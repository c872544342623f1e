package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Concurrent serving (r10 verdict item 1, batch half): the reference is a
  * multi-client server — many clients issuing queries against ONE engine
  * instance. SparkSession is the engine instance; FAIR scheduler pools are
  * the per-client isolation knob (a long scan in one pool can't starve a
  * cheap lookup in another). This spec pins that N batch queries answered
  * simultaneously from separate threads, each in its own FAIR pool, return
  * exactly their serial answers — shared session state (catalog, conf,
  * codegen cache, temp views) must not bleed across in-flight queries.
  * The streaming half (N simultaneous StreamingQueries off one feed) is
  * the `stream_fanout` key + its StreamingSpec pin.
  */
class ConcurrencySpec extends SparkFixture {

  private def canon(k: String): Seq[String] =
    SparkEntry.queries(k)(spark, sf001).collect().map(_.toString).sorted.toSeq

  test("four batch keys answered concurrently from threads (FAIR pools) equal their serial answers") {
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode", "FIFO") == "FAIR",
      "test session must run the FAIR scheduler (SparkFixture config)")
    // four keys spanning agg / join / window / dedup, all pure reads (no
    // shared /tmp staging, so concurrent runs touch disjoint state)
    val keys = Seq("agg_hash_q1", "join_inner_equi", "window_rank", "llm_dedup_exact")
    val serial = keys.map(k => k -> canon(k)).toMap
    val futs = keys.map { k =>
      Future {
        // local properties are thread-confined: each "client" gets its own pool
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"client_$k")
        try k -> canon(k)
        finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      }
    }
    val concurrent = Await.result(Future.sequence(futs), 5.minutes).toMap
    keys.foreach { k =>
      assert(concurrent(k) == serial(k), s"$k diverged under concurrent serving")
    }
  }
}
