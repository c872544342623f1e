package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared SparkSession across all suites (Test/fork = one JVM). */
object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // FAIR pools: the multi-client serving shape (ConcurrencySpec) —
      // batch results are scheduler-invariant, so every other suite runs
      // unchanged under it
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.ansi.enabled", "true")
      // production-shaped streaming state: disk-backed RocksDB provider for
      // every StreamingQuery (r12; see StreamOps.ensureRocksDb)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: per-batch incremental changelog upload
      // instead of full RocksDB snapshots (the production setting; at
      // fixture scale it removes most per-micro-batch provider overhead)
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkFixture extends AnyFunSuite {
  lazy val spark: SparkSession = SparkFixture.session
  val sf001 = "/root/testdata/sf0.001"

  /** Deterministic property check over a scalacheck Gen (no scalatestplus
    * bridge in the offline cache): n samples from fixed seeds. */
  def checkAll[A](gen: org.scalacheck.Gen[A], n: Int = 30)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).foreach(f)
    }
}
