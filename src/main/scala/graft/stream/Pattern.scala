package graft.stream

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-sequence pattern match (`window_pattern`'s streaming
  * twin): per user, emit every CONTIGUOUS view→click→purchase triple in
  * EVENT-TIME order, from an out-of-order stream.
  *
  * The matcher is a per-key buffer machine over `flatMapGroupsWithState`:
  * arrivals accumulate in an event-time-sorted buffer; a prefix is only
  * MATCHED AND EMITTED once the watermark passes it (no earlier event can
  * still arrive to break contiguity — the same argument that makes
  * append-mode window aggregates final). The last 2 matured events stay as
  * context so triples spanning a maturity boundary are never lost; events
  * older than the watermark at arrival are dropped (standard late policy).
  *
  * Scale shape: state per user = pattern context (2 rows) + the in-flight
  * tail younger than the watermark — bounded by delay × per-user rate,
  * NEVER history length; idle users evict via a 24 h event-time TTL
  * (two-phase: flush-arm while data is in flight, TTL-arm once drained,
  * remove on TTL fire). Emission is append-mode (matches are final facts).
  */
object Pattern {

  case class PatEv(event_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      user_id: Long, event_type: String)
  case class PatRec(ts_us: Long, event_id: Long, event_type: String)
  /** `armedTtl`: the two-phase eviction flag — false while armed to flush
    * in-flight events, true once only context remains (next fire evicts). */
  case class PatBuf(evs: List[PatRec], armedTtl: Boolean)
  case class PatMatch(user_id: Long, e1: Long, e2: Long, e3: Long, span_us: Long)

  private val TtlMs = 24L * 3600 * 1000

  def patternFn(key: Long, it: Iterator[PatEv],
      state: GroupState[PatBuf]): Iterator[PatMatch] = {
    // watermark 0 = not yet established (Spark's convention): nothing is
    // late and nothing matures before the first watermark exists
    val wmMs = state.getCurrentWatermarkMs()
    val prior = if (state.exists) state.get else PatBuf(Nil, armedTtl = false)
    // events already behind the watermark at arrival can no longer be
    // ordered against the emitted prefix — drop (late-event policy).
    // Comparisons are STRICT and mirror Spark's guarantee exactly: Spark
    // only promises no arrivals with ts < watermark, so an event with
    // ts == wm can still arrive — it must be buffered (not dropped), and
    // nothing at ts == wm may mature yet (r8 advice: the old <=/> split
    // discarded on-time events in [wm, wm+1ms) and emitted non-final
    // matches there).
    val fresh = it.map(e => PatRec(e.ts_us, e.event_id, e.event_type))
      .filter(e => wmMs == 0 || e.ts_us / 1000 >= wmMs).toList
    val buf = (prior.evs ++ fresh).sortBy(r => (r.ts_us, r.event_id))
    // matured = strictly below the watermark: no event can still arrive
    // earlier than these, so their relative order is final
    val (matured, pending) =
      if (wmMs == 0) (Nil, buf) else buf.partition(_.ts_us / 1000 < wmMs)
    val matches = matured.sliding(3).collect {
      case List(a, b, c)
          if a.event_type == "view" && b.event_type == "click" &&
            c.event_type == "purchase" =>
        PatMatch(key, a.event_id, b.event_id, c.event_id, c.ts_us - a.ts_us)
    }.toList
    val keep = matured.takeRight(2) ++ pending
    if (keep.isEmpty ||
        (state.hasTimedOut && prior.armedTtl && fresh.isEmpty && pending.isEmpty)) {
      state.remove() // nothing buffered, or a genuine idle-TTL expiry
    } else if (pending.nonEmpty) {
      // flush-arm: fire as soon as the watermark can mature the tail
      state.update(PatBuf(keep, armedTtl = false))
      state.setTimeoutTimestamp(math.max(wmMs + 1, pending.head.ts_us / 1000 + 1))
    } else {
      // only context left: TTL-arm so a dormant user's 2 rows evict
      state.update(PatBuf(keep, armedTtl = true))
      state.setTimeoutTimestamp(math.max(wmMs + 1, keep.last.ts_us / 1000 + TtlMs))
    }
    matches.iterator
  }

  /** The watermarked matcher over any event stream (columns of
    * [[graft.Schemas.events]]); shared by the replay key and the specs. */
  def matchStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .as[PatEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        patternFn)
      .toDF()
  }

  val queries: Seq[Q] = Seq(
    // The REAL streaming run (not a batch twin): replay the fixture as
    // micro-batches, then a sentinel far-future row advances the watermark
    // so every buffered triple matures and flushes through the timeout
    // path (staging + cleanup shared via Sources.withFlushedReplay since
    // r9). The sentinel user (-1) can never complete a triple and is
    // dropped by the final filter. Oracle: identical SQL to
    // window_pattern's — the streaming machine must reproduce the batch
    // answer exactly.
    Q("stream_pattern",
      (spark, sfDir) =>
        Sources.withFlushedReplay(spark, sfDir) { evs =>
          StreamOps.runToTable(spark, matchStream(spark, evs), OutputMode.Append())
        }
          .filter(col("user_id") >= 0)
          .orderBy(col("user_id"), col("e1")),
      Some("""
        SELECT user_id, e1, e2, e3, epoch_us(t3) - epoch_us(t1) AS span_us
        FROM (
          SELECT user_id, event_id AS e1, ts AS t1, event_type AS ty1,
                 lead(event_type, 1) OVER w AS ty2, lead(event_id, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS ty3, lead(event_id, 2) OVER w AS e3,
                 lead(ts, 2) OVER w AS t3
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE ty1 = 'view' AND ty2 = 'click' AND ty3 = 'purchase'
        ORDER BY user_id, e1""".trim)),
  )
}
