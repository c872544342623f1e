package graft.stream

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import java.net.{InetAddress, ServerSocket}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

/** SURVEY §2.9 + streaming halves of §2.1/§2.3 — Structured Streaming.
  *
  * Two kinds of contract keys live here:
  *  - **Batch twins** (`stream_tumbling`/`sliding`/`session`): the window
  *    semantics are batch-expressible, so the oracle-checked query runs the
  *    native window operator in batch mode; StreamingSpec asserts the
  *    streaming run over the same data produces identical results
  *    (prefix-consistency makes this exact).
  *  - **Streaming-only keys**: each runs a real StreamingQuery (file-replay
  *    / socket / rate-micro-batch source → memory sink, AvailableNow
  *    trigger) inside the query function and returns the sink table —
  *    the driver's rows-only check sees genuinely streamed results.
  *
  * Scale notes: stateful ops key their state by (group, window) in the
  * state store — at 100 TB the watermark bounds state size; every shuffle
  * below is on the aggregation key, identical to the batch plans.
  */
object StreamOps {
  import Det._

  private val sinkId = new AtomicInteger

  /** Which state API `stream_stateful` actually ran last —
    * "transformWithState" (primary) or "flatMapGroupsWithState" (fallback).
    * Observability for the silent-downgrade hazard (ADVICE r5): a bench or
    * spec can assert the primary path ran instead of quietly timing the
    * fallback. */
  @volatile var lastStatefulPath: String = "unset"

  /** True only for the failure class the fallback exists for: a missing /
    * un-initializable state-store provider (e.g. RocksDB JNI absent on an
    * exotic platform) or the operator itself unsupported by the running
    * engine. Genuine regressions in the processor — and fatal errors like
    * OOM — must RETHROW, not silently downgrade to the mature API (ADVICE
    * r5: a blanket Throwable catch masked any primary-path failure while
    * correctness stayed green via the fallback). */
  private def isProviderUnavailable(e: Throwable): Boolean = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq
    chain.exists { t =>
      val cls = t.getClass.getName
      cls.contains("UnsupportedOperation") || cls.contains("ClassNotFound") ||
        cls.contains("NoClassDefFound") || cls.contains("UnsatisfiedLink") ||
        cls.contains("StateStoreProvider") ||
        String.valueOf(t.getMessage).contains("RocksDB")
    }
  }

  /** The watermarked left-outer click⟕purchase join over any event stream
    * — shared by the `stream_outer_join` key and the restart spec.
    *
    * The sentinel must pass BOTH branch filters: Catalyst pushes a
    * deterministic filter below EventTimeWatermark, so a filter that
    * drops the sentinel ('view', user -1) would pin each branch's
    * watermark at its own event-type maximum and the final unmatched
    * clicks would never evict (observed: exactly the last-hour null rows
    * went missing). user_id < 0 admits the sentinel into both branches;
    * it can't join (no user -1 on the other side in its window) and the
    * caller's final user_id >= 0 filter drops its own null row. */
  private[graft] def outerJoinStream(evs: DataFrame): DataFrame = {
    val clicks = evs.withWatermark("ts", "10 minutes")
      .filter(col("event_type") === "click" || col("user_id") < 0)
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = evs.withWatermark("ts", "10 minutes")
      .filter(col("event_type") === "purchase" || col("user_id") < 0)
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  /** The FULL-outer twin of [[outerJoinStream]] (r11): both sides
    * null-extend on watermark expiry — an unmatched click emits its NULL
    * purchase once wm proves no purchase can still land in its hour, and
    * an unmatched purchase emits its NULL click once wm proves no click
    * can still precede it (wm > p_ts, from the same range condition read
    * in the other direction). Same sentinel admission as the left-outer:
    * user -1 passes both branch filters so neither branch's watermark
    * pins at its own event-type maximum; its self-match row carries
    * user -1 and the caller's user_id >= 0 filter drops it. */
  private[graft] def fullOuterJoinStream(evs: DataFrame): DataFrame = {
    val clicks = evs.withWatermark("ts", "10 minutes")
      .filter(col("event_type") === "click" || col("user_id") < 0)
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = evs.withWatermark("ts", "10 minutes")
      .filter(col("event_type") === "purchase" || col("user_id") < 0)
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
        "full_outer")
      .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Default EVERY harness-run StreamingQuery onto the RocksDB state-store
    * provider (r11 verdict item 4; previously only `transformWithState`
    * pinned it) — the provider a production deployment runs, where state
    * is disk-backed + incrementally checkpointed instead of a JVM-heap
    * HashMap: at 100 TB/day state size is bounded by the watermark but
    * still far beyond executor heap. Set once, lazily, and only if the
    * session has no explicit provider choice (an explicit setting wins —
    * that is also what keeps the set/restore in [[runWithRocksDb]]
    * race-free against this). */
  private[stream] def ensureRocksDb(spark: SparkSession): Unit =
    if (spark.conf.getOption(ProviderKey).isEmpty)
      spark.conf.set(ProviderKey, RocksDbProvider)

  /** Streaming STATE partitioning is a scale knob of its own, not the
    * session's batch shuffle parallelism (r20, opt guide §2): every
    * stateful micro-batch opens + commits one state store — a RocksDB
    * instance under this engine's provider — PER shuffle partition, so a
    * tiny-state query on a 32-core session pays 32 store lifecycles per
    * batch while 100 TB of state wants thousands spread over a cluster.
    * Default: defaultParallelism/4 clamped to ≥4 (scale-adaptive: grows
    * with the session, never a constant); production overrides via
    * `spark.graft.stream.statePartitions`. An explicit SMALLER session
    * setting wins (keys that pin partitions to the stream's key
    * cardinality keep their pin). Scoped around query START — Spark
    * freezes the value into the checkpoint at creation, so the scope only
    * needs to cover `.start()`. */
  private[stream] def withStateParallelism[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val target = spark.conf.getOption("spark.graft.stream.statePartitions")
      .map(_.toInt)
      .getOrElse(math.max(4, spark.sparkContext.defaultParallelism / 4))
    if (before.toInt <= target) body
    else {
      spark.conf.set(key, target.toString)
      try body finally spark.conf.set(key, before)
    }
  }

  /** Run a streaming DF to completion (AvailableNow) into a memory sink,
    * return the sink contents as a batch DataFrame. Runs on the RocksDB
    * state store (see [[ensureRocksDb]]) at state parallelism
    * ([[withStateParallelism]]). */
  private[stream] def runToTable(spark: SparkSession, sdf: DataFrame,
      mode: OutputMode): DataFrame = {
    ensureRocksDb(spark)
    val tbl = s"graft_sink_${sinkId.incrementAndGet()}"
    val q = withStateParallelism(spark) {
      sdf.writeStream.format("memory").queryName(tbl).outputMode(mode)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(tbl)
  }

  /** [[runToTable]] with the RocksDB state-store provider pinned for the
    * query (read at stream START, so a runtime conf set/restore scopes it):
    * `transformWithState` requires RocksDB; the other streaming keys keep
    * the session's default provider. */
  private def runWithRocksDb(spark: SparkSession, sdf: DataFrame,
      mode: OutputMode): DataFrame = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDbProvider)
    try runToTable(spark, sdf, mode)
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  // ---- typed records for the stateful op ----
  // `ts` stays in the record even though the state machine only reads
  // `ts_us`: event-time timeout requires the WATERMARKED column to survive
  // into the flatMapGroupsWithState input (the analyzer checks for the
  // watermark metadata on the operator's child output).
  case class Ev(event_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      user_id: Long, value: Double)
  case class UserState(n: Long, sessions: Long, firstTs: Long, lastTs: Long)
  case class UserStats(user_id: Long, n_events: Long, n_sessions: Long, span_us: Long)

  /** Arbitrary per-user state machine: event count, 30-min-gap session
    * count, and first→last span. Associative across batches via the
    * persisted [[UserState]]; events within a batch are sorted by time
    * (arrival order within a micro-batch is not time order; the buffer is
    * bounded per (user, micro-batch) — maxFilesPerTrigger caps it here, and
    * an open-corpus deployment caps it the same way via source rate limits).
    *
    * State TTL (`ttlMs` > 0, requires `EventTimeTimeout` + an upstream
    * watermark): every update re-arms an event-time timeout at
    * lastTs + TTL; once the watermark passes that with no new events for
    * the user, the state is evicted silently — update-mode consumers
    * already hold the user's last emitted stats, and a user returning
    * after the TTL starts a fresh state. Without eviction, per-user state
    * at 100 TB × months of users grows without bound (r2's NoTimeout
    * version was flagged for exactly this). */
  def sessionStateFn(gapUs: Long, ttlMs: Long = 0L)(
      key: Long, it: Iterator[Ev], state: GroupState[UserState]): Iterator[UserStats] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val s = foldEvents(
      state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue, Long.MinValue)),
      it.toArray, gapUs)
    if (s.n > state.getOption.map(_.n).getOrElse(0L)) {
      state.update(s)
      if (ttlMs > 0) state.setTimeoutTimestamp(s.lastTs / 1000 + ttlMs)
    }
    Iterator.single(UserStats(key, s.n, s.sessions,
      if (s.firstTs == Long.MinValue) 0L else s.lastTs - s.firstTs))
  }

  /** The state fold shared by both state APIs: batch events sorted by
    * time (micro-batch arrival order is not time order), then the
    * count/session/span machine. */
  private def foldEvents(init: UserState, batch: Array[Ev], gapUs: Long): UserState = {
    var s = init
    batch.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      val newSession = s.lastTs == Long.MinValue || e.ts_us - s.lastTs >= gapUs
      s = UserState(s.n + 1, s.sessions + (if (newSession) 1 else 0),
        if (s.firstTs == Long.MinValue) e.ts_us else s.firstTs, e.ts_us)
    }
    s
  }

  /** The same per-user machine on the MODERN state API
    * (`transformWithState`, Spark 4.x): state lives in a named
    * `ValueState`, eviction is an EVENT-TIME TIMER re-armed to
    * lastTs + TTL on every update — `handleExpiredTimer` clears the state
    * once the watermark passes it, mirroring the
    * `flatMapGroupsWithState` + EventTimeTimeout fallback exactly. The
    * operator requires the RocksDB provider, the store that actually
    * holds 100 TB-scale state (changelog checkpointing, out-of-heap).
    *
    * Why timers and not store-managed `TTLConfig`: value TTL requires
    * `TimeMode.ProcessingTime`, and in that mode the operator reports
    * state-cleanup work after EVERY batch, so a `Trigger.AvailableNow`
    * drain never terminates — it loops empty "no new data but cleaning up
    * state" batches forever (observed >1100 batches; this loop, not a
    * RocksDB fault, was r4's "hang" — the thread dumps had merely caught
    * the loop's per-batch uploads in flight). Event-time timers fire off
    * the watermark, which stops moving when the replay drains, so the
    * query terminates — and eviction keyed to event time is the semantics
    * the fallback path pins anyway. */
  class UserSessionProcessor(gapUs: Long, ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserStats] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[UserState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[UserState]("user_state",
        org.apache.spark.sql.Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStats] = {
      val init = if (st.exists()) st.get()
        else UserState(0L, 0L, Long.MinValue, Long.MinValue)
      val s = foldEvents(init, rows.toArray, gapUs)
      st.update(s)
      // exactly one live eviction timer per key: drop the stale one, arm
      // at lastTs + TTL (timer timestamps are epoch millis)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(s.lastTs / 1000 + ttl.toMillis)
      Iterator.single(UserStats(key, s.n, s.sessions,
        if (s.firstTs == Long.MinValue) 0L else s.lastTs - s.firstTs))
    }
    override def handleExpiredTimer(key: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[UserStats] = {
      st.clear()
      Iterator.empty
    }
  }

  val queries: Seq[Q] = Seq(

    // ---- windowed aggregations ----

    // 1-hour tumbling count+sum per event_type. Kept as the BATCH twin
    // (streaming equality pinned in StreamingSpec): it is a baseline12
    // protocol key, so its bench time must stay comparable to BASELINE.md's
    // DuckDB measurement — the real streaming legs of this family are
    // stream_sliding / stream_session / stream_trending_topk below.
    Q("stream_tumbling",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
            col("n"), col("sum_val"))
          .orderBy(col("ws_us"), col("event_type")),
      Some(s"""
        SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
          COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY 1, 2
        ORDER BY ws_us, event_type""".trim)),

    // 1-hour window sliding every 15 min (each event lands in 4 windows).
    // Since r9 a REAL append-mode streaming run (sentinel-watermark-flush,
    // the stream_pattern recipe): the fixture replays as micro-batches, a
    // far-future sentinel advances the watermark so every window FINALIZES
    // and flushes; the sentinel's own windows stay withheld (their end is
    // beyond the watermark), and the defensive ws_us bound would drop them
    // if an engine ever emitted them. Append + watermark is the 100 TB
    // shape — state is evicted as windows close, never retained like
    // Complete mode's. The batch SQL oracle must hash-match the flushed
    // stream output exactly.
    Q("stream_sliding",
      (spark, sfDir) =>
        Sources.withFlushedReplay(spark, sfDir) { evs =>
          runToTable(spark,
            evs.withWatermark("ts", "0 seconds")
              .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
                col("event_type"))
              .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
              .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
                col("n"), col("sum_val")),
            OutputMode.Append())
        }
          .filter(col("ws_us") < Sources.FlushTsNs / 1000 - 3600L * 1000000)
          .orderBy(col("ws_us"), col("event_type")),
      Some(s"""
        SELECT (epoch_us(ts) // 900000000 - k) * 900000000 AS ws_us, event_type,
          COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) slides
        GROUP BY 1, 2
        ORDER BY ws_us, event_type""".trim)),

    // Chained stateful aggregations (r11): TWO windowed aggregates in ONE
    // append-mode streaming query — per-15-min counts re-aggregated into
    // per-hour totals/max — the multi-stateful-operator pipeline Spark
    // only allows since 3.4/4.x (before that, the second groupBy threw
    // UnsupportedOperationCheck and you paid an intermediate sink + second
    // job). The hour level aggregates the QUARTER-level output (window-of-
    // window), so its state is bounded by open windows × types, never
    // event volume, and its results finalize when the watermark passes the
    // HOUR end — one query, one checkpoint, end-to-end event-time
    // correctness across both levels. The sentinel flush finalizes both
    // levels over the fixture; the oracle is the batch twin (quarter
    // rollup → hour rollup). At 100 TB this replaces the classic
    // two-topology "minutely job feeding an hourly job" with one query
    // whose second stage touches only first-stage output.
    Q("stream_chained_agg",
      (spark, sfDir) =>
        Sources.withFlushedReplay(spark, sfDir) { evs =>
          runToTable(spark,
            evs.withWatermark("ts", "0 seconds")
              .groupBy(window(col("ts"), "15 minutes").as("w1"),
                col("event_type"))
              .agg(count(lit(1)).as("n_q"))
              .groupBy(window(col("w1"), "1 hour").as("w2"), col("event_type"))
              .agg(sum(col("n_q")).as("n_tot"), max(col("n_q")).as("max_q"),
                count(lit(1)).as("n_quarters"))
              .select(unix_micros(col("w2.start")).as("hs_us"),
                col("event_type"), col("n_tot").cast("long").as("n_tot"),
                col("max_q").cast("long").as("max_q"), col("n_quarters")),
            OutputMode.Append())
        }
          .filter(col("hs_us") < Sources.FlushTsNs / 1000 - 7200L * 1000000)
          .orderBy(col("hs_us"), col("event_type")),
      Some("""
        WITH q AS (
          SELECT (epoch_us(ts) // 900000000) * 900000000 AS qs_us,
                 event_type, COUNT(*) AS n_q
          FROM events GROUP BY 1, 2
        )
        SELECT (qs_us // 3600000000) * 3600000000 AS hs_us, event_type,
               CAST(SUM(n_q) AS BIGINT) AS n_tot,
               CAST(MAX(n_q) AS BIGINT) AS max_q,
               COUNT(*) AS n_quarters
        FROM q
        GROUP BY 1, 2
        ORDER BY hs_us, event_type""".trim)),

    // Per-user sessions with 30-min inactivity gap — native session_window;
    // oracle is an independent gap-and-island formulation. Since r9 a REAL
    // append-mode streaming run (sentinel-watermark-flush): sessions only
    // emit in append mode once the watermark passes session end + gap, so
    // the far-future sentinel finalizes every fixture session while its
    // own single-event session (user -1) stays withheld; the user_id >= 0
    // filter is the defensive twin of that argument.
    Q("stream_session",
      (spark, sfDir) =>
        Sources.withFlushedReplay(spark, sfDir) { evs =>
          runToTable(spark,
            evs.withWatermark("ts", "0 seconds")
              .groupBy(col("user_id"),
                session_window(col("ts"), "30 minutes").as("w"))
              .agg(count(lit(1)).as("n"))
              .select(col("user_id"), unix_micros(col("w.start")).as("ss_us"),
                unix_micros(col("w.end")).as("se_us"), col("n")),
            OutputMode.Append())
        }
          .filter(col("user_id") >= 0)
          .orderBy(col("user_id"), col("ss_us")),
      Some("""
        WITH t AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts_us,
            SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM t
        )
        SELECT user_id, MIN(ts_us) AS ss_us, MAX(ts_us) + 1800000000 AS se_us,
          COUNT(*) AS n
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, ss_us""".trim)),

    // ---- real streaming runs ----

    // Replay the events parquet as an unbounded stream, aggregate per
    // type. The Complete-mode final emission must equal the batch
    // aggregate exactly (oracle added r9; previously rows-only).
    Q("source_stream_replay",
      (spark, sfDir) => {
        val agg = Sources.replayEvents(spark, sfDir, "events.parquet")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
        runToTable(spark, agg, OutputMode.Complete()).orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // The seekable-offset commit-log source (see [[GraftLog]]): events
    // staged as ordered TSV segments, streamed back through the
    // DataSourceV2 MicroBatchStream with admission control forcing
    // multiple micro-batches. The Complete-mode final emission must equal
    // the batch aggregate exactly — one lost, duplicated, or misparsed
    // record across the batch boundaries shifts a count or sum and fails
    // the hash. Seek/redelivery/restart semantics are pinned in
    // StreamingSpec.
    Q("source_graft_log",
      (spark, sfDir) => {
        val log = Sources.stagedLogDir(spark, sfDir).toString
        // bound the trigger to ~4 micro-batches at any SF: multi-batch
        // execution is the contract under test; 25 batches of engine
        // overhead at sf0.1 is harness cost, not data-path cost
        val perTrigger = math.max(4096L, GraftLog.logTotal(log) / 4 + 1)
        val agg = GraftLog.readStream(spark, log, maxRecordsPerTrigger = Some(perTrigger))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
        runToTable(spark, agg, OutputMode.Complete()).orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // The PARTITIONED commit log (r12): four `p=<k>` broker partitions
    // keyed by user_id % 4, consumed under a vector offset with the
    // admission budget split across partitions — the multi-partition
    // Kafka-topic shape, driver-verified: the Complete-mode final
    // emission over the multi-batch multi-partition drain must equal the
    // batch aggregate exactly (a record lost at any partition boundary
    // fails the hash).
    Q("source_graft_log_partitioned",
      (spark, sfDir) => {
        val log = Sources.stagedPartitionedLogDir(spark, sfDir).toString
        val perTrigger = math.max(4096L, GraftLog.logTotal(log) / 4 + 1)
        val agg = GraftLog.readStream(spark, log, maxRecordsPerTrigger = Some(perTrigger))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
        runToTable(spark, agg, OutputMode.Complete()).orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Wire-schema evolution on the streaming path (r13 — r12 verdict item
    // 5): a MIXED-GENERATION log — v1 segments (6-column TSV, the even
    // event_ids) plus v2 segments from an upgraded producer (`#v=2` header,
    // 7th `source` column, the odd event_ids) — streamed under the v2
    // schema: v1 records surface `source` NULL (reader-side merge, the
    // same additive-evolution contract as source_evolving's mergeSchema,
    // here across a WIRE format where it means a producer upgrade never
    // breaks a running consumer). The Complete-mode final emission groups
    // by provenance and must hash-match the batch oracle — one misparsed
    // header, shifted field, or mis-NULLed record diverges. Forward compat
    // (v1 reader over v2 segments) is pinned in GraftLogSpec.
    Q("source_graft_log_evolved",
      (spark, sfDir) => {
        val log = graft.Tmp.dir("src_graftlog_evo", sfDir)
        graft.ops.Acid.reset(log)
        val ev = Tables.events(spark, sfDir)
        GraftLog.stage(spark, ev.filter(col("event_id") % 2 === 0), log,
          segmentRows = 4096)
        GraftLog.stageV2(spark,
          ev.filter(col("event_id") % 2 === 1)
            .withColumn("source",
              concat(lit("prod-"), pmod(col("user_id"), lit(3)).cast("string"))),
          log, segmentRows = 4096, firstSegment = 90000)
        val perTrigger = math.max(4096L, GraftLog.logTotal(log) / 4 + 1)
        val agg = GraftLog.readStream(spark, log,
            maxRecordsPerTrigger = Some(perTrigger), wireVersion = 2)
          .groupBy(coalesce(col("source"), lit("legacy")).as("src"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
        runToTable(spark, agg, OutputMode.Complete()).orderBy(col("src"))
      },
      Some(s"""
        SELECT CASE WHEN event_id % 2 = 1
                    THEN 'prod-' || CAST(user_id % 3 AS VARCHAR)
                    ELSE 'legacy' END AS src,
               COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY 1
        ORDER BY src""".trim)),

    // Consumer-lag observability (r13 — r12 verdict item 2): per-partition
    // lag = log end − committed offset, THE first operational question
    // asked of a commit-log consumer. A consumer drains generation 1 of a
    // 4-partition log (event_id % 10 ≠ 0, keyed user_id % 4) to a
    // checkpoint; the producer then lands generation 2 (the % 10 == 0
    // remainder) AFTER the consumer's run. Lag is computed exactly the way
    // a lag monitor does it — frozen log end from the broker's segment
    // metadata vs the committed offset vector read from the consumer
    // group's store (here: the checkpoint's commits/ + offsets/ WAL) — no
    // data I/O, O(partitions) control plane. The oracle recomputes all
    // three numbers per partition from the fixture: one record mis-staged,
    // mis-admitted, or mis-committed and a count diverges.
    Q("stream_lag",
      (spark, sfDir) => {
        ensureRocksDb(spark)
        val log = graft.Tmp.dir("stream_lag_log", sfDir)
        val ckpt = graft.Tmp.dir("stream_lag_ckpt", sfDir)
        graft.ops.Acid.reset(log); graft.ops.Acid.reset(ckpt)
        val ev = Tables.events(spark, sfDir)
        (0 until 4).foreach { k =>
          GraftLog.stage(spark,
            ev.filter(pmod(col("user_id"), lit(4)) === k && col("event_id") % 10 =!= 0),
            s"$log/p=$k", segmentRows = 4096)
        }
        // multi-batch drain (admission control) to a committed checkpoint
        val perTrigger = math.max(4096L, GraftLog.logTotal(log) / 3 + 1)
        val q = GraftLog.readStream(spark, log, maxRecordsPerTrigger = Some(perTrigger))
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // the producer keeps producing after the consumer's last run
        (0 until 4).foreach { k =>
          GraftLog.stage(spark,
            ev.filter(pmod(col("user_id"), lit(4)) === k && col("event_id") % 10 === 0),
            s"$log/p=$k", segmentRows = 4096, firstSegment = 90000)
        }
        import spark.implicits._
        GraftLog.lag(log, ckpt).toSeq
          .map { case (p, (c, e, l)) => (p, c, e, l) }
          .toDF("part", "committed", "log_end", "lag")
          .orderBy(col("part"))
      },
      Some("""
        SELECT 'p=' || CAST(user_id % 4 AS VARCHAR) AS part,
               COUNT(*) FILTER (WHERE event_id % 10 <> 0) AS committed,
               COUNT(*) AS log_end,
               COUNT(*) FILTER (WHERE event_id % 10 = 0) AS lag
        FROM events
        GROUP BY 1
        ORDER BY part""".trim)),

    // Line-JSON over a real TCP socket served in-process.
    Q("source_socket",
      (spark, sfDir) => {
        val types = Seq("click", "view", "signup", "purchase", "error")
        val payload = (0 until 60).map { i =>
          s"""{"event_id":$i,"ts_us":${1700000000000000L + i * 1000000L},"user_id":${i % 5},"event_type":"${types(i % types.size)}","value":${i * 1.5},"props":"{\\"k\\":${i % 100}}"}"""
        }
        val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
        val done = new java.util.concurrent.CountDownLatch(1)
        val feeder = new Thread(() => {
          val sock = server.accept()
          val out = new java.io.PrintWriter(sock.getOutputStream, true)
          payload.foreach(out.println)
          out.flush()
          // hold the connection only until the sink confirms receipt (the
          // r2 version slept 30 s unconditionally — the one construct in
          // the repo with nondeterministic latency under load)
          done.await(30, java.util.concurrent.TimeUnit.SECONDS)
          sock.close()
        })
        feeder.setDaemon(true)
        feeder.start()
        val tbl = s"graft_sink_${sinkId.incrementAndGet()}"
        val q = Sources.socketEvents(spark, "127.0.0.1", server.getLocalPort)
          .writeStream.format("memory").queryName(tbl)
          .outputMode(OutputMode.Append()).start()
        val deadline = System.nanoTime() + 30L * 1000000000L
        while (spark.table(tbl).count() < payload.size && System.nanoTime() < deadline) {
          q.processAllAvailable()
          Thread.sleep(100)
        }
        done.countDown()
        q.stop(); q.awaitTermination(); server.close()
        // a partial read must be a visible failure, not a silently small
        // aggregate the driver's rows-only check would accept as green
        val received = spark.table(tbl).count()
        require(received == payload.size,
          s"source_socket: received $received of ${payload.size} events before deadline")
        spark.table(tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      None),

    // Serving egress (r12 — see [[Serve]]): the reference's serve side.
    // Three subscribers, each with its own filter, each fed by its own
    // StreamingQuery pushing line-JSON over TCP from EXECUTOR-side
    // ForeachWriter connections. The key's output is aggregated from what
    // the subscribers RECEIVED (deduped on event_id — at-least-once push,
    // exactly-once consumption), hash-matched against the batch oracle —
    // one dropped, duplicated, or corrupted pushed line shifts a count or
    // sum and fails the hash. The received-lines parse is client-side
    // receipt verification, not an engine data path.
    Q("sink_serve",
      (spark, sfDir) => {
        val types = Seq("click", "purchase", "view")
        val clients = types.map(_ => new Serve.SubscriberClient())
        val queries = types.zip(clients).map { case (t, c) =>
          Serve.push(
            Sources.replayEvents(spark, sfDir, "events.parquet")
              .filter(col("event_type") === t),
            "127.0.0.1", c.port)
        }
        queries.foreach(_.awaitTermination())
        // termination proves the writers flushed+closed; quiesce until every
        // accepted connection hits EOF so in-flight TCP bytes are in the
        // received set before we aggregate (ADVICE r12)
        clients.foreach(_.quiesce())
        clients.foreach(_.close())
        import spark.implicits._
        val received = spark.createDataset(clients.flatMap(_.lines))
          .select(from_json(col("value"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "event_id LONG, ts_us LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"))
            .as("e"))
          .select(col("e.event_id").as("event_id"), col("e.event_type").as("event_type"),
            col("e.value").as("value"))
          .dropDuplicates("event_id")
        received.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE event_type IN ('click', 'purchase', 'view')
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Dynamic subscriber lifecycle (r14 — see [[Serve.Hub]]; r13 verdict
    // item 2): subscribers attach MID-STREAM with backfill-from-offset and
    // detach without disturbing the rest — the reference's
    // reconnect/backfill UX as one composed surface. Timeline: A attaches
    // at offset 0 and drains generation 1; B attaches at ordinal K (mid
    // log) — its single query serves the backfill [K, end-of-gen1) and
    // then keeps tailing; A detaches; the producer lands generation 2,
    // which B receives live. The key's output is B's received set — the
    // staged log is event_id-ordered, so "attached at ordinal K" must
    // equal "every event after the K-th smallest id", which the oracle
    // recomputes from scratch: one event lost or duplicated at the attach
    // seam, in the backfill→tail handoff, or during A's detach shifts the
    // row set and fails the hash. Per-event rows (not an aggregate) make
    // the no-loss/no-dup contract row-exact.
    Q("serve_dynamic_subscribe",
      (spark, sfDir) => {
        val log = graft.Tmp.dir("serve_dyn_log", sfDir)
        graft.ops.Acid.reset(log)
        val ev = Tables.events(spark, sfDir)
        val maxId = ev.agg(max(col("event_id"))).head.getLong(0)
        val cutLive = maxId * 3 / 5 // generation 1 = ids <= cutLive
        val cutB = maxId * 3 / 10   // B's attach ordinal = #(ids <= cutB)
        val gen1 = ev.filter(col("event_id") <= cutLive)
        GraftLog.stage(spark, gen1, log, segmentRows = 2048)
        val n1 = gen1.count()
        val k = ev.filter(col("event_id") <= cutB).count()
        val hub = new Serve.Hub(spark, log)
        val a = new Serve.SubscriberClient()
        val b = new Serve.SubscriberClient()
        try {
          hub.attach("a", "127.0.0.1", a.port)
          Serve.waitUntil(s"A drains generation 1 (${a.count}/$n1)")(a.count >= n1)
          // B joins mid-stream at ordinal K: backfill first ...
          hub.attach("b", "127.0.0.1", b.port, startingOffset = k)
          Serve.waitUntil(s"B backfills [K, gen1) (${b.count}/${n1 - k})")(
            b.count >= (n1 - k).toInt)
          // ... A detaches mid-stream (B and the hub are undisturbed) ...
          hub.detach("a")
          // ... then the live tail: the producer lands generation 2
          GraftLog.stage(spark, ev.filter(col("event_id") > cutLive), log,
            segmentRows = 2048, firstSegment = 90000)
          val total = GraftLog.logTotal(log)
          Serve.waitUntil(s"B tails generation 2 (${b.count}/${total - k})")(
            b.count >= (total - k).toInt)
        } finally hub.detachAll()
        a.close(); b.quiesce(); b.close()
        import spark.implicits._
        spark.createDataset(b.lines.toSeq)
          .select(from_json(col("value"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "event_id LONG, ts_us LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"))
            .as("e"))
          .select(col("e.event_id").as("event_id"),
            col("e.event_type").as("event_type"), col("e.value").as("value"))
          .dropDuplicates("event_id") // at-least-once push, exactly-once receipt
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, event_type, value
        FROM events
        WHERE event_id > (SELECT CAST(FLOOR(MAX(event_id) * 3 / 10) AS BIGINT) FROM events)
        ORDER BY event_id""".trim)),

    // Consumer-group consumption (r14 — see [[ConsumerGroup]]): Kafka's
    // horizontal-scale primitive for ONE logical subscriber, composed over
    // the partitioned commit log. Generation 1 (ids ≤ cut, 4 broker
    // partitions keyed user_id % 4) is divided between members alice
    // {p=0,p=2} and bob {p=1,p=3} — independent StreamingQueries whose
    // source sees ONLY its assigned partitions; both commit their reported
    // end-offset vectors to the group ledger. Bob then LEAVES, the producer
    // lands generation 2, and the rebalanced group (alice alone, all four
    // partitions) resumes from the ledger — her own commits plus bob's
    // handoff. The key's output is the UNION of everything every member
    // ever received, per-event rows with NO dedup: a record delivered to
    // two members, re-delivered across the rebalance (ledger position too
    // low), or lost at a partition handoff (position too high) changes the
    // row multiset and fails the hash against the whole events table.
    Q("serve_consumer_group",
      (spark, sfDir) => {
        val log = graft.Tmp.dir("cg_log", sfDir)
        val group = graft.Tmp.dir("cg_group", sfDir)
        graft.ops.Acid.reset(log); graft.ops.Acid.reset(group)
        val ev = Tables.events(spark, sfDir)
        val maxId = ev.agg(max(col("event_id"))).head.getLong(0)
        val cut = maxId * 3 / 5 // generation 1 = ids <= cut
        def land(df: DataFrame, firstSegment: Int): Unit =
          GraftLog.stagePartitioned(spark, df, log, numParts = 4,
            segmentRows = 2048, firstSegment = firstSegment)
        land(ev.filter(col("event_id") <= cut), 0)
        val parts = (0 until 4).map(k => s"p=$k")
        // keep every drain multi-batch (the contract under test) while the
        // budget scales with the staged log — a fixed 2048 ran ~90
        // micro-batches of pure engine lifecycle per member at sf0.1
        val per = Some(math.max(2048L, GraftLog.logTotal(log) / 12 + 1))
        val gen1 = ConsumerGroup.assign(parts, Seq("alice", "bob"))
        val aliceG1 = ConsumerGroup.drainMember(spark, log, group, gen1("alice"), per)
        val bobG1 = ConsumerGroup.drainMember(spark, log, group, gen1("bob"), per)
        land(ev.filter(col("event_id") > cut), 90000) // generation 2
        val gen2 = ConsumerGroup.assign(parts, Seq("alice")) // bob left
        val aliceG2 = ConsumerGroup.drainMember(spark, log, group, gen2("alice"), per)
        val cols = Seq("event_id", "user_id", "event_type", "value").map(col)
        aliceG1.select(cols: _*)
          .unionAll(bobG1.select(cols: _*))
          .unionAll(aliceG2.select(cols: _*))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, event_type, value
        FROM events
        ORDER BY event_id""".trim)),

    // Join-side rebalance with generation fencing (r14 — the complement
    // of serve_consumer_group's leave-side handoff; Kafka's group epoch):
    // alice consumes the whole topic alone under generation 1, then BOB
    // JOINS — the rebalance bumps the epoch and REVOKES p=1/p=3 from
    // alice; bob resumes those partitions from ALICE's committed ledger
    // positions (the revocation handoff: log-start would duplicate her
    // generation-1 receipts, log-end would lose the backlog). A zombie
    // commit from the dead generation is FENCED in-body: with the
    // ledger's monotone max-merge, an unfenced zombie advancing a revoked
    // partition would make bob SKIP records — the fence turns silent
    // loss into a loud rejection, and the oracle hash over the union of
    // every member's receipts (NO dedup) would catch either failure
    // mode. Member parallelism stays query parallelism: each drain is an
    // independent StreamingQuery over only its assigned partitions.
    Q("serve_group_rebalance",
      (spark, sfDir) => {
        val log = graft.Tmp.dir("cgr_log", sfDir)
        val group = graft.Tmp.dir("cgr_group", sfDir)
        graft.ops.Acid.reset(log); graft.ops.Acid.reset(group)
        val ev = Tables.events(spark, sfDir)
        val maxId = ev.agg(max(col("event_id"))).head.getLong(0)
        val cut = maxId * 3 / 5
        def land(df: DataFrame, firstSegment: Int): Unit =
          GraftLog.stagePartitioned(spark, df, log, numParts = 4,
            segmentRows = 2048, firstSegment = firstSegment)
        land(ev.filter(col("event_id") <= cut), 0)
        val parts = (0 until 4).map(k => s"p=$k")
        // size-adaptive multi-batch budget (see serve_consumer_group)
        val per = Some(math.max(2048L, GraftLog.logTotal(log) / 12 + 1))
        // generation 1: alice is the whole group
        val (g1, asg1) = ConsumerGroup.rebalance(group, parts, Seq("alice"))
        val aliceG1 = ConsumerGroup.drainMember(spark, log, group,
          asg1("alice"), per, generation = Some(g1))
        land(ev.filter(col("event_id") > cut), 90000) // backlog keeps growing
        // bob JOINS: epoch bump, p=1/p=3 revoked from alice
        val (g2, asg2) = ConsumerGroup.rebalance(group, parts, Seq("alice", "bob"))
        require(g2 == g1 + 1, s"rebalance must bump the generation: $g1 -> $g2")
        // a zombie still living in generation 1 tries to push p=1 past the
        // end of the log — fenced, ledger untouched (bob would otherwise
        // resume past the backlog and the hash below would miss rows)
        val before = ConsumerGroup.committedOffsets(group)
        val fenced =
          try { ConsumerGroup.commitOffsets(group, Map("p=1" -> Long.MaxValue), Some(g1)); false }
          catch { case _: FencedGenerationException => true }
        require(fenced, "stale-generation commit was not fenced")
        require(ConsumerGroup.committedOffsets(group) == before,
          "fenced commit mutated the group ledger")
        val aliceG2 = ConsumerGroup.drainMember(spark, log, group,
          asg2("alice"), per, generation = Some(g2))
        val bobG2 = ConsumerGroup.drainMember(spark, log, group,
          asg2("bob"), per, generation = Some(g2))
        val cols = Seq("event_id", "user_id", "event_type", "value").map(col)
        aliceG1.select(cols: _*)
          .unionAll(aliceG2.select(cols: _*))
          .unionAll(bobG2.select(cols: _*))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, event_type, value
        FROM events
        ORDER BY event_id""".trim)),

    // The composed end-to-end service loop (r13 — see [[E2e]]; r12 verdict
    // item 1, highest leverage): graft-log ingest → per-user stateful
    // transform → serve egress as ONE restartable chain. Generation 1 of
    // the log (first ~60% by event_id) drains through the chain, the query
    // TERMINATES (the down window), the producer lands generation 2, and a
    // SECOND query on the same checkpoint resumes — offsets at the source
    // (only gen 2 replays), state across the restart (per-user sequence
    // counters continue where gen 1 left them), idempotent consumption at
    // the sink (exact-line dedup; a divergent re-push would survive as a
    // duplicate event_id row and fail the row count). The result is every
    // served record with its sequence number, hash-matched against the
    // batch ROW_NUMBER oracle over the FULL log: one lost, duplicated, or
    // re-numbered record anywhere across the restart boundary fails. The
    // asynchronous mid-batch kill variant is pinned in StreamingSpec.
    Q("pipeline_e2e_serve",
      (spark, sfDir) => {
        ensureRocksDb(spark)
        val log = graft.Tmp.dir("e2e_log", sfDir)
        val ckpt = graft.Tmp.dir("e2e_ckpt", sfDir)
        graft.ops.Acid.reset(log); graft.ops.Acid.reset(ckpt)
        val ev = Tables.events(spark, sfDir)
        val n = ev.count()
        // deterministic split point: the (3n/5)-th smallest event_id
        val split = ev.orderBy(col("event_id")).limit((n * 3 / 5).toInt)
          .agg(max(col("event_id"))).head.getLong(0)
        GraftLog.stage(spark, ev.filter(col("event_id") <= split), log,
          segmentRows = 4096)
        val client = new Serve.SubscriberClient()
        val perTrigger = math.max(1024L, n / 5)
        // leg 1: drain generation 1 in several admitted micro-batches
        E2e.startChain(spark, log, ckpt, perTrigger,
          "127.0.0.1", client.port).awaitTermination()
        // the consumer is down; the producer keeps producing
        GraftLog.stage(spark, ev.filter(col("event_id") > split), log,
          segmentRows = 4096, firstSegment = 90000)
        // leg 2: restart from the checkpoint — offsets AND state resume
        E2e.startChain(spark, log, ckpt, perTrigger,
          "127.0.0.1", client.port).awaitTermination()
        client.quiesce(); client.close()
        E2e.parseReceived(spark, client.lines)
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS seq
        FROM events
        WHERE event_type IN ('click', 'purchase')
        ORDER BY event_id""".trim)),

    // The PRODUCER side of the commit log (r12): a StreamingQuery LANDS
    // its micro-batches as graft-log segments (executors render the TSV
    // wire format distributed; deterministic segment names + overwrite =
    // idempotent replay), then the landed log is re-read through the
    // BATCH_READ capability and aggregated — engine as both producer and
    // consumer of the same wire format, hash-matched against the batch
    // filter+agg: one lost/duplicated/misrendered record fails the hash.
    Q("sink_graft_log",
      (spark, sfDir) => {
        val out = graft.Tmp.dir("sink_graftlog", sfDir)
        graft.ops.Acid.reset(out) // fresh log per run (staging policy)
        val q = Sources.replayEvents(spark, sfDir, "events.parquet")
          .filter(col("event_type") === "purchase")
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            GraftLog.landBatch(batch, out, batchId)
          }
          .option("checkpointLocation",
            Files.createTempDirectory("graft_sinklog_ckpt").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        GraftLog.read(spark, out)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("d"))
      },
      Some(s"""
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
               ${sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
        ORDER BY d""".trim)),

    // Log compaction (r12): Kafka compacted-topic semantics for the
    // graft log — the full event stream lands as segments (produce
    // side), then compaction rewrites the log keeping only the record at
    // the highest offset per key (user_id; event_id is the stream's
    // monotone offset, the replay order source_stream_replay feeds by).
    // The compacted generation is re-landed THROUGH THE WIRE FORMAT and
    // re-read — per-user rows round-trip TSV exactly (double → shortest
    // string → double is identity; value compared through the Det
    // DECIMAL(18,6) → DOUBLE policy). At 100 TB compaction is the
    // periodic maintenance job that bounds a keyed changelog at
    // |keys| × record size regardless of stream length — the same
    // O(keys)-not-O(history) claim as sink_cdc/merge-on-read, proven
    // here across the serialization boundary.
    Q("sink_graft_log_compact",
      (spark, sfDir) => {
        val out = graft.Tmp.dir("sink_graftlog_cmp", sfDir)
        graft.ops.Acid.reset(out)
        val ev = graft.Tables.events(spark, sfDir)
        GraftLog.landBatch(ev, out, 0L)
        val log = GraftLog.read(spark, out)
        val lastIds = log.groupBy(col("user_id"))
          .agg(max(col("event_id")).as("event_id"))
        val compacted = log.join(lastIds, Seq("user_id", "event_id"))
        val out2 = graft.Tmp.dir("sink_graftlog_cmp2", sfDir)
        graft.ops.Acid.reset(out2)
        GraftLog.landBatch(compacted
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"), col("props")), out2, 0L)
        GraftLog.read(spark, out2)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"),
            graft.Det.val6(col("value")).cast("double").as("last_value"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH last AS (
          SELECT user_id, MAX(event_id) AS last_event_id
          FROM events GROUP BY 1
        )
        SELECT e.user_id, e.event_id AS last_event_id,
               e.event_type AS last_type,
               CAST(CAST(e.value AS DECIMAL(18,6)) AS DOUBLE) AS last_value
        FROM events e JOIN last l
          ON e.user_id = l.user_id AND e.event_id = l.last_event_id
        ORDER BY e.user_id""".trim)),

    // Segment retention (r13 — r12 verdict item 4): the size-based half of
    // log maintenance (compaction above is the keyed half). The full event
    // stream stages as 1000-row segments; expiry keeps the most recent
    // 3000 records, deleting whole prefix segments and advancing the
    // `_truncated` log-start marker FIRST (crash mid-expiry leaves
    // unreferenced segments, never a readable gap). Ordinals of surviving
    // records never change — Kafka's logStartOffset contract — so
    // committed consumer offsets stay valid; a consumer that fell below
    // the new log start fails loudly at its next plan (GraftLogSpec pins
    // both). The batch read-back aggregates exactly the retained suffix;
    // the oracle recomputes the retention horizon arithmetic (whole-
    // segment granularity) from the fixture — one record lost or spared
    // wrongly at the boundary shifts a count and fails the hash. At
    // 100 TB/day this is the difference between a log and a disk-full
    // incident.
    Q("sink_graft_log_retention",
      (spark, sfDir) => {
        val out = graft.Tmp.dir("sink_graftlog_ret", sfDir)
        graft.ops.Acid.reset(out)
        GraftLog.stage(spark, Tables.events(spark, sfDir), out, segmentRows = 1000)
        GraftLog.expire(out, keepRecordsPerPartition = 3000)
        GraftLog.read(spark, out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH t AS (SELECT COUNT(*) AS total FROM events),
        h AS (SELECT CASE WHEN total >= 3000
                     THEN CAST(FLOOR((total - 3000) / 1000) * 1000 AS BIGINT)
                     ELSE 0 END AS h FROM t),
        r AS (SELECT event_type, value,
                     ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS ord
              FROM events)
        SELECT event_type, COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM r, h
        WHERE r.ord >= h.h
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Deterministic synthetic generator: exactly one 256-row micro-batch.
    Q("source_rate",
      (spark, sfDir) => {
        val tbl = s"graft_sink_${sinkId.incrementAndGet()}"
        val q = Sources.rateMicroBatch(spark, 256)
          .writeStream.format("memory").queryName(tbl)
          .outputMode(OutputMode.Append()).trigger(Trigger.Once()).start()
        q.awaitTermination()
        spark.table(tbl)
          .groupBy((col("value") % 8).as("bucket"))
          .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
            max(col("value")).as("max_v"))
          .orderBy(col("bucket"))
      },
      None),

    // Streaming sinks: foreachBatch → parquet (prod path) then read back.
    // Exactly-once across retries AND restarts: each micro-batch writes to
    // a deterministic batch=<id> directory with overwrite — a replayed
    // batch (task retry, restart from checkpoint re-running the last
    // uncommitted batch) overwrites its own output instead of appending a
    // duplicate. StreamingSpec proves the restart path end-to-end.
    Q("sink_stream",
      (spark, sfDir) => {
        val outDir = Files.createTempDirectory("graft_sink_parquet").toString
        val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
        val purchases = Sources.replayEvents(spark, sfDir, "events.parquet")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"))
        val q = purchases.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.read.parquet(outDir)
          .groupBy((col("user_id") % 10).as("user_mod"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("user_mod"))
      },
      // The landed parquet must hold every purchase exactly once — the
      // read-back aggregate hash-matches the batch filter+agg (oracle
      // added r9; previously rows-only).
      Some(s"""
        SELECT user_id % 10 AS user_mod, COUNT(*) AS n,
               ${sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
        ORDER BY user_mod""".trim)),

    // Streaming → ACID table (r11): the lakehouse landing path. Each
    // micro-batch commits through Acid.appendTxn keyed by its batchId —
    // the txn ledger rides the manifest, so a replayed batch (task retry,
    // restart re-running the last uncommitted batch) finds its id
    // committed and NO-OPS: at-least-once delivery becomes exactly-once
    // ON THE TABLE, not just in a sink directory convention. Unlike
    // sink_stream's batch=<id> overwrite dirs, readers here get one
    // atomic snapshot (pointer → manifest → files) — a reader concurrent
    // with batch N sees exactly batches 0..N-1 or 0..N, never a torn mix.
    // The fixture is staged as 4 files so the replay genuinely commits a
    // multi-version chain (v0..v3), and the key reads the final snapshot
    // back THROUGH the manifest and aggregates it — the oracle proves no
    // batch was lost or double-applied. StreamingSpec pins the replay
    // no-op and the checkpoint-restart path. At 100 TB this is
    // foreachBatch + Delta/Iceberg txn-id dedup, byte-for-byte the same
    // contract.
    Q("stream_acid_sink",
      (spark, sfDir) => {
        val stage = graft.Tmp.dir("stream_acid_src", sfDir)
        Tables.events(spark, sfDir)
          .repartition(4, col("event_id"))
          .write.mode("overwrite").parquet(stage)
        val table = graft.Tmp.dir("stream_acid_tbl", sfDir)
        graft.ops.Acid.reset(table)
        val ckpt = Files.createTempDirectory("graft_acid_ckpt").toString
        val q = Sources.replayEvents(spark, stage)
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            graft.ops.Acid.appendTxn(spark, table, batch, batchId); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        graft.ops.Acid.read(spark, table)
          .groupBy(to_date(col("ts")).as("d"), col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("d"), col("event_type"))
      },
      Some(s"""
        SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n,
               ${sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1, 2
        ORDER BY d, event_type""".trim)),

    // Dual-sink micro-batch landing (r11): the "operational store +
    // metrics store" shape — every micro-batch computes ONCE and lands in
    // TWO Acid tables: the raw purchase detail and a per-user_mod rollup,
    // both committed under the same txnId. Each table's manifest ledger
    // makes its write exactly-once under replay independently; the pair is
    // NOT one cross-table atomic commit (that needs a shared log — a
    // two-table reader between the two appends can see detail at batch N,
    // rollup at N−1, healed by the next commit), which is precisely
    // Delta/Iceberg's contract for multi-table streaming too. The key
    // re-aggregates the detail table and re-sums the rollup table into the
    // SAME shape, tags each, and the oracle demands both equal the batch
    // answer — no batch lost, duplicated, or landed in only one table.
    // The rollup re-sum is exact: per-batch partials are 6dp decimals
    // whose doubles round-trip losslessly (Det policy), so re-summing
    // through val6 is order-independent. StreamingSpec pins the
    // replayed-batch no-op on both tables.
    Q("stream_multi_sink",
      (spark, sfDir) => {
        val stage = graft.Tmp.dir("stream_msink_src", sfDir)
        Tables.events(spark, sfDir)
          .repartition(4, col("event_id"))
          .write.mode("overwrite").parquet(stage)
        val tDetail = graft.Tmp.dir("stream_msink_detail", sfDir)
        val tRollup = graft.Tmp.dir("stream_msink_rollup", sfDir)
        graft.ops.Acid.reset(tDetail)
        graft.ops.Acid.reset(tRollup)
        val ckpt = Files.createTempDirectory("graft_msink_ckpt").toString
        val q = Sources.replayEvents(spark, stage)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val b = batch.cache() // one source compute, two destinations
            try {
              graft.ops.Acid.appendTxn(spark, tDetail, b, batchId)
              graft.ops.Acid.appendTxn(spark, tRollup,
                b.groupBy((col("user_id") % 10).as("user_mod"))
                  .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val")),
                batchId)
              ()
            } finally { b.unpersist(blocking = false); () }
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val fromDetail = graft.ops.Acid.read(spark, tDetail)
          .groupBy((col("user_id") % 10).as("user_mod"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
        val fromRollup = graft.ops.Acid.read(spark, tRollup)
          .groupBy(col("user_mod"))
          .agg(sum(col("n")).as("n"), emit(sum(val6(col("sum_val"))), 6).as("sum_val"))
        fromDetail.withColumn("sink", lit("detail"))
          .unionByName(fromRollup.withColumn("sink", lit("rollup")))
          .select(col("sink"), col("user_mod"), col("n"), col("sum_val"))
          .orderBy(col("sink"), col("user_mod"))
      },
      Some(s"""
        WITH agg AS (
          SELECT user_id % 10 AS user_mod, COUNT(*) AS n,
                 ${sqlSumVal6("value")} AS sum_val
          FROM events
          WHERE event_type = 'purchase'
          GROUP BY 1
        )
        SELECT sink, user_mod, n, sum_val FROM (
          SELECT 'detail' AS sink, * FROM agg
          UNION ALL
          SELECT 'rollup' AS sink, * FROM agg
        ) ORDER BY sink, user_mod""".trim)),

    // Event-time watermark + append mode: only finalized windows emit.
    // The emitted set is a DETERMINISTIC function of the replay — one data
    // batch advances the watermark to max(ts) − 10 min, and exactly the
    // windows whose end sits at or below that watermark finalize; the tail
    // windows stay withheld in state. The oracle computes the same cutoff
    // from the raw table (oracle added r9; previously rows-only — the
    // late-DROP semantics, which need a second batch, stay in §5 tests).
    Q("stream_watermark_late",
      (spark, sfDir) => {
        val agg = Sources.replayEvents(spark, sfDir, "events.parquet")
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"), col("n"))
        runToTable(spark, agg, OutputMode.Append())
          .orderBy(col("ws_us"), col("event_type"))
      },
      Some("""
        WITH m AS (SELECT epoch_us(MAX(ts)) - 600000000 AS wm FROM events)
        SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
               COUNT(*) AS n
        FROM events, m
        GROUP BY 1, 2, m.wm
        HAVING ws_us + 3600000000 <= m.wm
        ORDER BY ws_us, event_type""".trim)),

    // Exactly-once per event_id across micro-batches: the replay dir holds
    // two copies of the events file (2 batches); state dedups the second.
    // WITHIN-WATERMARK dedup, not plain dropDuplicates: the plain variant
    // keys state on every event_id ever seen — unbounded at 100 TB — while
    // this one expires state once the watermark passes, bounding it by
    // (watermark delay + duplicate skew). The delay here exceeds the
    // fixture's whole span, so the output is identical to the unbounded
    // variant; StreamingSpec pins the bounded-state semantics.
    Q("stream_dedup",
      (spark, sfDir) => {
        val dir = Files.createTempDirectory("graft_dedup")
        Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("a.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("b.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val deduped = Sources.replayEvents(spark, dir.toString)
          .withWatermark("ts", "30 days")
          .dropDuplicatesWithinWatermark("event_id")
        runToTable(spark, deduped, OutputMode.Append())
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      // The doubled replay feeds every event TWICE; per-type counts over
      // the deduped stream must equal per-type DISTINCT event_ids of the
      // single original — one leaked duplicate or lost event shifts a
      // count and fails the hash (oracle added r9; previously rows-only).
      Some("""
        SELECT event_type, COUNT(DISTINCT event_id) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Arbitrary per-user state with event-time TTL eviction (24 h after a
    // user's last event, watermark-driven). PRIMARY path (r5): the Spark
    // 4.x-native `transformWithState` + [[UserSessionProcessor]] on the
    // RocksDB store — named state variables, timer-based eviction, the
    // API/store pairing that holds 100 TB-scale state. Fallback: the
    // mature `flatMapGroupsWithState` + EventTimeTimeout machine
    // ([[sessionStateFn]]) — same fold, same eviction semantics
    // (StreamingSpec asserts the two paths produce identical rows). The
    // fixture replay is a single micro-batch so no state ages out here;
    // StreamingSpec drives multi-batch eviction on both paths.
    Q("stream_stateful",
      (spark, sfDir) => {
        import spark.implicits._
        val evs: Dataset[Ev] = Sources.replayEvents(spark, sfDir, "events.parquet")
          .withWatermark("ts", "10 minutes")
          .select(col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
            col("user_id"), col("value"))
          .as[Ev]
        try {
          val stats = evs.groupByKey(_.user_id)
            .transformWithState(
              new UserSessionProcessor(30L * 60 * 1000000,
                java.time.Duration.ofHours(24)),
              org.apache.spark.sql.streaming.TimeMode.EventTime(),
              OutputMode.Update())
          val out = runWithRocksDb(spark, stats.toDF(), OutputMode.Update())
            .orderBy(col("user_id"))
          lastStatefulPath = "transformWithState"
          out
        } catch {
          // ONLY a missing/broken provider downgrades (fatal errors and
          // processor regressions rethrow — see isProviderUnavailable):
          // same machine on the HDFS-backed store via flatMapGroupsWithState
          case e: Throwable if isProviderUnavailable(e) =>
            System.err.println(s"[graft] transformWithState unavailable " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
              "falling back to flatMapGroupsWithState")
            lastStatefulPath = "flatMapGroupsWithState"
            val stats = evs.groupByKey(_.user_id)
              .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout)(
                sessionStateFn(30L * 60 * 1000000, ttlMs = 24L * 3600 * 1000))
            runToTable(spark, stats.toDF(), OutputMode.Update())
              .orderBy(col("user_id"))
        }
      },
      // The single-data-batch replay emits exactly one final stats row per
      // user, so the state machine's output is SQL-expressible: session
      // starts where the gap >= 30 min (the fold's `>= gapUs`, matching
      // stream_session's convention), span = last − first (oracle added
      // r9; previously rows-only — the multi-batch/eviction semantics the
      // oracle can't see stay pinned in StreamingSpec).
      Some("""
        WITH t AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(is_new) AS BIGINT) AS n_sessions,
               MAX(ts_us) - MIN(ts_us) AS span_us
        FROM t
        GROUP BY user_id
        ORDER BY user_id""".trim)),

    // Stream-stream join, batch twin (r3): click→purchase attribution —
    // every purchase within 1 h after a click by the same user. The twin
    // is oracle-checked SQL (equi join on user_id + event-time range
    // residual, the same shuffle the streaming operator keys on);
    // StreamingSpec runs the REAL watermarked stream-stream join over the
    // same replay and asserts set equality. At 100 TB the range condition
    // is what lets the streaming operator evict buffered rows: state per
    // side is bounded by (watermark delay + join window), never the
    // stream's history.
    Q("join_stream_stream",
      (spark, sfDir) => {
        val e = Tables.events(spark, sfDir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        clicks.join(purchases, Seq("user_id"))
          .filter(col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
          .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
      },
      Some("""
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
          epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        ORDER BY c.user_id, click_id, purchase_id""".trim)),

    // Watermarked stream-stream LEFT OUTER join (r10), run as a REAL
    // micro-batch stream (the stream_pattern precedent, not a batch
    // twin): clicks left-join purchases within [c_ts, c_ts+1h] on
    // user_id, both legs watermarked 10 min off one replayed source.
    // The outer semantic is the hard part — an unmatched click may only
    // emit its NULL row once the watermark proves no purchase can still
    // arrive inside its hour, i.e. wm > c_ts + 1h + delay; the engine
    // holds it in join state until then and the sentinel's far-future
    // batch (plus the no-data finalization batch) flushes every survivor.
    // State is bounded by (delay + 1h) × arrival rate per key — the
    // standard interval-join state bound; at 100 TB the join shuffles
    // both legs on user_id once and state eviction is watermark-driven,
    // never a full-history scan. Oracle: the plain batch LEFT JOIN —
    // matched rows AND null-extended rows must both match exactly
    // (purchase_id sorts NULLS FIRST in both engines by construction).
    Q("stream_outer_join",
      (spark, sfDir) => {
        // Streaming state partitioning is FROZEN at first query start (the
        // checkpoint binds it), so a real deployment sizes
        // spark.sql.shuffle.partitions to the stream's key cardinality
        // before launch — exactly what we do here: 4 state partitions for
        // the two join stores (left+right) instead of inheriting the
        // batch-oriented 32, which pays 8× the per-batch store overhead
        // for zero parallelism benefit at this state size. Restored after
        // the drain; batch keys are unaffected (results are
        // partitioning-invariant — DetSpec asserts it).
        val before = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try Sources.withFlushedReplay(spark, sfDir) { evs =>
          runToTable(spark, outerJoinStream(evs), OutputMode.Append())
        }
          .filter(col("user_id") >= 0)
          .orderBy(col("user_id"), col("click_id"),
            col("purchase_id").asc_nulls_first)
        finally spark.conf.set("spark.sql.shuffle.partitions", before)
      },
      Some("""
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
          epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        ORDER BY c.user_id, click_id, purchase_id NULLS FIRST""".trim)),

    // Streaming events ⋈ static customer dim, revenue by nation. The static
    // sides carry NO broadcast hint: nation is trivially broadcast by stats,
    // but customer is corpus-sized at scale — pinning it would OOM the
    // executors exactly like the dedup-side hints r4 removed. The planner
    // re-plans the static side per micro-batch from its measured size.
    Q("join_stream_static",
      (spark, sfDir) => {
        val cust = Tables.customer(spark, sfDir)
        val nat = Tables.nation(spark, sfDir)
        val joined = Sources.replayEvents(spark, sfDir, "events.parquet")
          .join(cust, col("user_id") === col("c_custkey"))
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_events"), sumVal6(col("value")).as("sum_val"))
        runToTable(spark, joined, OutputMode.Complete()).orderBy(col("n_name"))
      },
      // Per-micro-batch static-side re-plan must not change the answer:
      // the Complete-mode final emission equals the batch 3-way join
      // aggregate (oracle added r9; previously rows-only).
      Some(s"""
        SELECT n_name, COUNT(*) AS n_events, ${sqlSumVal6("value")} AS sum_val
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n_name
        ORDER BY n_name""".trim)),

    // Batch-catchup then streaming-handoff (reconnect/backfill, r8; live
    // leg on the seekable graft-log since r12 — see [[Backfill]] and
    // [[GraftLog]]): the archive holds the history up to a recorded
    // offset; the live leg SEEKS the commit log to the archive's row
    // count (the staged log is event_id-ordered and event_ids are unique,
    // so ordinal k = the (k+1)-th smallest event_id — "the recorded
    // offset maps to the broker seek" is now executed code, not a
    // comment). The `> hwm` event filter stays as the defensive twin for
    // sources that CANNOT seek and redeliver from retention start; with
    // the seek it is a no-op by construction. foreachBatch batch=<id>
    // overwrite landing is idempotent across retries/restarts. The SQL
    // oracle over the FULL events table IS the zero-dup / zero-gap check
    // — one duplicated or dropped event at the seam shifts a count or sum
    // and fails the hash.
    Q("stream_backfill",
      (spark, sfDir) => {
        val full = Tables.events(spark, sfDir)
        // snapshot covers the first ~60% of the feed by offset
        // floor→Long: bare `/` yields Double and a getLong ClassCastException
        val cut = full.agg(floor(max(col("event_id")) * 3 / 5).as("h")).head().getLong(0)
        val archive = full.filter(col("event_id") <= cut)
        val hwm = Backfill.recordOffset(archive)
        val seekOrdinal = archive.count() // rank of hwm in the ordered log
        val outDir = Files.createTempDirectory("graft_backfill").toString
        val ckpt = Files.createTempDirectory("graft_backfill_ckpt").toString
        val live = GraftLog.readStream(spark,
          Sources.stagedLogDir(spark, sfDir).toString, startingOffset = seekOrdinal)
        val landed = Backfill.landLive(spark, live, hwm, outDir, ckpt)
        Backfill.unify(archive, landed)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Streaming CDC apply (r8 — see [[Cdc]]): the events feed consumed as
    // a keyed changelog, materialized into its latest-state table via a
    // per-micro-batch (prev ∪ batch) → latest-per-key merge onto an
    // immutable version chain (deterministic `v=<batchId>` overwrite =
    // idempotent replay; predecessor from the listing, not driver memory
    // = restart-safe). The oracle is the batch twin: the newest
    // (ts, event_id) row per user over the FULL history — any lost,
    // doubled, or misordered change surfaces as a wrong picked row.
    Q("stream_cdc_upsert",
      (spark, sfDir) => {
        val stateDir = Files.createTempDirectory("graft_cdc_state").toString
        val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
        val changelog = Sources.replayEvents(spark, sfDir, "events.parquet")
        Cdc.materialize(spark, changelog, stateDir, ckpt)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("event_type"), col("value"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
        FROM (
          SELECT user_id, ts, event_id, event_type, value,
            row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1
        ORDER BY user_id""".trim)),

    // Trending top-k (r8; REAL streaming run since r9): the reference
    // domain's signature live query — per tumbling hour, the 3 busiest
    // event types by count (tie-broken by type, so the k-boundary is
    // total). The verify/bench path now RUNS the StreamingQuery: the
    // fixture replays as micro-batches into a Complete-mode windowed
    // count (same state as stream_tumbling — bounded by windows × types,
    // not events; no sentinel needed, Complete emits full state each
    // trigger), and the per-window rank is applied to the emitted result
    // per micro-batch — top-k is a PRESENTATION of the aggregate state,
    // never extra streaming state. The batch SQL oracle must hash-match
    // the stream's final emission. At 100 TB/day the count state shuffles
    // on (window, type) and the rank's per-window fanout is the (small)
    // type cardinality. StreamingSpec additionally pins the streamed
    // result against an independently-computed batch twin.
    Q("stream_trending_topk",
      (spark, sfDir) => {
        val counts = runToTable(spark,
          Sources.replayEvents(spark, sfDir, "events.parquet")
            .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
            .agg(count(lit(1)).as("n"))
            .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
              col("n")),
          OutputMode.Complete())
        val rk = Window.partitionBy(col("ws_us"))
          .orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rnk", rank().over(rk))
          .filter(col("rnk") <= 3)
          .orderBy(col("ws_us"), col("rnk"))
      },
      Some("""
        WITH c AS (
          SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type, COUNT(*) AS n
          FROM events
          GROUP BY 1, 2)
        SELECT ws_us, event_type, n, rnk FROM (
          SELECT ws_us, event_type, n,
            CAST(rank() OVER (PARTITION BY ws_us ORDER BY n DESC, event_type) AS INT) AS rnk
          FROM c)
        WHERE rnk <= 3
        ORDER BY ws_us, rnk""".trim)),

    // Watermarked stream-stream FULL outer join (r11) — the last member
    // of the streaming-join family (inner r3, left-outer r10): clicks
    // FULL JOIN purchases within [c_ts, c_ts+1h] on user_id, run as a
    // REAL micro-batch stream. Both sides hold state until the watermark
    // proves their window closed, then null-extend: unmatched clicks emit
    // (click_id, NULL) once wm > c_ts + 1h + delay, unmatched purchases
    // emit (NULL, purchase_id) once wm > p_ts + delay (no earlier click
    // can still arrive). State per side stays the interval-join bound —
    // (delay + 1h) × per-key arrival rate — and the sentinel batch plus
    // the no-data finalization batch flush every survivor. Oracle: the
    // batch FULL JOIN; matched, left-null and right-null rows must all
    // match exactly.
    Q("stream_join_full_outer",
      (spark, sfDir) => {
        // 4 state partitions for the two join stores, as stream_outer_join
        // (state partitioning is frozen at first start; sized to the
        // stream, restored after the drain)
        val before = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try Sources.withFlushedReplay(spark, sfDir) { evs =>
          runToTable(spark, fullOuterJoinStream(evs), OutputMode.Append())
        }
          .filter(col("user_id") >= 0)
          .orderBy(col("user_id"), col("click_id").asc_nulls_first,
            col("purchase_id").asc_nulls_first)
        finally spark.conf.set("spark.sql.shuffle.partitions", before)
      },
      Some("""
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
          c.event_id AS click_id, p.event_id AS purchase_id,
          epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        ORDER BY user_id, click_id NULLS FIRST, purchase_id NULLS FIRST""".trim)),

    // Update output mode (r11) — the dashboard-feed shape, closing the
    // output-mode matrix (Append and Complete proven across the other
    // streaming keys): per-type running aggregate over a 4-micro-batch
    // replay, emitting ONLY the groups whose value changed each batch.
    // The memory sink can't distinguish emissions, so each batch lands
    // via foreachBatch tagged with its batch_id and the key reads back
    // the LAST emission per group — which must equal the batch aggregate
    // over the full fixture (any lost or duplicated update leaves a stale
    // running total and fails the hash). StreamingSpec pins the stronger
    // property the oracle can't see: per group the emitted totals are
    // strictly increasing and only changed groups appear. At 100 TB
    // Update mode is the low-egress feed — per trigger the sink carries
    // the changed groups, not the full state (Complete) or closed windows
    // only (Append).
    Q("stream_update_mode",
      (spark, sfDir) => {
        // stage the fixture as 4 round-robin splits → 4 micro-batches
        // (maxFilesPerTrigger=1); aggregation is order-independent so the
        // file replay order is irrelevant
        val stage = Files.createTempDirectory("graft_update_stage")
        Tables.events(spark, sfDir).repartition(4)
          .write.mode("overwrite").parquet(stage.toString)
        val outDir = Files.createTempDirectory("graft_update_out").toString
        val ckpt = Files.createTempDirectory("graft_update_ckpt").toString
        val agg = Sources.replayEvents(spark, stage.toString)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
        val q = withStateParallelism(spark) {
          agg.writeStream.outputMode(OutputMode.Update())
            .foreachBatch { (df: DataFrame, id: Long) =>
              df.withColumn("batch_id", lit(id))
                .write.mode("append").parquet(outDir)
              ()
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("batch_id").desc)
        spark.read.parquet(outDir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("n"), col("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Concurrent serving fan-out (r11) — the reference's core runtime
    // shape: one ingest feed, N long-lived subscribers, each a filtered
    // per-client view of the same stream. Three StreamingQueries with
    // distinct subscriber predicates start in ONE SparkSession and run
    // SIMULTANEOUSLY (all started before any is awaited — three active
    // micro-batch threads sharing the session, scheduler, and source
    // files), each draining into its own sink; the key returns the union
    // tagged by subscriber. Oracle: the same three batch filters unioned
    // — each subscriber's stream must deliver exactly its predicate's
    // rows, none of a neighbor's, under concurrency. At 100 TB this is
    // the broker fan-out shape: the source is read per subscriber (the
    // Kafka consumer-group model) and each query's filter pushes into its
    // own scan; per-subscriber state is disjoint so queries scale
    // independently. StreamingSpec additionally pins that all three
    // queries are genuinely active at once and a FAIR-scheduler batch
    // concurrency test covers the shared-session query path.
    Q("stream_fanout",
      (spark, sfDir) => {
        val subs: Seq[(Int, org.apache.spark.sql.Column)] = Seq(
          (1, col("user_id") % 7 === 0),
          (2, col("user_id") % 7 === 1 && col("event_type") === "click"),
          (3, col("user_id") % 7 === 2 && col("value") > 50))
        val started = subs.map { case (id, pred) =>
          val tbl = s"graft_fanout_${id}_${sinkId.incrementAndGet()}"
          val q = Sources.replayEvents(spark, sfDir, "events.parquet")
            .filter(pred)
            .select(lit(id).as("sub_id"), col("event_id"), col("user_id"),
              col("event_type"), col("value"))
            .writeStream.format("memory").queryName(tbl)
            .outputMode(OutputMode.Append())
            .trigger(Trigger.AvailableNow()).start()
          (q, tbl)
        }
        started.foreach(_._1.awaitTermination())
        started.map { case (_, tbl) => spark.table(tbl) }
          .reduce(_.unionByName(_))
          .orderBy(col("sub_id"), col("event_id"))
      },
      Some("""
        SELECT sub_id, event_id, user_id, event_type, value FROM (
          SELECT 1 AS sub_id, event_id, user_id, event_type, value
          FROM events WHERE user_id % 7 = 0
          UNION ALL
          SELECT 2 AS sub_id, event_id, user_id, event_type, value
          FROM events WHERE user_id % 7 = 1 AND event_type = 'click'
          UNION ALL
          SELECT 3 AS sub_id, event_id, user_id, event_type, value
          FROM events WHERE user_id % 7 = 2 AND value > 50)
        ORDER BY sub_id, event_id""".trim)),

    // Streaming canary onto a BRANCH, audited publish (r16): the risky
    // new ingest pipeline runs as a real StreamingQuery whose micro-
    // batches commit to a branch ref via [[graft.ops.Acid.appendTxnBranch]]
    // keyed by batchId — the branch's own txn ledger makes the landing
    // exactly-once under replay (in-body pinned by re-playing batch 0
    // post-run), while main's readers provably never see a canary row
    // (pinned). After the run, the AUDIT reads the branch preview and
    // only then fast-forward-publishes: main adopts the whole canary
    // history metadata-only, ledger carried. This is stream_acid_sink
    // composed with branch refs — the deployment story for new pipeline
    // code at 100 TB: shadow-run against the real table's branch for a
    // day, audit, publish in O(1), or dropBranch and main never knew.
    Q("stream_branch_publish",
      (spark, sfDir) => {
        import graft.ops.Acid
        val stage = graft.Tmp.dir("stream_brpub_src", sfDir)
        Tables.events(spark, sfDir)
          .repartition(4, col("event_id"))
          .write.mode("overwrite").parquet(stage)
        val table = graft.Tmp.dir("stream_brpub_tbl", sfDir)
        Acid.reset(table)
        // the PRODUCTION pipeline already landed clicks (v0); the canary
        // pipeline will ingest purchases on a branch
        Acid.appendTxn(spark, table,
          Tables.events(spark, sfDir)
            .filter(col("event_type") === "click")
            .select(col("event_id"), col("ts"), col("event_type"), col("value")),
          txnId = 1000L)
        Acid.createBranch(table, "canary", 0L)
        val mainRows = Acid.read(spark, table).count()
        val ckpt = Files.createTempDirectory("graft_brpub_ckpt").toString
        val q = Sources.replayEvents(spark, stage)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            graft.ops.Acid.appendTxnBranch(spark, table, "canary", batch, batchId); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // main never saw a canary row while the stream ran
        require(Acid.read(spark, table).count() == mainRows,
          "canary stream leaked into main before publish")
        // a replayed micro-batch no-ops against the BRANCH ledger
        val head = Acid.branches(table)("canary")._2
        require(Acid.appendTxnBranch(spark, table, "canary",
          Tables.events(spark, sfDir).limit(3)
            .select(col("event_id"), col("ts"), col("event_type"), col("value")),
          txnId = 0L) == head,
          "replayed canary batch advanced the branch")
        // audit passes -> publish metadata-only
        require(Acid.readBranch(spark, table, "canary").count() > mainRows,
          "canary branch is empty — nothing to audit")
        Acid.fastForwardBranch(table, "canary", txnId = 2000L)
        Acid.read(spark, table)
          .groupBy(to_date(col("ts")).as("d"), col("event_type"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("d"), col("event_type"))
      },
      Some(s"""
        SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n,
               ${sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1, 2
        ORDER BY d, event_type""".trim)),
  )
}
