package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.5 — window functions.
  *
  * Window operators shuffle once on the partition key, sort within
  * partitions, and stream the frame — at 100 TB the only hazard is a skewed
  * partition key; `user_id` and `c_mktsegment` are bounded-fanout here, and
  * a skewed key would be salted upstream. Frames are ROWS or RANGE on an
  * integer epoch column — never on raw timestamps (§7.3).
  */
object Windows {
  import Det._

  /** EXACT global row_number with no single-partition WindowExec — the
    * scale-correct replacement for `row_number() OVER (ORDER BY …)` on
    * unbounded input (`window_rfm_segments`). Range-exchange on the order
    * key, localCheckpoint to PIN the sampled boundaries (every consumer
    * must see one partitioning), per-partition counts → broadcast
    * prefix-sum offsets (≤|partitions| rows — the only window here runs
    * over that bounded set), then partition-LOCAL row_number + offset.
    * Ranks are invariant to the sampled boundary choice whenever `ord` is
    * a total order (break ties with a PK column). */
  private[graft] def distributedRank(df: DataFrame, name: String,
      ord: org.apache.spark.sql.Column*): DataFrame = {
    val parted = df.repartitionByRange(32, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offsets = parted.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(
        sum(col("_cnt")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    val local = Window.partitionBy(col("_pid")).orderBy(ord: _*)
    parted.join(broadcast(offsets), Seq("_pid"))
      .withColumn(name, col("_off") + row_number().over(local))
      .drop("_pid", "_off")
  }

  val queries: Seq[Q] = Seq(

    // Ranking family over a total per-partition order (tie-broken by PK).
    Q("window_rank",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            row_number().over(w).as("rn"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pr"))
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""
        SELECT c_custkey, c_mktsegment, c_acctbal,
          CAST(rank() OVER w AS INT) AS rnk,
          CAST(dense_rank() OVER w AS INT) AS drnk,
          CAST(row_number() OVER w AS INT) AS rn,
          CAST(ntile(4) OVER w AS INT) AS quartile,
          percent_rank() OVER w AS pr
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_mktsegment, rn""".trim)),

    // Per-user running sum (ROWS frame), exact decimal accumulation.
    Q("window_running",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
            emit(sum(val6(col("value"))).over(w), 6).as("running_value"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some(s"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          ${sqlEmit(s"SUM(${sqlVal6("value")}) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 6)} AS running_value
        FROM events
        ORDER BY user_id, ts_us, event_id""".trim)),

    // RANGE frame: trailing 1-hour average per user, on integer epoch-µs.
    Q("window_range_frame",
      (spark, sfDir) => {
        val hourUs = 3600L * 1000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-hourUs, 0)
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
            val6(col("value")).as("v"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            (emit(sum(col("v")).over(w), 6) / count(col("v")).over(w)).as("trailing_avg"),
            count(col("v")).over(w).as("n_in_window"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some(s"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          ${sqlEmit(s"SUM(${sqlVal6("value")}) OVER w", 6)} / COUNT(value) OVER w AS trailing_avg,
          COUNT(value) OVER w AS n_in_window
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us, event_id""".trim)),

    // lag/lead inter-event gaps — the sessionization precursor.
    Q("window_lag_lead",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_from_prev_us"),
            (lead(col("ts_us"), 1).over(w) - col("ts_us")).as("gap_to_next_us"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_from_prev_us,
          lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS gap_to_next_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ORDER BY user_id, ts_us, event_id""".trim)),

    // Batch sessionization via window composition (r5): the gap-and-island
    // pattern — lag() marks session starts (gap ≥ 30 min), a running sum
    // over the marks assigns session ids, then one aggregate per (user,
    // session). Two stacked windows + the final agg all partition on
    // user_id, so the whole pipeline rides ONE shuffle. Complements
    // stream_session (native session_window): same semantics, operator
    // composition instead of a built-in — the shape every engine needs
    // when a windowing primitive is missing.
    Q("window_sessionize",
      (spark, sfDir) => {
        val gapUs = 30L * 60 * 1000000
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("is_new",
            when(lag(col("ts_us"), 1).over(w).isNull ||
              col("ts_us") - lag(col("ts_us"), 1).over(w) >= gapUs, 1).otherwise(0))
          .withColumn("sid", sum(col("is_new")).over(run))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts_us")).as("ss_us"), max(col("ts_us")).as("se_us"),
            count(lit(1)).as("n"))
          .orderBy(col("user_id"), col("ss_us"))
      },
      Some("""
        WITH t AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), s AS (
          SELECT user_id, ts_us,
            SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM t
        )
        SELECT user_id, CAST(sid AS BIGINT) AS sid,
          MIN(ts_us) AS ss_us, MAX(ts_us) AS se_us, COUNT(*) AS n
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, ss_us""".trim)),

    // Frame navigation family (r5): first_value / last_value / nth_value
    // over an explicit full-partition ROWS frame (the default frame stops
    // at CURRENT ROW — the classic last_value footgun both engines share),
    // plus cume_dist on the ordered prefix. One shuffle on user_id, same
    // plan shape as the other window keys.
    Q("window_first_last",
      (spark, sfDir) => {
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
            val6(col("value")).as("v"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            emit(first(col("v")).over(full), 6).as("first_v"),
            emit(last(col("v")).over(full), 6).as("last_v"),
            emit(nth_value(col("v"), 2).over(full), 6).as("second_v"),
            cume_dist().over(ord).as("cd"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some(s"""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          ${sqlEmit(s"first_value(${sqlVal6("value")}) OVER wf", 6)} AS first_v,
          ${sqlEmit(s"last_value(${sqlVal6("value")}) OVER wf", 6)} AS last_v,
          ${sqlEmit(s"nth_value(${sqlVal6("value")}, 2) OVER wf", 6)} AS second_v,
          cume_dist() OVER wo AS cd
        FROM events
        WINDOW
          wo AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
          wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id, ts_us, event_id""".trim)),

    // Canonical top-k per group via row_number ≤ 3.
    Q("window_topk_group",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(spark, sfDir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn""".trim)),

    // Per-key rate limiting (r5): keep the first 3 events per (user, hour),
    // arrival-ordered — quota enforcement over an event stream, the
    // throttling primitive next to window_topk_group's value-ranked top-k.
    // Same WindowGroupLimit-eligible plan (rank ≤ k pushes the limit into
    // the sort, partial + final, so a hot user's overflow never crosses
    // the exchange); tie-break on event_id keeps reruns identical.
    // date_trunc('hour', ...) is dialect-shared.
    Q("window_throttle",
      (spark, sfDir) => {
        val w = Window
          .partitionBy(col("user_id"), date_trunc("hour", col("ts")))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, event_type, CAST(rn AS INT) AS rn FROM (
          SELECT event_id, user_id, event_type,
            row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                               ORDER BY ts, event_id) AS rn
          FROM events)
        WHERE rn <= 3
        ORDER BY event_id""".trim)),

    // Windowed percentile (r6): exact interpolating percentiles over a
    // trailing 21-row frame per return flag — the moving-quantile analytic
    // (p25/p50 of recent quantities) that completes the window family next
    // to rank/frame/nav/gapfill/throttle. Spark's `percentile(x, p)` and
    // DuckDB's `quantile_cont(x, p)` share the continuous-interpolation
    // definition (pos = p·(n−1), lower + frac·(higher−lower)).
    // Determinism: frame membership rides a UNIQUE total order
    // (shipdate, orderkey, linenumber) and quarter-fraction percentiles of
    // 2dp quantities have ≤4 exact decimals, so round(·, 4) recovers the
    // same decimal in both engines regardless of last-ulp formula
    // differences — the agg_median_mode coarsening argument, per frame.
    // One shuffle on the partition key; the frame is O(21) per row. At
    // 100 TB the same shape holds (bounded frame, bounded fanout per key);
    // full-history quantiles would move to agg_approx_quantile's sketch.
    Q("window_percentile",
      (spark, sfDir) => {
        // (orderkey, linenumber) is NOT unique in the synthetic lineitem
        // (r8 finding: sf0.01 has (A,14,3) twice), so both the frame order
        // and the final order add l_quantity as tiebreak — full ties then
        // have multiset-identical frames, making p25/p50 deterministic,
        // and the positional oracle compare sees one row order.
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(-20, Window.currentRow)
        Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            round(expr("percentile(l_quantity, 0.25)").over(w), 4).as("p25"),
            round(expr("percentile(l_quantity, 0.5)").over(w), 4).as("p50"))
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("p25"), col("p50"))
      },
      Some("""
        SELECT l_returnflag, l_orderkey, l_linenumber,
          round(quantile_cont(l_quantity, 0.25) OVER w, 4) AS p25,
          round(quantile_cont(l_quantity, 0.5) OVER w, 4) AS p50
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag
          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
          ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
        ORDER BY l_returnflag, l_orderkey, l_linenumber, p25, p50""".trim)),

    // Rolling z-score (r8): each quantity standardized against its own
    // trailing 21-row frame — the streaming anomaly-detection analytic
    // (how unusual is this event vs its recent context). Unlike
    // window_percentile's native-quantile twin, the moments are REBUILT
    // from §7.3 exact decimal window sums (sum, sum-of-squares — 2dp and
    // 4dp exact, magnitudes ≤ 21·2500 so the double casts are lossless);
    // mean/variance/z are then IDENTICAL double expressions on identical
    // operands in both engines, so the result is bit-deterministic without
    // any coarsening round. stddev_samp itself is NOT used: its streaming
    // update order differs per engine. Frame membership rides the same
    // unique total order as window_percentile (quantity tie-break — full
    // ties have multiset-identical frames). One shuffle on the partition
    // key, O(21) frame per row; the same bounded shape at 100 TB.
    Q("window_zscore",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(-20, Window.currentRow)
        val s1 = emit(sum(money(col("l_quantity"))).over(w), 2)
        val s2 = emit(sum(money(col("l_quantity")) * money(col("l_quantity"))).over(w), 4)
        val n = count(lit(1)).over(w).cast("double")
        val variance = (s2 - (s1 * s1 / n)) / (n - lit(1.0))
        Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"),
            when(n > 1 && variance > 0,
              (col("l_quantity") - (s1 / n)) / sqrt(variance)).as("z"))
          // final order adds z: (orderkey, linenumber, quantity) can tie
          // across DIFFERENT shipdates (hence different frames/z), and
          // shipdate is not an output column — the window_percentile
          // order-by-outputs rule
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("z").asc_nulls_first)
      },
      Some(s"""
        WITH m AS (
          SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
            ${sqlEmit(s"SUM(${sqlMoney("l_quantity")}) OVER w", 2)} AS s1,
            ${sqlEmit(s"SUM(${sqlMoney("l_quantity")} * ${sqlMoney("l_quantity")}) OVER w", 4)} AS s2,
            CAST(COUNT(*) OVER w AS DOUBLE) AS n
          FROM lineitem
          WINDOW w AS (PARTITION BY l_returnflag
            ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
            ROWS BETWEEN 20 PRECEDING AND CURRENT ROW))
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
          CASE WHEN n > 1 AND ((s2 - (s1 * s1 / n)) / (n - 1.0)) > 0
            THEN (l_quantity - (s1 / n)) / sqrt((s2 - (s1 * s1 / n)) / (n - 1.0))
          END AS z
        FROM m
        ORDER BY l_returnflag, l_orderkey, l_linenumber, l_quantity, z NULLS FIRST""".trim)),

    // Per-event EWMA (r8): geometric half-decay over the trailing 21
    // observations per user — the per-key smoothed running metric next to
    // window_running's unweighted sum and agg_decay's GROUP-level decay.
    // Formulated as an explicit 21-term lag chain (one fused Window
    // operator — same spec for every lag), normalized by the weights of
    // the lags that EXIST, so the warm-up prefix is a true weighted mean,
    // not a damped one. Determinism: 0.5^i is exactly representable
    // (i ≤ 20), inputs are 6dp-coarsened per row BEFORE any arithmetic
    // (§7.3), and both engines evaluate the IDENTICAL left-folded IEEE
    // expression — bit-equal without coarsening the output. One shuffle
    // on user_id, O(21) per row; the same bounded shape at 100 TB (a
    // full-history EWMA would be a stateful streaming op instead —
    // stream_stateful's slot).
    Q("window_ewma",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val weights = (0 to 20).map(i => math.pow(0.5, i))
        val num = weights.zipWithIndex.map { case (wt, i) =>
          coalesce(lag(col("v"), i).over(w) * lit(wt), lit(0.0))
        }.reduce(_ + _)
        val den = weights.zipWithIndex.map { case (wt, i) =>
          when(lag(col("v"), i).over(w).isNotNull, lit(wt)).otherwise(lit(0.0))
        }.reduce(_ + _)
        Tables.events(spark, sfDir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
            col("ts"), val6(col("value")).cast("double").as("v"))
          .select(col("user_id"), col("ts_us"), col("event_id"), col("ts"), col("v"),
            (num / den).as("ewma"))
          .select(col("user_id"), col("ts_us"), col("event_id"), col("ewma"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some {
        val weights = (0 to 20).map(i => s"power(0.5, $i)")
        val num = weights.zipWithIndex
          .map { case (wt, i) => s"coalesce(lag(v, $i) OVER w * $wt, 0.0)" }
          .mkString(" + ")
        val den = weights.zipWithIndex
          .map { case (wt, i) => s"CASE WHEN lag(v, $i) OVER w IS NOT NULL THEN $wt ELSE 0.0 END" }
          .mkString(" + ")
        s"""
        WITH base AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id, ts,
            CAST(${sqlVal6("value")} AS DOUBLE) AS v
          FROM events)
        SELECT user_id, ts_us, event_id, ($num) / ($den) AS ewma
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts_us, event_id""".trim
      }),

    // Time-series resample + forward-fill (r4): per-user hourly grid over
    // the stream's full span, each cell carrying the latest observation at
    // or before it — the gap-fill step behind any continuous per-key
    // metric. Scale shape: the 1-row bounds broadcast onto the distinct
    // users, the hour grid explodes partition-locally (never more than
    // span-hours rows per user), the grid←observations join and the ffill
    // window both key on user_id — one shuffle each, skew-bounded by
    // per-user fanout. `last(ignoreNulls)` over (user, hour) is exactly
    // DuckDB's ASOF LEFT JOIN on (user, grid.h >= obs.h) — the oracle
    // proves the equivalence; hours before a user's first observation stay
    // NULL in both.
    Q("window_gapfill",
      (spark, sfDir) => {
        val evs = Tables.events(spark, sfDir).filter(col("user_id") < 50)
        val obs = evs
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(sumVal6(col("value")).as("v"))
        val bounds = evs.agg(
          date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        val grid = evs.select(col("user_id")).distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
        grid.join(obs, Seq("user_id", "h"), "left")
          .withColumn("v_fill", last(col("v"), ignoreNulls = true)
            .over(Window.partitionBy(col("user_id")).orderBy(col("h"))))
          .select(col("user_id"), unix_micros(col("h")).as("h_us"), col("v_fill"))
          .orderBy(col("user_id"), col("h_us"))
      },
      Some(s"""
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
          FROM events WHERE user_id < 50),
        grid AS (
          SELECT u.user_id, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h
          FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50) u, bounds b),
        obs AS (
          SELECT user_id, date_trunc('hour', ts) AS h, ${sqlSumVal6("value")} AS v
          FROM events WHERE user_id < 50 GROUP BY 1, 2)
        SELECT g.user_id, epoch_us(g.h) AS h_us, o.v AS v_fill
        FROM grid g ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.h >= o.h
        ORDER BY g.user_id, h_us""".trim)),

    // Event-sequence pattern match (r8): MATCH_RECOGNIZE-lite. Find every
    // CONTIGUOUS view→click→purchase triple inside a user's event stream
    // (ordered by ts, tie-broken by event_id) — contiguity is the
    // difference from `agg_funnel`, which allows gaps. Expressed as two
    // `lead()`s over one (user_id) window, so the whole pattern costs a
    // single hash-partition + sort; no self-joins, no state blow-up. At
    // 100 TB this is the same shuffle any per-user window pays, and longer
    // patterns only add lead() columns to the same sorted pass — the frame
    // never widens beyond the pattern length.
    Q("window_pattern",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id").as("e1"), col("ts").as("t1"),
            col("event_type").as("ty1"),
            lead(col("event_type"), 1).over(w).as("ty2"),
            lead(col("event_id"), 1).over(w).as("e2"),
            lead(col("event_type"), 2).over(w).as("ty3"),
            lead(col("event_id"), 2).over(w).as("e3"),
            lead(col("ts"), 2).over(w).as("t3"))
          .filter(col("ty1") === "view" && col("ty2") === "click" &&
            col("ty3") === "purchase")
          .select(col("user_id"), col("e1"), col("e2"), col("e3"),
            (unix_micros(col("t3")) - unix_micros(col("t1"))).as("span_us"))
          .orderBy(col("user_id"), col("e1"))
      },
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

    // Gaps-and-islands (r8): longest run of CONSECUTIVE same-type events
    // per (user, type), via the classic row_number-difference trick — two
    // row_numbers whose difference is constant exactly within an island.
    // The (user) and (user, type) window specs share a clustering: hash
    // partitioning on user_id satisfies both, so Catalyst plans ONE
    // exchange with a re-sort between the two Window ops — islands at
    // 100 TB cost the same single shuffle as any per-user window. The
    // island sizes then aggregate with two stacked hash aggregates, both
    // output-bound by (user, type, island) and (user, type).
    Q("window_islands",
      (spark, sfDir) => {
        val wu = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wt = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_type"),
            row_number().over(wu).as("rn"),
            row_number().over(wt).as("rnt"))
          .groupBy(col("user_id"), col("event_type"),
            (col("rn") - col("rnt")).as("grp"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("user_id"), col("event_type"))
          .agg(max(col("cnt")).as("max_streak"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""
        WITH s AS (
          SELECT user_id, event_type,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
            row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rnt
          FROM events)
        SELECT user_id, event_type, CAST(MAX(cnt) AS BIGINT) AS max_streak
        FROM (SELECT user_id, event_type, rn - rnt AS grp,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM s GROUP BY 1, 2, 3)
        GROUP BY 1, 2
        ORDER BY 1, 2""".trim)),

    // Linear interpolation of missing sensor values (r9): the time-series
    // repair twin of window_gapfill (which fills missing ROWS; this fills
    // missing VALUES at known timestamps). Readings at event_id % 7 == 0
    // are masked missing, then reconstructed between the nearest non-null
    // neighbors per user:  v = prev + (next−prev)·(t−t₀)/(t₁−t₀).
    // ALL arithmetic is exact int64: values live in 6dp micro-units
    // (decimal-scaled, the Det policy), timestamps in epoch seconds, and
    // the division uses the pmod-subtraction floor trick (numerator minus
    // its non-negative pmod is an exact multiple, so floor == truncate
    // and Spark `div` and DuckDB `//` cannot disagree on negative deltas
    // — falling series make next−prev negative). Boundary gaps (no prev
    // or no next neighbor) stay NULL by spec. Scale shape: one hash
    // exchange on user_id feeds both ignore-nulls window passes (backward
    // last + forward first share the partition/order); the masked flag
    // and both neighbor columns are projection arithmetic.
    Q("window_interpolate",
      (spark, sfDir) => {
        val ts = expr("unix_micros(ts) div 1000000").as("ts_s")
        val v6 = expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
        val masked = (col("event_id") % 7 === 0).as("masked")
        val wB = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wF = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"), col("event_id"))
          .rowsBetween(1, Window.unboundedFollowing)
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), ts, v6.as("v6"), masked)
          .withColumn("vk", when(!col("masked"), col("v6")))
          .withColumn("tk", when(!col("masked"), col("ts_s")))
          .withColumn("pv", last(col("vk"), ignoreNulls = true).over(wB))
          .withColumn("pt", last(col("tk"), ignoreNulls = true).over(wB))
          .withColumn("nv", first(col("vk"), ignoreNulls = true).over(wF))
          .withColumn("nt", first(col("tk"), ignoreNulls = true).over(wF))
          .withColumn("value_u6", when(!col("masked"), col("v6"))
            .otherwise(expr(
              """pv + (CASE WHEN nt = pt THEN 0 ELSE
                   ((nv - pv) * (ts_s - pt)
                    - pmod((nv - pv) * (ts_s - pt), nt - pt)) div (nt - pt)
                 END)""")))
          .select(col("user_id"), col("event_id"), col("ts_s"), col("masked"),
            col("value_u6"))
          .orderBy(col("user_id"), col("ts_s"), col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s,
                 CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v6,
                 event_id % 7 = 0 AS masked
          FROM events),
        k AS (
          SELECT *,
            CASE WHEN NOT masked THEN v6 END AS vk,
            CASE WHEN NOT masked THEN ts_s END AS tk
          FROM e),
        nb AS (
          SELECT user_id, event_id, ts_s, masked, v6,
            last_value(vk IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
            last_value(tk IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
            first_value(vk IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
            first_value(tk IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
          FROM k)
        SELECT user_id, event_id, ts_s, masked,
          CASE WHEN NOT masked THEN v6
               ELSE pv + (CASE WHEN nt = pt THEN 0 ELSE
                 ((nv - pv) * (ts_s - pt)
                  - ((((nv - pv) * (ts_s - pt)) % (nt - pt) + (nt - pt)) % (nt - pt)))
                 // (nt - pt) END)
          END AS value_u6
        FROM nb
        ORDER BY user_id, ts_s, event_id""".trim)),

    // Max drawdown per user series (r9): running peak minus current value,
    // the classic monitoring/series-quality metric ("how far below its
    // historical high has this metric fallen?"). Values are micro-scaled
    // to exact BIGINTs (window_interpolate's v6 recipe) so the running
    // MAX, the subtraction, and the final per-user MAX are all integer —
    // hash-stable with no float policy needed at all. Plan shape: the
    // window's hashpartitioning(user_id) exchange is reused by the
    // groupBy(user_id) that follows — one shuffle feeds both.
    Q("window_drawdown",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("v6"))
          .withColumn("peak", max(col("v6")).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            max(col("peak") - col("v6")).as("max_dd_u6"),
            max(col("v6")).as("peak_u6"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH v AS (
          SELECT user_id, event_id, ts,
                 CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v6
          FROM events),
        p AS (
          SELECT user_id, v6,
                 MAX(v6) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          FROM v)
        SELECT user_id, COUNT(*) AS n, MAX(peak - v6) AS max_dd_u6,
               MAX(v6) AS peak_u6
        FROM p GROUP BY user_id
        ORDER BY user_id""".trim)),

    // Rolling correlation (r9): 21-row windowed Pearson r between
    // quantity and discount per returnflag series — the co-movement
    // monitor ("did these two metrics start tracking each other?") that
    // pairs with window_zscore's level monitor. All six moments (n, Σx,
    // Σy, Σxy, Σx², Σy²) share ONE frame spec, so they fuse into a
    // SINGLE Window operator over a single hash exchange (the zscore
    // recipe, doubled); sums are exact decimals (2dp inputs, 4dp
    // products), r is a fixed IEEE tree over them, DECIMAL(18,6)-
    // coarsened. (l_orderkey, l_linenumber) is the table's primary key,
    // so both the frame order and the output order are total.
    Q("window_rolling_corr",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          // (shipdate, orderkey, linenumber) ties in this fixture: the
          // measure columns join the frame order so the 21-row boundary
          // cuts identically in both engines (window_zscore's rule)
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_discount"))
          .rowsBetween(-20, Window.currentRow)
        val n = count(lit(1)).over(w).cast("double")
        val sx = emit(sum(money(col("l_quantity"))).over(w), 2)
        val sy = emit(sum(money(col("l_discount"))).over(w), 2)
        val sxy = emit(sum(money(col("l_quantity")) * money(col("l_discount"))).over(w), 4)
        val sxx = emit(sum(money(col("l_quantity")) * money(col("l_quantity"))).over(w), 4)
        val syy = emit(sum(money(col("l_discount")) * money(col("l_discount"))).over(w), 4)
        val vx = n * sxx - sx * sx
        val vy = n * syy - sy * sy
        Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            when(n > 1 && vx > 0 && vy > 0,
              emit((n * sxy - sx * sy) / sqrt(vx * vy), 6)).as("r"))
          // (l_orderkey, l_linenumber) is NOT unique in this fixture
          // (window_zscore's discovery): rows can tie across different
          // shipdates, whose frames differ — so r joins the sort
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("r").asc_nulls_first)
      },
      Some(s"""
        WITH m AS (
          SELECT l_returnflag, l_orderkey, l_linenumber,
            CAST(COUNT(*) OVER w AS DOUBLE) AS n,
            ${sqlEmit(s"SUM(${sqlMoney("l_quantity")}) OVER w", 2)} AS sx,
            ${sqlEmit(s"SUM(${sqlMoney("l_discount")}) OVER w", 2)} AS sy,
            ${sqlEmit(s"SUM(${sqlMoney("l_quantity")} * ${sqlMoney("l_discount")}) OVER w", 4)} AS sxy,
            ${sqlEmit(s"SUM(${sqlMoney("l_quantity")} * ${sqlMoney("l_quantity")}) OVER w", 4)} AS sxx,
            ${sqlEmit(s"SUM(${sqlMoney("l_discount")} * ${sqlMoney("l_discount")}) OVER w", 4)} AS syy
          FROM lineitem
          WINDOW w AS (PARTITION BY l_returnflag
            ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_discount
            ROWS BETWEEN 20 PRECEDING AND CURRENT ROW))
        SELECT l_returnflag, l_orderkey, l_linenumber,
          CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN ${sqlEmit(
              "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))",
              6)}
          END AS r
        FROM m
        ORDER BY l_returnflag, l_orderkey, l_linenumber, r NULLS FIRST""".trim)),

    // Rolling exact median (r9): 11-row trailing median of quantity per
    // returnflag series — the robust-location twin of window_ewma's mean
    // smoother (outlier-immune, the form SLO/latency monitors use).
    // Spark's exact `percentile` aggregate accepts a window frame, so
    // this is ONE Window operator walking the same (shipdate, orderkey,
    // linenumber, quantity) deterministic frame order as
    // window_rolling_corr (the fixture ties on the first three). Inputs
    // pass the 2dp decimal cast first; an 11-row median of 2dp values is
    // either a sample value or a midpoint (≤3 decimals), so the 4dp
    // round has no boundary case. One hash exchange on returnflag, one
    // frame walk. At 100 TB the exact sliding median holds per-partition;
    // an approx_percentile sketch replaces it only for cross-partition
    // global medians.
    Q("window_rolling_median",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("q"))
          .rowsBetween(-10, Window.currentRow)
        Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate"), emit(money(col("l_quantity")), 2).as("q"))
          .withColumn("med11", round(expr("percentile(q, 0.5D)").over(w), 4))
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("med11"))
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("med11"))
      },
      Some(s"""
        WITH b AS (
          SELECT l_returnflag, l_orderkey, l_linenumber, l_shipdate,
                 ${sqlEmit(sqlMoney("l_quantity"), 2)} AS q
          FROM lineitem)
        SELECT l_returnflag, l_orderkey, l_linenumber,
               round(median(q) OVER (PARTITION BY l_returnflag
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, q
                 ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 4) AS med11
        FROM b
        ORDER BY l_returnflag, l_orderkey, l_linenumber, med11""".trim)),

    // OHLC resample (r10): collapse each user's event stream into 1-hour
    // bars — open/high/low/close/volume, the canonical time-series
    // downsample every monitoring and market pipeline runs. Open/close
    // are first_value/last_value over a FULL frame ordered by
    // (ts, event_id) — a total order, so bars are deterministic under
    // ties; high/low/volume are plain min/max/sum in exact decimal. One
    // shuffle on (user, hour): the window and the groupBy share the same
    // partitioning, so Catalyst plans a single exchange, and hour buckets
    // bound partition size at any scale (no per-user history blowup).
    Q("window_ohlc",
      (spark, sfDir) => {
        val w = Window
          .partitionBy(col("user_id"), col("hr"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("unix_micros(ts) div 3600000000").as("hr"),
            money(col("value")).as("x"))
          .select(col("user_id"), col("hr"), col("x"),
            first(col("x")).over(w).as("open_x"),
            last(col("x")).over(w).as("close_x"))
          .groupBy(col("user_id"), col("hr"))
          .agg(count(lit(1)).as("n_events"),
            emit(min(col("open_x")), 2).as("open"),
            emit(max(col("x")), 2).as("high"),
            emit(min(col("x")), 2).as("low"),
            emit(min(col("close_x")), 2).as("close"),
            emit(sum(col("x")), 2).as("volume"))
          .select(col("user_id"), (col("hr") * lit(3600000000L)).as("hr_start_us"),
            col("n_events"), col("open"), col("high"), col("low"),
            col("close"), col("volume"))
          .orderBy(col("user_id"), col("hr_start_us"))
      },
      Some(s"""
        WITH b AS (
          SELECT user_id, ts, event_id,
                 epoch_us(ts) // 3600000000 AS hr,
                 ${sqlMoney("value")} AS x
          FROM events),
        f AS (
          SELECT user_id, hr, x,
                 first_value(x) OVER w AS open_x,
                 last_value(x) OVER w AS close_x
          FROM b
          WINDOW w AS (PARTITION BY user_id, hr ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        SELECT user_id, hr * 3600000000 AS hr_start_us,
               COUNT(*) AS n_events,
               ${sqlEmit("MIN(open_x)", 2)} AS open,
               ${sqlEmit("MAX(x)", 2)} AS high,
               ${sqlEmit("MIN(x)", 2)} AS low,
               ${sqlEmit("MIN(close_x)", 2)} AS close,
               ${sqlEmit("SUM(x)", 2)} AS volume
        FROM f
        GROUP BY user_id, hr
        ORDER BY user_id, hr_start_us""".trim)),

    // CUSUM drift detection (r10): per user, the running sum of
    // deviations from the GLOBAL mean, flagged when |cusum| exceeds
    // 3σ·√25 — the sequential change-detector that complements stats_psi
    // (distribution drift) with sample-path drift. Determinism: the
    // global mean quantizes to DECIMAL(18,6) once (exact in both
    // engines), per-row deviations and their running sum stay in exact
    // decimal — so the window aggregation is order-independent and
    // immune to DuckDB's segment-tree float reassociation; only the
    // final emit and the σ threshold are doubles, computed from exact
    // moments via one shared IEEE tree. One 1-row broadcast + one
    // window shuffle on user_id.
    Q("window_cusum",
      (spark, sfDir) => {
        val g = Tables.events(spark, sfDir)
          .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("sx"),
            sum(money(col("value")) * money(col("value"))).as("sxx"))
          .select(col("n"),
            (emit(col("sx"), 2) / col("n").cast("double")).cast(Val6).as("mu6"),
            ((emit(col("sxx"), 4) - emit(col("sx"), 2) * emit(col("sx"), 2) /
              col("n").cast("double")) / col("n").cast("double")).as("var_pop"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(spark, sfDir)
          .crossJoin(broadcast(g))
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
            sum(money(col("value")).cast(Val6) - col("mu6")).over(w).as("cusum_d"),
            sqrt(col("var_pop")).as("sigma"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            emit(col("cusum_d"), 6).as("cusum"),
            (abs(emit(col("cusum_d"), 6)) > lit(15.0) * col("sigma")).as("drifted"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some(s"""
        WITH g AS (
          SELECT COUNT(*) AS n,
                 SUM(${sqlMoney("value")}) AS sx,
                 SUM(${sqlMoney("value")} * ${sqlMoney("value")}) AS sxx
          FROM events),
        p AS (
          SELECT CAST(${sqlEmit("sx", 2)} / CAST(n AS DOUBLE) AS DECIMAL(18,6)) AS mu6,
                 (${sqlEmit("sxx", 4)} - ${sqlEmit("sx", 2)} * ${sqlEmit("sx", 2)}
                    / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_pop
          FROM g),
        c AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us,
            SUM(CAST(${sqlMoney("value")} AS DECIMAL(18,6)) - p.mu6) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_d,
            sqrt(p.var_pop) AS sigma
          FROM events CROSS JOIN p)
        SELECT user_id, event_id, ts_us,
          ${sqlEmit("cusum_d", 6)} AS cusum,
          (abs(${sqlEmit("cusum_d", 6)}) > 15.0 * sigma) AS drifted
        FROM c
        ORDER BY user_id, ts_us, event_id""".trim)),

    // Week-over-week growth (r10): revenue per epoch-week with the lag
    // ratio — the KPI-report staple, pinned for its PLAN SHAPE: the lag
    // window runs over the AGGREGATED series (a dozen rows), not the
    // fact table, so the unpartitioned window is output-bound and safe
    // at any scale (the same argument as stats_ks_test's bin window).
    // Weeks are integer epoch-µs floor-divisions (no calendar dialect);
    // revenue is the exact decimal sum; the growth ratio is the only
    // double, NULL for the first week (no prior) and whenever the prior
    // week's revenue is zero — never a division blowup.
    Q("window_wow_growth",
      (spark, sfDir) => {
        val w = Window.orderBy(col("wk"))
        Tables.orders(spark, sfDir)
          .groupBy(expr("unix_micros(o_orderdate) div 604800000000").as("wk"))
          .agg(count(lit(1)).as("n_orders"),
            sum(money(col("o_totalprice"))).as("revd"))
          .select(col("wk"), col("n_orders"), emit(col("revd"), 2).as("revenue"),
            lag(emit(col("revd"), 2), 1).over(w).as("prev_revenue"))
          .select(col("wk"), col("n_orders"), col("revenue"), col("prev_revenue"),
            round(when(col("prev_revenue") > lit(0.0),
              (col("revenue") - col("prev_revenue")) / col("prev_revenue") * lit(100.0)),
              4).as("wow_pct"))
          .orderBy(col("wk"))
      },
      Some(s"""
        WITH g AS (
          SELECT epoch_us(o_orderdate) // 604800000000 AS wk,
                 COUNT(*) AS n_orders,
                 SUM(${sqlMoney("o_totalprice")}) AS revd
          FROM orders GROUP BY 1),
        l AS (
          SELECT wk, n_orders, ${sqlEmit("revd", 2)} AS revenue,
                 lag(${sqlEmit("revd", 2)}, 1) OVER (ORDER BY wk) AS prev_revenue
          FROM g)
        SELECT wk, n_orders, revenue, prev_revenue,
          round(CASE WHEN prev_revenue > 0.0
            THEN (revenue - prev_revenue) / prev_revenue * 100.0 END, 4) AS wow_pct
        FROM l
        ORDER BY wk""".trim)),

    // Pareto contribution curve (r11): per event type, days ranked by
    // their value total with each day's share and CUMULATIVE share of
    // the type's total as floor-ppm integers — the "top N days carry X%
    // of the volume" concentration analysis (and the general
    // RATIO_TO_REPORT + running-share analytic pair). Rank ties break on
    // the date, so the curve is total-ordered and reproducible. The one
    // table-sized operation is the daily rollup; both windows and the
    // ppm arithmetic run over the 30-row-per-type OUTPUT. The cumulative
    // numerator (micros × 10⁶) tops int64 at warehouse scale, so the
    // division runs in DECIMAL(38,0) — non-negative operands, floor ==
    // truncate cross-engine (the standing ppm recipe).
    Q("window_pareto",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val byX = Window.partitionBy(col("event_type"))
          .orderBy(col("x").desc, col("d"))
        val wt = Window.partitionBy(col("event_type"))
        Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(graft.Det.val6(col("value"))) * 1000000).cast("long").as("x"))
          .withColumn("rnk", row_number().over(byX).cast("long"))
          .withColumn("cum", sum(col("x")).over(byX))
          .withColumn("total", sum(col("x")).over(wt))
          .select(col("event_type"), col("rnk"), col("d"), col("x"),
            expr("""CAST(CAST(x AS DECIMAL(38,0)) * 1000000
                      div CAST(total AS DECIMAL(38,0)) AS BIGINT)""").as("share_ppm"),
            expr("""CAST(CAST(cum AS DECIMAL(38,0)) * 1000000
                      div CAST(total AS DECIMAL(38,0)) AS BIGINT)""").as("cum_ppm"))
          .orderBy(col("event_type"), col("rnk"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT event_type, d, x,
                 CAST(row_number() OVER w AS BIGINT) AS rnk,
                 SUM(x) OVER w AS cum,
                 SUM(x) OVER (PARTITION BY event_type) AS total
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY x DESC, d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, rnk, d, x,
               CAST(CAST(x AS HUGEINT) * 1000000 // CAST(total AS HUGEINT)
                    AS BIGINT) AS share_ppm,
               CAST(CAST(cum AS HUGEINT) * 1000000 // CAST(total AS HUGEINT)
                    AS BIGINT) AS cum_ppm
        FROM ranked
        ORDER BY event_type, rnk""".trim)),

    // Multi-touch attribution (r12): the event-stream analytics classic —
    // credit each purchase's value to the user's qualifying clicks
    // (click ≤ purchase, within a 7-day lookback) under three standard
    // models at once: FIRST-touch (earliest click's day takes all),
    // LAST-touch (latest click's day), LINEAR (split across clicks).
    // All-integer micros arithmetic keeps it exact and engine-portable:
    // the linear split is value_us div n with the remainder assigned to
    // the FIRST click (deterministic; Σ shares == value exactly, so the
    // three models' grand totals are provably equal — a drifted join or
    // window loses cents and fails the hash). Shape: one purchases⋈clicks
    // range join per user (shuffle on user_id; at 100 TB bound the
    // lookback window so the per-user fanout is days-bounded), two
    // window-min/max passes, one hash-agg per model keyed by click day.
    Q("window_attribution",
      (spark, sfDir) => {
        val ev = Tables.events(spark, sfDir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"),
            (Det.val6(col("value")) * 1000000).cast("long").as("value_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"),
            unix_micros(col("ts")).as("c_us"), to_date(col("ts")).as("c_day"))
        val touched = purchases.join(clicks, Seq("user_id"))
          .filter(col("c_us") <= col("p_us") &&
            col("c_us") > col("p_us") - lit(7L * 86400L * 1000000L))
        val w = Window.partitionBy(col("p_id"))
        val ranked = touched
          .withColumn("rn", row_number().over(
            w.orderBy(col("c_us"), col("c_id"))))
          .withColumn("n", count(lit(1)).over(w))
        val credited = ranked.select(col("c_day"),
          when(col("rn") === 1, col("value_us")).otherwise(lit(0L)).as("first_us"),
          when(col("rn") === col("n"), col("value_us")).otherwise(lit(0L)).as("last_us"),
          expr("value_us div n") // integer division, not double
            .plus(when(col("rn") === 1, pmod(col("value_us"), col("n")))
              .otherwise(lit(0L))).as("linear_us"))
        credited.groupBy(col("c_day").as("d"))
          .agg(sum(col("first_us")).as("first_us"),
            sum(col("last_us")).as("last_us"),
            sum(col("linear_us")).as("linear_us"))
          .orderBy(col("d"))
      },
      Some("""
        WITH purchases AS (
          SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us,
                 CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS value_us
          FROM events WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us,
                 CAST(ts AS DATE) AS c_day
          FROM events WHERE event_type = 'click'
        ), touched AS (
          SELECT p.p_id, p.value_us, c.c_id, c.c_us, c.c_day
          FROM purchases p JOIN clicks c ON p.user_id = c.user_id
           AND c.c_us <= p.p_us AND c.c_us > p.p_us - CAST(604800000000 AS BIGINT)
        ), ranked AS (
          SELECT c_day, value_us,
                 row_number() OVER (PARTITION BY p_id ORDER BY c_us, c_id) AS rn,
                 COUNT(*) OVER (PARTITION BY p_id) AS n
          FROM touched
        )
        SELECT c_day AS d,
               CAST(SUM(CASE WHEN rn = 1 THEN value_us ELSE 0 END) AS BIGINT) AS first_us,
               CAST(SUM(CASE WHEN rn = n THEN value_us ELSE 0 END) AS BIGINT) AS last_us,
               CAST(SUM(value_us // n +
                        CASE WHEN rn = 1 THEN value_us % n ELSE 0 END) AS BIGINT) AS linear_us
        FROM ranked
        GROUP BY c_day
        ORDER BY d""".trim)),

    // RFM segmentation (r12): every user scored 1-5 on Recency/Frequency/
    // Monetary quintiles, rolled up to segment sizes — the CRM classic.
    // The interesting part is HOW the quintile rank is computed: a naive
    // row_number() over an unpartitioned window is a single-partition
    // WindowExec — the exact scale smell this repo's standing policy bans
    // on unbounded inputs (|users| grows with the data). Instead,
    // `distributedRank` computes an EXACT global row_number with no
    // single-partition operator: range-exchange on the order key,
    // localCheckpoint to pin the partitioning (both consumers must see
    // the same boundaries), per-partition counts → broadcast prefix-sum
    // offsets (≤|partitions| rows), then partition-LOCAL row_number +
    // offset. Rank values are invariant to the sampled range boundaries
    // because the composite order key is total (ties broken by user_id).
    // Three ranked dimensions → three range exchanges over the per-user
    // ROLLUP (not the event table); scores are integer quintile math;
    // output is ≤125 segment rows. The oracle uses plain unpartitioned
    // windows — same ranks, engine-appropriate plan on each side.
    Q("window_rfm_segments",
      (spark, sfDir) => {
        val ev = Tables.events(spark, sfDir)
        val per = ev.groupBy(col("user_id"))
          .agg(max(to_date(col("ts"))).as("last_d"),
            count(lit(1)).as("freq"),
            (sum(Det.val6(col("value"))) * 1000000).cast("long").as("mon_us"))
        val gmax = ev.agg(max(to_date(col("ts"))).as("gmax"))
        val base = per.crossJoin(broadcast(gmax))
          .withColumn("rec_days", datediff(col("gmax"), col("last_d")).cast("long"))
          .drop("gmax", "last_d")
        val r1 = distributedRank(base, "r_rn", col("rec_days"), col("user_id"))
        val r2 = distributedRank(r1, "f_rn", col("freq").desc, col("user_id"))
        val r3 = distributedRank(r2, "m_rn", col("mon_us").desc, col("user_id"))
        r3.crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
          .withColumn("r_score", lit(5) - expr("(5 * (r_rn - 1)) div n"))
          .withColumn("f_score", lit(5) - expr("(5 * (f_rn - 1)) div n"))
          .withColumn("m_score", lit(5) - expr("(5 * (m_rn - 1)) div n"))
          .groupBy(col("r_score"), col("f_score"), col("m_score"))
          .agg(count(lit(1)).as("n_users"), sum(col("mon_us")).as("mon_us_total"))
          .orderBy(col("r_score"), col("f_score"), col("m_score"))
      },
      Some("""
        WITH per AS (
          SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d, COUNT(*) AS freq,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS mon_us
          FROM events GROUP BY 1
        ), base AS (
          SELECT user_id, freq, mon_us,
                 (SELECT MAX(CAST(ts AS DATE)) FROM events) - last_d AS rec_days
          FROM per
        ), ranked AS (
          SELECT user_id, mon_us,
                 row_number() OVER (ORDER BY rec_days, user_id) AS r_rn,
                 row_number() OVER (ORDER BY freq DESC, user_id) AS f_rn,
                 row_number() OVER (ORDER BY mon_us DESC, user_id) AS m_rn,
                 COUNT(*) OVER () AS n
          FROM base
        )
        SELECT 5 - (5 * (r_rn - 1)) // n AS r_score,
               5 - (5 * (f_rn - 1)) // n AS f_score,
               5 - (5 * (m_rn - 1)) // n AS m_score,
               COUNT(*) AS n_users,
               CAST(SUM(mon_us) AS BIGINT) AS mon_us_total
        FROM ranked
        GROUP BY 1, 2, 3
        ORDER BY r_score, f_score, m_score""".trim)),

    // LTTB downsampling (r12): reduce each type's hourly series to 30
    // visually-dominant points (`ops/Lttb.scala` — Steinarsson 2013, the
    // Grafana-default reducer). The bucket-by-bucket dependency on the
    // previously KEPT point is sequential and non-monotone — not
    // SQL-expressible — so this runs on the TYPED Dataset surface:
    // groupByKey(event_type).flatMapGroups, one bounded series array per
    // key, executors never exchange more than the rollup. Exact integer
    // geometry (rebased x, centroid division cleared, BigInt cross
    // products), earliest-candidate ties → identical output under ANY
    // partitioning (spec-pinned). At 100 TB the per-key series must fit
    // its executor (the mapGroups contract — a 10-year hourly series is
    // 87 k points); longer series downsample hierarchically, LTTB over
    // LTTB per epoch. Oracle omitted per SURVEY §2's rule (sequential
    // non-monotone); OperatorSpec pins an independent driver recount,
    // endpoint/membership/size properties, and partition invariance.
    Q("window_lttb_downsample",
      (spark, sfDir) => {
        import spark.implicits._
        val hourly = Tables.events(spark, sfDir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("hr"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("v"))
          .as[(String, Long, Long)]
        hourly.groupByKey(_._1)
          .flatMapGroups { (typ, it) =>
            val pts = it.map(r => (r._2, r._3)).toArray.sortBy(_._1)
            Lttb.select(pts, 30).map { case (x, y) => (typ, x, y) }
          }
          .toDF("event_type", "hr", "v")
          .orderBy(col("event_type"), col("hr"))
      },
      None),

    // Distribution windows (r16): the ranked-distribution trio — NTILE
    // (equal-frequency bucketing, larger buckets first per the SQL
    // standard), CUME_DIST (rank/n), PERCENT_RANK ((rank−1)/(n−1)) — over
    // a total order (o_orderkey is unique per partition, so no tie
    // ambiguity). The two ratios are each ONE IEEE division of identical
    // integer operands in both engines — bit-deterministic without any
    // coarsening. One hash exchange on o_orderstatus carries all three
    // analytics; at 100 TB this is the quantile-bucket assignment every
    // feature pipeline runs (decile targets, rank-normalized features).
    Q("window_ntile",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
        Tables.orders(spark, sfDir)
          .filter(col("o_orderkey") % 97 === 0) // ~1% sample keeps output bounded
          .select(col("o_orderstatus"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            cume_dist().over(w).as("cdist"),
            percent_rank().over(w).as("prank"))
          .orderBy(col("o_orderstatus"), col("o_orderkey"))
      },
      Some("""
        SELECT o_orderstatus, o_orderkey,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               CUME_DIST() OVER w AS cdist,
               PERCENT_RANK() OVER w AS prank
        FROM orders
        WHERE o_orderkey % 97 = 0
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        ORDER BY o_orderstatus, o_orderkey""".trim)),
  )
}
