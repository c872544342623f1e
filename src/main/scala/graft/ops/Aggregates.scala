package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 — aggregation operators.
  *
  * All declarative `groupBy.agg` — Catalyst plans these as two-phase
  * HashAggregate (partial map-side combine, then final after a shuffle on
  * the group keys), which is exactly the plan that scales: at 100 TB the
  * shuffle carries only one partial row per (partition, group), not data.
  * `agg_highcard` exercises the many-groups path (shuffle carries one row
  * per group — still output-bound, not input-bound); distinct aggs plan via
  * Expand + two aggregations, also shuffle-minimal.
  */
object Aggregates {
  import Det._


  /** Shared ANSI text for `agg_funnel` (see `Joins.InNotInSql` for the
    * dialect-shared pattern). Visible to OperatorSpec, which runs it over a
    * hand-built events view to pin the strict-ordering semantics. */
  private[graft] val FunnelSql = """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id)
    SELECT s1.user_id,
      1 + CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    ORDER BY s1.user_id""".trim

  val queries: Seq[Q] = Seq(

    // Flagship: TPC-H-Q1-style scan + filter + 2-key group + sums/avgs.
    Q("agg_hash_q1",
      (spark, sfDir) => {
        Tables.lineitem(spark, sfDir)
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumMoney(col("l_quantity")).as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            emit(sum(money(col("l_extendedprice")) * (factor(lit(1)) - factor(col("l_discount")))), 4)
              .as("sum_disc_price"),
            emit(sum(money(col("l_extendedprice")) * (factor(lit(1)) - factor(col("l_discount")))
              * (factor(lit(1)) + factor(col("l_tax")))), 6)
              .as("sum_charge"),
            avgMoney(col("l_quantity")).as("avg_qty"),
            avgMoney(col("l_extendedprice")).as("avg_price"),
            avgMoney(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"),
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          ${sqlSumMoney("l_quantity")} AS sum_qty,
          ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
          ${sqlEmit(s"SUM(${sqlMoney("l_extendedprice")} * (${sqlFactor("1")} - ${sqlFactor("l_discount")}))", 4)} AS sum_disc_price,
          ${sqlEmit(s"SUM(${sqlMoney("l_extendedprice")} * (${sqlFactor("1")} - ${sqlFactor("l_discount")}) * (${sqlFactor("1")} + ${sqlFactor("l_tax")}))", 6)} AS sum_charge,
          ${sqlAvgMoney("l_quantity")} AS avg_qty,
          ${sqlAvgMoney("l_extendedprice")} AS avg_price,
          ${sqlAvgMoney("l_discount")} AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.trim)),

    // High-cardinality group (one group per order) — spill-path shape.
    Q("agg_highcard",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_lines"), sumMoney(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_orderkey")),
      Some(s"""
        SELECT l_orderkey, COUNT(*) AS n_lines, ${sqlSumMoney("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY l_orderkey""".trim)),

    // COUNT(DISTINCT) per group (Expand + 2-phase agg).
    {
      // SQL-routed key (r12): Spark executes the SAME dialect-shared text
      // the DuckDB oracle runs — the pure-SQL entry path, end to end.
      val text = """
        SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""".trim
      Q("agg_distinct",
        (spark, sfDir) => SqlEntry.sql(spark, sfDir, text),
        Some(text))
    },

    // Two distinct aggregates in one query (planner Expand coverage).
    Q("agg_multi_distinct",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_linestatus"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n"))
          .orderBy(col("l_linestatus")),
      Some("""
        SELECT l_linestatus, COUNT(DISTINCT l_suppkey) AS n_supp,
          COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus""".trim)),

    // ROLLUP over a 2-join star; NULL totals pinned NULLS FIRST + grouping id.
    Q("agg_rollup",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir)
        val c = Tables.customer(spark, sfDir)
        val n = Tables.nation(spark, sfDir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .rollup(col("n_name"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"), sumMoney(col("o_totalprice")).as("revenue"),
            grouping_id().cast("int").as("gid"))
          .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
      },
      Some(s"""
        SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
          ${sqlSumMoney("o_totalprice")} AS revenue,
          CAST(GROUPING(n_name, o_orderstatus) AS INT) AS gid
        FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, o_orderstatus)
        ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST""".trim)),

    // CUBE over lineitem flags.
    Q("agg_cube",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("sum_qty"),
            grouping_id().cast("int").as("gid"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${sqlSumMoney("l_quantity")} AS sum_qty,
          CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".trim)),

    // Explicit GROUPING SETS with grouping() markers (SQL entry point —
    // the same text runs in Spark SQL and DuckDB).
    Q("agg_grouping_sets",
      (spark, sfDir) => {
        Tables.registerAll(spark, sfDir)
        spark.sql(Aggregates.groupingSetsSql)
      },
      Some(groupingSetsSql)),

    // Statistical aggregates; bounded-range inputs + rounding per §7.3.
    Q("agg_stats",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
          round(stddev_samp(l_quantity), 4) AS sd_qty,
          round(var_samp(l_quantity), 4) AS var_qty,
          round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
          round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
          COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""".trim)),

    // Boolean / bitwise aggregates (r5): bool_and / bool_or over
    // predicates, bit_and / bit_or / bit_xor over the id domain — the
    // flag-mask reduction family. All associative-commutative, so they
    // ride the standard two-phase HashAggregate; exact int64/boolean, no
    // float policy needed.
    Q("agg_bool_bit",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .groupBy(col("event_type"))
          .agg(
            bool_and(col("value") > 0).as("all_pos"),
            bool_or(col("value") > 100).as("any_large"),
            bit_and(col("user_id")).as("ids_and"),
            bit_or(col("user_id")).as("ids_or"),
            bit_xor(col("user_id")).as("ids_xor"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
          bool_and(value > 0) AS all_pos,
          bool_or(value > 100) AS any_large,
          bit_and(user_id) AS ids_and,
          bit_or(user_id) AS ids_or,
          bit_xor(user_id) AS ids_xor,
          COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Median + mode (r5): the order-statistic aggregates. Median runs the
    // engines' native interpolating percentile over the raw doubles (2dp
    // inputs → midpoints have ≤3 decimals, so the 4dp round is boundary-
    // safe); mode is the DETERMINISTIC formulation — count + rank with
    // ties broken by smallest value — because both engines' native mode()
    // picks an arbitrary tie winner. BOTH sides group on the 2dp decimal
    // (ADVICE r5: a raw-value oracle group key would split counts the
    // Spark side merges if the fixture ever carried >2dp quantities). Two-phase agg + a 1-row-per-group
    // window; at 100 TB median would move to approx_percentile (the
    // agg_approx_quantile key) — this is its exactness anchor.
    Q("agg_median_mode",
      (spark, sfDir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(col("cnt").desc, col("q"))
        val modes = Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"), money(col("l_quantity")).as("q"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), emit(col("q"), 2).as("mode_qty"),
            col("cnt").as("mode_n"))
        val med = Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"))
          .agg(round(median(col("l_quantity")), 4).as("median_qty"))
        modes.join(med, "l_returnflag").orderBy(col("l_returnflag"))
      },
      Some(s"""
        WITH m AS (
          SELECT l_returnflag, ${sqlEmit(sqlMoney("l_quantity"), 2)} AS q,
            COUNT(*) AS cnt,
            row_number() OVER (PARTITION BY l_returnflag
              ORDER BY COUNT(*) DESC, ${sqlMoney("l_quantity")}) AS rn
          FROM lineitem GROUP BY l_returnflag, ${sqlMoney("l_quantity")}
        )
        SELECT l_returnflag, q AS mode_qty, cnt AS mode_n,
          (SELECT round(median(l_quantity), 4) FROM lineitem i
           WHERE i.l_returnflag = m.l_returnflag) AS median_qty
        FROM m WHERE rn = 1
        ORDER BY l_returnflag""".trim)),

    // Pivot / crosstab: order counts per priority × status. Spark's
    // pivot() with explicit values plans as a single aggregate (no
    // per-value scans); missing cells coalesce to 0 like the oracle's
    // FILTER counts.
    Q("agg_pivot",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p"))
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
          COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
          COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
          COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""".trim)),

    // HLL sketch — engine-specific, no SQL oracle (SURVEY §2.4); bounds
    // vs exact distinct are property-tested in AggregatesSpec.
    Q("agg_approx_distinct",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      None),

    // Exact distinct users per event-time window (r4): the batch twin of
    // "unique visitors per hour per type" — the distinct-agg shape OVER
    // tumbling windows. Plans as the standard two-phase distinct: partial
    // dedup of (window, type, user) map-side, then the count — the shuffle
    // carries one row per distinct triple, never per event. At 100 TB the
    // approx_count_distinct above is the cheaper knob; this key is the
    // exact-semantics reference for it.
    Q("agg_window_distinct",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
          .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
            col("n_users"), col("n"))
          .orderBy(col("ws_us"), col("event_type")),
      Some("""
        SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
          COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
        ORDER BY ws_us, event_type""".trim)),

    // String aggregation (r4): the LISTAGG/string_agg shape — distinct
    // member values per group joined into one string. collect_set order is
    // partition-dependent, so the list is SORTED before the join (the only
    // deterministic form of this aggregate under parallel execution; an
    // unsorted listagg can never be oracle-checked).
    Q("agg_string_concat",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .groupBy(col("o_orderpriority"))
          .agg(
            array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
            countDistinct(col("o_orderstatus")).as("n_status"))
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
          array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
          count(DISTINCT o_orderstatus) AS n_status
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""".trim)),

    // Conditional aggregation (r4): FILTER-clause aggregates — several
    // differently-predicated measures out of ONE scan and one shuffle,
    // instead of self-joining per condition. Spark expresses the filter as
    // the aggregate of a CASE; DuckDB as the native FILTER clause; both
    // produce the identical two-phase plan over exact-decimal inputs.
    Q("agg_filter_clause",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_all"),
            count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
            emit(sum(when(col("o_orderpriority") === "1-URGENT", money(col("o_totalprice")))), 2)
              .as("sum_urgent"),
            count(when(col("o_totalprice") > 150000, 1)).as("n_big"))
          .orderBy(col("o_orderstatus")),
      Some(s"""
        SELECT o_orderstatus,
          COUNT(*) AS n_all,
          COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
          ${sqlEmit(s"SUM(${sqlMoney("o_totalprice")}) FILTER (WHERE o_orderpriority = '1-URGENT')", 2)} AS sum_urgent,
          COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""".trim)),

    // Fixed-bin histogram (r4): 20 bins of width 25 over events.value —
    // the profiling aggregate behind threshold choices and dashboards. The
    // bin id is pure float arithmetic identical in both engines
    // (floor(v/25), top edge clamped), so this stays a single two-phase
    // aggregate whose shuffle carries one row per non-empty bin.
    Q("agg_histogram",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(least(lit(19L), floor(col("value") / 25)).as("bin"),
            col("value"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sumVal6(col("value")).as("sum_v"))
          .select(col("bin"), (col("bin") * 25.0).as("lo"),
            ((col("bin") + 1) * 25.0).as("hi"), col("n"), col("sum_v"))
          .orderBy(col("bin")),
      Some(s"""
        SELECT bin, bin * 25.0 AS lo, (bin + 1) * 25.0 AS hi,
          COUNT(*) AS n, ${sqlSumVal6("value")} AS sum_v
        FROM (SELECT LEAST(19, CAST(FLOOR(value / 25) AS BIGINT)) AS bin, value FROM events)
        GROUP BY bin
        ORDER BY bin""".trim)),

    // Unpivot / melt (r4): wide metric columns → long (metric, value) rows,
    // the inverse of agg_pivot — the reshape step before any per-metric
    // aggregation or plotting export. Unpivot is a zero-shuffle per-row
    // expand (Expand node, 3 output rows per input); the only exchange is
    // the downstream per-(flag, metric) aggregate. Oracle: the portable
    // UNION ALL stack with literal metric labels.
    Q("agg_unpivot",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_quantity"), col("l_discount"), col("l_tax"))
          .unpivot(Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")), "metric", "v")
          .groupBy(col("l_returnflag"), col("metric"))
          .agg(sumVal6(col("v")).as("sum_v"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("metric")),
      Some(s"""
        WITH long AS (
          SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS v FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'l_discount' AS metric, l_discount AS v FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'l_tax' AS metric, l_tax AS v FROM lineitem)
        SELECT l_returnflag, metric, ${sqlSumVal6("v")} AS sum_v, COUNT(*) AS n
        FROM long
        GROUP BY l_returnflag, metric
        ORDER BY l_returnflag, metric""".trim)),

    // Mergeable-sketch re-aggregation (§2.12 extension): per-(type, day)
    // HLL sketches — the KB-sized persisted partial — merged per type with
    // hll_union_agg. This is the incremental-rollup pattern at 100 TB:
    // store the day-level sketch once, then answer any date-range distinct
    // count by merging sketches instead of rescanning events. Sketch bytes
    // are engine-specific ⇒ no SQL oracle; AggregatesSpec checks the
    // merged estimate against the exact distinct count and against the
    // directly-built single sketch.
    Q("agg_sketch_merge",
      (spark, sfDir) => {
        val daily = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(expr("hll_sketch_agg(user_id)").as("sketch"))
        daily.groupBy(col("event_type"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("approx_users"),
            count(lit(1)).as("n_days"))
          .orderBy(col("event_type"))
      },
      None),

    // Exponentially-decayed trending counts (r5): per event type, the sum
    // of exp(-age · ln2/24h) weights relative to the stream's newest
    // event — the "what's hot NOW" aggregate (a plain count scores a
    // week-old spike the same as a live one). The reference instant comes
    // from a 1-row max() broadcast, ages are exact integer µs diffs, and
    // each weight is Det-coarsened to DECIMAL(18,6) BEFORE the sum (libm
    // exp may differ in the last ulp between engines; the per-row decimal
    // makes the sum order-independent and cross-engine exact — the
    // lm_score policy). Two-phase agg, zero extra shuffle.
    Q("agg_decay",
      (spark, sfDir) => {
        val ev = Tables.events(spark, sfDir)
        val mx = ev.agg(max(unix_micros(col("ts"))).as("mx"))
        ev.crossJoin(broadcast(mx))
          .groupBy(col("event_type"))
          .agg(
            Det.emit(sum(Det.val6(
              exp((col("mx") - unix_micros(col("ts"))).cast("double")
                * lit(-8.022536812036404e-12)))), 6).as("decayed"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events)
        SELECT event_type,
          ${Det.sqlEmit(s"SUM(${Det.sqlVal6("exp(CAST(m.mx - epoch_us(ts) AS DOUBLE) * -8.022536812036404e-12)")})", 6)} AS decayed,
          COUNT(*) AS n
        FROM events CROSS JOIN m
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Count-min point-frequency sketch (r5): the third mergeable-sketch
    // family next to HLL (distinct counts) and KLL-style quantiles —
    // "how often did THIS key occur" without storing per-key counters.
    // The sketch is built as a standard two-phase aggregate (counter
    // arrays sum commutatively, so partials merge exactly); the KB-sized
    // sketch never leaves the cluster — it broadcasts onto the probe rows
    // as a 1-row cross join. Probes compare the estimate against the
    // exact count for the 20 heaviest clickers; CMS never undercounts, so
    // est ≥ exact always, and at this scale the overcount is ~0
    // (OperatorSpec pins both bounds + the fixed-seed determinism).
    // Sketch bytes are engine-specific ⇒ no SQL oracle, same policy as
    // agg_sketch_merge.
    Q("agg_count_min",
      (spark, sfDir) => {
        val clicks = Tables.events(spark, sfDir)
          .filter(col("event_type") === "click")
        // LAZY (r6, VERDICT r5 finding 3): the sketch aggregate rides the
        // plan as a broadcast 1-row cross join instead of an eager `.head`
        // at construction time, so building the DataFrame runs zero jobs —
        // the same `(spark, sfDir) => DataFrame` contract every other key
        // honors. The per-row UDF deserializes the KB-sized sketch from the
        // joined bytes column; only 20 rows survive the top-k, so the
        // repeated readFrom is noise (and at scale the sketch column is
        // broadcast once per executor, never shuffled with data).
        val sk = clicks
          .agg(expr("count_min_sketch(user_id, 0.0001d, 0.99d, 42)").as("sk_bytes"))
        val est = udf { (bytes: Array[Byte], u: Long) =>
          org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(bytes))
            .estimateCount(java.lang.Long.valueOf(u))
        }
        clicks.groupBy(col("user_id"))
          .agg(count(lit(1)).as("exact_clicks"))
          .orderBy(col("exact_clicks").desc, col("user_id")).limit(20)
          .crossJoin(broadcast(sk))
          .withColumn("est_clicks", est(col("sk_bytes"), col("user_id")))
          .select(col("user_id"), col("exact_clicks"), col("est_clicks"))
      },
      None),

    // Quantile sketch (§2.12 extension): per-group median/p95/p99 via
    // approx_percentile — the profiling aggregate a data pipeline runs
    // before choosing filters/thresholds. Mergeable sketch ⇒ two-phase
    // partial aggregation like every other agg here; sketch output is
    // engine-specific ⇒ no SQL oracle (rank-error bounds vs the exact
    // percentiles are property-tested, same policy as agg_approx_distinct).
    Q("agg_approx_quantile",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)")
              .as("q"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            element_at(col("q"), 1).as("p50"),
            element_at(col("q"), 2).as("p95"),
            element_at(col("q"), 3).as("p99"),
            col("n"))
          .orderBy(col("l_returnflag")),
      None),

    // Ordered event funnel (r5): per user, how far through
    // view → click → purchase did they get, with each stage STRICTLY after
    // the previous one — the sequence-matching analytic (ClickHouse's
    // windowFunnel shape) that a plain per-type count cannot express
    // (a click before the first view must not count). Three stage
    // aggregates chained by time joins, every one keyed on user_id: at
    // 100 TB all stages shuffle on the same key (one exchange under a
    // bucketed layout), and each stage's row count only shrinks. The
    // dialect-shared ANSI text is both the Spark entry point and the
    // oracle.
    Q("agg_funnel",
      (spark, sfDir) => {
        graft.Tables.registerAll(spark, sfDir)
        spark.sql(FunnelSql)
      },
      Some(FunnelSql)),

    // Cohort retention (r5): users grouped by first-activity day, counted
    // again at each later activity-day offset — THE product-analytics
    // rollup over an event stream. Two aggregates and a join, all keyed on
    // user_id (the distinct-day dedup, the cohort min, and the join reuse
    // one hash partitioning); the final (cohort, offset) matrix is
    // output-bound — days × days rows, independent of event volume.
    Q("agg_retention",
      (spark, sfDir) => {
        val active = Tables.events(spark, sfDir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val cohorts = active.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        active.join(cohorts, "user_id")
          .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("offset_days"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort"), col("offset_days"))
      },
      Some("""
        WITH active AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        cohorts AS (
          SELECT user_id, MIN(day) AS cohort FROM active GROUP BY user_id)
        SELECT cohort,
          CAST(date_diff('day', cohort, day) AS INT) AS offset_days,
          COUNT(DISTINCT active.user_id) AS n_users
        FROM active JOIN cohorts USING (user_id)
        GROUP BY 1, 2
        ORDER BY cohort, offset_days""".trim)),

    // Weighted aggregates (r8): quantity-weighted mean price and discount
    // per return flag — the weighted-moment family (importance-weighted
    // corpus statistics, revenue-weighted means) the plain AVG keys cannot
    // express. Determinism rides the §7.3 decimal policy end-to-end:
    // qty(2dp) × price(2dp) is an EXACT 4dp decimal product, summed
    // exactly, narrowed (HALF_UP in both engines), emitted as double, and
    // only THEN divided — one IEEE division on identical operands.
    // Magnitude check: sf0.1 revenue-sum ≈ 3e12, unscaled 3e14 at scale 2
    // < 2^53, so the double cast is exact; the discount numerator keeps
    // its full 4dp (≤ 3e6, safe). Plan: one two-phase HashAggregate, the
    // shuffle carries one partial row per (partition, flag) — the same
    // output-bound shape at 100 TB.
    Q("agg_weighted",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"))
          .agg(
            sumMoney(col("l_quantity")).as("w_total"),
            (emit(sum(money(col("l_quantity")) * money(col("l_extendedprice"))), 2)
              / emit(sum(money(col("l_quantity"))), 2)).as("wavg_price"),
            (emit(sum(money(col("l_quantity")) * money(col("l_discount"))), 4)
              / emit(sum(money(col("l_quantity"))), 2)).as("wavg_disc"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      Some(s"""
        SELECT l_returnflag,
          ${sqlSumMoney("l_quantity")} AS w_total,
          ${sqlEmit(s"SUM(${sqlMoney("l_quantity")} * ${sqlMoney("l_extendedprice")})", 2)}
            / ${sqlEmit(s"SUM(${sqlMoney("l_quantity")})", 2)} AS wavg_price,
          ${sqlEmit(s"SUM(${sqlMoney("l_quantity")} * ${sqlMoney("l_discount")})", 4)}
            / ${sqlEmit(s"SUM(${sqlMoney("l_quantity")})", 2)} AS wavg_disc,
          COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""".trim)),

    // Exact distinct-count via bitmap blocks (r8): the scalable alternative
    // to COUNT(DISTINCT) when the id space is dense integers. Each
    // (group, id/32) block OR-accumulates a 32-bit membership mask —
    // map-side combinable, unlike distinct's expand — then popcounts sum
    // up. The shuffle carries |groups| × |id-space|/32 mask rows instead
    // of |groups| × |distinct ids| raw ids: a 32× reduction, and the
    // partial aggregate absorbs all same-block duplicates before the
    // exchange. Bit 31 stays inside a positive BIGINT, so no sign games.
    // The oracle is plain COUNT(DISTINCT) — proving the bitmap IS an exact
    // distinct, not an approximation. Bit index is pmod (always 0..31) and
    // the block is true floor division, so NEGATIVE ids map to distinct
    // (block, bit) slots instead of colliding via sign-truncated %/div
    // (r8 advice; the fixture is non-negative but the operator no longer
    // assumes it).
    Q("agg_bitmap_distinct",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(to_date(col("ts")).as("d"), col("event_type"),
            expr("(user_id - pmod(user_id, 32)) div 32").as("blk"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 32) AS INT))").as("mask"))
          .groupBy(col("d"), col("event_type"), col("blk"))
          .agg(expr("bit_or(mask)").as("block_bits"))
          .groupBy(col("d"), col("event_type"))
          .agg(sum(expr("bit_count(block_bits)")).cast("long").as("n_users"))
          .orderBy(col("d"), col("event_type")),
      Some("""
        SELECT CAST(ts AS DATE) AS d, event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2""".trim)),

    // Bitmap set algebra (r8): day-over-day retained users as
    // popcount(bits_d AND bits_d+1) over the same 32-bit blocks
    // agg_bitmap_distinct builds. The join is on (block, day) — the
    // bitmap side carries |id-space|/32 rows per day instead of
    // |active users|, and the AND+popcount re-aggregates partial. The
    // oracle is the naive distinct-users self-join — proving the bitmap
    // intersection computes EXACT audience overlap. At 100 TB this is the
    // segment-overlap / cohort-retention shape: day×block bitmaps are the
    // materialized view, any day-pair overlap is one co-partitioned join
    // away, never a re-scan of raw events.
    Q("agg_bitmap_overlap",
      (spark, sfDir) => {
        val daily = Tables.events(spark, sfDir)
          .select(to_date(col("ts")).as("d"),
            expr("(user_id - pmod(user_id, 32)) div 32").as("blk"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 32) AS INT))").as("mask"))
          .groupBy(col("d"), col("blk"))
          .agg(expr("bit_or(mask)").as("bits"))
        val next = daily.select(col("d").as("d2"), col("blk").as("blk2"),
          col("bits").as("bits2"))
        daily.join(next,
            col("blk") === col("blk2") && col("d2") === date_add(col("d"), 1))
          .groupBy(col("d"))
          .agg(sum(expr("bit_count(bits & bits2)")).cast("long").as("retained"))
          // a day-pair sharing blocks but zero common users would emit a
          // 0 row the exact-join oracle doesn't have — align on overlap>0
          .filter(col("retained") > 0)
          .orderBy(col("d"))
      },
      Some("""
        SELECT a.d AS d, CAST(COUNT(*) AS BIGINT) AS retained
        FROM (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events) a
        JOIN (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events) b
          ON a.user_id = b.user_id AND b.d = a.d + INTERVAL 1 DAY
        GROUP BY 1
        ORDER BY 1""".trim)),

    // Spearman rank correlation (r9): does a metric trend with time? —
    // per event_type, the rank correlation between arrival order and
    // value order, ρ = 1 − 6Σd²/(n(n²−1)), entirely integer-exact at 6dp
    // (ρ_e6 ∈ [−10⁶, 10⁶]). Ranks are row_number over a DETERMINISTIC
    // total order (ties broken by event_id — documented variant: the
    // textbook tie-averaged ranks need fractional arithmetic; the
    // tie-broken form is exact, and identical in both engines by
    // construction). The only non-int64-safe product, 6·10⁶·Σd², runs in
    // DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — Σd² alone can reach
    // n³/3 ≈ 10¹⁵ at fixture scale and the 10⁶ scaling would overflow a
    // BIGINT; `div` on decimals is still integral division, and every
    // operand is non-negative so floor == truncate cross-engine. Scale
    // shape: one hash exchange on event_type feeds BOTH rank windows
    // (two in-partition sorts, no second shuffle); the Σd²/n aggregate
    // is partial-combinable.
    Q("agg_rank_corr",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val byVal = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        val byTime = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(spark, sfDir)
          .select(col("event_type"), col("event_id"), col("ts"), col("value"))
          .withColumn("rv", row_number().over(byVal).cast("long"))
          .withColumn("rt", row_number().over(byTime).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((col("rv") - col("rt")) * (col("rv") - col("rt"))).as("sd2"))
          .filter(col("n") > 1) // n(n²−1)=0: ρ undefined for singletons
          .select(col("event_type"), col("n"),
            (lit(1000000L) - expr(
              """CAST((CAST(6000000 AS DECIMAL(38,0)) * CAST(sd2 AS DECIMAL(38,0)))
                   div (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1)) AS BIGINT)"""))
              .as("rho_e6"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH r AS (
          SELECT event_type,
            CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rv,
            CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT) AS rt
          FROM events)
        SELECT event_type, COUNT(*) AS n,
          1000000 - CAST((6000000 * CAST(SUM((rv - rt) * (rv - rt)) AS HUGEINT))
            // (CAST(COUNT(*) AS HUGEINT) * (CAST(COUNT(*) AS HUGEINT) * COUNT(*) - 1)) AS BIGINT) AS rho_e6
        FROM r
        GROUP BY event_type
        HAVING COUNT(*) > 1
        ORDER BY event_type""".trim)),

    // Shannon entropy of the event-type mix per user cohort (r9): the
    // diversity metric a curation pipeline tracks per source/shard (a
    // collapsing mix ⇒ near-zero entropy ⇒ quality alarm). Two bounded
    // aggregations: (cohort, type) counts, then the cohort total via a
    // window over the COUNT table (fanout = type cardinality, ≤5). The
    // share p = cnt/total is one IEEE division of exact longs; each
    // −p·ln(p) term is coarsened to DECIMAL(18,6) per row (llm_lm_score's
    // ulp-proofing recipe for libm ln) and the final sum is exact decimal
    // — order-independent under any partitioning, the hash-stable shape.
    Q("agg_entropy",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val cnt = Tables.events(spark, sfDir)
          .select(expr("user_id div 10").as("cohort"), col("event_type"))
          .groupBy("cohort", "event_type").agg(count(lit(1)).as("cnt"))
        val wc = Window.partitionBy("cohort")
        val p = col("cnt").cast("double") / col("total").cast("double")
        cnt
          .select(col("cohort"), col("cnt"), sum("cnt").over(wc).as("total"))
          .select(col("cohort"), col("total"),
            Det.val6(-p * log(p)).as("term"))
          .groupBy("cohort")
          .agg(count(lit(1)).as("n_types"), max("total").as("n_events"),
            Det.emit(sum(col("term")), 6).as("entropy"))
          .orderBy("cohort")
      },
      Some("""
        WITH c AS (
          SELECT user_id // 10 AS cohort, event_type, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        t AS (
          SELECT cohort, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY cohort) AS BIGINT) AS total
          FROM c)
        SELECT cohort, COUNT(*) AS n_types, MAX(total) AS n_events,
               CAST(CAST(SUM(CAST(
                 -(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                   * ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS entropy
        FROM t
        GROUP BY cohort
        ORDER BY cohort""".trim)),

    // Exact interpolated percentiles (r9): per-returnflag quartiles + IQR
    // over l_quantity. Spark's `percentile` is the EXACT linear-
    // interpolation aggregate (sort-based, one pass per group) — the
    // audit-path twin of the omit-listed agg_approx_quantile sketch.
    // Inputs go through the 2dp decimal cast to exact doubles first, so
    // both engines interpolate identical values at identical positions
    // (p·(n−1) with binary-exact p = .25/.5/.75); interpolated quarters
    // of 2dp values carry ≤4 decimals, so the 4dp round is never at a
    // rounding boundary. At 100 TB the exact form stays viable per-group
    // (sort within group), but the default monitoring path is the
    // approx_percentile sketch; this key pins the exact semantics.
    Q("agg_percentile_exact",
      (spark, sfDir) => {
        val q3 = expr("percentile(q, array(0.25D, 0.5D, 0.75D))")
        Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), emit(money(col("l_quantity")), 2).as("q"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), q3.as("p"))
          .select(col("l_returnflag"), col("n"),
            round(col("p").getItem(0), 4).as("p25"),
            round(col("p").getItem(1), 4).as("p50"),
            round(col("p").getItem(2), 4).as("p75"),
            round(col("p").getItem(2) - col("p").getItem(0), 4).as("iqr"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH b AS (
          SELECT l_returnflag, ${sqlEmit(sqlMoney("l_quantity"), 2)} AS q
          FROM lineitem),
        a AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 quantile_cont(q, 0.25) AS p25x,
                 quantile_cont(q, 0.5) AS p50x,
                 quantile_cont(q, 0.75) AS p75x
          FROM b GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round(p25x, 4) AS p25, round(p50x, 4) AS p50,
               round(p75x, 4) AS p75, round(p75x - p25x, 4) AS iqr
        FROM a
        ORDER BY l_returnflag""".trim)),

    // Largest-remainder apportionment (r10): split a global budget of
    // B=100,000 sample slots across the (event_type, day) cells
    // proportional to their row counts — the quota allocator behind
    // sampling budgets, shard assignments, and seat apportionment.
    // Hamilton's method in PURE INTEGER arithmetic: base = (B·n) div N,
    // remainder = (B·n) mod N, the B − Σbase leftover slots go to the
    // largest remainders (ties → cell key order). No doubles anywhere —
    // the key is exact on any topology by construction. Scale: one
    // grouped count (the only data-bound shuffle), a 1-row total
    // broadcast, and a window over |cells| rows — allocation cost is
    // output-bound, never data-bound.
    Q("agg_apportion",
      (spark, sfDir) => {
        val cells = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        val b = lit(100000L)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("event_type"), col("d"))
        // total via an unpartitioned window over the |cells| rows — NOT a
        // separate aggregate + cross join, which would re-scan events
        // (the |cells|-row window is output-bound; a second fact scan is
        // not)
        cells
          .withColumn("total",
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy()))
          .select(col("event_type"), col("d"), col("n"), col("total"),
            expr("(100000 * n) div total").as("base"),
            expr("(100000 * n) % total").as("rem"))
          .withColumn("leftover",
            b - sum(col("base")).over(org.apache.spark.sql.expressions.Window
              .partitionBy()))
          .withColumn("rk", row_number().over(w))
          .select(col("event_type"), col("d"), col("n"), col("base"),
            (col("rk") <= col("leftover")).cast("int").as("extra"),
            (col("base") + (col("rk") <= col("leftover")).cast("long"))
              .as("alloc"))
          .orderBy(col("event_type"), col("d"))
      },
      Some("""
        WITH cells AS (
          SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        t AS (SELECT SUM(n) AS total FROM cells),
        q AS (
          SELECT event_type, d, n,
                 CAST((100000 * n) // total AS BIGINT) AS base,
                 (100000 * n) % total AS rem
          FROM cells CROSS JOIN t),
        r AS (
          SELECT event_type, d, n, base, rem,
                 SUM(base) OVER () AS base_sum,
                 row_number() OVER (ORDER BY rem DESC, event_type, d) AS rk
          FROM q)
        SELECT event_type, d, n, base,
               CAST(rk <= 100000 - base_sum AS INT) AS extra,
               CAST(base + CAST(rk <= 100000 - base_sum AS INT) AS BIGINT) AS alloc
        FROM r
        ORDER BY event_type, d""".trim)),

    // Activation time (r10): per user, the time from FIRST view to SECOND
    // purchase — the "time to activation" product metric (the first
    // purchase can be an accident; the second marks a habit). Purchases
    // take a row_number over (ts, event_id) per user, then one grouped
    // aggregate picks the rn=1/rn=2 timestamps conditionally — the
    // window and the groupBy share the (user) partitioning, so the
    // purchase leg costs ONE exchange (the ohlc fusion); the view leg is
    // an independent min aggregate, merged by a full outer join on the
    // same key. Users missing a view or a second purchase keep NULLs —
    // churn analysis needs the denominators. Ties at equal ts break by
    // event_id identically in both engines.
    Q("agg_activation_time",
      (spark, sfDir) => {
        val e = Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .withColumn("rn", row_number().over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_purchases"),
            min(when(col("rn") === 1, col("us"))).as("first_purchase_us"),
            min(when(col("rn") === 2, col("us"))).as("second_purchase_us"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id"))
          .agg(min(col("us")).as("first_view_us"))
        views.join(purchases, Seq("user_id"), "full_outer")
          .select(col("user_id"), col("first_view_us"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
            col("first_purchase_us"), col("second_purchase_us"),
            (col("second_purchase_us") - col("first_view_us"))
              .as("activation_us"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        p AS (
          SELECT user_id, COUNT(*) AS n_purchases,
                 MIN(CASE WHEN rn = 1 THEN us END) AS first_purchase_us,
                 MIN(CASE WHEN rn = 2 THEN us END) AS second_purchase_us
          FROM (
            SELECT user_id, us,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY us, event_id) AS rn
            FROM e WHERE event_type = 'purchase')
          GROUP BY user_id),
        v AS (
          SELECT user_id, MIN(us) AS first_view_us
          FROM e WHERE event_type = 'view' GROUP BY user_id)
        SELECT COALESCE(v.user_id, p.user_id) AS user_id, first_view_us,
               CAST(COALESCE(n_purchases, 0) AS BIGINT) AS n_purchases,
               first_purchase_us, second_purchase_us,
               second_purchase_us - first_view_us AS activation_us
        FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
        ORDER BY user_id""".trim)),

    // Weekly cohort triangle (r10): users grouped by first-seen week,
    // tracked by distinct-active count per week since — THE
    // product-analytics retention artifact (agg_retention pins the
    // day-over-day scalar; this pins the full cohort × offset matrix).
    // Weeks are integer epoch-µs floor-divisions (no calendar-week
    // dialect drift between engines); cohorts come from a min-aggregate
    // broadcast back onto activity, and the matrix is one exact
    // count-distinct per cell plus each cohort's size for the rate. At
    // 100 TB: one shuffle for first-seen, one for the (cohort, offset)
    // distinct — both keyed, both bounded by users and cells.
    Q("agg_cohort_triangle",
      (spark, sfDir) => {
        val wk = expr("unix_micros(ts) div 604800000000").as("wk")
        val acts = Tables.events(spark, sfDir)
          .select(col("user_id"), wk)
        val cohorts = acts.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cohort_wk"))
        val sizes = cohorts.groupBy(col("cohort_wk"))
          .agg(countDistinct(col("user_id")).as("cohort_n"))
        acts.join(cohorts, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
          .agg(countDistinct(col("user_id")).as("active_n"))
          .join(broadcast(sizes), "cohort_wk")
          .select(col("cohort_wk"), col("wk_offset"), col("active_n"),
            col("cohort_n"),
            round(col("active_n").cast("double") /
              col("cohort_n").cast("double"), 6).as("retention"))
          .orderBy(col("cohort_wk"), col("wk_offset"))
      },
      Some("""
        WITH a AS (
          SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        c AS (
          SELECT user_id, MIN(wk) AS cohort_wk FROM a GROUP BY user_id),
        s AS (
          SELECT cohort_wk, COUNT(DISTINCT user_id) AS cohort_n
          FROM c GROUP BY cohort_wk),
        m AS (
          SELECT c.cohort_wk, a.wk - c.cohort_wk AS wk_offset,
                 COUNT(DISTINCT a.user_id) AS active_n
          FROM a JOIN c USING (user_id)
          GROUP BY 1, 2)
        SELECT cohort_wk, wk_offset, active_n, cohort_n,
               round(CAST(active_n AS DOUBLE) / CAST(cohort_n AS DOUBLE), 6)
                 AS retention
        FROM m JOIN s USING (cohort_wk)
        ORDER BY cohort_wk, wk_offset""".trim)),

    // Hash-aggregate argmin/argmax (r10): the per-group top-1 WITHOUT a
    // window — max_by/arg_max fold to a single two-phase hash aggregate
    // (no per-group sort, no row_number shuffle-then-filter), the plan
    // you want when top-1 is the only rank needed at 100 TB. Both
    // engines' arg functions are tie-UNDETERMINED, so the order key is
    // an ENCODED composite bigint — cents × 10¹² ± custkey — making the
    // winner unique by construction (max → richest then lowest key;
    // min → poorest then lowest key). All-integer encoding: exact,
    // topology-independent, identical in both engines. Range proof:
    // |cents| ≤ 10⁶ (acctbal ∈ ±9999.99), so |cents·10¹²| ≤ 10¹⁸ < 2⁶³,
    // and the encoding stays collision-free while custkey < 10¹², i.e.
    // TPC-H SF < ~6.6M (≈ 6.6 EB) — three decades past the 100 TB
    // target. (r10's 10¹⁰ multiplier bled at SF ≳ 66k ≈ 66 TB.)
    Q("agg_argmin",
      (spark, sfDir) => {
        val cents = money(col("c_acctbal")).cast("decimal(18,2)")
          .*(lit(100)).cast("long")
        val ordMax = cents * lit(1000000000000L) - col("c_custkey")
        val ordMin = cents * lit(1000000000000L) + col("c_custkey")
        Tables.customer(spark, sfDir)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            max_by(col("c_name"), ordMax).as("richest"),
            emit(max(money(col("c_acctbal"))), 2).as("max_bal"),
            min_by(col("c_name"), ordMin).as("poorest"),
            emit(min(money(col("c_acctbal"))), 2).as("min_bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        WITH b AS (
          SELECT c_mktsegment, c_name, c_custkey,
                 CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal,
                 CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,2))
                      * 100 AS BIGINT) AS cents
          FROM customer)
        SELECT c_mktsegment, COUNT(*) AS n,
               arg_max(c_name, cents * 1000000000000 - c_custkey) AS richest,
               CAST(CAST(MAX(bal) AS DECIMAL(18,2)) AS DOUBLE) AS max_bal,
               arg_min(c_name, cents * 1000000000000 + c_custkey) AS poorest,
               CAST(CAST(MIN(bal) AS DECIMAL(18,2)) AS DOUBLE) AS min_bal
        FROM b
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""".trim)),

    // Co-purchase pair mining (r11): market-basket co-occurrence — which
    // part pairs appear together in the same order with support ≥ 2 (the
    // Apriori/FP-growth first stage, and the "frequently bought together"
    // feature). Shape: distinct (order, part), self-join on the order key
    // with pa < pb to emit each unordered pair once, hash-aggregate on the
    // pair, threshold. The fan-out is bounded by the BASKET, not the
    // table: a TPC-H order holds ≤ 7 distinct parts (≤ 13 in this fixture)
    // → ≤ C(13,2) = 78 pairs per order, so the join output is O(rows ×
    // basket), linear at 100 TB. The one genuine skew hazard is a
    // mega-basket (one order with 10^5 items → 10^10 pairs); production
    // caps basket size or salts the basket key first — same guard as the
    // LSH mega-bucket policy. Support filter is applied post-aggregate
    // (HAVING), output bounded by the threshold.
    Q("agg_copurchase_pairs",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .orderBy(col("support").desc, col("pa"), col("pb"))
      },
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
        ORDER BY support DESC, pa, pb""".trim)),

    // Association rules (r11): the Apriori second stage on top of
    // agg_copurchase_pairs — each frequent unordered pair becomes TWO
    // directed rules a→b and b→a, scored by confidence (pair support /
    // antecedent support) and lift (observed co-rate / independence
    // expectation), both as floor-ppm integers: conf_ppm = sup_pair·10⁶
    // div sup_ante; lift_ppm = sup_pair·N·10⁶ div (sup_ante·sup_cons),
    // run in DECIMAL(38,0) because sup·N·10⁶ exceeds int64 at warehouse
    // scale (every operand non-negative, so floor == truncate cross-
    // engine — the rank_corr recipe). Shape: basket-bounded pair join
    // (the copurchase argument), one broadcast-joined per-item support
    // table (output-bound at |parts|), and a 1-row basket-count scalar
    // broadcast — no new table-sized operation beyond the mining pass.
    Q("agg_assoc_rules",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairSup = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("sup_pair"))
          .filter(col("sup_pair") >= 2)
        val rules = pairSup
          .select(col("pa").as("ante"), col("pb").as("cons"), col("sup_pair"))
          .unionByName(pairSup
            .select(col("pb").as("ante"), col("pa").as("cons"), col("sup_pair")))
        val itemSup = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("sup"))
        val baskets = li.agg(countDistinct(col("l_orderkey")).as("n_baskets"))
        rules
          .join(broadcast(itemSup.select(col("l_partkey").as("ante"),
            col("sup").as("sup_ante"))), Seq("ante"))
          .join(broadcast(itemSup.select(col("l_partkey").as("cons"),
            col("sup").as("sup_cons"))), Seq("cons"))
          .crossJoin(broadcast(baskets))
          .select(col("ante"), col("cons"), col("sup_pair"), col("sup_ante"),
            expr("CAST(sup_pair * 1000000 div sup_ante AS BIGINT)").as("conf_ppm"),
            expr("""CAST(CAST(sup_pair AS DECIMAL(38,0)) * n_baskets * 1000000
                      div (CAST(sup_ante AS DECIMAL(38,0)) * sup_cons)
                    AS BIGINT)""").as("lift_ppm"))
          .orderBy(col("conf_ppm").desc, col("ante"), col("cons"))
      },
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pair_sup AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS sup_pair
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        rules AS (
          SELECT pa AS ante, pb AS cons, sup_pair FROM pair_sup
          UNION ALL SELECT pb, pa, sup_pair FROM pair_sup),
        item_sup AS (
          SELECT l_partkey, COUNT(*) AS sup FROM li GROUP BY 1),
        baskets AS (
          SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li)
        SELECT r.ante, r.cons, r.sup_pair, ia.sup AS sup_ante,
               CAST(r.sup_pair * 1000000 // ia.sup AS BIGINT) AS conf_ppm,
               CAST(CAST(r.sup_pair AS HUGEINT) * b.n_baskets * 1000000
                    // (CAST(ia.sup AS HUGEINT) * ic.sup) AS BIGINT) AS lift_ppm
        FROM rules r
        JOIN item_sup ia ON r.ante = ia.l_partkey
        JOIN item_sup ic ON r.cons = ic.l_partkey
        CROSS JOIN baskets b
        ORDER BY conf_ppm DESC, ante, cons""".trim)),

    // Day-of-week seasonality index (r11): per (event type, weekday), the
    // ratio of that weekday's average daily total to the type's overall
    // average daily total, as a floor-ppm integer — the multiplicative
    // seasonal profile behind staffing curves, anomaly baselines ("is
    // this Sunday low or is the metric broken?") and seasonal adjustment.
    // Pure-integer ratio of two rational averages via cross-
    // multiplication: idx_ppm = (sum_dow · n_days_total · 10⁶) div
    // (sum_total · n_days_dow), in DECIMAL(38,0) because micros·days·10⁶
    // tops int64; all operands non-negative so floor == truncate cross-
    // engine. Weekday is Monday=0 in both engines (Spark weekday() ≡
    // DuckDB isodow−1 — dayofweek/dow disagree on the week start, a
    // classic cross-engine trap). One table-sized aggregate builds the
    // daily rollup; the 7×|types| index math is output-bound.
    Q("agg_seasonal_index",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val wt = Window.partitionBy(col("event_type"))
        Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(graft.Det.val6(col("value"))) * 1000000).cast("long").as("x"))
          .withColumn("dow", weekday(col("d")))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sum_dow"))
          .withColumn("n_total", sum(col("n_days")).over(wt))
          .withColumn("sum_total", sum(col("sum_dow")).over(wt))
          .select(col("event_type"), col("dow"), col("n_days"),
            expr("""CAST(CAST(sum_dow AS DECIMAL(38,0)) * n_total * 1000000
                      div (CAST(sum_total AS DECIMAL(38,0)) * n_days)
                    AS BIGINT)""").as("idx_ppm"))
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x
          FROM events GROUP BY 1, 2
        ), dow AS (
          SELECT event_type, isodow(d) - 1 AS dow,
                 COUNT(*) AS n_days, SUM(x) AS sum_dow
          FROM daily GROUP BY 1, 2
        )
        SELECT event_type, CAST(dow AS INTEGER) AS dow, n_days,
               CAST(CAST(sum_dow AS HUGEINT) *
                      SUM(n_days) OVER (PARTITION BY event_type) * 1000000
                    // (CAST(SUM(sum_dow) OVER (PARTITION BY event_type)
                          AS HUGEINT) * n_days) AS BIGINT) AS idx_ppm
        FROM dow
        ORDER BY event_type, dow""".trim)),

    // Heavy hitters with an exactness guarantee (r11): find every key
    // with frequency > n/32 WITHOUT a full-universe groupBy — the
    // two-phase sketch-then-verify shape for hot-key detection on
    // domains too large to aggregate exactly. Phase 1 runs SpaceSaving
    // (capacity m = 64) per partition via mapPartitions — the one
    // legitimate mapPartitions use outside the codec seam: a
    // bounded-memory stream summary has per-partition STATE no Catalyst
    // expression can carry. Merging per-partition summaries by keeping
    // every candidate retains any key with global count > Σ_p n_p/m =
    // n/m, and m=64 > 32 makes the union a PROVABLE superset of the
    // true heavy hitters — so phase 2's exact recount over the (tiny,
    // broadcast) candidate set + threshold filter returns EXACTLY the
    // true answer, deterministic under any partitioning even though the
    // intermediate candidates are not. The skewed key domain is derived
    // (floor(sqrt(user_id)) — counts grow linearly with the key), since
    // the fixture's raw ids are uniform. At 100 TB phase 1 touches each
    // row once with O(m) state; phase 2 aggregates only candidate rows.
    Q("agg_heavy_hitters",
      (spark, sfDir) => {
        import spark.implicits._
        val keyed = Tables.events(spark, sfDir)
          .select(expr("CAST(floor(sqrt(user_id)) AS BIGINT)").as("k"))
        val candidates = keyed.as[Long].mapPartitions { it =>
          val m = 64
          val counts = scala.collection.mutable.HashMap.empty[Long, Long]
          it.foreach { k =>
            if (counts.contains(k)) counts(k) += 1L
            else if (counts.size < m) counts(k) = 1L
            else { // evict the min-estimate entry (production: a heap)
              val (mk, mv) = counts.minBy(_._2)
              counts.remove(mk); counts(k) = mv + 1L
            }
          }
          counts.keysIterator
        }.toDF("k").distinct()
        val n = keyed.agg(count(lit(1)).as("n"))
        keyed.join(broadcast(candidates), Seq("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(n))
          .filter(col("cnt") > expr("n div 32"))
          .select(col("k"), col("cnt"))
          .orderBy(col("k"))
      },
      Some("""
        WITH keyed AS (
          SELECT CAST(floor(sqrt(user_id)) AS BIGINT) AS k FROM events
        )
        SELECT k, COUNT(*) AS cnt
        FROM keyed
        GROUP BY k
        HAVING COUNT(*) > (SELECT COUNT(*) FROM keyed) // 32
        ORDER BY k""".trim)),

    // Behavioral transition matrix (r11): first-order Markov counts over
    // each user's event sequence — P(next event type | current) — the
    // event-stream analytics that powers next-action prediction, funnel
    // drop-off heat maps, and bot detection (improbable transition
    // chains). lead() over (user, time) pairs every event with its
    // successor, one hash-agg counts the (from, to) cells, and a second
    // tiny window over the 5×5 matrix converts counts to floor-ppm
    // probabilities (integer div — no float division in hash-compared
    // values). The per-user window shuffles once on user_id (each user's
    // history is a partition — the same per-key locality every sessionize
    // key uses); the matrix itself is O(|event types|²) rows, so the
    // normalization window is output-bound. Ties inside a user's history
    // break on event_id (unique), making lead() reproducible under any
    // partitioning.
    Q("agg_transition_matrix",
      (spark, sfDir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wFrom = org.apache.spark.sql.expressions.Window
          .partitionBy(col("from_type"))
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("row_total", sum(col("n")).over(wFrom))
          .withColumn("prob_ppm", expr("(n * 1000000) div row_total").cast("long"))
          .select(col("from_type"), col("to_type"), col("n"), col("prob_ppm"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""
        WITH seq AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events
        ), cells AS (
          SELECT from_type, to_type, COUNT(*) AS n
          FROM seq WHERE to_type IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST((n * 1000000) // SUM(n) OVER (PARTITION BY from_type)
                    AS BIGINT) AS prob_ppm
        FROM cells
        ORDER BY from_type, to_type""".trim)),

    // Log-bucketed magnitude histogram (r12): the HDR-histogram shape —
    // per event type, value micros bucketed by floor(log2(v)), with
    // count/min/max/sum per bucket. Exponential buckets are how latency
    // and money spectra are monitored at scale: ~40 buckets cover 12
    // orders of magnitude with fixed state, and the per-bucket partials
    // are abelian (map-side combine + trivially mergeable across days —
    // the agg_sketch_merge property, but EXACT). floor(log2) is computed
    // as length(bin(v)) − 1 — minimal-binary-string length, bit-identical
    // in both engines, no libm log call (the standing no-doubles policy).
    // Zero/negative values carry no magnitude — filtered identically on
    // both sides.
    Q("agg_log_histogram",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(col("event_type"),
            (Det.val6(col("value")) * 1000000).cast("long").as("v_us"))
          .filter(col("v_us") > 0)
          .withColumn("bucket", (length(expr("bin(v_us)")) - 1).cast("long"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"), min(col("v_us")).as("min_us"),
            max(col("v_us")).as("max_us"), sum(col("v_us")).as("sum_us"))
          .orderBy(col("event_type"), col("bucket")),
      Some("""
        WITH v AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_us
          FROM events
        )
        SELECT event_type, CAST(length(bin(v_us)) - 1 AS BIGINT) AS bucket,
               COUNT(*) AS n, MIN(v_us) AS min_us, MAX(v_us) AS max_us,
               CAST(SUM(v_us) AS BIGINT) AS sum_us
        FROM v
        WHERE v_us > 0
        GROUP BY 1, 2
        ORDER BY event_type, bucket""".trim)),
  )

  /** Shared text for `agg_grouping_sets`: valid in both Spark SQL and DuckDB. */
  lazy val groupingSetsSql: String = s"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      ${sqlSumMoney("l_extendedprice")} AS sum_price,
      CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      CAST(GROUPING(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".trim
}
