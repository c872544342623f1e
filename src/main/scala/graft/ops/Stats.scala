package graft.ops

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Cost-based-optimizer statistics (SURVEY §4 — the one optimizer input
  * AQE cannot supply).
  *
  * AQE re-plans from RUNTIME shuffle statistics, which is why the engine
  * leans on it by default — but AQE only sees sizes after a stage has
  * already run. Catalog statistics from `ANALYZE TABLE` feed the PLANNING
  * estimates: exact row counts and per-column NDV/min/max/null-count let
  * the optimizer pick join order and build sides for a 20-table query
  * before anything executes. At 100 TB the operational pattern is: ingest →
  * `ANALYZE TABLE ... FOR ALL COLUMNS` (one cheap scan) → queries plan with
  * `spark.sql.cbo.enabled=true` + `spark.sql.cbo.joinReorder.enabled=true`.
  *
  * CboSpec demonstrates the mechanics end-to-end: registration + analyze
  * populate exact `rowCount` and column NDVs in the optimized plan's
  * statistics, filter estimates tighten from column stats, and a CBO
  * session's join reorder cannot change results.
  */
object Stats {
  import org.apache.spark.sql.functions._

  val queries: Seq[graft.Q] = Seq(

    // Exact table profiler (r9): the data-quality pass every ingest runs —
    // per-column row count, null count, exact NDV, and min/max over the
    // events table, emitted as one row per column (numeric min/max in
    // double columns — id casts are exact below 2^53; string min/max in
    // varchar columns; each NULL where the type doesn't apply). One
    // aggregate computes every metric in a single scan; the three exact
    // COUNT(DISTINCT)s plan as one Expand-based multi-distinct — the
    // expensive-but-exact shape. At 100 TB the daily profiler swaps NDV
    // to HLL (agg_approx_distinct's sketch) and keeps everything else;
    // exact NDV stays the audit/backfill path. Output rows are unpivoted
    // driver-side-free via stack(). Feeds the same planning story as
    // [[registerWithStats]]: these are exactly the statistics CBO wants.
    graft.Q("stats_profile",
      (spark, sfDir) => {
        val wide = Tables.events(spark, sfDir).agg(
          count(lit(1)).as("n"),
          count(col("event_id")).as("cnt_id"),
          countDistinct(col("event_id")).as("ndv_id"),
          min(col("event_id")).cast("double").as("min_id"),
          max(col("event_id")).cast("double").as("max_id"),
          count(col("user_id")).as("cnt_user"),
          countDistinct(col("user_id")).as("ndv_user"),
          min(col("user_id")).cast("double").as("min_user"),
          max(col("user_id")).cast("double").as("max_user"),
          count(col("value")).as("cnt_value"),
          countDistinct(col("value")).as("ndv_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          count(col("event_type")).as("cnt_type"),
          countDistinct(col("event_type")).as("ndv_type"),
          min(col("event_type")).as("min_type"),
          max(col("event_type")).as("max_type"))
        wide.select(expr(
          """stack(4,
               'event_id',   n - cnt_id,    ndv_id,    min_id,    max_id,    CAST(NULL AS STRING), CAST(NULL AS STRING),
               'event_type', n - cnt_type,  ndv_type,  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_type, max_type,
               'user_id',    n - cnt_user,  ndv_user,  min_user,  max_user,  CAST(NULL AS STRING), CAST(NULL AS STRING),
               'value',      n - cnt_value, ndv_value, min_value, max_value, CAST(NULL AS STRING), CAST(NULL AS STRING))
             AS (col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"""))
          .orderBy(col("col_name"))
      },
      Some("""
        WITH w AS (
          SELECT COUNT(*) AS n,
                 COUNT(event_id) AS cnt_id, COUNT(DISTINCT event_id) AS ndv_id,
                 CAST(MIN(event_id) AS DOUBLE) AS min_id, CAST(MAX(event_id) AS DOUBLE) AS max_id,
                 COUNT(user_id) AS cnt_user, COUNT(DISTINCT user_id) AS ndv_user,
                 CAST(MIN(user_id) AS DOUBLE) AS min_user, CAST(MAX(user_id) AS DOUBLE) AS max_user,
                 COUNT(value) AS cnt_value, COUNT(DISTINCT value) AS ndv_value,
                 MIN(value) AS min_value, MAX(value) AS max_value,
                 COUNT(event_type) AS cnt_type, COUNT(DISTINCT event_type) AS ndv_type,
                 MIN(event_type) AS min_type, MAX(event_type) AS max_type
          FROM events)
        SELECT 'event_id' AS col_name, n - cnt_id AS n_nulls, ndv_id AS n_distinct,
               min_id AS min_num, max_id AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM w
        UNION ALL
        SELECT 'event_type', n - cnt_type, ndv_type, NULL, NULL, min_type, max_type FROM w
        UNION ALL
        SELECT 'user_id', n - cnt_user, ndv_user, min_user, max_user, NULL, NULL FROM w
        UNION ALL
        SELECT 'value', n - cnt_value, ndv_value, min_value, max_value, NULL, NULL FROM w
        ORDER BY col_name""".trim)),

    // Two-sample Kolmogorov–Smirnov statistic (r9): distribution drift
    // between URGENT and LOW order prices — the monitoring primitive a
    // training-data pipeline runs per ingest batch ("did today's data
    // shift?"). Binned-ECDF formulation: values quantize to $1000 bins,
    // one bounded agg produces per-bin counts for both samples, a window
    // over the BIN table (≤500 rows, post-aggregation) builds both
    // cumulative distributions, and the statistic is the max ECDF gap.
    // All-integer arithmetic until the final single division: the gap is
    // computed as |c1·t2 − c2·t1| over exact longs, so the result is
    // hash-stable under any partitioning; ks = num/(n1·n2) is one IEEE
    // division of exact integers, identical in both engines. At 100 TB
    // only the first agg touches the data (shuffle bounded by bin count);
    // the window runs on the bin table, not the fact table.
    graft.Q("stats_ks_test",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val s = Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(expr("CAST(FLOOR(o_totalprice / 1000) AS BIGINT)").as("bin"),
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("g1"),
            when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L).as("g2"))
        val b = s.groupBy("bin").agg(sum("g1").as("n1"), sum("g2").as("n2"))
        // unpartitioned window is safe here: it runs over the ≤500-row bin
        // table, never the fact table (same shape as the oracle's OVER)
        val w = Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = b.select(sum("n1").over(w).as("c1"), sum("n2").over(w).as("c2"))
        val tot = b.agg(sum("n1").as("t1"), sum("n2").as("t2"))
        cum.crossJoin(broadcast(tot)) // scalar-join idiom: 1-row broadcast
          .agg(max(abs(col("c1") * col("t2") - col("c2") * col("t1"))).as("ks_num"),
            max("t1").as("n1"), max("t2").as("n2"))
          .select(col("ks_num"), col("n1"), col("n2"),
            (col("ks_num").cast("double") /
              (col("n1") * col("n2")).cast("double")).as("ks"))
      },
      Some("""
        WITH s AS (
          SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bin,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
                 CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g2
          FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        b AS (SELECT bin, SUM(g1) AS n1, SUM(g2) AS n2 FROM s GROUP BY bin),
        c AS (SELECT SUM(n1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
                     SUM(n2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
              FROM b),
        t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2 FROM b)
        SELECT CAST(MAX(ABS(c1 * t2 - c2 * t1)) AS BIGINT) AS ks_num,
               MAX(t1) AS n1, MAX(t2) AS n2,
               CAST(CAST(MAX(ABS(c1 * t2 - c2 * t1)) AS BIGINT) AS DOUBLE)
                 / CAST(MAX(t1) * MAX(t2) AS DOUBLE) AS ks
        FROM c, t""".trim)),

    // Chi-square independence table (r9): order status × priority — the
    // categorical-drift twin of stats_ks_test ("is the label mix changing
    // with priority?"). One bounded agg produces the contingency cells
    // (15 rows); row/column marginals come from windows over the CELL
    // table; the grand total rides the 1-row broadcast scalar-join idiom.
    // Expected counts and per-cell contributions are emitted per cell
    // (not summed) so every value is a fixed IEEE expression tree over
    // exact integers — no order-dependent float fold anywhere — then
    // coarsened through DECIMAL(18,6) (Det.emit policy) to be ulp-proof.
    graft.Q("stats_chi_square",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val cell = Tables.orders(spark, sfDir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("obs"))
        val n1 = cell.agg(sum("obs").as("n"))
        val wr = Window.partitionBy("o_orderstatus")
        val wc = Window.partitionBy("o_orderpriority")
        val expC = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
        cell
          .select(col("o_orderstatus"), col("o_orderpriority"), col("obs"),
            sum("obs").over(wr).as("rt"), sum("obs").over(wc).as("ct"))
          .crossJoin(broadcast(n1))
          .withColumn("expected", expC)
          .select(col("o_orderstatus"), col("o_orderpriority"), col("obs"),
            col("rt"), col("ct"),
            graft.Det.emit(col("expected"), 6).as("expected"),
            graft.Det.emit(
              (col("obs").cast("double") - col("expected")) *
                (col("obs").cast("double") - col("expected")) / col("expected"),
              6).as("contrib"))
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""
        WITH cell AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS obs
          FROM orders GROUP BY 1, 2),
        m AS (
          SELECT o_orderstatus, o_orderpriority, obs,
                 CAST(SUM(obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS rt,
                 CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS ct,
                 (SELECT CAST(SUM(obs) AS BIGINT) FROM cell) AS n
          FROM cell),
        e AS (
          SELECT o_orderstatus, o_orderpriority, obs, rt, ct,
                 CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected
          FROM m)
        SELECT o_orderstatus, o_orderpriority, obs, rt, ct,
               CAST(CAST(expected AS DECIMAL(18,6)) AS DOUBLE) AS expected,
               CAST(CAST((CAST(obs AS DOUBLE) - expected) * (CAST(obs AS DOUBLE) - expected)
                    / expected AS DECIMAL(18,6)) AS DOUBLE) AS contrib
        FROM e
        ORDER BY o_orderstatus, o_orderpriority""".trim)),

    // Population Stability Index (r9): the third leg of the drift trio
    // (KS for continuous, chi-square for categorical, PSI for the binned
    // score monitoring every ML-ops pipeline standardizes on — "has the
    // serving distribution moved from the training baseline?"). Baseline
    // = finished (F) orders, actual = open (O) orders, 20 capped $25k
    // price bins. psi = Σ (p−q)·ln(p/q) over jointly-populated bins (the
    // ε-free convention; the cap keeps every bin populated at fixture
    // scale so the guard never fires there). Shares stats_ks_test's
    // shape: one bounded agg on the fact table, totals ride the 1-row
    // broadcast, each term is a fixed IEEE tree over exact longs
    // coarsened to DECIMAL(18,6), the sum is exact decimal.
    graft.Q("stats_psi",
      (spark, sfDir) => {
        val b = Tables.orders(spark, sfDir)
          .filter(col("o_orderstatus").isin("F", "O"))
          .select(
            expr("LEAST(19, CAST(FLOOR(o_totalprice / 25000) AS BIGINT))").as("bin"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("g1"),
            when(col("o_orderstatus") === "O", 1L).otherwise(0L).as("g2"))
          .groupBy("bin").agg(sum("g1").as("n1"), sum("g2").as("n2"))
        val tot = b.agg(sum("n1").as("t1"), sum("n2").as("t2"))
        val p = col("n1").cast("double") / col("t1").cast("double")
        val q = col("n2").cast("double") / col("t2").cast("double")
        b.crossJoin(broadcast(tot)) // scalar-join idiom: 1-row broadcast
          .filter(col("n1") > 0 && col("n2") > 0)
          .select(graft.Det.val6((p - q) * log(p / q)).as("term"))
          .agg(count(lit(1)).as("n_bins"),
            graft.Det.emit(sum(col("term")), 6).as("psi"))
      },
      Some("""
        WITH s AS (
          SELECT LEAST(19, CAST(FLOOR(o_totalprice / 25000) AS BIGINT)) AS bin,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g1,
                 CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS g2
          FROM orders WHERE o_orderstatus IN ('F', 'O')),
        b AS (SELECT bin, CAST(SUM(g1) AS BIGINT) AS n1,
                     CAST(SUM(g2) AS BIGINT) AS n2 FROM s GROUP BY bin),
        t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2 FROM b)
        SELECT COUNT(*) AS n_bins,
               CAST(CAST(SUM(CAST(
                 (CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                  - CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE))
                 * ln((CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                      / (CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)))
                 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS psi
        FROM b, t
        WHERE n1 > 0 AND n2 > 0""".trim)),

    // Pearson correlation matrix (r9): pairwise r over the lineitem
    // pricing columns (quantity, discount, tax) — the feature-redundancy
    // screen a training pipeline runs before model fitting ("are these
    // columns measuring the same thing?"). Built-in corr() is an
    // order-dependent float fold, so it can never hash-match an oracle;
    // instead each pair's five moments (Σx Σy Σxy Σx² Σy²) are EXACT
    // decimal sums (2dp inputs ⇒ 4dp products, lossless in DECIMAL(18,4)
    // up to ~10¹¹ — centuries of headroom over sf1), and r is one fixed
    // IEEE tree over those exact moments, coarsened through DECIMAL(18,6)
    // (Det.emit policy) to be ulp-proof. stack() unpivots the 3 pairs in
    // ONE scan (row fanout 3×, absorbed by map-side partial agg); the
    // shuffle carries 3 moment rows total. At 100 TB this is the shape
    // that wins: one pass, |pairs| aggregate rows, no per-pair re-scan.
    graft.Q("stats_corr_matrix",
      (spark, sfDir) => {
        import graft.Det._
        val pairs = Tables.lineitem(spark, sfDir)
          .select(money(col("l_quantity")).as("qm"),
            money(col("l_discount")).as("dm"), money(col("l_tax")).as("tm"))
          .selectExpr("""stack(3,
              'disc_tax', dm, tm,
              'qty_disc', qm, dm,
              'qty_tax',  qm, tm) AS (pair, x, y)""")
        val m = pairs.groupBy("pair").agg(
          count(lit(1)).as("n"),
          emit(sum(col("x")), 2).as("sx"), emit(sum(col("y")), 2).as("sy"),
          emit(sum(col("x") * col("y")), 4).as("sxy"),
          emit(sum(col("x") * col("x")), 4).as("sxx"),
          emit(sum(col("y") * col("y")), 4).as("syy"))
        val nd = col("n").cast("double")
        val vx = nd * col("sxx") - col("sx") * col("sx")
        val vy = nd * col("syy") - col("sy") * col("sy")
        m.select(col("pair"), col("n"),
            when(vx > 0 && vy > 0,
              emit((nd * col("sxy") - col("sx") * col("sy")) / sqrt(vx * vy), 6))
              .as("r"))
          .orderBy("pair")
      },
      Some(s"""
        WITH b AS (
          SELECT ${graft.Det.sqlMoney("l_quantity")} AS qm,
                 ${graft.Det.sqlMoney("l_discount")} AS dm,
                 ${graft.Det.sqlMoney("l_tax")} AS tm
          FROM lineitem),
        p AS (
          SELECT 'disc_tax' AS pair, dm AS x, tm AS y FROM b
          UNION ALL SELECT 'qty_disc', qm, dm FROM b
          UNION ALL SELECT 'qty_tax', qm, tm FROM b),
        a AS (
          SELECT pair, COUNT(*) AS n,
                 ${graft.Det.sqlEmit("SUM(x)", 2)} AS sx,
                 ${graft.Det.sqlEmit("SUM(y)", 2)} AS sy,
                 ${graft.Det.sqlEmit("SUM(x * y)", 4)} AS sxy,
                 ${graft.Det.sqlEmit("SUM(x * x)", 4)} AS sxx,
                 ${graft.Det.sqlEmit("SUM(y * y)", 4)} AS syy
          FROM p GROUP BY pair)
        SELECT pair, n,
          CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
                AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
            THEN ${graft.Det.sqlEmit(
              """(CAST(n AS DOUBLE) * sxy - sx * sy) / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))""",
              6)}
          END AS r
        FROM a
        ORDER BY pair""".trim)),

    // Decile lift table (r9): per event_type, rank rows into value
    // deciles (ntile(10) over a TOTAL order — value with event_id
    // tiebreak, so the k-boundary is deterministic and both engines
    // agree) and emit each decile's population and exact value mass —
    // the calibration/lift table every scoring model ships with ("is the
    // top decile actually carrying the value?"). The window partitions
    // by event_type, so the exchange is the same hashpartitioning any
    // per-segment analysis pays; output is |types|×10 rows. At 100 TB a
    // GLOBAL decile assignment would instead reuse stats_ks_test's
    // binned-ECDF pattern (bin counts → cumulative → boundary lookup) —
    // the per-segment form here is the one that stays a partitioned
    // window.
    graft.Q("stats_decile_lift",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        Tables.events(spark, sfDir)
          .select(col("event_type"), col("event_id"),
            graft.Det.val6(col("value")).as("v6"),
            ntile(10).over(w).as("decile"))
          .groupBy(col("event_type"), col("decile"))
          .agg(count(lit(1)).as("n"),
            graft.Det.emit(sum(col("v6")), 6).as("sum_val"),
            min(col("v6")).cast("double").as("min_val"),
            max(col("v6")).cast("double").as("max_val"))
          .orderBy(col("event_type"), col("decile"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v6,
                 CAST(ntile(10) OVER (PARTITION BY event_type
                   ORDER BY value, event_id) AS INT) AS decile
          FROM events)
        SELECT event_type, decile, COUNT(*) AS n,
               CAST(CAST(SUM(v6) AS DECIMAL(18,6)) AS DOUBLE) AS sum_val,
               CAST(MIN(v6) AS DOUBLE) AS min_val,
               CAST(MAX(v6) AS DOUBLE) AS max_val
        FROM d
        GROUP BY event_type, decile
        ORDER BY event_type, decile""".trim)),

    // Welch two-sample t-test (r9): for each event_type, test its value
    // distribution against the complement (all other types) — the A/B
    // readout every experimentation pipeline computes. Determinism policy
    // is stats_corr_matrix's: values round to exact 2dp decimals, one
    // grouped aggregate produces exact per-group moments (n, Σx, Σx²),
    // the GLOBAL moments are the decimal sum of the group moments (one
    // extra tiny agg, no second scan of the fact table), and complement
    // moments are exact decimal subtraction global−group. Only then does
    // arithmetic go to double, with the same IEEE expression tree as the
    // oracle, so t and df match bit-for-bit before the stabilizing
    // round. One scan + one 5-row broadcast join — at 100 TB the scan
    // dominates and the moment algebra is free.
    graft.Q("stats_ttest",
      (spark, sfDir) => {
        import graft.Det._
        val g = Tables.events(spark, sfDir)
          .select(col("event_type"), money(col("value")).as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sxd"),
            sum(col("x") * col("x")).as("sxxd"))
        val tot = g.agg(sum(col("n")).as("tn"), sum(col("sxd")).as("tsx"),
          sum(col("sxxd")).as("tsxx"))
        val j = g.crossJoin(broadcast(tot)).select(
          col("event_type"), col("n"),
          (col("tn") - col("n")).as("n2"),
          emit(col("sxd"), 2).as("sx1"), emit(col("sxxd"), 4).as("sxx1"),
          emit(col("tsx") - col("sxd"), 2).as("sx2"),
          emit(col("tsxx") - col("sxxd"), 4).as("sxx2"))
        val (n1d, n2d) = (col("n").cast("double"), col("n2").cast("double"))
        val m1 = col("sx1") / n1d
        val m2 = col("sx2") / n2d
        val v1 = (col("sxx1") - col("sx1") * col("sx1") / n1d) / (n1d - lit(1.0))
        val v2 = (col("sxx2") - col("sx2") * col("sx2") / n2d) / (n2d - lit(1.0))
        val se2 = v1 / n1d + v2 / n2d
        val df = se2 * se2 /
          ((v1 / n1d) * (v1 / n1d) / (n1d - lit(1.0)) +
            (v2 / n2d) * (v2 / n2d) / (n2d - lit(1.0)))
        j.select(col("event_type"), col("n"), col("n2"),
            round(m1, 6).as("mean_grp"), round(m2, 6).as("mean_rest"),
            round((m1 - m2) / sqrt(se2), 6).as("t_stat"),
            round(df, 4).as("df"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH g AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(${graft.Det.sqlMoney("value")}) AS sxd,
                 SUM(${graft.Det.sqlMoney("value")} * ${graft.Det.sqlMoney("value")}) AS sxxd
          FROM events GROUP BY event_type),
        t AS (
          SELECT SUM(n) AS tn, SUM(sxd) AS tsx, SUM(sxxd) AS tsxx FROM g),
        j AS (
          SELECT event_type, n, CAST(t.tn - n AS BIGINT) AS n2,
                 ${graft.Det.sqlEmit("sxd", 2)} AS sx1,
                 ${graft.Det.sqlEmit("sxxd", 4)} AS sxx1,
                 ${graft.Det.sqlEmit("t.tsx - sxd", 2)} AS sx2,
                 ${graft.Det.sqlEmit("t.tsxx - sxxd", 4)} AS sxx2
          FROM g CROSS JOIN t),
        d AS (
          SELECT event_type, n, n2,
                 sx1 / CAST(n AS DOUBLE) AS m1,
                 sx2 / CAST(n2 AS DOUBLE) AS m2,
                 (sxx1 - sx1 * sx1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v1,
                 (sxx2 - sx2 * sx2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2
          FROM j)
        SELECT event_type, n, n2,
               round(m1, 6) AS mean_grp, round(m2, 6) AS mean_rest,
               round((m1 - m2) / sqrt(v1 / CAST(n AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)), 6) AS t_stat,
               round((v1 / CAST(n AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) * (v1 / CAST(n AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) /
                     ((v1 / CAST(n AS DOUBLE)) * (v1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) +
                      (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)), 4) AS df
        FROM d
        ORDER BY event_type""".trim)),

    // Per-group OLS (r9): regress l_discount on l_quantity within each
    // returnflag — slope, intercept, and R² from the same exact-decimal
    // moment pattern as stats_corr_matrix (2dp inputs → exact Σx Σy Σxy
    // Σx² Σy² in one grouped aggregate; double arithmetic only on the
    // emitted moments, mirrored verbatim in the oracle). Spark has
    // regr_slope/regr_intercept built in, but their double partial
    // aggregation is merge-order-dependent — the moment form is the one
    // that stays deterministic across AQE re-plans and at any partition
    // count, which is the property the whole oracle gate rests on.
    graft.Q("stats_linreg",
      (spark, sfDir) => {
        import graft.Det._
        val m = Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), money(col("l_quantity")).as("x"),
            money(col("l_discount")).as("y"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            emit(sum(col("x")), 2).as("sx"), emit(sum(col("y")), 2).as("sy"),
            emit(sum(col("x") * col("y")), 4).as("sxy"),
            emit(sum(col("x") * col("x")), 4).as("sxx"),
            emit(sum(col("y") * col("y")), 4).as("syy"))
        val nd = col("n").cast("double")
        val cov = nd * col("sxy") - col("sx") * col("sy")
        val vx = nd * col("sxx") - col("sx") * col("sx")
        val vy = nd * col("syy") - col("sy") * col("sy")
        val slope = cov / vx
        m.select(col("l_returnflag"), col("n"),
            when(vx > 0, round(slope, 6)).as("slope"),
            when(vx > 0,
              round((col("sy") - slope * col("sx")) / nd, 6)).as("intercept"),
            when(vx > 0 && vy > 0, round(cov * cov / (vx * vy), 6)).as("r2"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH b AS (
          SELECT l_returnflag, ${graft.Det.sqlMoney("l_quantity")} AS x,
                 ${graft.Det.sqlMoney("l_discount")} AS y
          FROM lineitem),
        a AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 ${graft.Det.sqlEmit("SUM(x)", 2)} AS sx,
                 ${graft.Det.sqlEmit("SUM(y)", 2)} AS sy,
                 ${graft.Det.sqlEmit("SUM(x * y)", 4)} AS sxy,
                 ${graft.Det.sqlEmit("SUM(x * x)", 4)} AS sxx,
                 ${graft.Det.sqlEmit("SUM(y * y)", 4)} AS syy
          FROM b GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
            THEN round((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) END AS slope,
          CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
            THEN round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx) / CAST(n AS DOUBLE), 6) END AS intercept,
          CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
                AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
            THEN round((CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy) /
                       ((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) END AS r2
        FROM a
        ORDER BY l_returnflag""".trim)),

    // Mann–Whitney U (r9): the nonparametric twin of stats_ttest — click
    // vs purchase values, rank-sum with textbook AVERAGE ranks for ties
    // and the tie-corrected normal approximation. The whole computation
    // is INTEGER-exact until the final z: group by distinct value (2dp
    // decimal), a cumulative window over the ~|distinct| grouped rows
    // gives each value's doubled average rank 2·cum+t+1 (doubling keeps
    // the ½ fractions integral), so 2·R₁, 2·U₁, and Σ(t³−t) are exact
    // int64 in any partitioning; z is one fixed IEEE tree over them.
    // The global window runs over the ~30k GROUPED rows, not the sample
    // — at 100 TB this becomes stats_ks_test's binned-ECDF shape (bin →
    // cumulative → rank), same algebra, bounded cardinality.
    graft.Q("stats_mann_whitney",
      (spark, sfDir) => {
        import graft.Det._
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(spark, sfDir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(money(col("value")).as("x"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("is_a"))
        val byVal = ev.groupBy("x")
          .agg(count(lit(1)).as("t"), sum(col("is_a")).as("t1"))
        val w = Window.orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1)
        val agg = byVal
          .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
          .agg(sum(col("t1")).as("n1"), sum(col("t") - col("t1")).as("n2"),
            sum(col("t1") * (lit(2L) * col("cum") + col("t") + lit(1L)))
              .as("r1x2"),
            sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
        val (n1d, n2d) = (col("n1").cast("double"), col("n2").cast("double"))
        val nd = n1d + n2d
        val u1 = (col("r1x2") - col("n1") * (col("n1") + lit(1L)))
          .cast("double") / lit(2.0)
        val mu = n1d * n2d / lit(2.0)
        val v = n1d * n2d / lit(12.0) *
          ((nd + lit(1.0)) - col("tie3").cast("double") / (nd * (nd - lit(1.0))))
        agg.select(col("n1"), col("n2"), u1.as("u1"),
          round((u1 - mu) / sqrt(v), 6).as("z"))
      },
      Some("""
        WITH ev AS (
          SELECT CAST(value AS DECIMAL(12,2)) AS x,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
          FROM events WHERE event_type IN ('click', 'purchase')),
        v AS (
          SELECT x, COUNT(*) AS t, SUM(is_a) AS t1
          FROM ev GROUP BY x),
        c AS (
          SELECT t, t1, COALESCE(SUM(t) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          FROM v),
        a AS (
          SELECT CAST(SUM(t1) AS BIGINT) AS n1,
                 CAST(SUM(t - t1) AS BIGINT) AS n2,
                 CAST(SUM(t1 * (2 * cum + t + 1)) AS BIGINT) AS r1x2,
                 CAST(SUM(t * t * t - t) AS BIGINT) AS tie3
          FROM c)
        SELECT n1, n2,
          CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
          round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
                  ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                   - CAST(tie3 AS DOUBLE) /
                     ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
                      (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))), 6) AS z
        FROM a""".trim)),

    // One-way ANOVA (r10): does mean spend differ across the k=5 event
    // ROC AUC (r11): per order priority, how well does o_totalprice rank
    // finished ('F') orders above the rest — THE standard ranking-quality
    // readout for any scoring model. Tie-corrected rank formulation
    // (AUC = (R1 − n1(n1+1)/2)/(n1·n0) with average ranks on ties),
    // sharing stats_mann_whitney's machinery: group by (priority, exact
    // 2dp score) so tie blocks are well-defined cross-engine, one
    // cumulative window per priority over the VALUE-DISTINCT table (output
    // -bounded, not row-bounded — at 100 TB the window sees |distinct
    // scores| rows, the fact scan + tiny shuffle dominate), and all rank
    // sums stay in doubled-integer arithmetic (2·R1) so exactly ONE IEEE
    // division produces the statistic.
    graft.Q("stats_auc",
      (spark, sfDir) => {
        import graft.Det._
        import org.apache.spark.sql.expressions.Window
        val base = Tables.orders(spark, sfDir)
          .select(col("o_orderpriority").as("prio"),
            money(col("o_totalprice")).as("x"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
        val byVal = base.groupBy("prio", "x")
          .agg(count(lit(1)).as("t"), sum(col("pos")).as("t1"))
        val w = Window.partitionBy("prio").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1)
        byVal
          .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
          .groupBy("prio")
          .agg(sum(col("t1")).as("n_pos"), sum(col("t") - col("t1")).as("n_neg"),
            sum(col("t1") * (lit(2L) * col("cum") + col("t") + lit(1L)))
              .as("r1x2"))
          .select(col("prio").as("o_orderpriority"), col("n_pos"), col("n_neg"),
            round((col("r1x2") - col("n_pos") * (col("n_pos") + lit(1L)))
              .cast("double") /
              (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
              6).as("auc"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderpriority AS prio,
                 CAST(o_totalprice AS DECIMAL(12,2)) AS x,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
          FROM orders),
        v AS (
          SELECT prio, x, COUNT(*) AS t, SUM(pos) AS t1
          FROM base GROUP BY prio, x),
        c AS (
          SELECT prio, t, t1, COALESCE(SUM(t) OVER (PARTITION BY prio
            ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS cum
          FROM v),
        a AS (
          SELECT prio,
                 CAST(SUM(t1) AS BIGINT) AS n_pos,
                 CAST(SUM(t - t1) AS BIGINT) AS n_neg,
                 CAST(SUM(t1 * (2 * cum + t + 1)) AS BIGINT) AS r1x2
          FROM c GROUP BY prio)
        SELECT prio AS o_orderpriority, n_pos, n_neg,
          round(CAST(r1x2 - n_pos * (n_pos + 1) AS DOUBLE)
                / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
                6) AS auc
        FROM a
        ORDER BY o_orderpriority""".trim)),

    // Calibration / reliability curve (r11): bin a [0,1] confidence score
    // into deciles and compare mean predicted confidence against observed
    // positive rate per bin — the companion readout to stats_auc (AUC
    // measures ranking; calibration measures whether the score MEANS a
    // probability). Score = min-max-normalized price from a 1-row
    // broadcast min/max agg (NOT a global percent_rank window — the
    // unpartitioned-window trap at 100 TB); exact-decimal subtraction
    // feeds one IEEE division per row, the per-row confidence is
    // quantized to DECIMAL(18,6) BEFORE the cross-row sum (Det.val6
    // argument: order-independent exact aggregation), and each output
    // cell does at most one final division. Two scans of orders (one for
    // min/max, one for rows) or one with a cheap reuse — at 100 TB the
    // row scan dominates and the 1-row extreme agg is free.
    graft.Q("stats_calibration",
      (spark, sfDir) => {
        import graft.Det._
        val o = Tables.orders(spark, sfDir)
        val mm = o.agg(min(money(col("o_totalprice"))).as("mn"),
          max(money(col("o_totalprice"))).as("mx"))
        o.select(money(col("o_totalprice")).as("x"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
          .crossJoin(broadcast(mm))
          .withColumn("p", (col("x") - col("mn")).cast("double") /
            (col("mx") - col("mn")).cast("double"))
          .withColumn("conf6", val6(col("p")))
          .withColumn("bin", least(floor(col("p") * lit(10.0)), lit(9L)))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
            sum(col("conf6")).as("sc"))
          .select(col("bin"), col("n"), col("n_pos"),
            round(col("n_pos").cast("double") / col("n").cast("double"), 6)
              .as("pos_rate"),
            round(col("sc").cast("double") / col("n").cast("double"), 6)
              .as("avg_conf"))
          .orderBy(col("bin"))
      },
      Some("""
        WITH mm AS (
          SELECT MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS mn,
                 MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS mx
          FROM orders),
        base AS (
          SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS x,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
          FROM orders),
        scored AS (
          SELECT pos,
            CAST(x - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE) AS p
          FROM base, mm),
        q AS (
          SELECT pos, CAST(p AS DECIMAL(18,6)) AS conf6,
            CAST(LEAST(floor(p * 10.0), 9) AS BIGINT) AS bin
          FROM scored)
        SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
          round(CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
            AS pos_rate,
          round(CAST(SUM(conf6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
            AS avg_conf
        FROM q
        GROUP BY bin
        ORDER BY bin""".trim)),

    // types? The k-group generalization of stats_ttest, same single-scan
    // moment algebra: per-group (n, Σx, Σx²) in exact decimal, then
    // SSB = Σ_g sx_g²/n_g − (Σx)²/N and SSW = Σx² − Σ_g sx_g²/n_g.
    // The one cross-group sum of inexact terms (sx_g²/n_g, a division)
    // is quantized to DECIMAL(18,6) per group BEFORE summing, so the
    // cross-group aggregation is exact and order-independent — the same
    // argument Det.sumVal6 makes for row-level doubles, applied at the
    // group level. One scan + a 5-row final agg: at 100 TB the scan is
    // the whole cost and F-statistics over any grouping are free.
    graft.Q("stats_anova",
      (spark, sfDir) => {
        import graft.Det._
        val g = Tables.events(spark, sfDir)
          .select(col("event_type"), money(col("value")).as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sxd"),
            sum(col("x") * col("x")).as("sxxd"))
          .select(col("n"), col("sxd"), col("sxxd"),
            (emit(col("sxd"), 2) * emit(col("sxd"), 2) /
              col("n").cast("double")).cast(Val6).as("b6"))
        val a = g.agg(count(lit(1)).as("k"), sum(col("n")).as("n_total"),
          sum(col("sxd")).as("tsx"), sum(col("sxxd")).as("tsxx"),
          sum(col("b6")).as("sb"))
        val (nd, kd) = (col("n_total").cast("double"), col("k").cast("double"))
        val ssb = emit(col("sb"), 6) - emit(col("tsx"), 2) * emit(col("tsx"), 2) / nd
        val ssw = emit(col("tsxx"), 4) - emit(col("sb"), 6)
        a.select(col("k"), col("n_total"),
          round(ssb, 4).as("ss_between"), round(ssw, 4).as("ss_within"),
          round((ssb / (kd - lit(1.0))) / (ssw / (nd - kd)), 6).as("f_stat"))
      },
      Some(s"""
        WITH g AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(${graft.Det.sqlMoney("value")}) AS sxd,
                 SUM(${graft.Det.sqlMoney("value")} * ${graft.Det.sqlMoney("value")}) AS sxxd,
                 CAST(${graft.Det.sqlEmit("SUM(CAST(value AS DECIMAL(12,2)))", 2)}
                      * ${graft.Det.sqlEmit("SUM(CAST(value AS DECIMAL(12,2)))", 2)}
                      / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS b6
          FROM events GROUP BY event_type),
        a AS (
          SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS n_total,
                 SUM(sxd) AS tsx, SUM(sxxd) AS tsxx, SUM(b6) AS sb
          FROM g)
        SELECT k, n_total,
          round(${graft.Det.sqlEmit("sb", 6)}
                - ${graft.Det.sqlEmit("tsx", 2)} * ${graft.Det.sqlEmit("tsx", 2)}
                  / CAST(n_total AS DOUBLE), 4) AS ss_between,
          round(${graft.Det.sqlEmit("tsxx", 4)} - ${graft.Det.sqlEmit("sb", 6)}, 4) AS ss_within,
          round(((${graft.Det.sqlEmit("sb", 6)}
                  - ${graft.Det.sqlEmit("tsx", 2)} * ${graft.Det.sqlEmit("tsx", 2)}
                    / CAST(n_total AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
                / ((${graft.Det.sqlEmit("tsxx", 4)} - ${graft.Det.sqlEmit("sb", 6)})
                   / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat
        FROM a""".trim)),

    // Gini coefficient (r10): order-value inequality per order priority —
    // the concentration metric revenue/treasury dashboards and
    // training-data token-budget audits both use. Exact rank formula
    // G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending xᵢ: row_number per
    // group gives i, and Σ i·x stays in exact decimal (bigint × 2dp), so
    // the only doubles are the two final divisions. Tied x values make
    // rank assignment among ties arbitrary but Σ i·x invariant (equal x
    // absorb any rank permutation), so the key is hash-deterministic.
    // Scale: one shuffle on the group key + an in-partition sort —
    // exactly a window aggregate's cost; no driver materialization.
    graft.Q("stats_gini",
      (spark, sfDir) => {
        import graft.Det._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p")).orderBy(col("x"))
        val b = Tables.orders(spark, sfDir)
          .select(col("o_orderpriority").as("p"),
            money(col("o_totalprice")).as("x"))
          .withColumn("rn", row_number().over(w))
        val g = b.groupBy(col("p"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("rn") * col("x")).as("srx"))
        val nd = col("n").cast("double")
        // srx = Σ i·xᵢ grows O(n²·x̄): 10^16 already at sf1 (the r13 full
        // gate caught the narrow emit overflowing under ANSI) — wide emit
        g.select(col("p"), col("n"), emit(col("sx"), 2).as("total"),
            round(lit(2.0) * emitWide(col("srx"), 2) / (nd * emit(col("sx"), 2))
              - (nd + lit(1.0)) / nd, 6).as("gini"))
          .orderBy(col("p"))
      },
      Some(s"""
        WITH b AS (
          SELECT o_orderpriority AS p, ${graft.Det.sqlMoney("o_totalprice")} AS x,
                 row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY ${graft.Det.sqlMoney("o_totalprice")}) AS rn
          FROM orders),
        g AS (
          SELECT p, COUNT(*) AS n, SUM(x) AS sx, SUM(rn * x) AS srx
          FROM b GROUP BY p)
        SELECT p, n, ${graft.Det.sqlEmit("sx", 2)} AS total,
          round(2.0 * ${graft.Det.sqlEmitWide("srx", 2)}
                  / (CAST(n AS DOUBLE) * ${graft.Det.sqlEmit("sx", 2)})
                - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
        FROM g
        ORDER BY p""".trim)),

    // Robust outlier detection via MAD (r10): per event type, flag values
    // beyond 3σ-equivalent of the Median Absolute Deviation (3·1.4826 =
    // 4.4478·MAD) — the outlier rule that, unlike z-scores, a few extreme
    // rows can't drag. Inherently two-pass (MAD is a median OF deviations
    // from a median): pass 1 computes per-group medians, pass 2 joins the
    // 5-row median table back (broadcast — no second shuffle of the fact
    // side) and aggregates deviations. Inputs quantize to 2dp doubles so
    // x − med and the interpolated medians are bit-identical across
    // engines; the count compares unrounded doubles both engines derive
    // from the same exact inputs. Exact per-group median sorts within the
    // group at 100 TB — the audit-path cost; the daily path swaps in
    // approx_percentile (agg_approx_quantile's sketch) unchanged.
    graft.Q("stats_outlier_mad",
      (spark, sfDir) => {
        import graft.Det._
        val b = Tables.events(spark, sfDir)
          .select(col("event_type"), emit(money(col("value")), 2).as("x"))
        val med = b.groupBy("event_type").agg(median(col("x")).as("med"))
        val withDev = b.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("x") - col("med")))
        val madT = withDev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), min(col("med")).as("med"),
            median(col("dev")).as("mad"))
        withDev.join(broadcast(madT.select(col("event_type"),
            col("mad").as("mad_j"))), "event_type")
          .groupBy("event_type")
          .agg(sum(when(col("dev") > lit(4.4478) * col("mad_j"), 1L)
            .otherwise(0L)).as("n_outliers"))
          .join(madT, "event_type")
          .select(col("event_type"), col("n"), round(col("med"), 4).as("med"),
            round(col("mad"), 4).as("mad"), col("n_outliers"))
          .orderBy("event_type")
      },
      Some("""
        WITH b AS (
          SELECT event_type,
                 CAST(CAST(CAST(value AS DECIMAL(12,2)) AS DECIMAL(18,2)) AS DOUBLE) AS x
          FROM events),
        m AS (
          SELECT event_type, median(x) AS med FROM b GROUP BY event_type),
        d AS (
          SELECT b.event_type, abs(b.x - m.med) AS dev, m.med
          FROM b JOIN m USING (event_type)),
        a AS (
          SELECT event_type, COUNT(*) AS n, MIN(med) AS med,
                 median(dev) AS mad
          FROM d GROUP BY event_type)
        SELECT d.event_type, a.n, round(a.med, 4) AS med,
               round(a.mad, 4) AS mad,
               CAST(SUM(CASE WHEN d.dev > 4.4478 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers
        FROM d JOIN a USING (event_type)
        GROUP BY d.event_type, a.n, a.med, a.mad
        ORDER BY d.event_type""".trim)),

    // Benford's-law conformance (r10): leading-digit distribution of
    // order totals vs log10(1+1/d) — the classic fabricated-data /
    // fat-finger detector for financial columns. The leading digit comes
    // from the DECIMAL's STRING form (both engines render DECIMAL(12,2)
    // canonically), never from log10 arithmetic — no libm in the digit
    // path. Expected shares are nine hardcoded literals; the χ² statistic
    // is Σ(obs−exp)²/exp over exact counts with one shared IEEE tree.
    // One scan + a 9-row aggregate: free at any scale.
    graft.Q("stats_benford",
      (spark, sfDir) => {
        import graft.Det._
        val exp = Seq(0.301029995663981, 0.176091259055681, 0.124938736608300,
          0.096910013008056, 0.079181246047625, 0.066946789630613,
          0.057991946977687, 0.051152522447381, 0.045757490560675)
        val expCol = expr(
          "CASE d " + exp.zipWithIndex.init
            .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}D" }.mkString(" ") +
            s" ELSE ${exp.last}D END")
        val digits = Tables.orders(spark, sfDir)
          .select(substring(money(col("o_totalprice")).cast("string"), 1, 1)
            .cast("int").as("d"))
          .filter(col("d").between(1, 9))
          .groupBy(col("d")).agg(count(lit(1)).as("n"))
        val tot = digits.withColumn("total",
          sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
        tot.select(col("d"), col("n"),
            round(col("n").cast("double") / col("total").cast("double"), 6)
              .as("share"),
            round(expCol, 6).as("benford"),
            round(
              (col("n").cast("double") - expCol * col("total").cast("double"))
                * (col("n").cast("double") - expCol * col("total").cast("double"))
                / (expCol * col("total").cast("double")), 4).as("chi2_term"))
          .orderBy(col("d"))
      },
      Some("""
        WITH b AS (
          SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1)
                 AS INT) AS d
          FROM orders),
        c AS (
          SELECT d, COUNT(*) AS n FROM b WHERE d BETWEEN 1 AND 9 GROUP BY d),
        t AS (
          SELECT d, n, SUM(n) OVER () AS total,
            CASE d WHEN 1 THEN 0.301029995663981 WHEN 2 THEN 0.176091259055681
                   WHEN 3 THEN 0.124938736608300 WHEN 4 THEN 0.096910013008056
                   WHEN 5 THEN 0.079181246047625 WHEN 6 THEN 0.066946789630613
                   WHEN 7 THEN 0.057991946977687 WHEN 8 THEN 0.051152522447381
                   ELSE 0.045757490560675 END AS exp_p
          FROM c)
        SELECT d, n,
          round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
          round(exp_p, 6) AS benford,
          round((CAST(n AS DOUBLE) - exp_p * CAST(total AS DOUBLE))
                * (CAST(n AS DOUBLE) - exp_p * CAST(total AS DOUBLE))
                / (exp_p * CAST(total AS DOUBLE)), 4) AS chi2_term
        FROM t
        ORDER BY d""".trim)),

    // Wilson 95% interval on the daily purchase share (r10): purchases
    // as a fraction of ALL events that day (a true nested proportion —
    // x ≤ n by construction) with the score interval: the uncertainty
    // band a conversion dashboard should draw instead of a bare ratio
    // (Wilson stays sane at small n and p near 0/1, unlike the Wald
    // ±z√(p(1−p)/n)). Counts are exact bigints from one grouped
    // aggregate; z = 1.96 is a literal; the interval arithmetic is one
    // IEEE tree written identically in both engines, stabilized at 6dp.
    // One scan + one (day) aggregate — free at scale.
    graft.Q("stats_wilson_ci",
      (spark, sfDir) => {
        val g = Tables.events(spark, sfDir)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n_events"),
            count(when(col("event_type") === "purchase", lit(1))).as("n_purch"))
        val n = col("n_events").cast("double")
        val p = col("n_purch").cast("double") / n
        val z2 = lit(3.8416) // 1.96²
        val denom = lit(1.0) + z2 / n
        val center = (p + z2 / (lit(2.0) * n)) / denom
        val half = (lit(1.96) * sqrt(p * (lit(1.0) - p) / n +
          z2 / (lit(4.0) * n * n))) / denom
        g.select(col("d"), col("n_events"), col("n_purch"),
            round(p, 6).as("rate"),
            round(center - half, 6).as("wilson_lo"),
            round(center + half, 6).as("wilson_hi"))
          .orderBy(col("d"))
      },
      Some("""
        WITH g AS (
          SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events,
                 COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purch
          FROM events GROUP BY 1),
        c AS (
          SELECT d, n_events, n_purch,
                 CAST(n_events AS DOUBLE) AS n,
                 CAST(n_purch AS DOUBLE) / CAST(n_events AS DOUBLE) AS p
          FROM g)
        SELECT d, n_events, n_purch,
          round(p, 6) AS rate,
          round((p + 3.8416 / (2.0 * n)) / (1.0 + 3.8416 / n)
                - (1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n)))
                  / (1.0 + 3.8416 / n), 6) AS wilson_lo,
          round((p + 3.8416 / (2.0 * n)) / (1.0 + 3.8416 / n)
                + (1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n)))
                  / (1.0 + 3.8416 / n), 6) AS wilson_hi
        FROM c
        ORDER BY d""".trim)),

    // Paired t-test (r10): each user is their own control — per-user mean
    // purchase value minus mean view value, then a one-sample t on the
    // differences over users having both. The within-subject design the
    // Welch test (stats_ttest) can't express: between-user variance
    // cancels, so the same effect needs far fewer subjects. Per-user
    // means are exact-decimal sums with ONE division each, quantized to
    // DECIMAL(18,6) so the cross-user moment sums stay exact and
    // order-independent (the stats_anova group-level argument); t and
    // the final moments go through one shared IEEE tree.
    graft.Q("stats_ttest_paired",
      (spark, sfDir) => {
        import graft.Det._
        val perUser = Tables.events(spark, sfDir)
          .filter(col("event_type").isin("view", "purchase"))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "purchase", money(col("value"))))
              .as("ps"),
            count(when(col("event_type") === "purchase", lit(1))).as("pn"),
            sum(when(col("event_type") === "view", money(col("value"))))
              .as("vs"),
            count(when(col("event_type") === "view", lit(1))).as("vn"))
          .filter(col("pn") > 0 && col("vn") > 0)
          .select(((emit(col("ps"), 2) / col("pn").cast("double")) -
            (emit(col("vs"), 2) / col("vn").cast("double")))
            .cast(Val6).as("d6"))
        val a = perUser.agg(count(lit(1)).as("n_users"),
          sum(col("d6")).as("sd"), sum(col("d6") * col("d6")).as("sdd"))
        val nd = col("n_users").cast("double")
        val mean = emit(col("sd"), 6) / nd
        val varS = (emit(col("sdd"), 6) - emit(col("sd"), 6) * emit(col("sd"), 6) / nd) /
          (nd - lit(1.0))
        a.select(col("n_users"), round(mean, 6).as("mean_diff"),
          round(mean / sqrt(varS / nd), 6).as("t_stat"))
      },
      Some(s"""
        WITH u AS (
          SELECT user_id,
                 SUM(CASE WHEN event_type = 'purchase'
                     THEN ${graft.Det.sqlMoney("value")} END) AS ps,
                 COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS pn,
                 SUM(CASE WHEN event_type = 'view'
                     THEN ${graft.Det.sqlMoney("value")} END) AS vs,
                 COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS vn
          FROM events
          WHERE event_type IN ('view', 'purchase')
          GROUP BY user_id),
        d AS (
          SELECT CAST(${graft.Det.sqlEmit("ps", 2)} / CAST(pn AS DOUBLE)
                      - ${graft.Det.sqlEmit("vs", 2)} / CAST(vn AS DOUBLE)
                      AS DECIMAL(18,6)) AS d6
          FROM u WHERE pn > 0 AND vn > 0),
        a AS (
          SELECT COUNT(*) AS n_users, SUM(d6) AS sd, SUM(d6 * d6) AS sdd
          FROM d)
        SELECT n_users,
          round(${graft.Det.sqlEmit("sd", 6)} / CAST(n_users AS DOUBLE), 6)
            AS mean_diff,
          round((${graft.Det.sqlEmit("sd", 6)} / CAST(n_users AS DOUBLE))
                / sqrt(((${graft.Det.sqlEmit("sdd", 6)}
                         - ${graft.Det.sqlEmit("sd", 6)} * ${graft.Det.sqlEmit("sd", 6)}
                           / CAST(n_users AS DOUBLE))
                        / (CAST(n_users AS DOUBLE) - 1.0))
                       / CAST(n_users AS DOUBLE)), 6) AS t_stat
        FROM a""".trim)),

    // Data-quality constraint suite (r11): the Deequ/Great-Expectations
    // shape — a declarative check set evaluated in ONE pass, emitting a
    // per-check report (metric, violation count, pass). Checks over
    // orders: key completeness, key uniqueness, a DELIBERATELY-failing
    // uniqueness expectation on o_custkey (customers order repeatedly —
    // the report must surface red rows, not only confirm green ones),
    // referential integrity into customer, a positivity range check, and
    // an accepted-values domain check. Plan shape: one hash-less single
    // aggregate over orders computes five checks map-side (the multi-
    // distinct pair plans as one Expand), and the FK check is a broadcast
    // anti-join count — at 100 TB the suite costs one scan of the fact
    // table plus a broadcast of the dimension keys, which is why DQ runs
    // piggyback ingest rather than being feared as extra jobs. Metrics are
    // integer parts-per-million (floor division) — the Det policy: no
    // float ratio whose last-ulp rounding could differ across engines.
    graft.Q("stats_dq_checks",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir)
        val c = Tables.customer(spark, sfDir)
        val base = o.agg(
          count(lit(1)).as("n"),
          count(col("o_orderkey")).as("nn_key"),
          countDistinct(col("o_orderkey")).as("nd_key"),
          countDistinct(col("o_custkey")).as("nd_cust"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("bad_price"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("bad_status"))
        val orphans = o
          .join(broadcast(c.select(col("c_custkey").as("o_custkey"))),
            Seq("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("orphans"))
        base.crossJoin(orphans)
          .selectExpr("""stack(6,
            'completeness_o_orderkey', (nn_key * 1000000) div n, n - nn_key,
            'unique_o_orderkey',       (nd_key * 1000000) div n, n - nd_key,
            'unique_o_custkey',        (nd_cust * 1000000) div n, n - nd_cust,
            'fk_o_custkey_in_customer',
              ((n - orphans) * 1000000) div n, orphans,
            'range_o_totalprice_positive',
              ((n - bad_price) * 1000000) div n, bad_price,
            'values_o_orderstatus',
              ((n - bad_status) * 1000000) div n, bad_status
            ) as (check_name, metric_ppm, violations)""")
          .withColumn("pass", col("violations") === 0L)
          .orderBy(col("check_name"))
      },
      Some("""
        WITH b AS (
          SELECT COUNT(*) AS n, COUNT(o_orderkey) AS nn_key,
                 COUNT(DISTINCT o_orderkey) AS nd_key,
                 COUNT(DISTINCT o_custkey) AS nd_cust,
                 CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS bad_price,
                 CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                   THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
          FROM orders
        ), orph AS (
          SELECT COUNT(*) AS orphans FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)
        ), r AS (
          SELECT 'completeness_o_orderkey' AS check_name,
                 (nn_key * 1000000) // n AS metric_ppm,
                 n - nn_key AS violations FROM b
          UNION ALL SELECT 'unique_o_orderkey',
                 (nd_key * 1000000) // n, n - nd_key FROM b
          UNION ALL SELECT 'unique_o_custkey',
                 (nd_cust * 1000000) // n, n - nd_cust FROM b
          UNION ALL SELECT 'fk_o_custkey_in_customer',
                 ((n - orphans) * 1000000) // n, orphans FROM b, orph
          UNION ALL SELECT 'range_o_totalprice_positive',
                 ((n - bad_price) * 1000000) // n, bad_price FROM b
          UNION ALL SELECT 'values_o_orderstatus',
                 ((n - bad_status) * 1000000) // n, bad_status FROM b
        )
        SELECT check_name, CAST(metric_ppm AS BIGINT) AS metric_ppm,
               CAST(violations AS BIGINT) AS violations,
               violations = 0 AS pass
        FROM r ORDER BY check_name""".trim)),

    // Mann-Kendall trend test (r11): the standard non-parametric "is this
    // series drifting?" monitor for metric time series — S = Σ_{i<j}
    // sign(x_j − x_i) over each event type's daily value totals, plus the
    // tie-corrected variance numerator 18·Var(S) = n(n−1)(2n+5) −
    // Σ_ties t(t−1)(2t+5). Everything is INTEGER: daily totals are exact
    // 6dp decimals carried as scaled micros (sign comparisons can never
    // disagree across engines), S and var18 are integer sums — the z/p
    // step (a sqrt and a normal CDF) is deliberately left to the consumer
    // because libm is not bit-portable (same policy as every stats key).
    // Shape: the daily rollup is the only table-sized aggregate (one
    // shuffle, 30 rows × |types| out); the O(n²) pair join runs on that
    // OUTPUT (C(30,2) = 435 pairs per type) — the same output-bound
    // self-join argument as stats_ks_test. At 100 TB n stays the number
    // of DAYS, so the quadratic term never touches row counts.
    graft.Q("stats_trend_mk",
      (spark, sfDir) => {
        import graft.Det
        val daily = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("x"))
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.d") < col("b.d"))
          .groupBy(col("a.event_type").as("event_type"))
          .agg(sum(signum(col("b.x") - col("a.x")).cast("long")).as("s_stat"))
        val base = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"))
        val ties = daily.groupBy(col("event_type"), col("x"))
          .agg(count(lit(1)).as("t"))
          .groupBy(col("event_type"))
          .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
        base.join(pairs, Seq("event_type"))
          .join(ties, Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("s_stat"),
            (expr("n_days * (n_days - 1) * (2 * n_days + 5)") -
              col("tie_term")).cast("long").as("var18"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x
          FROM events GROUP BY 1, 2
        ), s AS (
          SELECT a.event_type, CAST(SUM(sign(b.x - a.x)) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d < b.d
          GROUP BY 1
        ), base AS (
          SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1
        ), ties AS (
          SELECT event_type,
                 CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
          FROM (SELECT event_type, x, COUNT(*) AS t FROM daily GROUP BY 1, 2)
          GROUP BY 1
        )
        SELECT base.event_type, n_days, s_stat,
               CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                    AS BIGINT) AS var18
        FROM base
        JOIN s ON base.event_type = s.event_type
        JOIN ties ON base.event_type = ties.event_type
        ORDER BY base.event_type""".trim)),

    // Kendall rank concordance (r11): tau's raw counts between two daily
    // series per event type — total value (exact scaled micros) vs event
    // count — the nonparametric "do busier days carry more value" monitor
    // that, unlike Pearson, is outlier-immune and needs no moments. All
    // O(n²) pair work runs on the DAILY rollup's output (C(30,2) = 435
    // pairs/type, output-bound — the stats_ks_test argument); the only
    // table-sized operation is the one hash-aggregate building the
    // rollup. Concordant/discordant/tie counts are pure integers; tau,
    // z, and p are left to the consumer (division with a possibly
    // NEGATIVE numerator floor/truncates differently across engines, and
    // libm sqrt is not bit-portable — the standing stats policy).
    graft.Q("stats_kendall_tau",
      (spark, sfDir) => {
        import graft.Det
        val daily = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("x"),
            count(lit(1)).as("y"))
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.d") < col("b.d"))
          .select(col("a.event_type").as("event_type"),
            (signum(col("b.x") - col("a.x")) *
              signum(col("b.y") - col("a.y"))).cast("long").as("cc"))
        pairs.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("cc") > 0, 1L).otherwise(0L)).as("n_c"),
            sum(when(col("cc") < 0, 1L).otherwise(0L)).as("n_d"),
            sum(when(col("cc") === 0, 1L).otherwise(0L)).as("n_tie"),
            sum(col("cc")).as("s_stat"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x,
                 COUNT(*) AS y
          FROM events GROUP BY 1, 2
        ), pairs AS (
          SELECT a.event_type,
                 CAST(sign(b.x - a.x) * sign(b.y - a.y) AS BIGINT) AS cc
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d < b.d
        )
        SELECT event_type, COUNT(*) AS n_pairs,
               CAST(SUM(CASE WHEN cc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN cc < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
               CAST(SUM(CASE WHEN cc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie,
               CAST(SUM(cc) AS BIGINT) AS s_stat
        FROM pairs
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Wald–Wolfowitz runs test (r11): randomness-of-sequence check on each
    // type's daily totals — a metric oscillating around its median every
    // day (many runs) and one that drifted then recovered (few long runs)
    // have identical marginal distributions; run counts are what
    // distinguishes them, which is why drift monitors pair a runs test
    // with the Mann-Kendall trend stat. Median is the LOWER median (the
    // value at ordered position (n+1) div 2) — an actual series element,
    // picked by row_number, so no cross-engine interpolation ambiguity;
    // "above" is strictly > median (ties side with below, deterministic
    // both sides). Everything after the daily rollup is windows over ≤31
    // rows/type (output-bound); counts are pure integers, the z-score is
    // the consumer's (stats policy).
    graft.Q("stats_runs_test",
      (spark, sfDir) => {
        import graft.Det
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("x"))
        val byX = Window.partitionBy(col("event_type")).orderBy(col("x"), col("d"))
        val med = daily
          .withColumn("rx", row_number().over(byX))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
          .filter(col("rx") === expr("(n + 1) div 2"))
          .select(col("event_type"), col("x").as("med"))
        val byD = Window.partitionBy(col("event_type")).orderBy(col("d"))
        daily.join(med, Seq("event_type"))
          .withColumn("above", (col("x") > col("med")).cast("int"))
          .withColumn("flip",
            when(lag(col("above"), 1).over(byD).isNull, 1)
              .when(lag(col("above"), 1).over(byD) =!= col("above"), 1)
              .otherwise(0))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("above")).cast("long").as("n_above"),
            (count(lit(1)) - sum(col("above"))).cast("long").as("n_below"),
            sum(col("flip")).cast("long").as("n_runs"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT event_type, d, x,
                 row_number() OVER (PARTITION BY event_type ORDER BY x, d) AS rx,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM daily
        ), med AS (
          SELECT event_type, x AS med FROM ranked WHERE rx = (n + 1) // 2
        ), seq AS (
          SELECT daily.event_type,
                 CASE WHEN x > med THEN 1 ELSE 0 END AS above,
                 CASE WHEN lag(CASE WHEN x > med THEN 1 ELSE 0 END)
                        OVER (PARTITION BY daily.event_type ORDER BY d)
                      IS DISTINCT FROM CASE WHEN x > med THEN 1 ELSE 0 END
                      THEN 1 ELSE 0 END AS flip
          FROM daily JOIN med ON daily.event_type = med.event_type
        )
        SELECT event_type, COUNT(*) AS n_days,
               CAST(SUM(above) AS BIGINT) AS n_above,
               CAST(COUNT(*) - SUM(above) AS BIGINT) AS n_below,
               CAST(SUM(flip) AS BIGINT) AS n_runs
        FROM seq
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Pettitt change-point test (r11): for each event type, the split
    // point k in its daily series maximizing |U_k|, U_k = Σ_{i≤k<j}
    // sign(x_j − x_i) — the rank-based change-point detector drift
    // monitors run when a level shift's WHERE matters as much as its
    // existence. Rank-based means tiny exact integers (|U_k| ≤
    // k(n−k) ≤ 240) — no squared-sum magnitudes to overflow and no
    // float argmax ambiguity; k* tie-breaks to the earliest day. The
    // pair/grid expansion is Σ(j−i) ≈ n³/6 ≈ 4.5k rows per type —
    // output-bound on DAYS, never table rows (the stats_ks_test
    // argument); the one table-sized op is the daily rollup aggregate.
    graft.Q("stats_changepoint",
      (spark, sfDir) => {
        import graft.Det
        import org.apache.spark.sql.expressions.Window
        val byD = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val daily = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("x"))
          .withColumn("rn", row_number().over(byD))
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.rn") < col("b.rn"))
          .select(col("a.event_type").as("event_type"),
            col("a.rn").as("i"), col("b.rn").as("j"),
            signum(col("b.x") - col("a.x")).cast("long").as("s"))
        val grid = daily.select(col("event_type"), col("rn").as("k"), col("d"))
        val uk = pairs.join(grid.drop("d"),
            pairs("event_type") === grid("event_type") &&
              col("i") <= col("k") && col("k") < col("j"))
          .groupBy(pairs("event_type").as("event_type"), col("k"))
          .agg(sum(col("s")).as("u"))
        val best = Window.partitionBy(col("event_type"))
          .orderBy(abs(col("u")).desc, col("k"))
        uk.withColumn("pick", row_number().over(best))
          .filter(col("pick") === 1)
          .join(grid, Seq("event_type", "k"))
          .join(daily.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_days")), Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("k").cast("long").as("k_split"),
            col("d").as("split_day"), abs(col("u")).as("u_abs"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY CAST(ts AS DATE)) AS rn
          FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), pairs AS (
          SELECT a.event_type, a.rn AS i, b.rn AS j,
                 CAST(sign(b.x - a.x) AS BIGINT) AS s
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.rn < b.rn
        ), uk AS (
          SELECT p.event_type, g.rn AS k, SUM(p.s) AS u
          FROM pairs p JOIN daily g
            ON p.event_type = g.event_type AND p.i <= g.rn AND g.rn < p.j
          GROUP BY 1, 2
        ), best AS (
          SELECT event_type, k, u,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY abs(u) DESC, k) AS pick
          FROM uk
        )
        SELECT b.event_type,
               (SELECT COUNT(*) FROM daily n WHERE n.event_type = b.event_type)
                 AS n_days,
               b.k AS k_split, g.d AS split_day,
               CAST(abs(b.u) AS BIGINT) AS u_abs
        FROM best b JOIN daily g ON b.event_type = g.event_type AND b.k = g.rn
        WHERE b.pick = 1
        ORDER BY b.event_type""".trim)),

    // Percentile bootstrap CI (r11): a 95% confidence interval for each
    // type's total daily value WITHOUT parametric assumptions or libm —
    // B = 199 resamples of the n daily totals, drawn by a deterministic
    // LCG on (resample, draw) so the "randomness" is reproducible across
    // engines, reruns, and partitionings (the llm_doc_sample property);
    // CI bounds are the 5th and 195th ORDER STATISTICS of the resample
    // sums ((B+1)·0.025 — the standard percentile method), picked by an
    // integer rank window with (sum, b) tie-break. Everything is exact
    // micros integers: resample SUMS order identically to means (n fixed
    // within a type), so no division enters any compared value. The only
    // table-sized op is the daily rollup; the B×n draw grid (~6k
    // rows/type) and the join back to daily are output-bound on DAYS —
    // bootstrap cost is independent of corpus size, which is exactly why
    // the method scales to 100 TB metrics.
    graft.Q("stats_bootstrap_ci",
      (spark, sfDir) => {
        import graft.Det
        import org.apache.spark.sql.expressions.Window
        val byD = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val daily = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("x"))
          .withColumn("rn", row_number().over(byD))
        val types = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("obs_sum"))
        val draws = types
          .select(col("event_type"), col("n"), explode(sequence(lit(0), lit(198))).as("b"))
          .select(col("event_type"), col("n"), col("b"),
            explode(sequence(lit(1), col("n").cast("int"))).as("i"))
          .withColumn("idx",
            expr("CAST(((CAST(b AS BIGINT) * 31 + i) * 1103515245 + 12345) % 2048 % n + 1 AS INT)"))
        val sums = draws
          .join(daily.select(col("event_type"), col("rn"), col("x")),
            draws("event_type") === daily("event_type") && col("idx") === col("rn"))
          .groupBy(draws("event_type").as("event_type"), col("b"))
          .agg(sum(col("x")).as("s"))
        val byS = Window.partitionBy(col("event_type")).orderBy(col("s"), col("b"))
        sums.withColumn("rk", row_number().over(byS))
          .groupBy(col("event_type"))
          .agg(max(when(col("rk") === 5, col("s"))).as("boot_lo"),
            max(when(col("rk") === 195, col("s"))).as("boot_hi"))
          .join(types.select(col("event_type"), col("n").as("n_days"), col("obs_sum")),
            Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("obs_sum"),
            col("boot_lo"), col("boot_hi"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY CAST(ts AS DATE)) AS rn
          FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), types AS (
          SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS obs_sum FROM daily GROUP BY 1
        ), draws AS (
          SELECT t.event_type, t.n, b.b, i.i,
                 CAST(((b.b * 31 + i.i) * 1103515245 + 12345) % 2048 % t.n + 1
                      AS INT) AS idx
          FROM types t
          CROSS JOIN (SELECT unnest(generate_series(0, 198)) AS b) b
          JOIN (SELECT unnest(generate_series(1, (SELECT MAX(n) FROM types))) AS i) i
            ON i.i <= t.n
        ), sums AS (
          SELECT d2.event_type, d2.b, CAST(SUM(daily.x) AS BIGINT) AS s
          FROM draws d2 JOIN daily
            ON daily.event_type = d2.event_type AND daily.rn = d2.idx
          GROUP BY 1, 2
        ), ranked AS (
          SELECT event_type, s,
                 row_number() OVER (PARTITION BY event_type ORDER BY s, b) AS rk
          FROM sums
        )
        SELECT r.event_type, t.n AS n_days, t.obs_sum,
               MAX(CASE WHEN rk = 5 THEN s END) AS boot_lo,
               MAX(CASE WHEN rk = 195 THEN s END) AS boot_hi
        FROM ranked r JOIN types t ON r.event_type = t.event_type
        GROUP BY r.event_type, t.n, t.obs_sum
        ORDER BY r.event_type""".trim)),

    // Chatterjee's xi correlation (r12): the modern rank statistic that
    // detects ANY functional dependence y = f(x) — monotone or not —
    // where Kendall/Spearman see only monotone trends (Chatterjee, JASA
    // 2021). Raw integer pieces per event type over the daily series
    // (x = date order, y = exact-micros value total): n_days and
    // s_abs = Σ|r_{i+1} − r_i| of the y-ranks walked in x order; a flat
    // series walks ranks smoothly (small s_abs, xi→1), an independent one
    // jumps (s_abs→n²/3, xi→0). xi = 1 − 3·s_abs/(n²−1) is the consumer's
    // division (possibly-negative numerator — the standing stats policy,
    // as stats_kendall_tau). Ranks are row_number over (y, d): total
    // order, deterministic under ties in both engines. Cost after the one
    // table-sized rollup: two ≤31-row windows per type — output-bound.
    graft.Q("stats_xi_corr",
      (spark, sfDir) => {
        import graft.Det
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(spark, sfDir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("y"))
        val byType = Window.partitionBy(col("event_type"))
        val ranked = daily.withColumn("r",
          row_number().over(byType.orderBy(col("y"), col("d"))))
        ranked
          .withColumn("dr",
            abs(col("r") - lag(col("r"), 1).over(byType.orderBy(col("d")))))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("dr")).as("s_abs"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS y
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT event_type, d,
                 row_number() OVER (PARTITION BY event_type ORDER BY y, d) AS r
          FROM daily
        ), stepped AS (
          SELECT event_type,
                 abs(r - lag(r) OVER (PARTITION BY event_type ORDER BY d)) AS dr
          FROM ranked
        )
        SELECT event_type, COUNT(*) AS n_days,
               CAST(SUM(dr) AS BIGINT) AS s_abs
        FROM stepped
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Herfindahl–Hirschman concentration index (r12): per day, how
    // concentrated the value flow is across event types — HHI = Σ of
    // squared floor-ppm shares (1e12 = monopoly, 1e12/k = k equal
    // types). THE market/revenue-concentration monitor: a melting HHI
    // means diversification, a spiking one means one flow dominates.
    // Shares go through DECIMAL(38,0)/HUGEINT before the ×1e6 (micros
    // totals top int64 at warehouse scale — the window_pareto policy);
    // squares of ppm values stay well inside int64. One rollup + one
    // per-day window over ≤|types| rows + one hash-agg.
    graft.Q("stats_hhi",
      (spark, sfDir) => {
        import graft.Det
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(spark, sfDir)
          .groupBy(to_date(col("ts")).as("d"), col("event_type"))
          .agg((sum(Det.val6(col("value"))) * 1000000).cast("long").as("v"))
        daily
          .withColumn("tot", sum(col("v")).over(Window.partitionBy(col("d"))))
          .withColumn("share_ppm",
            expr("""CAST(CAST(v AS DECIMAL(38,0)) * 1000000
                      div CAST(tot AS DECIMAL(38,0)) AS BIGINT)"""))
          .groupBy(col("d"))
          .agg(count(lit(1)).as("n_types"),
            sum(expr("share_ppm * share_ppm")).as("hhi_pp2"),
            max(col("share_ppm")).as("top_share_ppm"))
          .orderBy(col("d"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d, event_type,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS v
          FROM events GROUP BY 1, 2
        ), shares AS (
          SELECT d,
                 CAST(CAST(v AS HUGEINT) * 1000000 //
                      CAST(SUM(v) OVER (PARTITION BY d) AS HUGEINT)
                      AS BIGINT) AS share_ppm
          FROM daily
        )
        SELECT d, COUNT(*) AS n_types,
               CAST(SUM(share_ppm * share_ppm) AS BIGINT) AS hhi_pp2,
               CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm
        FROM shares
        GROUP BY d
        ORDER BY d""".trim)),

    // Cramér's V (r16): the EFFECT-SIZE companion to stats_chi_square —
    // chi² says "statuses and priorities are associated", V says "by how
    // much" on a 0..1 scale (V = sqrt(chi² / (n·min(r−1, c−1)))), the
    // number one actually compares across tables. Determinism follows the
    // §7.3 chi-square pattern one step further: each cell's contribution
    // is coarsened to DECIMAL(18,6) (the per-row double→decimal rounding
    // is engine-identical), then SUMMED AS DECIMALS — exact and
    // order-independent, so the cross-row reduction that plain double
    // summation would make partitioning-dependent is exact; the final
    // division and sqrt are one correctly-rounded IEEE op each on
    // identical operands. The r·c contingency cells are the only shuffle
    // payload — output-bound, independent of row count at 100 TB.
    graft.Q("stats_cramers_v",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        val or = Tables.orders(spark, sfDir)
        val cell = or.groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("obs"))
        val wr = Window.partitionBy("o_orderstatus")
        val wc = Window.partitionBy("o_orderpriority")
        val per = cell
          .select(col("obs"),
            sum("obs").over(wr).as("rt"), sum("obs").over(wc).as("ct"))
          .crossJoin(broadcast(cell.agg(sum("obs").as("n"))))
          .withColumn("expected",
            (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
          .withColumn("contrib",
            (col("obs").cast("double") - col("expected")) *
              (col("obs").cast("double") - col("expected")) / col("expected"))
        val r = cell.select("o_orderstatus").distinct().count()
        val c = cell.select("o_orderpriority").distinct().count()
        val minDim = math.min(r - 1, c - 1)
        per.agg(
          sum(col("obs")).as("n"),
          graft.Det.emit(sum(col("contrib").cast(DecimalType(18, 6))), 6).as("chi2"))
          .withColumn("df", lit((r - 1) * (c - 1)))
          .withColumn("cramers_v",
            sqrt(col("chi2") / (col("n") * lit(minDim)).cast("double")))
          .select(col("n"), col("chi2"), col("df"), col("cramers_v"))
      },
      Some(s"""
        WITH cell AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS obs
          FROM orders GROUP BY 1, 2),
        m AS (
          SELECT obs,
                 CAST(SUM(obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS rt,
                 CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS ct,
                 (SELECT CAST(SUM(obs) AS BIGINT) FROM cell) AS n
          FROM cell),
        e AS (
          SELECT obs, n,
                 CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected
          FROM m),
        dims AS (
          SELECT (SELECT COUNT(DISTINCT o_orderstatus) FROM orders) AS r,
                 (SELECT COUNT(DISTINCT o_orderpriority) FROM orders) AS c),
        agg AS (
          SELECT CAST(MAX(n) AS BIGINT) AS n,
                 ${graft.Det.sqlEmit(
                   "SUM(CAST((CAST(obs AS DOUBLE) - expected) * " +
                   "(CAST(obs AS DOUBLE) - expected) / expected AS DECIMAL(18,6)))",
                   6)} AS chi2
          FROM e)
        SELECT n, chi2,
               CAST((r - 1) * (c - 1) AS BIGINT) AS df,
               SQRT(chi2 / CAST(n * LEAST(r - 1, c - 1) AS DOUBLE)) AS cramers_v
        FROM agg, dims""".trim)),
  )

  /** Register fixture tables as managed catalog tables under `db` (stored
    * at `location`) and collect full table + column statistics for each.
    * Idempotent. */
  def registerWithStats(spark: SparkSession, sfDir: String, db: String,
      location: String, tables: Seq[String]): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")
    tables.foreach { t =>
      Tables.read(spark, sfDir, t).write.mode("overwrite").saveAsTable(s"$db.$t")
      spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }
}
