package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — join surface.
  *
  * Scale design notes (the 100 TB contract, not the 60 k-row test):
  *  - Equi-joins shuffle both sides on the key; dims (`nation`, `region`,
  *    `customer` at dim-scale) are broadcast — `join_broadcast` pins the
  *    hint, the others let AQE convert when the built side is small.
  *  - `join_interval` is equi on `user_id` + a range residual: the shuffle
  *    key is the equi part, so the range predicate never becomes a
  *    cartesian; skewed users are split by AQE skew-join.
  *  - `join_asof` is one shuffle on the key + one window pass over the
  *    unioned stream — no per-row probe, no broadcast of the big side;
  *    this is the sort-merge as-of shape that survives 1000 executors.
  */
object Joins {
  import Det._

  /** Shared ANSI text for `subquery_in_notin` — the same string is the
    * Spark entry point AND the DuckDB oracle (dialect-shared, like the
    * LATERAL pair above it in the file). */
  private val InNotInSql = """
    WITH risky AS (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
      FROM customer WHERE c_custkey < 500)
    SELECT
      (SELECT COUNT(*) FROM orders
         WHERE o_custkey IN (SELECT k FROM risky)) AS cnt_in,
      (SELECT COUNT(*) FROM orders
         WHERE o_custkey NOT IN (SELECT k FROM risky)) AS cnt_not_in,
      (SELECT COUNT(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM risky r
                           WHERE r.k = o.o_custkey)) AS cnt_not_exists""".trim

  /** Shared ANSI text for `subquery_scalar` (dialect-shared, like
    * [[InNotInSql]]): one uncorrelated scalar aggregate injected into the
    * outer filter. The scalar and the output sum both follow Det's exact
    * decimal→double emit, so the two engines compare identical doubles. */
  private val ScalarSubquerySql = """
    SELECT o_orderpriority, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(12,2)) > (
      SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE)
             / COUNT(*)
      FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority""".trim

  /** As-of composition (SURVEY §7.5): for each row of `rights` (key `k`,
    * time `t`, id `event_id`), the latest `ord_date` from `lefts` (key `k`,
    * time `t`, payload `ord_date`) with left.t <= right.t — DuckDB
    * `ASOF LEFT JOIN` semantics incl. ties (`<=`) and no-match rows (NULL).
    * One shuffle on `k` + one window pass over the tagged union; no per-row
    * probe, no broadcast of the big side — the shape that survives 1000
    * executors. */
  def asofLatestAtOrBefore(lefts: org.apache.spark.sql.DataFrame,
      rights: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val l = lefts.select(col("k"), col("t"), col("t").as("ord_date"),
      lit(null).cast("long").as("event_id"), lit(0).as("tag"))
    val r = rights.select(col("k"), col("t"),
      lit(null).cast("timestamp").as("ord_date"), col("event_id"), lit(1).as("tag"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("last_order_date", last(col("ord_date"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("k"), col("t"), col("last_order_date"))
  }

  /** The join_bloom_prefilter plan WITHOUT the eager checkpoint — the shape
    * ExplainDump / PlanShapeSpec audit (the key itself checkpoints to
    * execute while its conf overrides are live, which erases the plan).
    * Callers must set the injection confs around planning/explaining. */
  private[graft] def bloomPrefilterJoin(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import graft.Det._
    val li = Tables.lineitem(spark, sfDir)
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumMoney(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Seq[Q] = Seq(

    // 3-way star join: revenue per nation.
    {
      // SQL-routed key (r12): one dialect-shared text drives both engines
      // (pure-SQL entry path, ops/SqlEntry.scala) — the Det money policy
      // (exact DECIMAL sum → DECIMAL(18,2) → DOUBLE) is itself plain ANSI
      // text, so it routes unchanged.
      val text = s"""
        SELECT n_name, ${sqlSumMoney("o_totalprice")} AS revenue, COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name""".trim
      Q("join_inner_equi",
        (spark, sfDir) => SqlEntry.sql(spark, sfDir, text),
        Some(text))
    },

    // Same logical join, dims explicitly broadcast (plan-shape-tested).
    Q("join_broadcast",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir)
        val c = Tables.customer(spark, sfDir)
        val n = Tables.nation(spark, sfDir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sumMoney(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("n_name"))
      },
      Some(s"""
        SELECT n_name, ${sqlSumMoney("o_totalprice")} AS revenue, COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name""".trim)),

    // Null-extension for order-less customers.
    Q("join_left_outer",
      (spark, sfDir) => {
        val c = Tables.customer(spark, sfDir)
        val o = Tables.orders(spark, sfDir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            max(col("o_orderstatus")).as("max_status"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders, MAX(o_orderstatus) AS max_status
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey""".trim)),

    // Full outer over overlapping + one-sided key sets.
    Q("join_full_outer",
      (spark, sfDir) => {
        val perCust = Tables.orders(spark, sfDir)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        val third = Tables.customer(spark, sfDir)
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"))
        perCust.join(third, perCust("o_custkey") === third("c_custkey"), "full")
          .select(
            coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            col("c_mktsegment").isNotNull.as("in_third"),
            col("o_custkey").isNotNull.as("has_orders"))
          .orderBy(col("custkey"))
      },
      Some("""
        SELECT coalesce(o_custkey, c_custkey) AS custkey,
          coalesce(n_orders, 0) AS n_orders,
          c_mktsegment IS NOT NULL AS in_third,
          o_custkey IS NOT NULL AS has_orders
        FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) oc
        FULL OUTER JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0) c3
          ON oc.o_custkey = c3.c_custkey
        ORDER BY custkey""".trim)),

    // Customers having at least one order (EXISTS).
    Q("join_semi",
      (spark, sfDir) => {
        val c = Tables.customer(spark, sfDir)
        val o = Tables.orders(spark, sfDir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""".trim)),

    // Customers with no URGENT order — NOT EXISTS semantics (NULL-safe),
    // not NOT IN. (Every customer has *some* order in the fixtures, so the
    // predicate keeps the result non-trivial at every sf.)
    Q("join_anti",
      (spark, sfDir) => {
        val c = Tables.customer(spark, sfDir)
        val o = Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""".trim)),

    // Bounded cartesian (5 × 25).
    Q("join_cross",
      (spark, sfDir) =>
        Tables.region(spark, sfDir).crossJoin(Tables.nation(spark, sfDir))
          .select(col("r_name"), col("n_name"))
          .orderBy(col("r_name"), col("n_name")),
      Some("""
        SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name""".trim)),

    // Theta: nation pairs within the same region, strictly ordered keys.
    Q("join_theta",
      (spark, sfDir) => {
        val a = Tables.nation(spark, sfDir).select(
          col("n_nationkey").as("a_key"), col("n_name").as("a_name"),
          col("n_regionkey").as("a_region"))
        val b = Tables.nation(spark, sfDir).select(
          col("n_nationkey").as("b_key"), col("n_name").as("b_name"),
          col("n_regionkey").as("b_region"))
        a.join(b, col("a_region") === col("b_region") && col("a_key") < col("b_key"))
          .select(col("a_region").as("regionkey"), col("a_key"), col("b_key"),
            col("a_name"), col("b_name"))
          .orderBy(col("a_key"), col("b_key"))
      },
      Some("""
        SELECT a.n_regionkey AS regionkey, a.n_nationkey AS a_key, b.n_nationkey AS b_key,
          a.n_name AS a_name, b.n_name AS b_name
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        ORDER BY a_key, b_key""".trim)),

    // Interval self-join: related events of the same user within 5 minutes.
    // Equi on user_id carries the shuffle; the range is a residual filter.
    Q("join_interval",
      (spark, sfDir) => {
        val e = Tables.events(spark, sfDir)
        val a = e.select(col("user_id"), col("event_id").as("a_id"),
          col("ts").as("a_ts"))
        val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
          col("ts").as("b_ts"))
        a.join(b,
            col("user_id") === col("b_user")
              && col("b_ts") > col("a_ts")
              && col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
          .select(col("user_id"), col("a_id"), col("b_id"),
            (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("delta_us"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""
        SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
          epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        ORDER BY a_id, b_id""".trim)),

    // Skew-salted equi join: the fact side gets a deterministic salt, the
    // dim side is exploded over the salt range, and the join key becomes
    // (key, salt) — a hot key's rows spread over `salts` reducers instead
    // of one. Result is provably identical to the unsalted join (the oracle
    // IS the unsalted join). At 100 TB this is the manual fallback when
    // AQE's skew-join splitting isn't available (e.g. bucketed tables).
    Q("join_skew_salted",
      (spark, sfDir) => {
        val salts = 8
        val e = Tables.events(spark, sfDir)
          .select(col("user_id"), col("value"), col("event_id"))
          .withColumn("e_salt", pmod(hash(col("event_id")), lit(salts)))
        val c = Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_mktsegment"))
          .withColumn("c_salt", explode(expr(s"sequence(0, ${salts - 1})")))
        e.join(c, col("user_id") === col("c_custkey") && col("e_salt") === col("c_salt"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"), sumVal6(col("value")).as("sum_val"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        SELECT c_mktsegment, COUNT(*) AS n_events, ${sqlSumVal6("value")} AS sum_val
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""".trim)),

    // As-of: for each event, the latest order date of that user at-or-before
    // the event time. Composed as union-tag + last(ignoreNulls) window — one
    // shuffle on the key, no per-row probes (SURVEY §7.5). Oracle: native
    // DuckDB ASOF LEFT JOIN.
    Q("join_asof",
      (spark, sfDir) => {
        val ords = Tables.orders(spark, sfDir)
          .select(col("o_custkey").as("k"), col("o_orderdate").as("t"))
        val evts = Tables.events(spark, sfDir)
          .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
        asofLatestAtOrBefore(ords, evts)
          .select(col("event_id"), col("k").as("user_id"), col("last_order_date"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        FROM events e ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY event_id""".trim)),

    // As-of with tolerance (r9): the attribution variant — each purchase
    // matched to the user's latest PRIOR view, but only if that view is
    // within 24 hours; staler context is expired (NULL). This is how real
    // as-of consumers bound how old a quote/reading/session may be, and
    // the purchase→view pair keeps both sides in the same time range
    // (orders' 1992–98 dates vs 2024 events would expire everything).
    // Since the plain as-of match IS the nearest at-or-before row, the
    // tolerance is a post-window projection on the SAME one-shuffle
    // union-tag plan — no second window, no probe. On the fixture ~1/3
    // of matches survive and ~2/3 expire, so both branches bind (pinned
    // by OperatorSpec). Oracle: DuckDB ASOF LEFT JOIN + interval guard.
    Q("join_asof_tolerance",
      (spark, sfDir) => {
        val views = Tables.events(spark, sfDir)
          .filter(col("event_type") === "view")
          .select(col("user_id").as("k"), col("ts").as("t"))
        val purchases = Tables.events(spark, sfDir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
        asofLatestAtOrBefore(views, purchases)
          .select(col("event_id"), col("k").as("user_id"),
            when(expr("unix_micros(t) - unix_micros(last_order_date)")
              <= lit(86400L * 1000000L), col("last_order_date"))
              .as("view_ts_24h"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT p.event_id, p.user_id,
          CASE WHEN p.ts - v.ts <= INTERVAL 24 HOUR THEN v.ts END AS view_ts_24h
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id""".trim)),

    // Forward as-of (r9): each view attributed to the user's EARLIEST
    // purchase at-or-after it — the "what happened next" direction
    // (conversion attribution: next fill after a quote, next purchase
    // after a campaign touch). Same one-shuffle union-tag window as the
    // backward as-of, with the frame reversed: probes sort BEFORE matches
    // at equal t so the at-or-after boundary is inclusive, and
    // first(ignoreNulls) over (currentRow, unboundedFollowing) picks the
    // next purchase time. Oracle: a correlated MIN subquery
    // (decorrelation-friendly in both engines) rather than ASOF, which
    // DuckDB defines backward-only.
    Q("join_asof_forward",
      (spark, sfDir) => {
        val purchases = Tables.events(spark, sfDir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("k"), col("ts").as("t"),
            col("ts").as("p_ts"), lit(null).cast("long").as("event_id"),
            lit(1).as("tag"))
        val views = Tables.events(spark, sfDir)
          .filter(col("event_type") === "view")
          .select(col("user_id").as("k"), col("ts").as("t"),
            lit(null).cast("timestamp").as("p_ts"), col("event_id"),
            lit(0).as("tag"))
        val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tag"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        purchases.unionByName(views)
          .withColumn("next_purchase_ts",
            first(col("p_ts"), ignoreNulls = true).over(w))
          .filter(col("tag") === 0)
          .select(col("event_id"), col("k").as("user_id"),
            col("next_purchase_ts"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT v.event_id, v.user_id,
          (SELECT MIN(p.ts) FROM events p
           WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
             AND p.ts >= v.ts) AS next_purchase_ts
        FROM events v
        WHERE v.event_type = 'view'
        ORDER BY v.event_id""".trim)),

    // Nearest-asof (r10): each view pairs with its temporally CLOSEST
    // purchase in either direction (pandas merge_asof direction='nearest'),
    // tie → the earlier one. Completes the asof family (backward /
    // forward / tolerance / nearest) on the same single-interleave plan:
    // one union, one shuffle on user_id, two frames over one in-partition
    // sort — prev via last(ignoreNulls) over the preceding frame (same-ts
    // purchases sort before views, making prev inclusive: a 0-gap match
    // always wins), next via first(ignoreNulls) over the following frame
    // (strictly later by the same sort). Never a per-row probe; the
    // oracle's correlated MIN/MAX subqueries are the semantic spec only.
    Q("join_asof_nearest",
      (spark, sfDir) => {
        val purchases = Tables.events(spark, sfDir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("k"), col("ts").as("t"),
            col("ts").as("p_ts"), lit(null).cast("long").as("event_id"),
            lit(0).as("srt"))
        val views = Tables.events(spark, sfDir)
          .filter(col("event_type") === "view")
          .select(col("user_id").as("k"), col("ts").as("t"),
            lit(null).cast("timestamp").as("p_ts"), col("event_id"),
            lit(1).as("srt"))
        val ord = Window.partitionBy(col("k")).orderBy(col("t"), col("srt"))
        val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val both = purchases.unionByName(views)
          .withColumn("prev_ts", last(col("p_ts"), ignoreNulls = true).over(wPrev))
          .withColumn("next_ts", first(col("p_ts"), ignoreNulls = true).over(wNext))
          .filter(col("srt") === 1)
        val takePrev = col("prev_ts").isNotNull && (col("next_ts").isNull ||
          (unix_micros(col("t")) - unix_micros(col("prev_ts")) <=
            unix_micros(col("next_ts")) - unix_micros(col("t"))))
        val nearest = when(takePrev, col("prev_ts")).otherwise(col("next_ts"))
        both.select(col("event_id"), col("k").as("user_id"),
            nearest.as("nearest_purchase_ts"),
            when(takePrev, lit("prev"))
              .when(col("next_ts").isNotNull, lit("next")).as("dir"),
            (unix_micros(nearest) - unix_micros(col("t"))).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH v AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        p AS (
          SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        b AS (
          SELECT v.event_id, v.user_id, v.ts,
            (SELECT MAX(p.ts) FROM p
             WHERE p.user_id = v.user_id AND p.ts <= v.ts) AS prev_ts,
            (SELECT MIN(p.ts) FROM p
             WHERE p.user_id = v.user_id AND p.ts > v.ts) AS next_ts
          FROM v),
        c AS (
          SELECT event_id, user_id, ts,
            prev_ts IS NOT NULL AND (next_ts IS NULL OR
              epoch_us(ts) - epoch_us(prev_ts) <= epoch_us(next_ts) - epoch_us(ts))
              AS take_prev,
            prev_ts, next_ts
          FROM b)
        SELECT event_id, user_id,
          CASE WHEN take_prev THEN prev_ts ELSE next_ts END AS nearest_purchase_ts,
          CASE WHEN take_prev THEN 'prev'
               WHEN next_ts IS NOT NULL THEN 'next' END AS dir,
          epoch_us(CASE WHEN take_prev THEN prev_ts ELSE next_ts END)
            - epoch_us(ts) AS gap_us
        FROM c
        ORDER BY event_id""".trim)),

    // Lateral join (r4): per-customer top-1 order via a correlated LATERAL
    // subquery — Catalyst DECORRELATES this into the same ranked-window
    // plan `window_topk_group` declares directly, which is exactly the
    // point: the correlated per-row formulation a SQL user writes runs as
    // one shuffle + one window, never as a per-customer probe loop.
    Q("join_lateral",
      (spark, sfDir) => {
        graft.Tables.registerAll(spark, sfDir)
        spark.sql("""
          SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          FROM customer c,
          LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
          ) t
          ORDER BY c.c_custkey""")
      },
      Some("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) t
        ORDER BY c.c_custkey""".trim)),

    // Correlated scalar subquery (r4): customers above their own nation's
    // average balance. Catalyst decorrelates the per-row subquery into one
    // aggregate + join — the Det decimal policy keeps the per-nation
    // average exact so the comparison is oracle-stable.
    Q("subquery_correlated",
      (spark, sfDir) => {
        graft.Tables.registerAll(spark, sfDir)
        spark.sql("""
          SELECT c_custkey, c_nationkey,
            CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
          FROM customer c
          WHERE CAST(c_acctbal AS DECIMAL(12,2)) > (
            SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE)
                   / COUNT(*)
            FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_nationkey,
          CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) > (
          SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE)
                 / COUNT(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""".trim)),

    // IN / NOT IN / NOT EXISTS over a NULL-containing subquery (r5): the
    // three-valued-logic footgun pinned as a contract. The inner list maps
    // negative-balance customers to NULL, so NOT IN returns ZERO rows
    // (x <> NULL is unknown for every candidate) while the NOT EXISTS
    // formulation of "the same" predicate treats NULL as a non-match and
    // keeps rows — both engines are ANSI-standard here and the counts pin
    // the divergence. Spark plans the NOT IN as a null-aware anti join
    // (single-column broadcast NAAJ), never a per-row re-scan; JoinsSpec
    // asserts the fixture actually contains the NULL that makes
    // cnt_not_in = 0, so the key can't silently degrade into the
    // NULL-free case.
    Q("subquery_in_notin",
      (spark, sfDir) => {
        graft.Tables.registerAll(spark, sfDir)
        spark.sql(InNotInSql)
      },
      Some(InNotInSql)),

    // Uncorrelated scalar subquery (r9): orders above the GLOBAL average
    // price, summarized per priority. Catalyst executes the subquery ONCE
    // as its own tiny job and injects the scalar into the filter — the
    // plan is two scans of orders, not a per-row re-evaluation, and the
    // main scan's filter is a plain comparison against a literal-like
    // scalar (so at 100 TB the cost is one extra aggregate over the
    // price column, then a fully-pushed-down filtered scan). Both the
    // scalar and the output sums use the exact decimal→double emit, so
    // the shared SQL is engine-identical.
    Q("subquery_scalar",
      (spark, sfDir) => {
        graft.Tables.registerAll(spark, sfDir)
        spark.sql(ScalarSubquerySql)
      },
      Some(ScalarSubquerySql)),

    // Six-table analytic join (r4, TPC-H Q5 shape): local-supplier revenue
    // per nation for one region and a date range. The scale design: both
    // fact tables shuffle ONCE on their join keys (lineitem→orders on
    // orderkey carries the big shuffle), every dimension (supplier,
    // customer, nation, region) rides a broadcast, the date filter is
    // pushed into the orders scan, and the c_nationkey = s_nationkey twist
    // is a post-join residual — no extra exchange. At 100 TB the planner
    // degrades the fact-fact side to a shuffled join on the same keys;
    // nothing in the shape depends on fitting in memory.
    Q("join_multiway",
      (spark, sfDir) => {
        import graft.Det._
        val o = Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00")))
        val nr = broadcast(Tables.nation(spark, sfDir)
          .join(broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey")))
        // broadcast HINTS only on the genuinely-tiny nation⨝region dim;
        // customer/supplier are left to the planner — AQE broadcasts them
        // at this size, and at 100 TB (where a forced broadcast of a
        // billion-row customer would OOM) the same plan degrades to
        // shuffled joins on the keys with nothing else changing
        Tables.lineitem(spark, sfDir)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(spark, sfDir),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(nr, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(emit(sum(money(col("l_extendedprice")) * (factor(lit(1)) - factor(col("l_discount")))), 4)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""
        SELECT n_name,
          ${graft.Det.sqlEmit(s"SUM(${graft.Det.sqlMoney("l_extendedprice")} * (${graft.Det.sqlFactor("1")} - ${graft.Det.sqlFactor("l_discount")}))", 4)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""".trim)),

    // Bucketed co-located join (r5): both sides pre-bucketed (+ sorted) on
    // the join key into a warehouse table, so the SortMergeJoin consumes
    // the bucket layout directly — ZERO exchanges in the join plan
    // (PlanShapeSpec pins the zero-exchange plan on this layout, with
    // broadcast disabled there so the co-located SortMergeJoin — the path
    // that matters at 100 TB, where neither side broadcasts — is the one
    // asserted). This is the repeated-join answer at scale: pay the
    // shuffle once at write time, every subsequent join on that key is
    // exchange-free. The oracle is the plain logical join, proving the
    // layout changes nothing.
    Q("join_bucketed",
      (spark, sfDir) => {
        import graft.Det._
        val db = "graft_bk_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")
        if (!spark.catalog.databaseExists(db)) {
          Layout.writeBucketed(spark, sfDir, db,
            graft.Tmp.dir("bucket_wh", sfDir),
            Seq("orders" -> "o_custkey", "customer" -> "c_custkey"), nBuckets = 8)
        }
        spark.table(s"$db.orders")
          .join(spark.table(s"$db.customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"), sumMoney(col("o_totalprice")).as("sum_price"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
          ${graft.Det.sqlSumMoney("o_totalprice")} AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""".trim)),

    // STORAGE-PARTITIONED JOIN (r17 — Iceberg's SPJ, SPARK-37375, on the
    // Acid seam): both sides are Acid tables written with HIDDEN bucket
    // partitioning (`appendTxnHidden(bucketOf(k, 8))` manifest pvals); the
    // DSv2 scan (graft.sources.AcidBucketedSource) surfaces the manifest's
    // bucket map as KeyGroupedPartitioning with HasPartitionKey input
    // partitions, so Catalyst plans the join with ZERO exchange on EITHER
    // side — shuffle once at write time, then join big-to-big in place
    // forever, with the bucket map living in table metadata (no metastore,
    // unlike join_bucketed's managed-catalog variant). The in-body require
    // pins the claim on the executed adaptive plan: a SortMergeJoin and
    // exactly ONE Exchange (the final aggregate's) — a failed SPJ would
    // show three. Broadcast is disabled inside the run to mimic the
    // big×big shape at fixture scale (at 100 TB neither side broadcasts);
    // all touched confs restore after. Oracle = the plain logical join:
    // layout must change nothing.
    Q("join_storage_partitioned",
      (spark, sfDir) => {
        import graft.ops.Acid
        val tA = graft.Tmp.dir("spj_orders", sfDir)
        val tB = graft.Tmp.dir("spj_customer", sfDir)
        Acid.reset(tA); Acid.reset(tB)
        Acid.appendTxnHidden(spark, tA,
          Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"),
            (graft.Det.money(col("o_totalprice")) * 100).cast("long").as("cents")),
          txnId = 0L, transforms = Seq(Acid.bucketOf("o_custkey", 8)))
        Acid.appendTxnHidden(spark, tB,
          Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment")),
          txnId = 0L, transforms = Seq(Acid.bucketOf("c_custkey", 8)))
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val src = classOf[graft.sources.AcidBucketedSource].getName
          val dA = spark.read.format(src).option("path", tA)
            .option("bucket", "b8_o_custkey").load()
          val dB = spark.read.format(src).option("path", tB)
            .option("bucket", "b8_c_custkey").load()
          val agg = dA.join(dB,
              dA("b8_o_custkey") === dB("b8_c_custkey") &&
                dA("o_custkey") === dB("c_custkey"))
            .groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
            .orderBy(col("c_mktsegment"))
          val rows = agg.collect()
          val finalPlan = agg.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          // AQE query stages are leaf wrappers — their subtree hangs off
          // .plan, not .children — so cross them explicitly
          def walk(p: org.apache.spark.sql.execution.SparkPlan):
              Seq[org.apache.spark.sql.execution.SparkPlan] =
            p +: (p match {
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(q.plan)
              case _ => p.children.flatMap(walk)
            })
          val smj = walk(finalPlan).collectFirst {
            case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          }.getOrElse(sys.error(
            "join_storage_partitioned: no SortMergeJoin in the final plan —\n" +
              finalPlan.toString.take(3000)))
          val shuffles = smj.children.flatMap(walk).collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
            case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
          }
          require(shuffles.isEmpty,
            s"join_storage_partitioned: the join shuffled —\n${finalPlan.toString.take(2000)}")
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq, 1), agg.schema)
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""".trim)),

    // SPJ with COMPATIBLE-TRANSFORM grouping (r18 — Iceberg's
    // bucket-family SPJ, the VERDICT item 5 extension): the fact is
    // bucket(16)-partitioned, the dim bucket(8) — DIFFERENT transforms of
    // the same family. The modular-bucket family is closed under
    // reduction (floorMod(k,16) % 8 == floorMod(k,8) exactly), so the
    // fact scan coarsens at plan time (`coarsen=8`: sub-buckets {v, v+8}
    // merge into one input partition keyed v%8) and reports bucket(8)
    // clustering it genuinely has. Catalyst then plans the 16⋈8 join with
    // ZERO exchange on either side — in-body pinned like
    // join_storage_partitioned, plus PlanShapeSpec. At 100 TB this is
    // what lets a re-bucketed (grown) fact keep joining its old dims in
    // place: bucket counts evolve by powers of two, reads stay aligned,
    // nothing re-shuffles. Oracle = the plain logical join.
    Q("join_spj_bucket_transform",
      (spark, sfDir) => {
        import graft.ops.Acid
        val tA = graft.Tmp.dir("spjt_orders", sfDir)
        val tB = graft.Tmp.dir("spjt_customer", sfDir)
        Acid.reset(tA); Acid.reset(tB)
        Acid.appendTxnHidden(spark, tA,
          Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"),
            (graft.Det.money(col("o_totalprice")) * 100).cast("long").as("cents")),
          txnId = 0L, transforms = Seq(Acid.bucketOf("o_custkey", 16)))
        Acid.appendTxnHidden(spark, tB,
          Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment")),
          txnId = 0L, transforms = Seq(Acid.bucketOf("c_custkey", 8)))
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val src = classOf[graft.sources.AcidBucketedSource].getName
          // the 16-bucket fact scanned AS bucket(8): the derived column
          // surfaces the coarse value, so both sides cluster identically
          val dA = spark.read.format(src).option("path", tA)
            .option("bucket", "b16_o_custkey").option("coarsen", "8").load()
          val dB = spark.read.format(src).option("path", tB)
            .option("bucket", "b8_c_custkey").load()
          val agg = dA.join(dB,
              dA("b16_o_custkey") === dB("b8_c_custkey") &&
                dA("o_custkey") === dB("c_custkey"))
            .groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
            .orderBy(col("c_mktsegment"))
          val rows = agg.collect()
          val finalPlan = agg.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          def walk(p: org.apache.spark.sql.execution.SparkPlan):
              Seq[org.apache.spark.sql.execution.SparkPlan] =
            p +: (p match {
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(q.plan)
              case _ => p.children.flatMap(walk)
            })
          val smj = walk(finalPlan).collectFirst {
            case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          }.getOrElse(sys.error(
            "join_spj_bucket_transform: no SortMergeJoin in the final plan —\n" +
              finalPlan.toString.take(3000)))
          val shuffles = smj.children.flatMap(walk).collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
            case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
          }
          require(shuffles.isEmpty,
            s"join_spj_bucket_transform: the join shuffled —\n${finalPlan.toString.take(2000)}")
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq, 1), agg.schema)
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""".trim)),

    // SPJ under BUCKET SKEW — partially-clustered distribution (r18, the
    // skew half of the compatible-transform story; Iceberg/SPARK-41471):
    // one bucket of the fact is HOT (its key family carries 4× the rows,
    // landed across 4 commits = 4 files) — under plain SPJ that bucket is
    // ONE straggler task however large it grows. With `slice=true` the
    // scan emits one input partition PER FILE (duplicate partition keys,
    // legal in KeyGroupedPartitioning) and
    // `partiallyClusteredDistribution.enabled` keeps the fact side SPLIT,
    // replicating the dim's matching groups instead — the hot bucket runs
    // as 4 tasks, still ZERO full shuffle on either side (in-body pinned:
    // shuffle-free SMJ + the fact scan planned with MORE partitions than
    // buckets). At 100 TB this is the difference between a skewed key
    // family gating the whole join and it merely using more slots.
    Q("join_spj_skew",
      (spark, sfDir) => {
        import graft.ops.Acid
        val tA = graft.Tmp.dir("spjs_orders", sfDir)
        val tB = graft.Tmp.dir("spjs_customer", sfDir)
        Acid.reset(tA); Acid.reset(tB)
        val fact = Tables.orders(spark, sfDir).select(col("o_orderkey"),
          col("o_custkey"),
          (graft.Det.money(col("o_totalprice")) * 100).cast("long").as("cents"))
        val hot = fact.filter(pmod(col("o_custkey"), lit(8)) === 3)
        Acid.appendTxnHidden(spark, tA, fact, txnId = 0L,
          transforms = Seq(Acid.bucketOf("o_custkey", 8)))
        (1L to 3L).foreach(i => Acid.appendTxnHidden(spark, tA, hot, txnId = i,
          transforms = Seq(Acid.bucketOf("o_custkey", 8))))
        Acid.appendTxnHidden(spark, tB,
          Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment")),
          txnId = 0L, transforms = Seq(Acid.bucketOf("c_custkey", 8)))
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true",
          "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val src = classOf[graft.sources.AcidBucketedSource].getName
          val dA = spark.read.format(src).option("path", tA)
            .option("bucket", "b8_o_custkey").option("slice", "true").load()
          val dB = spark.read.format(src).option("path", tB)
            .option("bucket", "b8_c_custkey").load()
          val agg = dA.join(dB,
              dA("b8_o_custkey") === dB("b8_c_custkey") &&
                dA("o_custkey") === dB("c_custkey"))
            .groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
            .orderBy(col("c_mktsegment"))
          val rows = agg.collect()
          val finalPlan = agg.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          def walk(p: org.apache.spark.sql.execution.SparkPlan):
              Seq[org.apache.spark.sql.execution.SparkPlan] =
            p +: (p match {
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(q.plan)
              case _ => p.children.flatMap(walk)
            })
          val smj = walk(finalPlan).collectFirst {
            case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          }.getOrElse(sys.error(
            "join_spj_skew: no SortMergeJoin in the final plan —\n" +
              finalPlan.toString.take(3000)))
          val shuffles = smj.children.flatMap(walk).collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
            case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
          }
          require(shuffles.isEmpty,
            s"join_spj_skew: the join shuffled —\n${finalPlan.toString.take(2000)}")
          // the hot bucket must NOT have collapsed to one straggler: the
          // fact scan plans one partition per FILE (> 8 buckets)
          val factSlices = walk(finalPlan).collect {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
              if b.toString.contains("b8_o_custkey") => b.inputPartitions.size
          }
          require(factSlices.exists(_ > 8),
            s"join_spj_skew: fact scan not sliced (partitions: $factSlices)")
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq, 1), agg.schema)
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      },
      Some("""
        WITH fact AS (
          SELECT o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM orders
          UNION ALL
          SELECT o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM orders, (SELECT * FROM range(1, 4)) r
          WHERE o_custkey % 8 = 3
        )
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM fact JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""".trim)),

    // Binned PURE range join (r8): count lineitems shipping within 7 days
    // of each order's date — NO equi key at all, the case Catalyst can
    // only plan as a nested-loop cross product (join_interval/asof both
    // lean on an equi column; this one has none). The bin trick restores
    // an equi key: week = epoch-micros div 7d, each order probes its own
    // week and the next (a 7-day window spans at most 2 week bins), the
    // residual range predicate filters inside the match. Plan becomes a
    // shuffle equi join on the bin — candidate fanout is bounded by rows
    // per bin, never |orders| × |lineitem|. At 100 TB bin width tunes the
    // shuffle-width vs candidate-fanout trade; PlanShapeSpec pins that no
    // nested-loop/cartesian survives. LEFT join keeps zero-count orders.
    Q("join_range_binned",
      (spark, sfDir) => {
        val week = 7L * 86400L * 1000000L
        // TRUE floor division in exact int64 (subtract the non-negative
        // pmod first, then `div` is exact): double `/` + cast(long)
        // truncates toward zero, which breaks the at-most-2-bins invariant
        // for pre-1970 timestamps and double-rounds near 2^53 µs (r8 advice)
        def wkOf(tsCol: String): org.apache.spark.sql.Column =
          expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${week}L))" +
            s" div ${week}L")
        val orders = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate"),
            wkOf("o_orderdate").as("wk0"))
          .select(col("o_orderkey"), col("o_orderdate"),
            explode(array(col("wk0"), col("wk0") + 1)).as("wk"))
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_shipdate"),
            wkOf("l_shipdate").as("wk"))
        orders.join(li,
            orders("wk") === li("wk") &&
            li("l_shipdate") >= orders("o_orderdate") &&
            li("l_shipdate") < orders("o_orderdate") + expr("INTERVAL 7 DAY"),
            "left")
          .groupBy(col("o_orderkey"))
          .agg(count(col("l_orderkey")).as("n_ship"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o.o_orderkey, CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_ship
        FROM orders o LEFT JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        GROUP BY 1
        ORDER BY 1""".trim)),

    // Dynamic partition pruning (r9): the runtime sibling of
    // sink_partitioned's STATIC pruning — the fact side is a
    // date-partitioned layout, the dim side's filter is on a
    // NON-partition attribute (day-of-month ≤ 7), so no literal
    // partition predicate exists at plan time. Catalyst injects a
    // DynamicPruningExpression into the fact scan that evaluates the
    // dim side first (reusing its broadcast) and prunes fact partition
    // directories at RUNTIME — at 100 TB this is the difference between
    // scanning ~23% of the table and all of it whenever the selective
    // predicate lives on a dimension, which is every star-schema query.
    // PlanShapeSpec pins the injected pruning subquery; the oracle runs
    // the same aggregate over the unpartitioned original.
    Q("join_dpp",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("dpp", sfDir)
        Layout.writeDatePartitionedEvents(spark, sfDir, dir)
        val fact = spark.read.parquet(dir)
        val dim = Tables.events(spark, sfDir)
          .select(to_date(col("ts")).as("event_date")).distinct()
          .filter(dayofmonth(col("event_date")) <= 7)
        fact.join(dim, "event_date")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), Det.sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${Det.sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE EXTRACT(day FROM ts) <= 7
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Runtime bloom-filter join (r9): when neither side broadcasts (the
    // 100 TB fact-to-fact case), a shuffle join still moves EVERY fact
    // row — including the ~75% that can never match the filtered build
    // side. Spark's InjectRuntimeFilter closes the gap: a compact bloom
    // filter is aggregated from the filtered creation side and pushed
    // into the fact scan as `might_contain(xxhash64(key))`, dropping
    // non-matching rows BEFORE the exchange. Broadcast is disabled and
    // the injection thresholds opened inside the query (saved/restored —
    // the 10 GB application-side default exists because the filter only
    // pays for itself on big scans); the semi-join-shaped plan is pinned
    // by PlanShapeSpec. Bloom filters have no false negatives and the
    // exact join runs after the prefilter, so the result is EXACTLY the
    // plain join — which is the oracle.
    Q("join_bloom_prefilter",
      (spark, sfDir) => {
        val saved = Seq(
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
          .map(k => k -> spark.conf.getOption(k))
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
          // localCheckpoint is EAGER: the join executes here, while the
          // injection confs are live (Spark plans lazily — without this
          // the `finally` below would restore the confs before any action
          // ran and the bloom filter would never be injected)
          bloomPrefilterJoin(spark, sfDir).localCheckpoint()
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      },
      Some(s"""
        SELECT l_returnflag, COUNT(*) AS n,
          ${Det.sqlSumMoney("l_extendedprice")} AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag
        ORDER BY l_returnflag""".trim)),

    // Null-safe equi join (r9): `<=>` (IS NOT DISTINCT FROM) treats NULL
    // as a joinable value — the semantics every CDC/merge keyed on a
    // nullable business key needs (plain `=` silently drops the NULL
    // group). The key property at scale: Spark keeps EqualNullSafe as a
    // hash-join KEY (nulls hash like any value), so this plans as a
    // normal equi join — broadcast here, shuffled hash/SMJ when both
    // sides are big — never a nested-loop theta join (PlanShapeSpec pins
    // no-BNLJ/no-cartesian). Both sides pre-aggregate to key cardinality
    // before the join: the 100 TB shape when the join only needs group
    // counts, and it makes the NULL-group match a single row pair rather
    // than a |nulls|×|nulls| fanout.
    Q("join_null_safe",
      (spark, sfDir) => {
        val c = Tables.customer(spark, sfDir)
          .select(expr("NULLIF(c_nationkey % 5, 0)").as("k"))
          .groupBy("k").agg(count(lit(1)).as("c_cnt"))
        val s = Tables.supplier(spark, sfDir)
          .select(expr("NULLIF(s_nationkey % 5, 0)").as("k"))
          .groupBy("k").agg(count(lit(1)).as("s_cnt"))
        c.join(broadcast(s), c("k") <=> s("k"))
          .select(c("k").as("k"), col("c_cnt"), col("s_cnt"))
          .orderBy(col("k").asc_nulls_first)
      },
      Some("""
        WITH c AS (
          SELECT NULLIF(c_nationkey % 5, 0) AS k, COUNT(*) AS c_cnt
          FROM customer GROUP BY 1),
        s AS (
          SELECT NULLIF(s_nationkey % 5, 0) AS k, COUNT(*) AS s_cnt
          FROM supplier GROUP BY 1)
        SELECT c.k AS k, c.c_cnt, s.s_cnt
        FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
        ORDER BY k ASC NULLS FIRST""".trim)),

    // Grid-bucketed spatial neighbor join (r12): radius search over the
    // user point cloud (`fn_geo_grid`'s deterministic µdeg lat/lon)
    // WITHOUT the O(n²) cross product — the classic distributed spatial
    // join: cell size = radius, each LEFT point explodes to its 3×3
    // neighborhood cells (complete by construction: dist ≤ r ⇒ cells
    // differ by ≤1 per axis), equi-join on the RIGHT point's single home
    // cell, then the exact integer squared-distance residual. Candidate
    // volume is 9·n density-bounded rows vs n² — the shape that survives
    // a planetary point set; a hot cell (urban skew) is one key, split by
    // AQE skew-join. Zero-neighbor points are kept by the final left
    // join. The oracle takes DuckDB's IEJoin band path — same pairs,
    // different engine-appropriate algorithm on each side.
    Q("join_spatial_grid",
      (spark, sfDir) => {
        val cell = 5000000L // cell == radius: 5 degrees in micro-degrees
        val pts = Tables.events(spark, sfDir)
          .select(col("user_id")).distinct()
          .withColumn("lat",
            pmod(col("user_id") * 2654435761L, lit(180000000L)) - 90000000L)
          .withColumn("lon",
            pmod(col("user_id") * 40503L + 7L, lit(360000000L)) - 180000000L)
          .withColumn("cx", expr(s"CAST(floor(lat / $cell) AS BIGINT)"))
          .withColumn("cy", expr(s"CAST(floor(lon / $cell) AS BIGINT)"))
        val probes = pts.select(col("user_id").as("a_id"),
            col("lat").as("a_lat"), col("lon").as("a_lon"),
            explode(expr("flatten(transform(sequence(-1, 1), dx -> " +
              "transform(sequence(-1, 1), dy -> " +
              "struct(cx + dx AS qx, cy + dy AS qy))))")).as("q"))
          .select(col("a_id"), col("a_lat"), col("a_lon"),
            col("q.qx").as("qx"), col("q.qy").as("qy"))
        val homes = pts.select(col("user_id").as("b_id"),
          col("lat").as("b_lat"), col("lon").as("b_lon"),
          col("cx").as("bx"), col("cy").as("by"))
        val nbr = probes.join(homes,
            col("qx") === col("bx") && col("qy") === col("by") &&
              col("a_id") =!= col("b_id"))
          .filter((col("a_lat") - col("b_lat")) * (col("a_lat") - col("b_lat")) +
            (col("a_lon") - col("b_lon")) * (col("a_lon") - col("b_lon"))
            <= lit(cell * cell))
          .groupBy(col("a_id")).agg(count(lit(1)).as("n_nbr"))
        pts.join(nbr, pts("user_id") === nbr("a_id"), "left")
          .select(col("user_id"), coalesce(col("n_nbr"), lit(0L)).as("n_nbr"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH p AS (
          SELECT user_id,
                 (user_id * 2654435761) % 180000000 - 90000000 AS lat,
                 (user_id * 40503 + 7) % 360000000 - 180000000 AS lon
          FROM (SELECT DISTINCT user_id FROM events)
        ), nbr AS (
          SELECT a.user_id AS id, COUNT(*) AS n_nbr
          FROM p a JOIN p b
            ON b.lat BETWEEN a.lat - 5000000 AND a.lat + 5000000
           AND b.lon BETWEEN a.lon - 5000000 AND a.lon + 5000000
           AND a.user_id <> b.user_id
          WHERE (a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon) <= 25000000000000
          GROUP BY 1
        )
        SELECT p.user_id, COALESCE(n.n_nbr, CAST(0 AS BIGINT)) AS n_nbr
        FROM p LEFT JOIN nbr n ON n.id = p.user_id
        ORDER BY p.user_id""".trim)),

    // Blocked fuzzy join (r12): the entity-resolution primitive — find
    // near-identical part names WITHOUT the n² all-pairs comparison.
    // Two-stage: (1) BLOCK on a cheap deterministic key (first name
    // word) plus the classic length prefilter (levenshtein(a,b) ≥
    // |len(a)−len(b)|, so a length gap over the threshold can never
    // match — pairs are pruned before any edit-distance work); (2)
    // VERIFY candidates with exact levenshtein (cross-engine agreement
    // already pinned by fn_edit_distance). Output is the per-block
    // candidate/match/distance profile. At 100 TB: blocking bounds the
    // quadratic to within-block pairs (the LSH-bucket argument in string
    // space) — which is only a bound if block cardinality scales with
    // the data, so the key is the first TWO name words (the one-word key
    // measurably went quadratic on the scale probe: 8 blocks growing
    // linearly ⇒ 25 M pairs at sf0.1); a still-hot block is one join
    // key — AQE skew-split, or widen to three words / add a length
    // bucket. The catalog-entity domain itself is dimension-sized, not
    // event-sized.
    Q("join_fuzzy_blocked",
      (spark, sfDir) => {
        val p = Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_name"),
            concat_ws(" ", split(col("p_name"), " ").getItem(0),
              split(col("p_name"), " ").getItem(1)).as("blk"),
            length(col("p_name")).as("len"))
        // pin the join parallelism EXPLICITLY: the self-join input is a
        // few MB, so AQE coalesces its shuffle to ~1 partition by input
        // bytes — but this join's OUTPUT is multiplicative (within-block
        // pairs), which AQE cannot see, and the levenshtein verify then
        // runs single-threaded (measured: 15+ min at a 10x catalog vs
        // seconds parallel). A user repartition by the join key is
        // preserved by AQE and spreads the blocks across the cluster.
        val pr = p.repartition(64, col("blk"))
        pr.as("a").join(pr.as("b"),
            col("a.blk") === col("b.blk") &&
              col("a.p_partkey") < col("b.p_partkey") &&
              abs(col("a.len") - col("b.len")) <= 15)
          .select(col("a.blk").as("blk"),
            levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
          .groupBy(col("blk"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("dist") <= 15, 1L).otherwise(0L)).as("n_match"),
            min(col("dist")).as("min_dist"),
            max(col("dist")).as("max_dist"))
          .orderBy(col("blk"))
      },
      Some("""
        WITH p AS (
          SELECT p_partkey, p_name,
                 string_split(p_name, ' ')[1] || ' ' ||
                 string_split(p_name, ' ')[2] AS blk,
                 length(p_name) AS len
          FROM part
        ), pairs AS (
          SELECT a.blk, levenshtein(a.p_name, b.p_name) AS dist
          FROM p a JOIN p b
            ON a.blk = b.blk AND a.p_partkey < b.p_partkey
           AND abs(a.len - b.len) <= 15
        )
        SELECT blk, COUNT(*) AS n_pairs,
               CAST(SUM(CASE WHEN dist <= 15 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_match,
               CAST(MIN(dist) AS INT) AS min_dist,
               CAST(MAX(dist) AS INT) AS max_dist
        FROM pairs
        GROUP BY blk
        ORDER BY blk""".trim)),

    // Interval-overlap aggregation (r12): total promo-exposure time —
    // user sessions (30-min-gap sessionization, the window_sessionize
    // recipe on integer micros) intersected with six deterministic
    // 2-day promo windows laid every 5 days from the stream origin;
    // per promo: overlapping sessions, distinct users, summed overlap
    // micros. Half-open [start, end) intervals: overlap = min(ends) −
    // max(starts) > 0 — pure int64 interval algebra. The promo side is
    // dim-sized, so the inequality join is a BROADCAST of 6 rows (a
    // nested-loop against 6 build rows is the right plan — the event
    // side streams through codegen once); the only table-sized
    // exchanges are the per-user session window and the final 6-row agg.
    Q("join_interval_overlap",
      (spark, sfDir) => {
        val ev = Tables.events(spark, sfDir)
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
        val byU = Window.partitionBy(col("user_id")).orderBy(col("t"))
        val sess = ev
          .withColumn("new_s",
            when(lag(col("t"), 1).over(byU).isNull ||
              col("t") - lag(col("t"), 1).over(byU) > 1800000000L, 1)
              .otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(
            byU.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("t")).as("s_start"), max(col("t")).as("s_end"))
        val gmin = ev.agg(min(col("t")).as("g0"))
        val promos = spark.range(0, 6).select(col("id").as("promo_id"))
          .crossJoin(broadcast(gmin))
          .withColumn("p_start", col("g0") + col("promo_id") * 432000000000L)
          .withColumn("p_end", col("p_start") + 172800000000L)
          .select(col("promo_id"), col("p_start"), col("p_end"))
        sess.join(broadcast(promos),
            least(col("s_end"), col("p_end"))
              - greatest(col("s_start"), col("p_start")) > 0)
          .withColumn("ov", least(col("s_end"), col("p_end"))
            - greatest(col("s_start"), col("p_start")))
          .groupBy(col("promo_id"))
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("ov")).as("overlap_us"))
          .orderBy(col("promo_id"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS t FROM events
        ), marked AS (
          SELECT user_id, t,
                 CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                        OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                           > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM ev
        ), sid AS (
          SELECT user_id, t,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM marked
        ), sess AS (
          SELECT user_id, sid, MIN(t) AS s_start, MAX(t) AS s_end
          FROM sid GROUP BY 1, 2
        ), promos AS (
          SELECT i AS promo_id,
                 (SELECT MIN(t) FROM ev) + i * 432000000000 AS p_start,
                 (SELECT MIN(t) FROM ev) + i * 432000000000 + 172800000000
                   AS p_end
          FROM range(0, 6) r(i)
        ), ov AS (
          SELECT p.promo_id, s.user_id,
                 least(s.s_end, p.p_end) - greatest(s.s_start, p.p_start)
                   AS ov_us
          FROM sess s JOIN promos p
            ON least(s.s_end, p.p_end) - greatest(s.s_start, p.p_start) > 0
        )
        SELECT promo_id, COUNT(*) AS n_sessions,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(ov_us) AS BIGINT) AS overlap_us
        FROM ov
        GROUP BY promo_id
        ORDER BY promo_id""".trim)),
  )
}
