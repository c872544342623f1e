package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ops.Acid
import graft.plans.MvRewrite

/** Materialized-view query rewrite (plans/MvRewrite.scala): routing,
  * compensation exactness, and every soundness gate that must DECLINE.
  * The `sql_mv_rewrite` key pins the freshness lifecycle end-to-end; this
  * suite pins the rule's match surface at sf0.001.
  */
class MvRewriteSpec extends SparkFixture {
  import Det._

  private val base = "/tmp/graft_mvspec_base"
  private val mvDir = "/tmp/graft_mvspec_mv"

  private def scanned(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.toSeq
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  private def routed(df: DataFrame): Boolean = {
    val s = scanned(df)
    s.exists(_.contains("mvspec_mv")) && !s.exists(_.contains("mvspec_base"))
  }

  private lazy val ready: Unit = {
    Acid.reset(base)
    val or = Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
      (money(col("o_totalprice")) * 100).cast("long").as("price_cents"))
    Acid.appendTxn(spark, base, or, 0L)
    Acid.read(spark, base)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
      .write.mode("overwrite").parquet(mvDir)
    MvRewrite.register(spark, "mvspec", base, mvDir,
      Seq("o_orderstatus", "o_orderpriority"), "n",
      Map("price_cents" -> "sum_cents"))
  }

  private def tbl = { ready; Acid.read(spark, base) }

  test("roll-up to a grouping subset routes to the MV and matches the direct recompute") {
    val q = tbl.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
      .orderBy(col("o_orderstatus"))
    assert(routed(q), s"expected MV route, scanned ${scanned(q)}")
    MvRewrite.unregister("mvspec")
    val direct = try {
      tbl.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
        .orderBy(col("o_orderstatus")).collect().toSeq
    } finally MvRewrite.register(spark, "mvspec", base, mvDir,
      Seq("o_orderstatus", "o_orderpriority"), "n",
      Map("price_cents" -> "sum_cents"))
    assert(q.collect().toSeq == direct)
  }

  test("exact-grain group-by (both keys) rewrites, including aliased key passthrough") {
    val q = tbl.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("price_cents")).as("s"))
      .select(col("o_orderstatus").as("st"), col("o_orderpriority"), col("s"))
      .orderBy(col("st"), col("o_orderpriority"))
    assert(routed(q), s"expected MV route, scanned ${scanned(q)}")
    // spot value: one group's sum equals the base-side recompute
    val got = q.filter(col("st") === "F").limit(1).collect()
    assert(got.nonEmpty)
    val expect = tbl
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderpriority") === got.head.getString(1))
      .agg(sum(col("price_cents"))).head.getLong(0)
    assert(got.head.getLong(2) == expect)
  }

  test("global aggregate (no grouping) rewrites; count stays non-null long") {
    val q = tbl.agg(count(lit(1)).as("n"), sum(col("price_cents")).as("s"))
    assert(routed(q), s"expected MV route, scanned ${scanned(q)}")
    val r = q.head
    assert(r.getLong(0) == tbl.count())
  }

  test("filter on a key column commutes and routes; on a non-key column it declines") {
    val onKey = tbl.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(routed(onKey), s"expected MV route, scanned ${scanned(onKey)}")
    val onValue = tbl.filter(col("price_cents") > 100000L)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(!routed(onValue) && scanned(onValue).exists(_.contains("mvspec_base")),
      "a row-level filter must not be answered from group partials")
  }

  test("non-covered aggregates decline: distinct, avg, sum of an unregistered column") {
    val distinctQ = tbl.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_orderpriority")).as("d"))
    assert(!routed(distinctQ), "count distinct cannot roll up from (n, sum)")
    val avgQ = tbl.groupBy(col("o_orderstatus"))
      .agg(avg(col("price_cents")).as("a"))
    assert(!routed(avgQ), "avg is not a registered partial")
    val otherSum = tbl.groupBy(col("o_orderstatus"))
      .agg(sum(col("o_orderkey")).as("s"))
    assert(!routed(otherSum), "sum of an unregistered column must decline")
  }

  test("grouping by a non-key column declines") {
    val q = tbl.groupBy(col("o_orderkey") % 10).agg(count(lit(1)).as("n"))
    assert(!routed(q), "non-key (and non-attribute) grouping must decline")
  }

  // ---- join-MV rewrite (fact ⋈ dim summary table) ----

  private val jfact = "/tmp/graft_mvspec_jfact"
  private val jmv = "/tmp/graft_mvspec_jmv"

  private def jroutes(df: DataFrame): Boolean = {
    val s = scanned(df)
    s.exists(_.contains("mvspec_jmv")) &&
      !s.exists(_.contains("mvspec_jfact")) &&
      !s.exists(_.contains("customer.parquet"))
  }

  private def jdim = Tables.customer(spark, sf001)
    .select(col("c_custkey"), col("c_mktsegment"))

  private lazy val jready: Unit = {
    Acid.reset(jfact)
    val or = Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      (money(col("o_totalprice")) * 100).cast("long").as("price_cents"))
    Acid.appendTxn(spark, jfact, or, 0L)
    Acid.read(spark, jfact)
      .join(jdim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
      .write.mode("overwrite").parquet(jmv)
    MvRewrite.registerJoin(spark, "mvspec_join", jfact, jdim,
      "o_custkey", "c_custkey", jmv,
      Seq("c_mktsegment", "o_orderstatus"), "n",
      Map("price_cents" -> "sum_cents"))
  }

  private def jtbl = { jready; Acid.read(spark, jfact) }

  test("join-MV: the star aggregate routes to the MV (no join left) and matches the direct recompute") {
    val q = jtbl.join(jdim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
      .orderBy(col("c_mktsegment"))
    assert(jroutes(q), s"expected join-MV route, scanned ${scanned(q)}")
    assert(q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "the rewritten plan must contain no join")
    MvRewrite.unregister("mvspec_join")
    val direct = try {
      jtbl.join(jdim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
        .orderBy(col("c_mktsegment")).collect().toSeq
    } finally MvRewrite.registerJoin(spark, "mvspec_join", jfact, jdim,
      "o_custkey", "c_custkey", jmv,
      Seq("c_mktsegment", "o_orderstatus"), "n",
      Map("price_cents" -> "sum_cents"))
    assert(q.collect().toSeq == direct)
  }

  test("join-MV: swapped join sides route identically") {
    val q = jdim.join(jtbl, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(jroutes(q), s"expected join-MV route, scanned ${scanned(q)}")
  }

  test("join-MV: key-column filters on either side commute and route") {
    val q = jtbl.filter(col("o_orderstatus") === "F")
      .join(jdim.filter(col("c_mktsegment") =!= "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(sum(col("price_cents")).as("s"))
    assert(jroutes(q), s"expected join-MV route, scanned ${scanned(q)}")
  }

  test("join-MV: a left-outer join, a wrong join key, and a non-key filter all decline") {
    val outer = jtbl.join(jdim, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(!jroutes(outer), "outer join must decline (null-extended rows differ)")
    val wrongKey = jtbl.join(jdim, col("o_orderkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(!jroutes(wrongKey), "a different join key is a different view")
    val rowFilter = jtbl.filter(col("price_cents") > 100000L)
      .join(jdim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(!jroutes(rowFilter), "a row-level filter must decline")
  }

  test("SQL verbs: CREATE MATERIALIZED VIEW routes SQL + DataFrame aggregates; DROP removes the route") {
    import graft.ops.SqlEntry
    val base = "/tmp/graft_mvspec_sqlbase"
    val mv = "/tmp/graft_mvspec_sqlmv"
    Acid.reset(base)
    val or = Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_orderstatus"),
      (money(col("o_totalprice")) * 100).cast("long").as("price_cents"))
    Acid.appendTxn(spark, base, or, 0L)
    val out = SqlEntry.sqlLakehouse(spark,
      s"CREATE MATERIALIZED VIEW mvspec_sql AT '$mv' AS SELECT " +
        "o_orderstatus, COUNT(*) AS n, SUM(price_cents) AS sum_cents " +
        s"FROM acid_table('$base') GROUP BY o_orderstatus").head
    assert(out.getString(0) == "create_mv" && out.getLong(2) == 0L)
    def sqlAgg = SqlEntry.sqlLakehouse(spark,
      "SELECT o_orderstatus, COUNT(*) AS n FROM " +
        s"acid_table('$base') GROUP BY o_orderstatus ORDER BY o_orderstatus")
    val routedScan = scanned(sqlAgg)
    assert(routedScan.exists(_.contains("mvspec_sqlmv")) &&
      !routedScan.exists(_.contains("mvspec_sqlbase")),
      s"SQL-entered aggregate must route, scanned $routedScan")
    // values match the base recompute exactly
    val expect = Acid.read(spark, base).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).orderBy(col("o_orderstatus"))
      .collect().toSeq
    assert(sqlAgg.collect().toSeq == expect)
    // DROP removes the route; the same text runs on the base again
    SqlEntry.sqlLakehouse(spark, "DROP MATERIALIZED VIEW mvspec_sql")
    assert(scanned(sqlAgg).exists(_.contains("mvspec_sqlbase")),
      "after DROP the aggregate must scan the base")
  }

  test("incremental REFRESH: appends + MoR deletes merge as deltas and equal the full recompute; a COW rewrite falls back to full") {
    import graft.ops.SqlEntry
    val base = "/tmp/graft_mvspec_incbase"
    val mv = "/tmp/graft_mvspec_incmv"
    Acid.reset(base)
    val or = Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_orderstatus"),
      (money(col("o_totalprice")) * 100).cast("long").as("price_cents"))
    Acid.appendTxn(spark, base, or.filter(col("o_orderkey") % 3 === 0), 0L)
    SqlEntry.sqlLakehouse(spark,
      s"CREATE MATERIALIZED VIEW mvspec_inc AT '$mv' AS SELECT " +
        "o_orderstatus, COUNT(*) AS n, SUM(price_cents) AS sum_cents " +
        s"FROM acid_table('$base') GROUP BY o_orderstatus")
    // stale the view with an append AND a MoR equality delete — the feed
    // carries both inserts and delete preimages
    Acid.appendTxn(spark, base, or.filter(col("o_orderkey") % 3 === 1), 1L)
    Acid.deleteTxn(spark, base,
      Tables.orders(spark, sf001).filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey")), "o_orderkey", 2L)
    val r = SqlEntry.sqlLakehouse(spark,
      "REFRESH MATERIALIZED VIEW mvspec_inc").head
    assert(r.getString(3) == "incremental",
      s"append+MoR-delete window must refresh incrementally, got ${r.getString(3)}")
    // the incrementally-maintained view equals the full recompute exactly
    val expect = Acid.read(spark, base).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    val got = spark.read.parquet(mv)
      .orderBy(col("o_orderstatus")).collect().toSeq
    assert(got == expect, "incremental refresh diverged from the recompute")
    // and the refreshed view routes again
    val q = Acid.read(spark, base).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    assert(scanned(q).exists(_.contains("mvspec_incmv")),
      s"refreshed view must route, scanned ${scanned(q)}")
    // a COW UPDATE rewrites files — the feed refuses the window and the
    // refresh falls back to the full recompute, still correct
    Acid.updateWhere(spark, base,
      Seq(("o_orderstatus", lit("X"))), col("o_orderkey") % 11 === 0, 3L)
    val r2 = SqlEntry.sqlLakehouse(spark,
      "REFRESH MATERIALIZED VIEW mvspec_inc").head
    assert(r2.getString(3) == "full",
      s"rewrite-crossing window must fall back to full, got ${r2.getString(3)}")
    val expect2 = Acid.read(spark, base).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    assert(spark.read.parquet(mv).orderBy(col("o_orderstatus"))
      .collect().toSeq == expect2)
    MvRewrite.unregister("mvspec_inc")
  }

  test("parents survive the rewrite: HAVING and ORDER BY over the rewritten aggregate resolve (exprIds preserved)") {
    val q = tbl.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("s"))
      .filter(col("n") > 5L)          // HAVING over the rewritten output
      .orderBy(col("s").desc)
    assert(routed(q), s"expected MV route under HAVING/sort, scanned ${scanned(q)}")
    MvRewrite.unregister("mvspec")
    val direct = try {
      tbl.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("s"))
        .filter(col("n") > 5L).orderBy(col("s").desc).collect().toSeq
    } finally MvRewrite.register(spark, "mvspec", base, mvDir,
      Seq("o_orderstatus", "o_orderpriority"), "n",
      Map("price_cents" -> "sum_cents"))
    assert(q.collect().toSeq == direct)
  }

  test("two MVs over one base: the matcher tries every covering view and picks the one whose grain fits") {
    ready
    val mvCoarse = "/tmp/graft_mvspec_mv_coarse"
    // a second, coarser view: status-grain only
    Acid.read(spark, base).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
      .write.mode("overwrite").parquet(mvCoarse)
    MvRewrite.register(spark, "mvspec_coarse", base, mvCoarse,
      Seq("o_orderstatus"), "n", Map("price_cents" -> "sum_cents"))
    try {
      // a priority-grain query fits ONLY the fine view — the coarse one
      // (sorted first by name) must be tried, fail its grain gate, and
      // fall through to the fine view rather than declining outright
      val fine = tbl.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val sFine = scanned(fine)
      assert(sFine.exists(_.contains("mvspec_mv")) &&
        !sFine.exists(_.contains("mv_coarse")) &&
        !sFine.exists(_.contains("mvspec_base")),
        s"priority grain must route to the fine view, scanned $sFine")
      // a status-grain query is answerable by either; some view must win
      val coarse = tbl.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val sCoarse = scanned(coarse)
      assert(!sCoarse.exists(_.contains("mvspec_base")),
        s"status grain must route to a view, scanned $sCoarse")
    } finally MvRewrite.unregister("mvspec_coarse")
  }

  test("min/max partials: roll up exactly, decline when unregistered, refresh incrementally only while insert-only") {
    import graft.ops.SqlEntry
    val base = "/tmp/graft_mvspec_mmbase"
    val mv = "/tmp/graft_mvspec_mmmv"
    Acid.reset(base)
    val or = Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_orderstatus"),
      (money(col("o_totalprice")) * 100).cast("long").as("price_cents"))
    Acid.appendTxn(spark, base, or.filter(col("o_orderkey") % 2 === 0), 0L)
    SqlEntry.sqlLakehouse(spark,
      s"CREATE MATERIALIZED VIEW mvspec_mm AT '$mv' AS SELECT " +
        "o_orderstatus, COUNT(*) AS n, SUM(price_cents) AS sum_cents, " +
        "MIN(price_cents) AS min_cents, MAX(price_cents) AS max_cents " +
        s"FROM acid_table('$base') GROUP BY o_orderstatus")
    def q = Acid.read(spark, base).groupBy(col("o_orderstatus"))
      .agg(min(col("price_cents")).as("lo"), max(col("price_cents")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
    assert(scanned(q).exists(_.contains("mvspec_mmmv")),
      s"min/max aggregate must route, scanned ${scanned(q)}")
    MvRewrite.unregister("mvspec_mm")
    val direct = q.collect().toSeq
    SqlEntry.sqlLakehouse(spark,  // re-pin (base unchanged → same content)
      s"CREATE MATERIALIZED VIEW mvspec_mm AT '$mv' AS SELECT " +
        "o_orderstatus, COUNT(*) AS n, SUM(price_cents) AS sum_cents, " +
        "MIN(price_cents) AS min_cents, MAX(price_cents) AS max_cents " +
        s"FROM acid_table('$base') GROUP BY o_orderstatus")
    assert(q.collect().toSeq == direct, "min/max roll-up diverged")
    // min over an UNREGISTERED column declines
    val other = Acid.read(spark, base).groupBy(col("o_orderstatus"))
      .agg(min(col("o_orderkey")).as("k"))
    assert(!scanned(other).exists(_.contains("mvspec_mmmv")),
      "min of an unregistered column must decline")
    // ground truth = the UNREGISTERED recompute compared to the MV's own
    // parquet — a routed-vs-routed compare would be a tautology
    def mvMatchesRecompute(): Unit = {
      MvRewrite.unregister("mvspec_mm")
      val truth = Acid.read(spark, base).groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"),
          min(col("price_cents")).as("min_cents"),
          max(col("price_cents")).as("max_cents"))
        .orderBy(col("o_orderstatus")).collect().toSeq
      val got = spark.read.parquet(mv)
        .select(col("o_orderstatus"), col("n"), col("sum_cents"),
          col("min_cents"), col("max_cents"))
        .orderBy(col("o_orderstatus")).collect().toSeq
      assert(got == truth, "MV content diverged from the recompute")
      // re-arm WITHOUT recomputing — the content under test stays
      MvRewrite.register(spark, "mvspec_mm", base, mv, Seq("o_orderstatus"),
        "n", Map("price_cents" -> "sum_cents"),
        Map("price_cents" -> "min_cents"), Map("price_cents" -> "max_cents"))
    }
    // insert-only staleness refreshes INCREMENTALLY (min/max monotone)
    Acid.appendTxn(spark, base, or.filter(col("o_orderkey") % 2 === 1), 1L)
    val r1 = SqlEntry.sqlLakehouse(spark,
      "REFRESH MATERIALIZED VIEW mvspec_mm").head
    assert(r1.getString(3) == "incremental",
      s"insert-only window with min/max must stay incremental, got ${r1.getString(3)}")
    mvMatchesRecompute()
    // a delete in the window could have carried a group's extremum — the
    // refresh must take the full path, and still be exact
    Acid.deleteTxn(spark, base,
      Tables.orders(spark, sf001).filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey")), "o_orderkey", 2L)
    val r2 = SqlEntry.sqlLakehouse(spark,
      "REFRESH MATERIALIZED VIEW mvspec_mm").head
    assert(r2.getString(3) == "full",
      s"min/max across a delete window must recompute, got ${r2.getString(3)}")
    mvMatchesRecompute()
    MvRewrite.unregister("mvspec_mm")
  }

  test("time travel to a pre-pin version declines even though the version pin matches") {
    ready
    // same current version, but the scan's file set is v0-as-of-registration
    // — identical here, so instead move the table and probe BOTH guards
    val extra = Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
      (money(col("o_totalprice")) * 100).cast("long").as("price_cents"))
      .filter(col("o_orderkey") % 97 === 0)
    Acid.appendTxn(spark, base, extra, 1L)
    try {
      val live = Acid.read(spark, base).groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(!routed(live), "stale pin (base moved) must decline")
      val travel = Acid.readVersion(spark, base, 0L).groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(!routed(travel),
        "a time-travel read must decline (current version is no longer the pin)")
    } finally {
      // restore the registered snapshot for sibling tests: re-pin at head
      Acid.read(spark, base)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
        .write.mode("overwrite").parquet(mvDir)
      MvRewrite.register(spark, "mvspec", base, mvDir,
        Seq("o_orderstatus", "o_orderpriority"), "n",
        Map("price_cents" -> "sum_cents"))
    }
  }
}
