package graft

import org.apache.spark.sql.functions._

/** CBO statistics mechanics (graft.ops.Stats): ANALYZE TABLE populates
  * exact planning statistics, column stats tighten estimates, and join
  * reorder under CBO is result-invariant.
  */
class CboSpec extends SparkFixture {

  private lazy val db: String = {
    val loc = java.nio.file.Files.createTempDirectory("graft_cbo_wh").toString
    graft.ops.Stats.registerWithStats(spark, sf001, "graft_stats", loc,
      Seq("nation", "customer", "orders"))
    "graft_stats"
  }

  test("ANALYZE TABLE populates exact rowCount and column NDVs in plan statistics") {
    // plan statistics carry rowCount/column stats only when CBO is on;
    // without it Spark propagates size-only estimates
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table(s"$db.customer").queryExecution.optimizedPlan.stats
      val expected = Tables.customer(spark, sf001).count()
      assert(stats.rowCount.contains(BigInt(expected)),
        s"rowCount ${stats.rowCount} != analyzed $expected")
      assert(stats.attributeStats.nonEmpty, "FOR ALL COLUMNS must yield column stats")
      val ndv = stats.attributeStats.find(_._1.name == "c_custkey").map(_._2.distinctCount.get)
      assert(ndv.contains(BigInt(expected)), s"c_custkey NDV $ndv should equal row count")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("column stats tighten a filter's row estimate below the table rowCount") {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val full = spark.table(s"$db.orders").queryExecution.optimizedPlan.stats
      val filtered = spark.table(s"$db.orders")
        .filter(col("o_orderstatus") === lit("F"))
        .queryExecution.optimizedPlan.stats
      assert(full.rowCount.isDefined && filtered.rowCount.isDefined)
      assert(filtered.rowCount.get < full.rowCount.get,
        s"filter estimate ${filtered.rowCount} should be below ${full.rowCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("CBO join reorder is result-invariant on a 3-table star query") {
    def run(): Set[Seq[Any]] =
      spark.table(s"$db.orders")
        .join(spark.table(s"$db.customer"), col("o_custkey") === col("c_custkey"))
        .join(spark.table(s"$db.nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
    val baseline = run()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      assert(run() == baseline && baseline.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }
}
