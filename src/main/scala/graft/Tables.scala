package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table readers over the fixture parquet layout (TESTDATA.md).
  *
  * Every reader applies the declared schema from [[Schemas]] — projection
  * and predicates applied downstream are pushed into the vectorized parquet
  * scan by Catalyst (verified by plan-shape tests). At 100 TB each "table"
  * is a directory of many files, which this path handles unchanged.
  */
object Tables {

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.schema(Schemas.all(name)).parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = read(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "lineitem")
  /** Fixture generations have stored `ts` either as INT64 TIMESTAMP(NANOS)
    * (early rounds) or as plain TIMESTAMP(MICROS) (current). Detected once
    * per path from the parquet footer and cached; both land on the same
    * µs TimestampType the rest of the engine sees. Detection must run with
    * the legacy nanos flag set or the ns footer would throw on inference. */
  private val tsIsNanos = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private[graft] def eventsTsIsNanos(spark: SparkSession, path: String): Boolean = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsIsNanos.computeIfAbsent(path, p =>
      spark.read.parquet(p).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
  }

  /** Events with `ts` as µs TimestampType regardless of the physical
    * encoding (ns INT64 → exact div-1000 conversion; µs → native read). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    if (eventsTsIsNanos(spark, s"$sfDir/events.parquet")) {
      spark.read.schema(Schemas.eventsRaw).parquet(s"$sfDir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else read(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")

  /** Register every fixture table as a temp view so `spark.sql` queries and
    * the DataFrame API converge on one plan space (SURVEY §3.2). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    Schemas.all.keys.foreach { name =>
      val df = if (name == "events") events(spark, sfDir) else read(spark, sfDir, name)
      df.createOrReplaceTempView(name)
    }
}
