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
    * (early rounds) or as plain TIMESTAMP(MICROS) (current). Detected from
    * the parquet footer and cached by (path, mtime, length) — the driver
    * regenerates fixtures in place between rounds, so a path-only cache
    * would silently misread a re-encoded file in a long-lived session.
    * Detection must run with the legacy nanos flag set or the ns footer
    * would throw on inference. When the verdict is µs the flag is restored
    * to its prior state (session parquet behavior untouched); when ns it
    * stays set, because the subsequent read-as-LongType scan needs it. */
  private val tsIsNanos =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), java.lang.Boolean]()
  private[graft] def eventsTsIsNanos(spark: SparkSession, path: String): Boolean = {
    val f = new java.io.File(path)
    val key = (path, f.lastModified(), f.length())
    tsIsNanos.computeIfAbsent(key, _ => {
      val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val isNs = spark.read.parquet(path).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
      if (!isNs) prior match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      isNs
    })
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
