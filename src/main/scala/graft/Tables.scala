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
  /** `ts` is parquet INT64 TIMESTAMP(NANOS): read raw ns (legacy config),
    * convert to µs TimestampType — exact for the fixtures (µs-aligned) and
    * identical to DuckDB's ns→µs cast of the same column. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
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
