package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned table layout — the 100 TB scan story SURVEY §4 deferred
  * while fixtures were single files.
  *
  * At scale, `events` lives date-partitioned (`.../event_date=2024-01-01/`)
  * so that:
  *  - a literal date predicate becomes STATIC partition pruning — the scan
  *    plans only the matching directories (`PartitionFilters`, zero I/O on
  *    the rest);
  *  - a join against a filtered date dimension becomes DYNAMIC partition
  *    pruning (DPP) — the broadcast side's date set is pushed into the
  *    fact scan's partition filter at runtime
  *    (`dynamicpruningexpression(...)`), so a "revenue for promo weeks"
  *    query reads only the promo weeks' partitions.
  *
  * PlanShapeSpec asserts both plan shapes on a real date-partitioned copy
  * of the fixture events. Partition count scales as days × writers — at
  * 100 TB keep files ≥ ~128 MB per partition (compaction), and partition
  * ONLY on the columns queries filter by (over-partitioning makes small
  * files and kills the scan).
  */
object Layout {

  /** Write the fixture events date-partitioned (one directory per
    * event_date). Idempotent overwrite, memoized per (source, target) for
    * the JVM lifetime — the layout is a pure function of the immutable
    * fixture, and join_dpp/verify/bench invoke it repeatedly (the
    * once-per-JVM staging precedent of the stream replay fixture). */
  private val stagedDpp = scala.collection.mutable.Set.empty[(String, String)]
  def writeDatePartitionedEvents(spark: SparkSession, sfDir: String,
      outDir: String): Unit = stagedDpp.synchronized {
    if (!stagedDpp.contains((sfDir, outDir))) {
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(outDir)
      stagedDpp += ((sfDir, outDir))
    }
  }

  /** Read a date-partitioned events layout (partition column restored as a
    * regular column by partition discovery). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Write fixture tables BUCKETED (and sorted) by their join key into a
    * catalog database — the co-located-join layout: two tables bucketed
    * the same way on the same key join WITHOUT a shuffle exchange on
    * either side, the biggest repeated-join saving at 100 TB (the fact
    * table's shuffle is paid once at write time, amortized over every
    * subsequent join). PlanShapeSpec asserts the exchange-free plan. */
  def writeBucketed(spark: SparkSession, sfDir: String, db: String,
      location: String, tables: Seq[(String, String)], nBuckets: Int): Unit = {
    // A previous JVM may have left the warehouse dir behind while this
    // session's in-memory catalog starts empty — saveAsTable then fails
    // with LOCATION_ALREADY_EXISTS. The layout is a derived cache of the
    // source parquet, so a stale dir is safe to clear and rebuild.
    val loc = new org.apache.hadoop.fs.Path(location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")
    tables.foreach { case (t, key) =>
      Tables.read(spark, sfDir, t).write
        .bucketBy(nBuckets, key).sortBy(key)
        .mode("overwrite").saveAsTable(s"$db.$t")
    }
  }
}
