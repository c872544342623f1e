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
