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
