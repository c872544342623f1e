package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY §2: a stable key, its Spark implementation, and
  * (when SQL-expressible) its DuckDB oracle SQL. Implementations and oracles
  * are co-located so a change to one is a visible change to the other.
  */
final case class Q(
    key: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)
