package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 (operator inventory) and §7 (plan).
  *
  * Every implemented operator registers a [[Q]] in one of the `graft.ops` /
  * `graft.stream` modules; this object only aggregates them into the maps
  * the driver harness consumes (Verify.scala / Bench.scala).
  */
object SparkEntry {

  private lazy val registry: Seq[Q] =
    ops.Scans.queries ++ ops.Functions.queries ++ ops.Joins.queries ++
      ops.Aggregates.queries ++ ops.Windows.queries ++ ops.SortsSetops.queries ++
      ops.Llm.queries ++ ops.TextOps.queries ++ ops.Pipeline.queries ++
      ops.Udx.queries ++ ops.Graph.queries ++ ops.Bpe.queries ++
      ops.Stats.queries ++ ops.Lakehouse.queries ++
      stream.StreamOps.queries ++ stream.Pattern.queries ++
      stream.AcidStream.queries ++ stream.IncrementalMv.queries ++
      stream.CdcApply.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_hash_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.key -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.key -> sql)).toMap
}
