package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off engine-side verification of `graph_triangles` at the sf1-synth
  * fixture, where the DuckDB oracle's 3-way self-join plan is infeasible
  * (r13: > 75 GB temp spill, twice). Independence from the key under
  * test: the edge set is derived through a DIFFERENT plan (hash-aggregate
  * de-dup of the nation pair BEFORE any triangle logic, vs the key's
  * join-then-distinct), and the per-node triangle counts are recomputed
  * by a DRIVER-SIDE adjacency-set reference over the collected ≤ 625
  * nation-pair edges (the 25-node co-trade graph is control-plane sized
  * even though deriving it scans 6 M lineitem rows). Exit 0 iff the
  * recount equals the recorded Verify output byte-for-byte.
  *
  * Usage: runMain graft.tools.TrianglesSf1Check <sfDir> <recordedParquetDir>
  */
object TrianglesSf1Check {
  def main(args: Array[String]): Unit = {
    val (sfDir, recorded) = (args(0), args(1))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.lineitem(spark, sfDir)
    val su = Tables.supplier(spark, sfDir).select(col("s_suppkey"), col("s_nationkey"))
    val or = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val cu = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_nationkey"))
    // independent derivation: aggregate-dedup the pair, never distinct()
    val und = li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(or, li("l_orderkey") === or("o_orderkey"))
      .join(broadcast(cu), or("o_custkey") === cu("c_custkey"))
      .groupBy(least(col("s_nationkey"), col("c_nationkey")).as("a"),
        greatest(col("s_nationkey"), col("c_nationkey")).as("b"))
      .agg(count(lit(1)).as("m"))
      .filter(col("a") < col("b"))
      .select(col("a").cast("long"), col("b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[tri-check] edge set: ${und.size} undirected nation pairs")

    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triangles = for {
      (a, b) <- und.toSeq
      c <- adj.getOrElse(b, Set.empty) if und.contains((a, c))
    } yield (a, b, c)
    val expected = triangles.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = spark.read.parquet(recorded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"[tri-check] recorded: ${got.size} nodes, ${got.values.sum / 3} triangles; " +
      s"reference: ${expected.size} nodes, ${triangles.size} triangles")
    require(got == expected,
      s"sf1 triangle counts diverge: recorded=$got reference=$expected")
    println("[tri-check] PASS: recorded sf1 output == independent reference")
    spark.stop()
  }
}
