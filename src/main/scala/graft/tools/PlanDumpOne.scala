package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for a comma-separated list of query keys to
  * per-key files `<outDir>/<key>_<tag>.txt` — the before/after plan-witness
  * artifacts the optimization rounds commit under plans/r<N>/.
  * Usage: runMain graft.tools.PlanDumpOne <outDir> <tag> <key[,key...]> [sfDir]
  */
object PlanDumpOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDumpOne <outDir> <tag> <key[,key...]> [sfDir]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val keys = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    // One connected-components star round, in isolation: the iterative keys'
    // final frames truncate their lineage per round (localCheckpoint), so a
    // key-level explain can never show the round body — these two synthetic
    // keys dump the ROUND expression itself over a canonical edge frame.
    // `cc_star_round` is the current window-min form (Components.round);
    // `cc_star_round_join` reproduces the pre-r20 groupBy-min + rejoin form
    // verbatim (commit 5cc6392^) as the before-witness.
    import org.apache.spark.sql.functions._
    def canonicalEdges = spark.range(1000)
      .select((col("id") % 97).as("u"), (col("id") % 31).as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
    def joinFormRound(e: org.apache.spark.sql.DataFrame) = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      ls.join(ssMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    keys.foreach { key =>
      val df = key match {
        case "cc_star_round" => graft.ops.Components.round(canonicalEdges)
        case "cc_star_round_join" => joinFormRound(canonicalEdges)
        case _ => SparkEntry.queries(key)(spark, sfDir)
      }
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val body = s"## $key\n\n```\n$plan```\n"
      val f = outDir.resolve(s"${key}_$tag.txt")
      Files.writeString(f, body)
      println(s"wrote $f")
    }
    spark.stop()
  }
}
