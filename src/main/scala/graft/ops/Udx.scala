package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2.11 — user-defined function surface: scalar UDF, typed
  * Aggregator UDAF, and a generator (UDTF).
  *
  * UDFs break whole-stage codegen and predicate pushdown across them —
  * they exist here to prove the extension surface, with the native
  * expression noted per query (and preferred in the hot path at scale).
  */
object Udx {

  /** Geometric mean via typed `Aggregator[IN, BUF, OUT]` — the same shape
    * a custom sketch (HLL, quantile) aggregate would use. Buffer is
    * (sum of ln, count); merge is associative ⇒ safe under partial
    * aggregation, AQE re-planning, and retries at any scale. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Seq[Q] = Seq(

    // Scalar UDF registered for both DataFrame and SQL use. Oracle is the
    // inlined expression: p * (1 - d) is the same two IEEE-double ops in
    // both engines, so the output is bit-exact.
    Q("udf_scalar",
      (spark, sfDir) => {
        val discounted = udf((p: java.lang.Double, d: java.lang.Double) =>
          if (p == null || d == null) null
          else java.lang.Double.valueOf(p * (1 - d)))
        spark.udf.register("discounted_price", discounted)
        Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_linenumber"),
            discounted(col("l_extendedprice"), col("l_discount")).as("disc_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
          l_extendedprice * (1 - l_discount) AS disc_price
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // Typed UDAF: geometric mean of quantity per return flag. Oracle twin
    // exp(avg(ln x)); rounded 6dp (libm ln/exp differ in the last ulp
    // across runtimes; the averaged error is ~1e-15 relative).
    Q("udaf_aggregator",
      (spark, sfDir) => {
        val geo = udaf(GeoMean)
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"))
          .agg(round(geo(col("l_quantity")), 6).as("geo_qty"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""".trim)),

    // Generator (UDTF): one row per character 3-gram of p_name, with
    // position. Scala-function + posexplode is the UDTF surface; the
    // all-native twin is transform(sequence(...)) + posexplode.
    Q("udtf_generator",
      (spark, sfDir) => {
        val grams3 = udf((s: String) =>
          if (s == null || s.length < 3) Seq.empty[String]
          else (0 to s.length - 3).map(i => s.substring(i, i + 3)))
        Tables.part(spark, sfDir)
          .select(col("p_partkey"), posexplode(grams3(col("p_name"))).as(Seq("pos", "gram")))
          .orderBy(col("p_partkey"), col("pos"))
      },
      Some("""
        SELECT p_partkey, CAST(i - 1 AS INT) AS pos, substring(p_name, i, 3) AS gram
        FROM (SELECT p_partkey, p_name, unnest(range(1, length(p_name) - 1)) AS i FROM part)
        ORDER BY p_partkey, pos""".trim)),
  )
}
