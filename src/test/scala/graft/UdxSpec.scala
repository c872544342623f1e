package graft

import graft.ops.Udx.GeoMean
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** UDF/UDAF/UDTF surface (SURVEY §2.11). */
class UdxSpec extends SparkFixture {
  import spark.implicits._

  test("udf_scalar is null-safe") {
    val df = Seq((Some(100.0), Some(0.1)), (None, Some(0.1)), (Some(100.0), None))
      .toDF("p", "d")
    val disc = udf((p: java.lang.Double, d: java.lang.Double) =>
      if (p == null || d == null) null else java.lang.Double.valueOf(p * (1 - d)))
    val out = df.select(disc(col("p"), col("d"))).collect().map(r => Option(r.get(0)))
    assert(out(0).contains(90.0) && out(1).isEmpty && out(2).isEmpty)
  }

  test("GeoMean merge is associative and order-independent (cluster-safe)") {
    checkAll(Gen.listOfN(30, Gen.chooseNum(1, 1000).map(_.toDouble)), n = 10) { xs =>
      val whole = xs.foldLeft(GeoMean.zero)(GeoMean.reduce)
      val (l, r) = xs.splitAt(xs.size / 2)
      val split = GeoMean.merge(
        l.foldLeft(GeoMean.zero)(GeoMean.reduce),
        r.foldLeft(GeoMean.zero)(GeoMean.reduce))
      assert(math.abs(GeoMean.finish(whole) - GeoMean.finish(split)) < 1e-9)
      val rev = xs.reverse.foldLeft(GeoMean.zero)(GeoMean.reduce)
      assert(math.abs(GeoMean.finish(whole) - GeoMean.finish(rev)) < 1e-9)
    }
  }

  test("GeoMean of a constant sequence is the constant; empty is NaN") {
    val b = Seq(7.0, 7.0, 7.0).foldLeft(GeoMean.zero)(GeoMean.reduce)
    assert(math.abs(GeoMean.finish(b) - 7.0) < 1e-12)
    assert(GeoMean.finish(GeoMean.zero).isNaN)
  }

  test("udaf result agrees with the closed-form exp(avg(ln)) twin") {
    val geo = udaf(GeoMean)
    val df = Tables.lineitem(spark, sf001)
    val viaUdaf = df.agg(geo(col("l_quantity"))).head.getDouble(0)
    val viaExpr = df.agg(exp(avg(log(col("l_quantity"))))).head.getDouble(0)
    assert(math.abs(viaUdaf - viaExpr) < 1e-9)
  }

  test("udtf_generator emits length-2 grams count per part name") {
    val out = SparkEntry.queries("udtf_generator")(spark, sf001)
    val counts = out.groupBy("p_partkey").count()
    val expected = Tables.part(spark, sf001)
      .select(col("p_partkey"), (length(col("p_name")) - 2).as("expected"))
    val bad = counts.join(expected, "p_partkey")
      .filter(col("count") =!= col("expected"))
    assert(bad.count() == 0)
    // every gram is exactly 3 chars
    assert(out.filter(length(col("gram")) =!= 3).count() == 0)
  }
}
