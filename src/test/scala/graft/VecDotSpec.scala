package graft

import org.apache.spark.sql.functions._

/** Native `vec_dot` Catalyst expression (graft.plans.VecDot). */
class VecDotSpec extends SparkFixture {
  import spark.implicits._

  test("vec_dot is registered via SparkSessionExtensions and evaluates") {
    assert(spark.catalog.functionExists("vec_dot"))
    val r = spark.sql("SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)))").head.getDouble(0)
    assert(r == 4.0)
  }

  test("vec_dot is bit-identical to the interpreted HOF fold on fixture vectors") {
    val e = Tables.embeddings(spark, sf001).limit(100)
      .select(col("vec_id"), col("embedding"))
    val both = e.select(col("vec_id"),
      expr("vec_dot(embedding, embedding)").as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("vec_dot on ragged arrays is NULL, matching the zip_with null-pad fallback") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))), " +
        "aggregate(zip_with(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)), " +
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").head
    assert(r.isNullAt(0) && r.isNullAt(1), "native and HOF must agree on ragged inputs")
  }

  test("vec_dot NULL inputs yield NULL (nullSafe binary expression)") {
    val r = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .head
    assert(r.isNullAt(0))
  }

  test("sorted_intersect_count equals the built-in intersection on random sorted sets") {
    def lit(xs: List[Long]): String =
      s"CAST(array(${xs.map(_ + "L").mkString(",")}) AS ARRAY<BIGINT>)"
    checkAll(org.scalacheck.Gen.listOfN(2,
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.chooseNum(-1000L, 1000L)))) { lists =>
      val Seq(a, b) = lists.map(_.distinct.sorted)
      val row = spark.sql(
        s"SELECT sorted_intersect_count(${lit(a)}, ${lit(b)}), " +
          s"size(array_intersect(${lit(a)}, ${lit(b)}))").head
      assert(row.getInt(0) == row.getInt(1), s"a=$a b=$b")
    }
  }

  test("sorted_intersect_count: NULL input yields NULL; empty arrays count 0") {
    val r = spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)), " +
        "sorted_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L, 2L))").head
    assert(r.isNullAt(0) && r.getInt(1) == 0)
  }

  test("vec_dot participates in whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Tables.embeddings(spark, sf001)
        .select(expr("vec_dot(embedding, embedding)").as("d"))
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.startsWith("Found 0"), codegen.take(150))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
