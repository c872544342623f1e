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
    // exclude the rewrite rule here, or the "HOF" side silently becomes a
    // second vec_dot and the comparison proves nothing
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteHofDotProduct")
    try {
      val e = Tables.embeddings(spark, sf001).limit(100)
        .select(col("vec_id"), col("embedding"))
      val both = e.select(col("vec_id"),
        expr("vec_dot(embedding, embedding)").as("native"),
        expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
      val plan = both.queryExecution.optimizedPlan.toString
      assert("vec_dot".r.findAllIn(plan).size == 1, "exclusion must leave the HOF interpreted")
      assert(both.filter(col("native") =!= col("hof")).count() == 0)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
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

  test("optimizer rewrites the HOF dot-product fallback into native vec_dot") {
    val hof = "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val df = Tables.embeddings(spark, sf001).select(expr(hof).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), "HOF pattern must rewrite:\n" + optimized.take(800))
    // rewritten results are the values the interpreted fold produces
    val viaRule = df.limit(50).collect().map(_.getDouble(0))
    val viaNative = Tables.embeddings(spark, sf001)
      .select(expr("vec_dot(embedding, embedding)")).limit(50).collect().map(_.getDouble(0))
    assert(viaRule.toSeq == viaNative.toSeq)
  }

  test("the HOF rewrite declines unsound shapes (wrong zero, wrong merge)") {
    // zero != 0.0 changes the fold result — must NOT rewrite
    val wrongZero = Tables.embeddings(spark, sf001).select(expr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(1.0 AS DOUBLE), (acc, v) -> acc + v)").as("d"))
    assert(!wrongZero.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // subtraction merge is not the dot fold — must NOT rewrite
    val wrongMerge = Tables.embeddings(spark, sf001).select(expr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc - v)").as("d"))
    assert(!wrongMerge.queryExecution.optimizedPlan.toString.contains("vec_dot"))
  }

  test("vec_dot NULL element yields NULL, matching the HOF's absorbing null product") {
    val r = spark.sql(
      "SELECT vec_dot(a, b), " +
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) " +
        "FROM (SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)) AS b)").head
    assert(r.isNullAt(0) && r.isNullAt(1), "native and HOF must agree on null elements")
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

  test("minhash_sig is bit-identical to the compiled-UDF kernel on fixture tokens") {
    // The near-dup bucketing depends on these exact values: a single
    // changed bit moves band buckets. The expression and the UDF share
    // one kernel by construction; this pins it against refactor drift.
    assert(spark.catalog.functionExists("minhash_sig"))
    val toks = Tables.documents(spark, sf001).limit(200)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val sigUdf = udf(ops.Llm.minhashSig(16))
    val both = toks.select(col("doc_id"),
      expr("minhash_sig(toks)").as("native"), sigUdf(col("toks")).as("viaUdf"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)} diverges")
    }
    assert(both.nonEmpty)
  }

  test("simhash64 is bit-identical to the UDF twin and codegens; empty input is all-ties 0") {
    assert(spark.catalog.functionExists("simhash64"))
    val both = Tables.documents(spark, sf001).limit(200)
      .select(col("doc_id"),
        expr("simhash64(split(text, ' '))").as("native"),
        udf(ops.TextOps.simhash64).apply(split(col("text"), " ")).as("viaUdf"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)} diverges"))
    assert(both.nonEmpty)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val codegen = Tables.documents(spark, sf001)
        .select(expr("simhash64(split(text, ' '))").as("s"))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.startsWith("Found 0"), codegen.take(150))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(spark.sql("SELECT simhash64(CAST(array() AS ARRAY<STRING>))").head.getLong(0) == 0L,
      "no tokens, no votes — every bit ties to 0")
  }

  test("minhash_sig participates in whole-stage codegen; short token arrays are all-MaxValue") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Tables.documents(spark, sf001)
        .select(expr("minhash_sig(split(text, ' '))").as("s"))
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.startsWith("Found 0"), codegen.take(150))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val short = spark.sql("SELECT minhash_sig(array('a', 'b'))").head.getSeq[Long](0)
    assert(short == Seq.fill(16)(Long.MaxValue),
      "fewer than 3 tokens has no shingle — the signature must be the empty-set one")
  }

  test("ivf_argmax_dot equals the UDF fallback bit-for-bit on fixture unit vectors") {
    assert(spark.catalog.functionExists("ivf_argmax_dot"))
    // a deterministic centroid table from the corpus itself (first 7
    // normalized vectors), then assign EVERY vector both ways
    val unit = Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) / " +
          "sqrt(aggregate(embedding, 0.0d, (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))")
          .as("u"))
    val cents: Array[Array[Double]] = unit.filter(col("vec_id") < 7)
      .orderBy(col("vec_id")).collect()
      .map(_.getSeq[Double](1).toArray)
    val fallback = udf { (u: Seq[Double]) =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c); var d = 0.0; var i = 0
        while (i < u.length) { d += u(i) * cent(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }
    val both = unit.select(col("vec_id"),
      call_function("ivf_argmax_dot", col("u"),
        typedLit(cents.map(_.toSeq).toSeq)).as("native"),
      fallback(col("u")).as("viaUdf"))
    assert(both.filter(col("native") =!= col("viaUdf")).count() == 0,
      "native argmax-dot diverged from the UDF fallback")
    // ties break to the LOWEST index, like the UDF's strict '>' update
    val tie = spark.sql(
      "SELECT ivf_argmax_dot(array(1.0d, 0.0d), " +
        "array(array(0.0d, 1.0d), array(1.0d, 0.0d), array(1.0d, 0.0d)))")
      .head.getInt(0)
    assert(tie == 1, s"tie must keep the first best index, got $tie")
  }

  test("sign_buckets equals the UDF fallback bit-for-bit and stays in codegen") {
    assert(spark.catalog.functionExists("sign_buckets"))
    val emb = Tables.embeddings(spark, sf001).select(col("vec_id"), col("embedding"))
    // the UDF twin wraps the SAME kernel — but pin against a from-scratch
    // reimplementation too, so a kernel edit that breaks the original
    // arithmetic (not just the wiring) still fails here
    val reimpl = udf { (v: Seq[Float]) =>
      val out = new Array[Int](8)
      for (t <- 0 until 8) {
        var bucket = 0
        for (j <- 0 until 8) {
          var acc = 0.0
          for (i <- v.indices) {
            var z = ((t * 8 + j).toLong * 1021 + i) * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^= (z >>> 31)
            acc += v(i) * (z.toDouble / 9.223372036854776e18)
          }
          if (acc >= 0) bucket |= (1 << j)
        }
        out(t) = bucket
      }
      out
    }
    val both = emb.select(col("vec_id"),
      call_function("sign_buckets", col("embedding"), lit(8), lit(8)).as("native"),
      udf(graft.ops.TextOps.signBuckets(8, 8)).apply(col("embedding")).as("viaUdf"),
      reimpl(col("embedding")).as("viaReimpl"))
    assert(both.filter(col("native") =!= col("viaUdf") ||
      col("native") =!= col("viaReimpl")).count() == 0,
      "native sign_buckets diverged from the UDF twin / reimplementation")
    // the bucketing projection must participate in whole-stage codegen
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val codegen = emb
        .select(call_function("sign_buckets", col("embedding"), lit(8), lit(8)).as("b"))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.startsWith("Found 0"), codegen.take(150))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
