package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Training-pipeline extension operators: planted-duplicate recall for the
  * probabilistic dedup families and ANN recall on planted cluster
  * structure (the fixture embeddings are near-random, so structure is
  * planted where the test needs it).
  */
class TextOpsSpec extends SparkFixture {
  import spark.implicits._

  test("llm_dedup_simhash finds every planted near-duplicate (hamming ≤ 6)") {
    val out = SparkEntry.queries("llm_dedup_simhash")(spark, sf001)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L).map(i => (i, i + 100000L)).toSet
    assert(planted.subsetOf(pairs), s"missing ${planted -- pairs}")
  }

  test("llm_dedup_embed finds exactly the planted duplicate vectors at cosine 1") {
    val out = SparkEntry.queries("llm_dedup_embed")(spark, sf001).collect()
    val planted = (0L until 20L).map(i => (i, i + 100000L)).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == planted)
    assert(out.forall(_.getDouble(2) >= 0.999999))
  }

  test("sign-LSH ANN recalls cluster neighbors on planted cluster structure") {
    // 10 tight clusters of 30 unit vectors each (deterministic splitmix noise).
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(raw: Array[Double]): Array[Float] = {
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val centers = (0 until 10).map(c =>
      Array.tabulate(64)(i => mix(c * 64L + i).toDouble / 9.223372036854776e18))
    val vecs = for (c <- 0 until 10; m <- 0 until 30) yield {
      val noise = Array.tabulate(64)(i =>
        mix((c * 30 + m) * 64L + i + 7777).toDouble / 9.223372036854776e18 * 0.05)
      (c * 30L + m, unit(centers(c).zip(noise).map { case (a, b) => a + b }), c)
    }
    val df = vecs.toSeq.toDF("vec_id", "embedding", "cluster")
    val ann = TextOps.annTopK(df, col("vec_id") % 30 === 0, nBits = 8, k = 5)
    val withCluster = ann
      .join(df.select(col("vec_id"), col("cluster")), "vec_id")
      .join(df.select(col("vec_id").as("probe_id"), col("cluster").as("p_cluster")), "probe_id")
    val total = withCluster.count().toDouble
    val same = withCluster.filter(col("cluster") === col("p_cluster")).count().toDouble
    assert(total > 0 && same / total >= 0.9, s"cluster agreement ${same / total} of $total")
  }

  test("llm_fingerprint roll_hash matches a direct Scala fold") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("llm_fingerprint")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.take(20).foreach { case (id, text) =>
      val expected = text.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
      assert(out(id) == expected, s"doc $id")
    }
  }

  test("llm_token_count: regex tokens ≥ whitespace tokens; estimate positive") {
    val out = SparkEntry.queries("llm_token_count")(spark, sf001)
    assert(out.filter(col("bpe_ish_tokens") < col("ws_tokens")).count() == 0)
    assert(out.filter(col("est_tokens") <= 0).count() == 0)
  }

  test("llm_lang_id prediction agrees with the argmax of its own hit counts") {
    val rows = SparkEntry.queries("llm_lang_id")(spark, sf001).collect()
    rows.foreach { r =>
      val hits = Seq("en" -> r.getInt(1), "fr" -> r.getInt(2), "es" -> r.getInt(3),
        "de" -> r.getInt(4))
      val pred = r.getString(5)
      if (hits.forall(_._2 == 0)) assert(pred == "und")
      else assert(hits.toMap.apply(pred) == hits.map(_._2).max)
    }
  }

  test("llm_text_quality ratios are in [0, 1]") {
    val out = SparkEntry.queries("llm_text_quality")(spark, sf001)
    assert(out.filter(col("alpha_ratio") < 0 || col("alpha_ratio") > 1).count() == 0)
    assert(out.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(out.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("llm_dedup_ngram: planted pairs all found at 4-gram Jaccard ≥ 0.8") {
    val out = SparkEntry.queries("llm_dedup_ngram")(spark, sf001)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L).map(i => (i, i + 100000L)).toSet
    assert(planted.subsetOf(pairs), s"missing ${planted -- pairs}")
  }
}
