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

  test("llm_dedup_embed finds exactly the planted PERTURBED near-dups above threshold") {
    // Ground truth computed driver-side with the same fold the query uses:
    // the query plants vec' = vec with the last component negated
    // (cos = 1 − 2·x_d², typically ≈ 0.97 — NOT an exact copy), so a pair
    // only belongs in the output when its exact rounded cosine ≥ 0.95.
    // Multi-table LSH must recall every such pair; a single 16-bit table
    // missed ~half of them (that was round 2's silent-recall gap).
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val expected = Tables.embeddings(spark, sf001).filter(col("vec_id") < 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .flatMap { case (id, v) =>
        val vp = v.clone(); vp(vp.length - 1) = -vp(vp.length - 1)
        val cos = BigDecimal(dot(v, vp))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (cos >= 0.95) Some((id, id + 100000L)) else None
      }.toSet
    val out = SparkEntry.queries("llm_dedup_embed")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.size >= 10, s"degenerate fixture: only ${expected.size} plants over 0.95")
    assert(out == expected, s"missed: ${expected -- out}; spurious: ${out -- expected}")
  }

  test("multi-table ANN recalls >= 0.9 of perturbed (cos 0.95-0.98) true nearest neighbors") {
    // 400 deterministic pseudo-random unit vectors; probes 0..39 each get a
    // planted twin at id+1000 perturbed to cosine ≈ 0.95–0.98 (normalize
    // (v + ε·u), ε swept over [0.20, 0.33]). Ground truth is a driver-side
    // exact brute force; recall counts probes whose true top-1 neighbor
    // appears anywhere in the ANN top-10.
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
    val base = (0 until 400).map(id =>
      id.toLong -> unit(Array.tabulate(64)(i => mix(id * 64L + i).toDouble / 9.223372036854776e18)))
    val twins = (0 until 40).map { id =>
      val eps = 0.20 + 0.13 * id / 39.0
      val noise = Array.tabulate(64)(i => mix(id * 64L + i + 999999).toDouble / 9.223372036854776e18)
      val nn = math.sqrt(noise.map(x => x * x).sum)
      (id + 1000L, unit(base(id)._2.zip(noise).map { case (v, u) => v + eps * u / nn }))
    }
    val all = (base ++ twins).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    // sanity: perturbation landed in the intended band and IS the top-1
    val cosines = (0 until 40).map(id => dot(all(id.toLong), all(id + 1000L)))
    assert(cosines.forall(c => c > 0.93 && c < 0.995), cosines.min + ".." + cosines.max)
    val truth = (0 until 40).map { p =>
      p.toLong -> all.keys.filter(_ != p.toLong).maxBy(v =>
        (BigDecimal(dot(all(p.toLong), all(v))).setScale(6, BigDecimal.RoundingMode.HALF_UP), -v))
    }.toMap
    assert(truth.forall { case (p, t) => t == p + 1000L }, "twin should be the true NN")
    val df = all.toSeq.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val ann = TextOps.annTopK(df, col("vec_id") < 40, nTables = 8, nBits = 8, k = 10)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalled = truth.count { case (p, t) => ann.getOrElse(p, Set.empty).contains(t) }
    assert(recalled >= 36, s"recall ${recalled / 40.0} < 0.9 on perturbed planted neighbors")
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
    val ann = TextOps.annTopK(df, col("vec_id") % 30 === 0, nTables = 8, nBits = 8, k = 5)
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
