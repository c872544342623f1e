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
    // and not carried by the easy end of the band: recall must hold in the
    // HARDEST similarity tercile too (the largest-eps plants, cos ≈ 0.95,
    // where single-table LSH was ~43% — theory for 8×8-bit is ≈ 0.99)
    val hardest = (0 until 40).sortBy(id => cosines(id)).take(13)
    val hardRecalled = hardest.count(id =>
      ann.getOrElse(id.toLong, Set.empty).contains(id + 1000L))
    assert(hardRecalled >= 11,
      s"hard-tercile recall $hardRecalled/13 (cos ${cosines(hardest.head)}..${cosines(hardest.last)})")
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

  test("llm_doc_sample is deterministic and draws ~10% of documents") {
    val total = Tables.documents(spark, sf001).count().toDouble
    val s1 = SparkEntry.queries("llm_doc_sample")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    val s2 = SparkEntry.queries("llm_doc_sample")(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "hash sampling must be rerun-identical")
    val frac = s1.size / total
    assert(frac > 0.05 && frac < 0.16, s"sample fraction $frac far from 205/2048")
  }

  test("llm_doc_sample predicate holds the ~10% rate for doc_ids past the 64-bit LCG overflow point") {
    import spark.implicits._
    // A raw doc_id·1103515245 wraps signed 64-bit beyond doc_id ≈ 8.4e9;
    // the mod-reduced predicate must keep sampling ≈ 205/2048 up there
    // (the wrapped form would let every negative remainder through ≈ 55%).
    val huge = spark.range(0, 100000)
      .select((col("id") + (Long.MaxValue - 200000L)).as("doc_id"))
    val kept = huge
      .filter(expr("((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048 < 205"))
      .count()
    val frac = kept / 100000.0
    assert(frac > 0.05 && frac < 0.16, s"overflow-range fraction $frac far from 205/2048")
  }

  test("agg_approx_quantile estimates sit within tight rank bounds of exact percentiles") {
    import org.apache.spark.sql.Row
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sf001)
      .collect().map(r => r.getString(0) -> r).toMap
    // exact percentile ranks ±1% as the acceptance band (accuracy 10000
    // gives rank error 1/10000; ±1% is three orders of slack for ties)
    val exact = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.49, 0.51, 0.94, 0.96, 0.98, 1.0))").as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1).map(_.toString.toDouble)).toMap
    exact.foreach { case (flag, e) =>
      val Row(_, p50, p95, p99, _) = approx(flag)
      def d(x: Any): Double = BigDecimal(x.toString).toDouble
      assert(d(p50) >= e(0) && d(p50) <= e(1), s"$flag p50 ${d(p50)} outside [${e(0)}, ${e(1)}]")
      assert(d(p95) >= e(2) && d(p95) <= e(3), s"$flag p95 ${d(p95)} outside [${e(2)}, ${e(3)}]")
      assert(d(p99) >= e(4) && d(p99) <= e(5), s"$flag p99 ${d(p99)} outside [${e(4)}, ${e(5)}]")
    }
  }

  test("llm_dedup_components matches an independent driver-side union-find closure") {
    val rows = SparkEntry.queries("llm_dedup_components")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    // independent ground truth: rebuild the planted corpus, compute exact
    // word-3-gram Jaccard edges at 0.6, union-find the closure
    val words = Tables.documents(spark, sf001).filter(col("doc_id") < 20)
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 20)
    val nodes: Seq[(Long, Array[String])] = words.toSeq.flatMap { case (id, w) =>
      Seq(id -> w.take(20), (id + 100000L) -> w.take(16), (id + 200000L) -> w.take(12))
    }
    val shingles = nodes.map { case (id, w) =>
      id -> w.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val parent = scala.collection.mutable.Map(nodes.map(n => n._1 -> n._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for ((a, ga) <- shingles; (b, gb) <- shingles if a < b) {
      val inter = (ga & gb).size.toDouble
      if (inter / (ga.size + gb.size - inter) >= 0.6) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expected = nodes.map(n => n._1 -> find(n._1)).toMap
    assert(rows == expected,
      s"diff: ${(rows.toSet diff expected.toSet).take(5)} vs ${(expected.toSet diff rows.toSet).take(5)}")
    // and the transitivity is genuinely exercised: some A-C pair must be
    // in one component while being below the pairwise edge threshold
    val chained = words.exists { case (id, _) =>
      val (ga, gc) = (shingles(id), shingles(id + 200000L))
      val inter = (ga & gc).size.toDouble
      inter / (ga.size + gc.size - inter) < 0.6 && expected(id + 200000L) == expected(id)
    }
    assert(chained, "fixture must contain at least one closure-only A..C link")
  }

  test("prefixCandidates is COMPLETE: every pair at J >= t shares an indexed hash (t = 4/5 and 3/5)") {
    // the completeness theorem is what makes the exact dedup keys
    // oracle-gateable — property-test it on random set corpora with
    // planted near-identical copies (drop one element: J = (n-1)/n)
    import spark.implicits._
    checkAll(org.scalacheck.Gen.listOfN(20,
      org.scalacheck.Gen.chooseNum(5, 40).flatMap(n =>
        org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.chooseNum(0L, 99L)))), n = 5) { raw =>
      val docs: Seq[(Long, Set[Long])] = raw.zipWithIndex.map { case (xs, i) =>
        (i.toLong, xs.toSet)
      }.filter(_._2.size >= 5)
      val planted = docs.take(8).map { case (id, s) => (id + 1000L, s - s.min) }
      val all = (docs ++ planted).toMap
      val df = all.toSeq.map { case (id, s) => (id, s.toSeq.sorted) }.toDF("doc_id", "h")
      for ((tn, td) <- Seq((4, 5), (3, 5))) {
        val t = tn.toDouble / td
        val cands = TextOps.prefixCandidates(df, tn, td)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        for ((a, sa) <- all; (b, sb) <- all if a < b) {
          val j = (sa & sb).size.toDouble / (sa | sb).size
          if (j >= t)
            assert(cands.contains((a, b)),
              s"t=$tn/$td missed ($a,$b) at J=$j: |a|=${sa.size} |b|=${sb.size}")
        }
      }
    }
  }

  test("llm_dedup_ngram: planted pairs all found at 4-gram Jaccard ≥ 0.8") {
    val out = SparkEntry.queries("llm_dedup_ngram")(spark, sf001)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L).map(i => (i, i + 100000L)).toSet
    assert(planted.subsetOf(pairs), s"missing ${planted -- pairs}")
  }

  test("substringProfile: xxhash64-keyed and string-keyed paths are equal row-for-row") {
    // The 100 TB shape keys every posting/agg/semi-join on xxhash64(gram);
    // this pins that the hash rework cannot change a single count, ratio,
    // or flag vs the literal string-gram dataflow (the DuckDB oracle twin).
    val hashed = TextOps.substringProfile(spark, sf001, hashGrams = true).collect()
    val strung = TextOps.substringProfile(spark, sf001, hashGrams = false).collect()
    assert(hashed.length == strung.length,
      s"row counts differ: ${hashed.length} vs ${strung.length}")
    assert(hashed.nonEmpty, "fixture produced zero profile rows")
    hashed.zip(strung).foreach { case (h, s) => assert(h == s, s"$h != $s") }
    // and the planted 40-word copies are flagged (shared_ratio = 1.0)
    val flagged = hashed.filter(_.getLong(0) >= 500000L)
    assert(flagged.nonEmpty && flagged.forall(_.getBoolean(4)),
      s"planted copies not all flagged: ${flagged.mkString(",")}")
  }

  test("llm_vocab_topk: equals a driver-side recount, ordered by (count desc, token)") {
    val texts = Tables.documents(spark, sf001).select("text").collect().map(_.getString(0))
    val counts = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
    val out = SparkEntry.queries("llm_vocab_topk")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == expected)
  }

  test("llm_gopher_filter: per-rule verdicts recount, and the fixture splits on keep") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("llm_gopher_filter")(spark, sf001).collect()
    assert(out.length == docs.size)
    val en = Set("the", "a", "of", "and", "to", "in", "is")
    out.foreach { r =>
      val text = docs(r.getLong(0))
      val words = text.split(" ").filter(_.nonEmpty)
      assert(r.getInt(1) == words.length, s"doc ${r.getLong(0)} n_words")
      assert(r.getInt(4) == words.distinct.count(en), s"doc ${r.getLong(0)} stop_hits")
      assert(r.getBoolean(5) == (words.length >= 50 && words.length <= 100000))
      assert(r.getBoolean(9) == (r.getBoolean(5) && r.getBoolean(6)
        && r.getBoolean(7) && r.getBoolean(8)), s"doc ${r.getLong(0)} keep")
    }
    // the thresholds must actually bind on the fixture — an all-pass (or
    // all-fail) filter key would be vacuous
    val keeps = out.count(_.getBoolean(9))
    assert(keeps > 0 && keeps < out.length,
      s"keep does not split the fixture: $keeps/${out.length}")
  }

  test("llm_bm25 equals a driver-side integer recount, and length normalization binds") {
    val got = SparkEntry.queries("llm_bm25")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))

    val terms = Set("hash", "join", "vector")
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val lens = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val n = docs.length.toLong
    val sumdl = lens.values.sum
    val tfs = docs.flatMap { case (id, ws) =>
      ws.filter(terms).groupBy(identity).map { case (t, os) => (id, t, os.length.toLong) }
    }
    val df = tfs.groupBy(_._2).view.mapValues(_.map(_._1).distinct.length.toLong).toMap
    val scores = tfs.groupBy(_._1).view.mapValues(_.map { case (id, t, f) =>
      val idf = (1000000L * (2 * n - 2 * df(t) + 1)) / (2 * df(t) + 1)
      val tfc = (1000000L * 22 * f * sumdl) / (10 * f * sumdl + 3 * sumdl + 9 * lens(id) * n)
      idf * tfc / 1000000L
    }.sum).toMap
    val expected = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.toSeq == expected, s"spark=${got.toSeq} expected=$expected")

    // length normalization must bind: among scored docs there exist two
    // with equal total query-term tf where the SHORTER doc scores higher
    val totTf = tfs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val binds = scores.keys.toSeq.combinations(2).exists { case Seq(a, b) =>
      totTf(a) == totTf(b) && lens(a) != lens(b) &&
        (scores(a) > scores(b)) == (lens(a) < lens(b)) && scores(a) != scores(b)
    }
    assert(binds, "no doc pair shows the dl normalization — scoring degenerated to tf")
  }

  test("llm_rank_fusion equals a driver-side RRF recount over the two bounded lists") {
    val got = SparkEntry.queries("llm_rank_fusion")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val bm25 = TextOps.bm25Scores(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val rankA = bm25.sortBy { case (id, s) => (-s, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val rankB = Tables.documents(spark, sf001).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, c) => (-c, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = (rankA.keySet ++ rankB.keySet).toSeq.map { id =>
      id -> (rankA.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
        rankB.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L))
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.toSeq == expected, s"spark=${got.toSeq} expected=$expected")
  }

  test("llm_inverted_index: df is the true posting count, block0 the first ≤32 sorted postings") {
    val got = SparkEntry.queries("llm_inverted_index")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))

    val postings = Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().flatMap { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).distinct.map(_ -> r.getLong(0))
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    assert(got.map(_._1).toSeq == postings.keys.toSeq.sorted, "term set mismatch")
    got.foreach { case (term, df, block0) =>
      val full = postings(term)
      assert(df == full.length.toLong, s"$term df")
      assert(block0 == full.take(32).mkString(","), s"$term block0")
    }
    // the block cap must bind on at least one hot term, or the key never
    // exercises its bounded-state guard
    assert(got.exists { case (t, df, _) => df > 32 }, "no term exceeds the block size")
  }
}
