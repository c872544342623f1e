package graft

import org.apache.spark.sql.functions._

/** LLM-pipeline operator semantics (SURVEY §2.10 + §5.2 property tests). */
class LlmSpec extends SparkFixture {

  test("llm_dedup_exact collapses planted duplicates to the min doc_id") {
    val out = SparkEntry.queries("llm_dedup_exact")(spark, sf001)
    val dups = out.filter(col("n_copies") > 1)
    assert(dups.count() == 50) // exactly the 50 planted copies
    // every duplicate group kept the ORIGINAL id (min), not the planted one
    assert(dups.filter(col("keep_id") >= 100000).count() == 0)
    // idempotence: re-deduping the kept set changes nothing
    val kept = out.select(col("keep_id")).distinct().count()
    assert(kept == out.count())
  }

  test("llm_dedup_near finds every planted near-duplicate pair (recall = 1)") {
    val out = SparkEntry.queries("llm_dedup_near")(spark, sf001)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L).map(i => (i, i + 100000L)).toSet
    assert(planted.subsetOf(pairs), s"missing: ${planted -- pairs}")
    // verified similarity on planted pairs is high (last word dropped only)
    val sims = out.filter(col("b_id") >= 100000 && col("a_id") === col("b_id") - 100000)
      .select(col("jaccard_sim")).collect().map(_.getDouble(0))
    assert(sims.forall(_ >= 0.8), sims.mkString(","))
  }

  test("lshCandidates bounds reducers on a degenerate all-identical corpus (mega-bucket salting)") {
    import spark.implicits._
    import graft.ops.Llm
    // 1,000 byte-identical documents: every banded bucket holds all 1,000
    // ids. Without the bucket cap one reducer collects the full list and
    // the pair-explode is all-pairs (499,500); with cap 64 each collected
    // sub-bucket stays ~2·cap and the emitted pair set is far smaller,
    // while every doc still surfaces in at least one candidate pair.
    val docs = (0L until 1000L).map(i => (i, "exactly the same document text for every single row"))
      .toDF("doc_id", "text")
    val sigUdf = udf(Llm.minhashSig(16))
    val sig = docs.select(col("doc_id"), sigUdf(split(col("text"), " ")).as("sig"))
    val pairs = Llm.lshCandidates(sig, nBands = 8, bandRows = 2, bucketCap = 64).collect()
    val covered = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(covered.size == 1000, s"only ${covered.size}/1000 docs surfaced in a candidate pair")
    assert(pairs.length < 499500 / 2, s"${pairs.length} pairs — salting did not bound the explode")
  }

  test("llm_sim_knn returns exactly 10 ranked neighbors per probe, no self") {
    val out = SparkEntry.queries("llm_sim_knn")(spark, sf001).cache()
    val perProbe = out.groupBy("probe_id").count().collect()
    assert(perProbe.length == 10 && perProbe.forall(_.getLong(1) == 10))
    assert(out.filter(col("probe_id") === col("vec_id")).count() == 0)
    // similarities are a descending sequence within each probe
    val sims = out.orderBy(col("probe_id"), col("rank"))
      .collect().groupBy(_.getLong(0)).values
    sims.foreach { rows =>
      val s = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
    out.unpersist()
  }

  test("llm_sim_knn matches an independent driver-side brute-force top-10") {
    // (fixture labels are near-noise — mean same-label cosine ≈ 0.02 — so
    // exactness vs an independent implementation is the real ground truth)
    val vecs = Tables.embeddings(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val expected = (0L until 10L).map { p =>
      p -> vecs.keys.filter(_ != p).toSeq
        .map(v => (v, BigDecimal(dot(vecs(p), vecs(v)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (v, s) => (-s, v) }.take(10).map(_._1)
    }.toMap
    val got = SparkEntry.queries("llm_sim_knn")(spark, sf001)
      .orderBy(col("probe_id"), col("rank")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
    expected.foreach { case (p, exp) =>
      assert(got(p) == exp, s"probe $p: got ${got(p)} expected $exp")
    }
  }

  test("llm_embed_norm: fixture vectors are unit-norm to float precision") {
    val out = SparkEntry.queries("llm_embed_norm")(spark, sf001)
    val norms = out.select(col("norm")).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-6))
    assert(out.filter(col("dim") =!= 64).count() == 0)
  }

  test("llm_text_stats: top-50 counts sum to at most total token count") {
    val out = SparkEntry.queries("llm_text_stats")(spark, sf001)
    val topSum = out.agg(sum("n")).head.getLong(0)
    val total = Tables.documents(spark, sf001)
      .select(size(split(col("text"), " ")).as("k")).agg(sum("k")).head.getLong(0)
    assert(out.count() <= 50 && topSum <= total && topSum > 0)
  }

  test("llm_multimodal_features: normalized pooled histograms, consistent with decode, partition-local") {
    val q = SparkEntry.queries("llm_multimodal_features")
    val a = q(spark, sf001).collect()
    val b = q(spark, sf001).collect()
    assert(a.toSeq == b.toSeq, "feature extraction must be rerun-identical")
    val sampled = SparkEntry.queries("llm_multimodal_decode")(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(7)).toMap
    a.foreach { r =>
      val (id, k) = (r.getLong(0), r.getInt(2))
      // feat ships as a rounded CSV string (scalar-emit convention)
      val feat = r.getString(3).split(',').map(_.toDouble).toSeq
      assert(k == sampled(id), s"doc $id: used $k frames, decode sampled ${sampled(id)}")
      assert(feat.length == 8, s"doc $id: ${feat.length} bins")
      assert(feat.forall(v => v >= 0 && v <= 1), s"doc $id: bin out of [0,1]")
      // mean of per-frame normalized histograms stays a distribution
      // (each bin rounds to 6dp in the CSV emit → ±8 * 5e-7 on the sum)
      assert(math.abs(feat.sum - 1.0) < 1e-5, s"doc $id: pooled histogram sums to ${feat.sum}")
    }
    val plan = q(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), plan.take(800))
    // two exchanges allowed: the pre-encode (doc_id, text) spread and the
    // presentation sort — PAYLOADS must never shuffle, so no exchange may
    // sit between the png-encode project and the MapPartitions extract
    assert("Exchange".r.findAllIn(plan).size <= 2,
      "feature extraction must not shuffle payloads:\n" + plan.take(1500))
    // printed tree is downstream-first: below the MapPartitions extract,
    // the png-encode project (UDF) must appear before any Exchange — i.e.
    // the shuffle sits under the encode, carrying rows, never payloads
    val below = plan.substring(plan.indexOf("MapPartitions"))
    val (udfAt, exAt) = (below.indexOf("UDF"), below.indexOf("Exchange"))
    assert(udfAt >= 0 && (exAt == -1 || exAt > udfAt),
      "no exchange may sit between payload encode and extract:\n" + plan.take(1500))
    // kernel edge: an empty payload must yield a finite zero vector, not NaN
    val empty = ops.Llm.featureBatch(Seq(ops.Llm.MediaIn(1L, Array.emptyByteArray, "video/fake")))
    assert(empty.head.feat.forall(v => v == 0.0), "empty payload must pool to zeros")
  }

  test("llm_multimodal_features histograms match an independent pixel-level recomputation") {
    // Recompute the pooled luminance histogram from the raw PNG bytes with
    // plain ImageIO.read and an independently-written loop — the engine's
    // decode+extract path must reproduce it bin for bin (6dp CSV rounding).
    val feats = SparkEntry.queries("llm_multimodal_features")(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getString(3).split(',').map(_.toDouble)).toMap
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).limit(15).collect()
    docs.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ops.Llm.pngStrip(id, text)))
      val nFrames = math.floorMod(java.util.Arrays.hashCode(text.getBytes("UTF-8")), 240) + 1
      val (w, frameH) = (img.getWidth, img.getHeight / nFrames)
      val sampled = 0 until nFrames by 24
      val expected = sampled.map { fr =>
        val lums = for (y <- fr * frameH until (fr + 1) * frameH; x <- 0 until w) yield {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
        }
        (0 until 8).map(b => lums.count(_ >> 5 == b).toDouble / lums.size)
      }.transpose.map(_.sum / sampled.size)
      val got = feats(id)
      expected.zip(got).zipWithIndex.foreach { case ((e, g), b) =>
        assert(math.abs(e - g) < 1e-5, s"doc $id bin $b: engine $g != pixels $e")
      }
    }
  }

  test("llm_multimodal_decode: deterministic, correct frame sampling, decode stays partition-local") {
    val q = SparkEntry.queries("llm_multimodal_decode")
    val a = q(spark, sf001).collect()
    val b = q(spark, sf001).collect()
    assert(a.toSeq == b.toSeq, "batched decode must be rerun-identical")
    assert(a.nonEmpty)
    // frame sampling: 1 per 24 frames, always includes frame 0; resize:
    // aspect-preserving fit into the 224x224 budget (binding axis = 224)
    a.foreach { r =>
      val (w, h) = (r.getInt(2), r.getInt(3))
      val (rw, rh) = (r.getInt(4), r.getInt(5))
      val (nFrames, nSampled) = (r.getInt(6), r.getInt(7))
      assert(nSampled == (nFrames + 23) / 24, s"doc ${r.getLong(0)}: $nSampled of $nFrames")
      // pngStrip geometry: width 2..31, frame height 2..17, 1..240 frames
      assert(w >= 2 && w <= 31 && h >= 2 && h <= 17, s"doc ${r.getLong(0)}: ($w,$h)")
      assert(nFrames >= 1 && nFrames <= 240)
      assert(rw >= 1 && rh >= 1,
        s"doc ${r.getLong(0)}: resize ($w,$h) -> ($rw,$rh) emitted a 0-px axis")
      assert(rw <= 224 && rh <= 224 && math.max(rw, rh) == 224,
        s"doc ${r.getLong(0)}: resize ($w,$h) -> ($rw,$rh) must bind one axis to 224")
      val aspectIn = w.toDouble / h
      val aspectOut = rw.toDouble / rh
      // rounding grants ±0.5 px on the short axis, i.e. ~0.5/min(rw,rh)
      // of relative ratio shift — scale the tolerance accordingly
      assert(math.abs(aspectIn - aspectOut) / aspectIn < 0.01 + 0.6 / math.min(rw, rh),
        s"doc ${r.getLong(0)}: aspect $aspectIn -> $aspectOut drifted")
    }
    // plumbing: decode runs inside the partition — the only exchange in
    // the plan is the final presentation sort
    val plan = q(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), plan.take(800))
    // pre-encode row spread + presentation sort; payloads never shuffle
    assert("Exchange".r.findAllIn(plan).size <= 2, "decode must not shuffle payloads:\n" + plan.take(1500))
    val below = plan.substring(plan.indexOf("MapPartitions"))
    val (udfAt, exAt) = (below.indexOf("UDF"), below.indexOf("Exchange"))
    assert(udfAt >= 0 && (exAt == -1 || exAt > udfAt),
      "no exchange may sit between payload encode and decode:\n" + plan.take(1500))
  }

  test("llm_multimodal_decode reads REAL PNG bytes: dims and frame count match an independent decode") {
    // Independent cross-check, bypassing readPng: decode the same generated
    // bytes with plain ImageIO.read (pixel grid only) and derive the frame
    // count from the GENERATOR's formula — so the engine's tEXt-metadata
    // round trip is verified against the pixel grid, not against itself.
    val out = SparkEntry.queries("llm_multimodal_decode")(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(6)))).toMap
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).limit(25).collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val bytes = ops.Llm.pngStrip(id, text)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val h = java.util.Arrays.hashCode(text.getBytes("UTF-8"))
      val expFrames = math.floorMod(h, 240) + 1
      val (w, fh, n) = out(id)
      assert(n == expFrames, s"doc $id: engine read $n frames, generator wrote $expFrames")
      assert(w == img.getWidth, s"doc $id: width $w != decoded ${img.getWidth}")
      assert(fh * n == img.getHeight,
        s"doc $id: frame height $fh × $n frames != strip height ${img.getHeight}")
    }
  }

  test("llm_multimodal_schema: payload round-trips and digest is stable") {
    val out = SparkEntry.queries("llm_multimodal_schema")(spark, sf001)
    val docs = Tables.documents(spark, sf001)
    // n_bytes == n_chars for ASCII fixture text
    val j = out.join(docs, "doc_id")
    assert(j.filter(col("n_bytes") =!= col("n_chars")).count() == 0)
    assert(out.filter(length(col("digest")) =!= 64).count() == 0)
    assert(out.filter(col("fake_width") < 0 || col("fake_width") >= 1920).count() == 0)
  }

  test("llm_dedup_incremental flags every planted copy and every match verifies driver-side") {
    val out = SparkEntry.queries("llm_dedup_incremental")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val seedIds = Tables.documents(spark, sf001)
      .filter(col("doc_id") % 5 =!= 0 && col("doc_id") < 25)
      .collect().map(_.getLong(0)).sorted
    assert(seedIds.nonEmpty)
    val byNew = out.map(o => o._1 -> o).toMap
    // recall: every plant is flagged with an index-side match. The fixture
    // corpus has genuine near-dup structure (e.g. docs 8/12 at jaccard
    // 0.9867), so a plant may legitimately resolve to a different index
    // doc than its seed — min_by(old_id) semantics, verified below.
    seedIds.foreach { id =>
      val ex = byNew.get(id + 300000)
      assert(ex.exists(o => o._2 == "exact" && o._4 == 1.0), s"exact plant of $id: $ex")
      val nr = byNew.get(id + 400000)
      assert(nr.exists(o => o._4 >= 0.5), s"near plant of $id: $nr")
    }
    // precision: EVERY reported match re-verifies driver-side from the
    // raw texts — exact means byte-equal, near means true shingle
    // jaccard == reported score (so no candidate leaks through unverified)
    val texts = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def textOf(id: Long): String =
      if (id >= 400000) texts(id - 400000).replaceAll(" \\w+$", "")
      else if (id >= 300000) texts(id - 300000)
      else texts(id)
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    out.foreach { case (newId, kind, oldId, score) =>
      assert(oldId % 5 != 0, s"match target $oldId is not an index doc")
      if (kind == "exact") assert(textOf(newId) == textOf(oldId), s"$newId exact-matched $oldId")
      else {
        val (a, b) = (shingles(textOf(newId)), shingles(textOf(oldId)))
        val j = a.intersect(b).size.toDouble / a.union(b).size
        assert(math.abs(j - score) < 1e-3 && j >= 0.5,
          s"$newId near-matched $oldId at $score but true jaccard is $j")
      }
    }
    val rerun = SparkEntry.queries("llm_dedup_incremental")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rerun.toSeq == out.toSeq)
  }

  test("llm_dedup_phash finds every planted perturbed media copy (recall = 1)") {
    val nDocs = Tables.documents(spark, sf001)
      .filter(col("doc_id") < 20).count()
    assert(nDocs > 0)
    val pairs = SparkEntry.queries("llm_dedup_phash")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val plantPairs = pairs.filter { case (a, b, _) => b == a + 100000 }
    assert(plantPairs.length == nDocs,
      s"expected $nDocs planted pairs, got ${plantPairs.length}: ${plantPairs.mkString(",")}")
    // the perturbed plant is NOT byte-identical — a real near-dup, the
    // verify must see a genuine (but small) distance on at least some
    assert(plantPairs.forall(_._3 <= 12))
    // rerun identity (the whole pipeline is deterministic)
    val rerun = SparkEntry.queries("llm_dedup_phash")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rerun.toSeq == pairs.toSeq)
  }

  test("phash perturbation is band-local and unrelated images separate") {
    val all = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // dHash is honestly degenerate on frames smaller than its 8×9 grid
    // (a 2-px-wide frame has one informative comparison per row, so
    // unrelated tiny images land close — true of dHash everywhere, not a
    // defect here); assert separation on frames that fill the grid
    val docs = all.filter { case (_, text) =>
      val h = java.util.Arrays.hashCode(text.getBytes("UTF-8"))
      math.floorMod(h, 30) + 2 >= 9 && math.floorMod(h / 30, 16) + 2 >= 8
    }.take(10)
    assert(docs.length >= 5, s"fixture yielded only ${docs.length} grid-filling docs")
    val sigs = docs.map { case (id, text) =>
      val orig = ops.Llm.phashBatch(Seq(ops.Llm.MediaIn(
        id, ops.Llm.pngStrip(id, text), "image/png"))).head.phash
      val pert = ops.Llm.phashBatch(Seq(ops.Llm.MediaIn(
        id, ops.Llm.pngStrip(id, text, perturbLastRow = true), "image/png"))).head.phash
      (id, orig, pert)
    }
    sigs.foreach { case (id, orig, pert) =>
      val ham = java.lang.Long.bitCount(orig ^ pert)
      assert(ham <= 12, s"doc $id: plant drifted to hamming $ham")
      // the last-row edit may only touch dHash rows 4..7 → bands 0-1
      // (bits 0..31) must be bit-identical, which is what guarantees
      // LSH candidate recall
      assert((orig & 0xFFFFFFFFL) == (pert & 0xFFFFFFFFL),
        s"doc $id: perturbation leaked into bands 0-1")
    }
    // unrelated images sit far apart — deterministic fixture, so pin it
    for ((a, oa, _) <- sigs; (b, ob, _) <- sigs if a < b) {
      val ham = java.lang.Long.bitCount(oa ^ ob)
      assert(ham > 12, s"unrelated docs $a,$b at hamming $ham")
    }
  }

  test("WAV container round-trip is bit-lossless and reads back the declared rate") {
    val ids = Seq(0L, 1L, 7L, 123L, 99991L)
    ids.foreach { id =>
      val (samples, rate) = ops.Llm.readWav(ops.Llm.wavBytes(id, 2048))
      assert(rate == 8000, s"doc $id: rate $rate")
      assert(samples.length == 2048, s"doc $id: ${samples.length} samples")
      (0 until 2048).foreach { i =>
        assert(samples(i) == ops.Llm.pcmSample(id, i),
          s"doc $id sample $i: ${samples(i)} != formula")
      }
    }
  }

  test("audio stats on a REAL sine match the closed forms (RMS = a/sqrt2, ZCR = 2f)") {
    // 440 Hz sine, amplitude 16384 (half scale), 1 s at 8 kHz — genuine
    // audio through the same encode/decode/stats path as the key
    val rate = 8000
    val f = 440.0
    val amp = 16384.0
    val sine = Array.tabulate(rate)(i =>
      (amp * math.sin(2 * math.Pi * f * i / rate)).toShort)
    val wav = ops.Llm.wavFromSamples(sine, rate.toFloat)
    val st = ops.Llm.audioStatsBatch(
      Seq(ops.Llm.AudioIn(1L, wav, "audio/wav"))).head
    assert(st.sample_rate == rate && st.n_samples == rate.toLong)
    // mean |sin| = 2/pi → sum_abs ≈ amp * 2/pi * n (within 1%)
    val meanAbs = st.sum_abs.toDouble / st.n_samples
    assert(math.abs(meanAbs - amp * 2 / math.Pi) < amp * 0.01,
      s"mean|s| $meanAbs vs ${amp * 2 / math.Pi}")
    // a 440 Hz sine crosses zero 2f times per second (±1 boundary effect)
    assert(math.abs(st.crossings - 2 * f) <= 2, s"crossings ${st.crossings}")
    assert(st.peak <= amp.toLong && st.peak > (amp * 0.99).toLong,
      s"peak ${st.peak} vs amp $amp")
  }

  test("llm_multimodal_audio decodes stay partition-local: only the spread exchange and the sort shuffle") {
    val df = SparkEntry.queries("llm_multimodal_audio")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), plan.take(800))
    // pre-encode doc_id spread + presentation sort; payloads never shuffle
    assert("Exchange".r.findAllIn(plan).size <= 2,
      "audio decode must not shuffle payloads:\n" + plan.take(1500))
    // no exchange may sit between payload encode (UDF) and the decode
    val below = plan.substring(plan.indexOf("MapPartitions"))
    val (udfAt, exAt) = (below.indexOf("UDF"), below.indexOf("Exchange"))
    assert(udfAt >= 0 && (exAt == -1 || exAt > udfAt),
      "no exchange may sit between payload encode and decode:\n" + plan.take(1500))
  }

  test("JPEG lane (r15): real decode through the second still-image codec — true dims, structural features") {
    import graft.ops.Llm
    // dims come from the decoded pixel grid, not the hash stub (the stub
    // would fabricate dims from the payload hash — 48×32 proves the real
    // lane engaged on content dispatch)
    val bytes = Llm.jpegTile(docId = 5L, w = 48, h = 32)
    assert(Llm.isJpeg(bytes) && !Llm.isPng(bytes))
    val feat = Llm.decodeBatch(Seq(Llm.MediaIn(5L, bytes, "image/jpeg"))).head
    assert(feat.width == 48 && feat.height == 32 && feat.n_frames == 1,
      s"JPEG decode returned stub-shaped output: $feat")
    // features are STRUCTURAL under lossy coding: a flat mid-bin tile's
    // luminance histogram concentrates in its bin (doc 5 → bin 5), for
    // every bin
    (0L until 8L).foreach { id =>
      val v = Llm.featureBatch(Seq(Llm.MediaIn(id,
        Llm.jpegTile(id), "image/jpeg"))).head
      val bin = id.toInt
      assert(v.feat(bin) > 0.9,
        s"doc $id: luminance mass must sit in bin $bin: ${v.feat.toSeq}")
    }
    // mixed batch: PNG (bit-exact lane), JPEG (real lossy lane), and a
    // stub mime — one seam, three dispositions, no cross-talk
    val mixed = Llm.decodeBatch(Seq(
      Llm.MediaIn(1L, Llm.pngStrip(1L, "hello world png"), "image/png"),
      Llm.MediaIn(2L, Llm.jpegTile(2L, 20, 10), "image/jpeg"),
      Llm.MediaIn(3L, Array.tabulate[Byte](64)(_.toByte), "video/mp4")))
    assert(mixed(1).width == 20 && mixed(1).height == 10)
    assert(mixed(0).n_frames >= 1 && mixed(2).n_frames >= 1)
  }
}
