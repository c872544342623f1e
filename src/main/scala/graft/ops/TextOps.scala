package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline extensions beyond SURVEY §2.10: language-ID,
  * quality scoring, token counting, document fingerprinting, deterministic
  * sampling, and the remaining dedup/similarity families (n-gram Jaccard,
  * SimHash, embedding-cosine, sign-LSH ANN, dedup connected components).
  *
  * Scale notes: every per-document op here is a single narrow projection
  * over the scan (no shuffle); the pairwise ops generate candidates from
  * bucket equality — salted banded-LSH ([[Llm.bandedPairs]]) for the
  * probabilistic families, the exact prefix filter ([[prefixCandidates]])
  * for the oracle-gated ones — never an all-pairs product, with the
  * per-element kernels compiled (interpreted HOF lambdas are kept off the
  * corpus-wide hot path).
  */
object TextOps {

  /** Per-language stopword profiles for the n-gram/stopword heuristic.
    * Deterministic tiebreak order: en > fr > es > de > und. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "en", "que", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "mit"),
  )

  private def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString("[", ", ", "]")
  private def sparkList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** 64-bit SimHash over tokens (with multiplicity) — compiled kernel, same
    * rationale as [[Llm.minhashSig]]. */
  def simhash64: Seq[String] => Long = { toks =>
    // no-extension fallback twin of the native graft.plans.Simhash64
    // expression — one shared kernel (the UDF wraps into ArrayData first),
    // so hamming distances and band buckets cannot drift between paths
    graft.plans.Simhash64.kernel(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any]))
  }

  /** L independent sign-LSH tables (random-hyperplane signs) for embedding
    * vectors: table `t` uses its own `nBits` deterministic
    * pseudo-hyperplanes (splitmix64 components in [-1, 1)); per-table
    * bucket = the sign pattern.
    *
    * Why multiple tables: a single table's recall for a true neighbor at
    * angle θ is (1 − θ/π)^nBits — at cos 0.95 (θ ≈ 18°) with 8 bits that is
    * only ≈ 0.43, so one table silently drops most non-identical neighbors.
    * OR-amplification over L tables (candidate = same bucket in ANY table)
    * lifts recall to 1 − (1 − (1−θ/π)^b)^L ≈ 0.99 at L = 8, b = 8 — while
    * keeping the per-table collision rate for near-orthogonal background
    * pairs at ~2^-b, so the candidate set stays ∝ L·n²/2^b, never all
    * pairs. Table 0 reproduces the previous single-table seed layout. */
  def signBuckets(nTables: Int, nBits: Int): Seq[Float] => Array[Int] = { v =>
    // no-extension fallback twin of the native graft.plans.SignBuckets
    // expression — one shared kernel (the UDF wraps into ArrayData first),
    // so bucket ids cannot drift between paths (the simhash64 recipe)
    graft.plans.SignBuckets.kernel(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
      nTables, nBits)
  }

  /** Bucketing column: the native codegen'd `sign_buckets` expression when
    * the extension is installed (r20 — the last recurring Scala UDF on an
    * LLM hot loop, the ivf_argmax_dot precedent), the bit-identical UDF
    * twin on a vanilla session. */
  def signBucketsCol(spark: SparkSession, nTables: Int, nBits: Int)(v: Column): Column =
    if (spark.catalog.functionExists("sign_buckets"))
      call_function("sign_buckets", v, lit(nTables), lit(nBits))
    else udf(signBuckets(nTables, nBits)).apply(v)

  /** EXACT prefix-filter candidate pairs (the AllPairs/PPJoin scheme) for
    * set-similarity joins at threshold t = `tNum`/`tDen`: `hashed` carries
    * per-document SORTED arrays of element hashes (`h`); each document
    * indexes its |h| − ⌈t·|h|⌉ + 1 smallest hashes (integer ceil — float
    * ceil over-shoots exact multiples and would break the completeness
    * theorem), and any pair with Jaccard ≥ t provably shares an indexed
    * hash under this fixed global order — candidate generation with NO
    * probabilistic miss, unlike MinHash banding. Shuffles carry
    * (hash, doc_id) postings only. Unlike [[Llm.bandedPairs]] this
    * generator cannot salt over-full postings without losing exactness —
    * a corpus where one indexed hash posts O(n) documents has a truly
    * O(n²) answer and belongs to the capped probabilistic path. */
  def prefixCandidates(hashed: DataFrame, tNum: Int, tDen: Int): DataFrame =
    hashed
      .select(col("doc_id"), explode(expr(
        s"slice(h, 1, size(h) - CAST(($tNum * size(h) + $tDen - 1) div $tDen AS INT) + 1)"))
        .as("gram"))
      .groupBy(col("gram")).agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS a_id, y AS b_id))))"))
        .as("p"))
      .select(col("p.a_id"), col("p.b_id")).distinct()

  /** Planted A–B–C near-dup chains for the connected-components key: three
    * prefix variants of each ≥20-word doc, adjacent pairs above the edge
    * threshold, end pair below it — so only a transitive closure groups
    * them. */
  private[graft] def componentNodes(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 20)
    def variant(shift: Int, keep: Int) = base.select(
      (col("doc_id") + shift).as("doc_id"), expr(s"slice(w, 1, $keep)").as("w"))
    variant(0, 20)
      .unionByName(variant(100000, 16))
      .unionByName(variant(200000, 12))
  }

  /** Near-dup edge list for the components key: exact prefix-filter
    * candidates verified at word-3-gram Jaccard ≥ 0.6. Carries NO broadcast
    * hint — the shingle-hash side is corpus-sized at 100 TB (this key is
    * the canonical-doc-selection path) and a forced broadcast is an
    * executor OOM; AQE picks the small side (the candidate pairs) from
    * measured stats. PlanShapeSpec pins the hint-free plan. */
  private[graft] def componentEdges(spark: SparkSession, nodes: DataFrame): DataFrame = {
    val sh = nodes.select(col("doc_id"), expr(
        "array_sort(array_distinct(transform(sequence(1, size(w) - 2), i -> xxhash64(concat_ws(' ', slice(w, i, 3))))))").as("h"))
      .select(col("doc_id"), col("h"), size(col("h")).as("n"))
    prefixCandidates(sh, tNum = 3, tDen = 5)
      .join(sh.select(col("doc_id").as("a_id"), col("h").as("a_h"),
        col("n").as("a_n")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("h").as("b_h"),
        col("n").as("b_n")), "b_id")
      .withColumn("inter", expr(Llm.intersectCountFn(spark, "a_h", "b_h")).cast("double"))
      .filter(col("inter") / (col("a_n") + col("b_n") - col("inter")) >= 0.6)
      .select(col("a_id"), col("b_id"))
  }

  /** Multi-table sign-LSH ANN top-k: candidates share the probe's bucket in
    * at least one of `nTables` tables; exact dot ranking within the deduped
    * candidate set. The bucketed candidate join is the 100 TB path
    * (brute-force `llm_sim_knn` is the small-corpus oracle baseline); the
    * shuffle key is (table, bucket) and the post-join dedup carries only
    * (probe_id, vec_id, sim) — the cheap re-computed dot per duplicate
    * collision beats re-joining embeddings onto deduped id pairs. */
  def annTopK(emb: DataFrame, probeFilter: Column, nTables: Int, nBits: Int,
      k: Int): DataFrame = {
    val buckets = signBucketsCol(emb.sparkSession, nTables, nBits) _
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      posexplode(buckets(col("embedding"))).as(Seq("tbl", "bucket")))
    val probes = bucketed.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("tbl"), col("bucket"))
    val dot = Llm.dotFn(emb.sparkSession, "p_emb", "embedding")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim_r").desc, col("vec_id"))
    // probes are few by construction — broadcast them so the corpus side
    // joins map-side with no shuffle of (vec_id, embedding) rows
    broadcast(probes)
      .join(bucketed.select(col("tbl"), col("bucket"), col("vec_id"), col("embedding")),
        Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), round(expr(dot), 6).as("sim_r"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("sim_r"))
  }

  /** Cross-document repeated-substring profile (the `llm_dedup_substring`
    * dataflow): docs<300 ∪ planted 40-word copies → distinct word-8-grams
    * per doc → grams shared by >1 doc → per-doc shared ratio + ≥0.5 flag,
    * ordered by doc_id. With `hashGrams=true` the postings/agg/semi-join
    * key is `xxhash64(gram)` — the shuffle carries (int64, doc_id) rows,
    * ~8 bytes instead of a ~50-byte string per posting, which is the
    * 100 TB shape; counts are preserved exactly absent an xxhash64
    * collision among the corpus' distinct grams (P ≈ 10⁻¹¹ at 10⁴ grams).
    * With `hashGrams=false` the key stays the gram string, matching the
    * DuckDB oracle construction literally; TextOpsSpec pins the two paths
    * equal row-for-row on the fixture. */
  private[graft] def substringProfile(spark: SparkSession, sfDir: String,
                                      hashGrams: Boolean): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val planted = docs.filter(col("doc_id") < 20 && size(col("w")) >= 40)
      .select((col("doc_id") + 500000).as("doc_id"),
        expr("slice(w, 1, 40)").as("w"))
    val gramStr = explode(expr(
      "array_distinct(transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8))))"))
    val grams0 = docs.unionByName(planted)
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), gramStr.as("gram"))
    // fixed-width postings key: everything downstream (shared-gram agg,
    // semi-join, per-doc counts) shuffles the 64-bit hash, never the string
    val grams =
      if (hashGrams) grams0.select(col("doc_id"), xxhash64(col("gram")).as("gram"))
      else grams0
    val shared = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("gram"))
    grams
      .join(shared, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .join(grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams")),
        Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_ratio", round(col("n_shared") / col("n_grams"), 4))
      .withColumn("flagged", col("shared_ratio") >= 0.5)
      .orderBy(col("doc_id"))
  }

  val queries: Seq[Q] = Seq(

    // Language-ID by stopword-profile hits (n-gram heuristic family).
    // The CASE text is shared verbatim between Spark SQL and DuckDB.
    Q("llm_lang_id",
      (spark, sfDir) => {
        val hits = stopwords.toSeq.sortBy(_._1).foldLeft(
          Tables.documents(spark, sfDir)
            .select(col("doc_id"), split(col("text"), " ").as("toks"))) {
          case (df, (lang, ws)) =>
            df.withColumn(s"${lang}_hits",
              expr(s"size(filter(toks, t -> array_contains(${sparkList(ws)}, t)))"))
        }
        hits.select(col("doc_id"), col("en_hits"), col("fr_hits"), col("es_hits"), col("de_hits"),
            expr("""CASE WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
                         WHEN fr_hits >= es_hits AND fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
                         WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
                         WHEN de_hits > 0 THEN 'de'
                         ELSE 'und' END""").as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH h AS (
          SELECT doc_id,
            CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${sqlList(stopwords("en"))}, t))) AS INT) AS en_hits,
            CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${sqlList(stopwords("fr"))}, t))) AS INT) AS fr_hits,
            CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${sqlList(stopwords("es"))}, t))) AS INT) AS es_hits,
            CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${sqlList(stopwords("de"))}, t))) AS INT) AS de_hits
          FROM documents)
        SELECT doc_id, en_hits, fr_hits, es_hits, de_hits,
          CASE WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
               WHEN fr_hits >= es_hits AND fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
               WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
               WHEN de_hits > 0 THEN 'de'
               ELSE 'und' END AS pred_lang
        FROM h
        ORDER BY doc_id""".trim)),

    // Quality scoring: length / punctuation / stopword / alpha ratios.
    Q("llm_text_quality",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            length(col("text")).as("n_chars_c"),
            size(split(col("text"), " ")).as("n_tokens"),
            length(regexp_replace(col("text"), "[^a-z]", "")).as("n_alpha"),
            expr(s"size(filter(split(text, ' '), t -> array_contains(${sparkList(stopwords("en"))}, t)))").as("n_stop"))
          .select(col("doc_id"), col("n_chars_c"), col("n_tokens"),
            (col("n_alpha").cast("double") / col("n_chars_c")).as("alpha_ratio"),
            (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
            ((col("n_alpha").cast("double") / col("n_chars_c")) * 0.5
              + (col("n_stop").cast("double") / col("n_tokens")) * 0.5).as("quality"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH b AS (
          SELECT doc_id,
            CAST(length(text) AS INT) AS n_chars_c,
            CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
            CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS INT) AS n_alpha,
            CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${sqlList(stopwords("en"))}, t))) AS INT) AS n_stop
          FROM documents)
        SELECT doc_id, n_chars_c, n_tokens,
          CAST(n_alpha AS DOUBLE) / n_chars_c AS alpha_ratio,
          CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
          (CAST(n_alpha AS DOUBLE) / n_chars_c) * 0.5
            + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5 AS quality
        FROM b
        ORDER BY doc_id""".trim)),

    // Token counting: whitespace tokens + BPE-ish regex tokens + the
    // chars/4 heuristic estimate.
    Q("llm_token_count",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("ws_tokens"),
            size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)")).as("bpe_ish_tokens"),
            ceil(col("n_chars") / 4.0).cast("long").as("est_tokens"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
          CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS bpe_ish_tokens,
          CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
        FROM documents
        ORDER BY doc_id""".trim)),

    // Document fingerprinting: polynomial rolling hash over code points
    // (explicit fold — identical arithmetic in both engines) + a winnowed
    // min-4-gram variant of the same hash.
    Q("llm_fingerprint",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          // Guard: sequence(1, length(text) - 3) auto-steps DESCENDING for
          // texts < 4 chars (garbage substrings) while the oracle's range()
          // is empty — filter sub-gram docs identically on both sides.
          .filter(length(col("text")) >= 4)
          .select(col("doc_id"),
            expr("""aggregate(transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))),
                              0L, (h, c) -> (h * 31 + c) % 1000000007)""").as("roll_hash"),
            expr("""array_min(transform(sequence(1, length(text) - 3),
                              i -> aggregate(transform(sequence(i, i + 3), j -> ascii(substring(text, j, 1))),
                                             0L, (h, c) -> (h * 31 + c) % 1000000007)))""").as("min_gram_hash"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(text) + 1), i -> CAST(unicode(text[i]) AS BIGINT))),
                      (h, c) -> (h * 31 + c) % 1000000007) AS roll_hash,
          list_min(list_transform(range(1, length(text) - 2),
                   i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(i, i + 4), j -> CAST(unicode(text[j]) AS BIGINT))),
                                    (h, c) -> (h * 31 + c) % 1000000007))) AS min_gram_hash
        FROM documents
        WHERE length(text) >= 4
        ORDER BY doc_id""".trim)),

    // Character-4-gram Jaccard near-dup on a bounded sub-corpus + planted
    // perturbed copies — candidates via EXACT prefix filtering (the
    // AllPairs/PPJoin scheme), verification per candidate pair only.
    //
    // Design, with measurements (r3):
    //  - Grams are hashed to longs once per document (xxhash64) and kept
    //    sorted; Jaccard on the hashed sets equals Jaccard on the strings
    //    absent a 64-bit collision among this corpus's ~10⁴ distinct grams
    //    (P ≈ 10⁻¹¹), and the per-pair verify drops from string-set
    //    intersection+union to one long-array intersection plus the
    //    |A∪B| = |A|+|B|−|A∩B| identity — the pair kernel that made the
    //    r2 cross join 3.3 s is where the time actually was.
    //  - Prefix filter: index each doc's ⌊|g|⌋ − ⌈t·|g|⌉ + 1 smallest gram
    //    hashes (integer arithmetic — float ceil(0.8·n) over-ceils exact
    //    multiples and would shorten the prefix below the theorem's bound);
    //    any pair with J ≥ t provably shares an indexed gram under ANY
    //    fixed global order, so candidate generation is complete — no
    //    probabilistic miss on this oracle-gated key. Hash order trades
    //    the classic rarity order's stronger pruning for zero extra
    //    shuffles (rarity order needs a df aggregate + per-doc window;
    //    measured 17.4k vs 24.1k candidates on this corpus but 4× the
    //    stage cost — background char-4-gram J here is 0.26 mean/0.44 max,
    //    so NO order prunes much; on a diverse open corpus background J→0
    //    and the same prefix index prunes hard). Banded MinHash (16×2 over
    //    char grams) was also measured: 53% of all pairs survive — the
    //    S-curve cannot separate 0.44 from 0.8.
    //  - Size filter before the intersect: J ≥ 0.8 forces 4·|B| ≤ 5·|A|
    //    and vice versa (integer compare, prunes 24k → 6.7k pairs here).
    //  - A degenerate all-identical corpus degrades to the true all-pairs
    //    answer (the output itself is O(n²)); that corpus belongs to
    //    llm_dedup_exact / the bucket-capped MinHash path.
    Q("llm_dedup_ngram",
      (spark, sfDir) => {
        val docs = Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
        val planted = docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"),
            regexp_replace(col("text"), " \\w+$", "").as("text"))
        // Sub-gram docs (< 4 chars) have no 4-grams: the oracle's range()
        // is empty while Spark's sequence() would step descending — filter
        // identically on both sides.
        val base = docs.unionByName(planted).filter(length(col("text")) >= 4)
        val hashed = base.select(col("doc_id"), expr(
            "array_sort(array_distinct(transform(sequence(1, length(text) - 3), i -> xxhash64(substring(text, i, 4)))))").as("h"))
          .select(col("doc_id"), col("h"), size(col("h")).as("glen"))
        val cands = prefixCandidates(hashed, tNum = 4, tDen = 5)
        // No broadcast hint on the shingle-hash side: at 100 TB the hashed
        // table is corpus-sized and a forced broadcast is an executor OOM.
        // The candidate-pair side is the provably small one — leave the
        // choice to AQE, which sees actual sizes at runtime.
        cands
          .join(hashed.select(col("doc_id").as("a_id"), col("h").as("a_h"),
            col("glen").as("a_len")), "a_id")
          .join(hashed.select(col("doc_id").as("b_id"), col("h").as("b_h"),
            col("glen").as("b_len")), "b_id")
          .filter(col("a_len") * 5 >= col("b_len") * 4 && col("b_len") * 5 >= col("a_len") * 4)
          .withColumn("inter", expr(Llm.intersectCountFn(spark, "a_h", "b_h")).cast("double"))
          .select(col("a_id"), col("b_id"),
            round(col("inter") / (col("a_len") + col("b_len") - col("inter")), 4).as("jaccard_4gram"))
          .filter(col("jaccard_4gram") >= 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""
        WITH base AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 200
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, regexp_replace(text, ' \w+$', '') AS text
          FROM documents WHERE doc_id < 20
        ), grams AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, length(text) - 2), i -> substr(text, i, 4))) AS g
          FROM base
          WHERE length(text) >= 4)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
            / len(list_distinct(a.g || b.g)), 4) AS jaccard_4gram
        FROM grams a, grams b
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.8
        ORDER BY a_id, b_id""".trim)),

    // SimHash near-dup: 64-bit signature, 4×16-bit bands for candidates,
    // hamming ≤ 6 verification via bit_count(xor). Hash-dependent ⇒ omit
    // oracle; planted recall property-tested.
    Q("llm_dedup_simhash",
      (spark, sfDir) => {
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val planted = docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"),
            regexp_replace(col("text"), " \\w+$", "").as("text"))
        val sigCol =
          if (spark.catalog.functionExists("simhash64"))
            expr("simhash64(split(text, ' '))")
          else udf(simhash64).apply(split(col("text"), " "))
        val sigs = docs.unionByName(planted)
          .select(col("doc_id"), sigCol.as("sig"))
        // candidates via the shared salted bucket-join (16-bit signature
        // quarters as bands — r2's inline collect_set carried full sigs
        // through an uncapped bucket, the same mega-bucket exposure
        // lshCandidates was hardened against); signatures rejoin onto the
        // deduped id pairs for the hamming verify
        val banded = sigs.select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> (sig >> (b * 16)) & 65535)")).as(Seq("band", "bucket")))
        Llm.bandedPairs(banded)
          .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
          .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
          .select(col("a_id"), col("b_id"),
            expr("bit_count(a_sig ^ b_sig)").cast("int").as("hamming"))
          .filter(col("hamming") <= 6)
          .orderBy(col("a_id"), col("b_id"))
      },
      None),

    // Embedding-cosine near-dup: multi-table sign-LSH buckets (8 tables ×
    // 8 bits, OR-amplified — see [[signBuckets]]) → exact cosine ≥ 0.95.
    // The plants are PERTURBED copies, not exact ones: the last component
    // negated keeps unit norm and gives cosine = 1 − 2·x_d² ≈ 0.97 for
    // 64-d unit vectors — a genuine near-duplicate that sits across
    // hyperplanes, so single-table LSH would silently miss ~half of them
    // while the 8-table union recalls them all (TextOpsSpec measures this
    // against driver-side exact cosine). Omit oracle (hash-dependent
    // candidates).
    Q("llm_dedup_embed",
      (spark, sfDir) => {
        val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
        val planted = emb.filter(col("vec_id") < 20)
          .select((col("vec_id") + 100000).as("vec_id"),
            expr("transform(embedding, (x, i) -> IF(i = size(embedding) - 1, -x, x))")
              .as("embedding"))
        val all = emb.unionByName(planted)
        val buckets8 = signBucketsCol(spark, 8, 8) _
        // Candidate pairs via the shared salted bucket-join (tables are the
        // bands): the bucketing kernel evaluates ONCE and the shuffle
        // carries (table, bucket, vec_id) only — a bucketed SELF-join would
        // re-evaluate the kernel per side and shuffle the embedding
        // payloads. Exact cosine runs per deduped candidate pair; the
        // pairs⨝vectors joins carry NO broadcast hint — the planner
        // broadcasts the candidate-pair side (LSH makes it tiny relative
        // to the corpus), where a forced hint on the vector table would
        // pin the full embedding set to every executor at 100 TB.
        val banded = all.select(col("vec_id").as("doc_id"),
          posexplode(buckets8(col("embedding"))).as(Seq("band", "bucket")))
        val dot = Llm.dotFn(spark, "a_e", "b_e")
        Llm.bandedPairs(banded)
          .join(all.select(col("vec_id").as("a_id"), col("embedding").as("a_e")), "a_id")
          .join(all.select(col("vec_id").as("b_id"), col("embedding").as("b_e")), "b_id")
          .select(col("a_id"), col("b_id"), round(expr(dot), 6).as("cosine"))
          .filter(col("cosine") >= 0.95)
          .orderBy(col("a_id"), col("b_id"))
      },
      None),

    // Cross-document repeated-substring profile (r5): the substring-level
    // contamination check (RefinedWeb-style exact substring dedup, at
    // word-8-gram granularity) — for each doc, what fraction of its
    // distinct 8-grams also appears in ANOTHER doc; docs above 50% are
    // near-copies at span level even when document-level Jaccard
    // (llm_dedup_ngram) stays low. Planted: doc_id+500000 carries exactly
    // the first 40 words of its original, so every variant gram is shared
    // (ratio 1.0) and the dedup provably flags it. Scale shape (r6): the
    // Spark postings key is the gram's 64-BIT HASH — the shuffle carries
    // (int64, doc_id) rows, ~8 bytes instead of a ~50-byte string per
    // posting, and every downstream agg/semi-join keys on the fixed-width
    // hash. Per-doc counts are preserved exactly absent an xxhash64
    // collision among the corpus' distinct grams (P ≈ 10⁻¹¹ at 10⁴ grams —
    // the llm_dedup_ngram argument), so the string-gram DuckDB oracle
    // still matches hash-for-hash; TextOpsSpec additionally pins the hash
    // and string paths equal row-for-row on the fixture.
    Q("llm_dedup_substring",
      (spark, sfDir) =>
        substringProfile(spark, sfDir, hashGrams = true),
      Some("""
        WITH base AS (
          SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 300
          UNION ALL
          SELECT doc_id + 500000 AS doc_id, list_slice(string_split(text, ' '), 1, 40) AS w
          FROM documents WHERE doc_id < 20 AND len(string_split(text, ' ')) >= 40
        ), g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(w) - 6),
            i -> array_to_string(list_slice(w, i, i + 7), ' ')))) AS gram
          FROM base WHERE len(w) >= 8
        ), shared AS (
          SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
        ), per_doc AS (
          SELECT g.doc_id, COUNT(*) AS n_grams,
            COUNT(*) FILTER (WHERE g.gram IN (SELECT gram FROM shared)) AS n_shared
          FROM g GROUP BY g.doc_id
        )
        SELECT doc_id, n_grams, n_shared,
          round(CAST(n_shared AS DOUBLE) / n_grams, 4) AS shared_ratio,
          round(CAST(n_shared AS DOUBLE) / n_grams, 4) >= 0.5 AS flagged
        FROM per_doc
        ORDER BY doc_id""".trim)),

    // URL canonicalization dedup (r5): web-crawl corpora carry the same
    // page under host-case / trailing-slash / tracking-query variants —
    // canonicalize (lowercase host, strip query+fragment, strip trailing
    // slashes) and collapse to one doc per canonical URL. The fixture has
    // no URLs (SURVEY §0), so each doc constructs its variant
    // deterministically from doc_id: 100 canonical pages spread across
    // case/slash/query variants, provably collapsed by the dedup. Scale
    // shape: per-row regex (zero shuffle) + one hash-agg on the canonical
    // key — the same plan as llm_dedup_exact with URL, not digest, as key.
    Q("llm_url_dedup",
      (spark, sfDir) => {
        val url = concat(lit("https://"),
          when(col("doc_id") % 3 === 0, lit("WWW.Example.COM"))
            .otherwise(lit("www.example.com")),
          lit("/page/"), (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("?utm_source=feed")).otherwise(lit("")))
        Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 400)
          .select(col("doc_id"), url.as("url"))
          .withColumn("canon", concat(lit("https://"),
            lower(regexp_extract(col("url"), "^https://([^/?#]+)", 1)),
            regexp_replace(
              regexp_extract(col("url"), "^https://[^/?#]+([^?#]*)", 1),
              "/+$", "")))
          .groupBy(col("canon"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_variants"))
          .orderBy(col("canon"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
            'https://' ||
            CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM' ELSE 'www.example.com' END ||
            '/page/' || CAST(doc_id % 100 AS VARCHAR) ||
            CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
            CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed' ELSE '' END AS url
          FROM documents WHERE doc_id < 400
        )
        SELECT 'https://' ||
            lower(regexp_extract(url, '^https://([^/?#]+)', 1)) ||
            regexp_replace(regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1), '/+$', '')
          AS canon,
          MIN(doc_id) AS keep_id, COUNT(*) AS n_variants
        FROM u
        GROUP BY 1
        ORDER BY canon""".trim)),

    // Deterministic hash sampling (§2.12 extension): training pipelines
    // need REPRODUCIBLE subsamples — TABLESAMPLE / rand() change under
    // retries, AQE re-splits, and engine versions, so the predicate is a
    // pure function of the key: one LCG step bucketed mod 2048, keep 205
    // buckets ≈ 10.01%. The key is reduced mod 2048 BEFORE the multiply —
    // (k·a + c) mod 2048 depends only on k mod 2048, so the result is
    // identical, but the intermediate stays ≤ 2047·a ≈ 2.3e12: no signed
    // 64-bit overflow for ANY doc_id (a raw doc_id·a wraps past
    // doc_id ≈ 8.4e9 — silently in Spark, an error in DuckDB), and the
    // double-mod keeps the remainder non-negative even for negative keys.
    // Scale-safe by construction: a pushed-down scan filter, no shuffle,
    // stable under any partitioning.
    Q("llm_doc_sample",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .filter(expr("((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048 < 205"))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE ((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048 < 205
        ORDER BY doc_id""".trim)),

    // ANN similarity search — the bucketed scale path for llm_sim_knn,
    // OR-amplified over 8 independent 8-bit tables for recall (a single
    // table only finds near-identical vectors; see [[signBuckets]]).
    Q("llm_sim_ann",
      (spark, sfDir) =>
        annTopK(Tables.embeddings(spark, sfDir), col("vec_id") < 10,
          nTables = 8, nBits = 8, k = 10)
          .orderBy(col("probe_id"), col("rank")),
      None),

    // Dedup connected components (§2.12 extension): near-duplicate
    // similarity is NOT transitive — the corpus below plants chains
    // A–B–C (A = first 20 words, B = first 16, C = first 12; word-3-gram
    // Jaccard A↔B ≈ 0.78, B↔C ≈ 0.71, but A↔C ≈ 0.56 < the 0.6 edge
    // threshold), so picking one canonical doc per duplicate GROUP needs
    // the transitive closure, not a pairwise filter. Edges come from the
    // exact prefix filter at t = 3/5 (no probabilistic miss — this key is
    // oracle-gated against a DuckDB recursive-CTE closure); the closure
    // runs [[graft.ops.Components]]'s large-star/small-star alternation
    // (r12) — O(log n) rounds instead of O(diameter), one groupBy-min +
    // one join per round. The edge list is checkpointed ONCE so the
    // candidate-generation + verify pipeline never re-runs per round.
    Q("llm_dedup_components",
      (spark, sfDir) => {
        val nodes = componentNodes(spark, sfDir)
        val edges = componentEdges(spark, nodes)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
          .localCheckpoint()
        graft.ops.Components.run(
            nodes.select(col("doc_id").as("node")), edges)
          .select(col("node").as("doc_id"), col("comp").as("component"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH RECURSIVE
        b0 AS (
          SELECT doc_id, list_slice(string_split(text, ' '), 1, 20) AS w
          FROM documents
          WHERE doc_id < 20 AND len(string_split(text, ' ')) >= 20
        ),
        nodes AS (
          SELECT doc_id, w FROM b0
          UNION ALL SELECT doc_id + 100000 AS doc_id, list_slice(w, 1, 16) AS w FROM b0
          UNION ALL SELECT doc_id + 200000 AS doc_id, list_slice(w, 1, 12) AS w FROM b0
        ),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
          FROM nodes
        ),
        edges AS (
          SELECT a.doc_id AS src, b.doc_id AS dst
          FROM sh a, sh b
          WHERE a.doc_id <> b.doc_id
            AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.6
        ),
        reach AS (
          SELECT doc_id AS id, doc_id AS r FROM nodes
          UNION
          SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
        )
        SELECT id AS doc_id, MIN(r) AS component
        FROM reach
        GROUP BY id
        ORDER BY doc_id""".trim)),

    // Corpus vocabulary top-k (r8): explode tokens → global counts →
    // top-100 by (count DESC, token ASC) — the vocabulary-building /
    // corpus-statistics pass every tokenizer training run starts with.
    // Scale shape: the explode is partition-local; the count is a
    // two-phase HashAggregate whose shuffle carries ONE partial row per
    // (partition, token) — bounded by vocabulary size, not corpus size —
    // and the top-k plans as TakeOrderedAndProject (per-partition heaps,
    // k rows to the driver; never a global sort). Deterministic: the
    // token itself breaks count ties, so the k-boundary is a total order.
    Q("llm_vocab_topk",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
          .limit(100),
      Some("""
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT 100""".trim)),

    // Gopher-style quality-rule filter (r8): the named-rule filter chain
    // (word-count bounds, mean-word-length band, symbol ratio, distinct-
    // stopword floor) with PER-RULE verdicts plus the conjunctive keep —
    // the auditable shape real corpus filters need (each rule's kill count
    // is observable downstream), vs llm_text_quality's single blended
    // score. Thresholds are the published Gopher ones where the synthetic
    // corpus exercises them (50-word floor, ≥2 distinct stopwords split
    // the fixture; the mean-word-length band and symbol cap pass-through
    // here but bind on real web text). All integer/boolean except one
    // IEEE division per doc — deterministic. Zero-shuffle scan predicates;
    // at 100 TB this is a pushed-down projection, and `keep` feeds the
    // same partition-pruning story as llm_doc_sample.
    Q("llm_gopher_filter",
      (spark, sfDir) => {
        val toks = split(col("text"), " ")
        val nWords = size(filter(toks, t => t =!= ""))
        val meanWordLen = length(regexp_replace(col("text"), " ", ""))
          .cast("double") / nullif(nWords, lit(0))
        val symbolRatio = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
          .cast("double") / length(col("text"))
        val stopHits = size(array_intersect(array_distinct(toks),
          expr(sparkList(stopwords("en")))))
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), nWords.as("n_words"),
            meanWordLen.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
            stopHits.as("stop_hits"))
          .select(col("doc_id"), col("n_words"), col("mean_word_len"),
            col("symbol_ratio"), col("stop_hits"),
            (col("n_words") >= 50 && col("n_words") <= 100000).as("r_wordcount"),
            (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).as("r_wordlen"),
            (col("symbol_ratio") < 0.1).as("r_symbols"),
            (col("stop_hits") >= 2).as("r_stopwords"))
          .withColumn("keep",
            col("r_wordcount") && col("r_wordlen") && col("r_symbols") && col("r_stopwords"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH m AS (
          SELECT doc_id,
            CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_words,
            CAST(len(replace(text, ' ', '')) AS DOUBLE)
              / nullif(len(list_filter(string_split(text, ' '), t -> t <> '')), 0) AS mean_word_len,
            CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
              / len(text) AS symbol_ratio,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
              ${sqlList(stopwords("en"))})) AS INT) AS stop_hits
          FROM documents)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, stop_hits,
          n_words >= 50 AND n_words <= 100000 AS r_wordcount,
          mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS r_wordlen,
          symbol_ratio < 0.1 AS r_symbols,
          stop_hits >= 2 AS r_stopwords,
          (n_words >= 50 AND n_words <= 100000)
            AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
            AND (symbol_ratio < 0.1) AND (stop_hits >= 2) AS keep
        FROM m
        ORDER BY doc_id""".trim)),

    // BM25 retrieval scoring (r9): the keyword-search half of the
    // retrieval story (llm_sim_knn/llm_tfidf are the other halves) — score
    // every document against a fixed 3-term query and return the top 10.
    // ALL arithmetic is scaled int64 (the pagerank determinism policy):
    // the usual ln() IDF is replaced by its integer-exact rational odds
    // surrogate idf' = ⌊10^6·(2N−2df+1)/(2df+1)⌋ (monotone-decreasing in
    // df, so per-term ordering is preserved; ln is avoided because Spark's
    // JDK libm and DuckDB's C libm are not bit-identical), and the
    // k1=1.2 / b=0.75 saturation term is cleared of fractions by
    // multiplying through by 10·Σdl:
    //   tf' = ⌊10^6·22·tf·Σdl / (10·tf·Σdl + 3·Σdl + 9·dl·N)⌋.
    // Scale shape: one explode + two hash aggregates (doc lengths, term
    // tfs), the query-term filter prunes the explode BEFORE the tf
    // aggregate, df and the corpus globals are 1-to-31-row broadcasts,
    // and the final top-k is TakeOrderedAndProject — no global sort.
    Q("llm_bm25",
      (spark, sfDir) => bm25Scores(spark, sfDir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10),
      Some(s"""$bm25OracleCte
        SELECT doc_id, score FROM bm25_scores
        ORDER BY score DESC, doc_id
        LIMIT 10""".trim)),

    // Reciprocal-rank fusion (r9): merge two heterogeneous top-100
    // rankings — BM25 keyword relevance and a document-length prior —
    // into one list via RRF = Σ ⌊10^9/(60+rank)⌋ (the standard k=60,
    // integer-exact so cross-engine order is bit-stable). The full outer
    // join keeps docs present in only one list; ranks stay visible so the
    // fusion is auditable. Scale shape: each list is TakeOrdered-bounded
    // to 100 rows BEFORE its row_number window (single 100-row partition,
    // a driver-sized relation), so the fusion cost is O(k), independent
    // of corpus size — the shape hybrid search needs at 100 TB.
    Q("llm_rank_fusion",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        def ranked(base: DataFrame, ord: Seq[Column], rankCol: String) =
          base.orderBy(ord: _*).limit(100)
            .withColumn(rankCol, row_number().over(Window.orderBy(ord: _*)).cast("long"))
        val a = ranked(bm25Scores(spark, sfDir),
          Seq(col("score").desc, col("doc_id")), "rank_a")
          .select(col("doc_id"), col("rank_a"))
        val b = ranked(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars")),
          Seq(col("n_chars").desc, col("doc_id")), "rank_b")
          .select(col("doc_id").as("doc_id_b"), col("rank_b"))
        a.join(b, col("doc_id") === col("doc_id_b"), "full_outer")
          .select(coalesce(col("doc_id"), col("doc_id_b")).as("doc_id"),
            (coalesce(expr("1000000000L div (60 + rank_a)"), lit(0L)) +
              coalesce(expr("1000000000L div (60 + rank_b)"), lit(0L))).as("rrf"),
            col("rank_a"), col("rank_b"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""$bm25OracleCte,
        rank_a AS (
          SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_a
          FROM (SELECT doc_id, score FROM bm25_scores ORDER BY score DESC, doc_id LIMIT 100)),
        rank_b AS (
          SELECT doc_id, CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank_b
          FROM (SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100))
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
          COALESCE(1000000000 // (60 + rank_a), 0) +
          COALESCE(1000000000 // (60 + rank_b), 0) AS rrf,
          rank_a, rank_b
        FROM rank_a a FULL OUTER JOIN rank_b b ON a.doc_id = b.doc_id
        ORDER BY rrf DESC, doc_id
        LIMIT 10""".trim)),

    // Inverted index with fixed-size posting blocks (r9): term → document
    // posting lists, the structure BM25/keyword retrieval reads at serve
    // time. Real indexes store postings in bounded blocks, so the key
    // emits df (the full posting count) plus BLOCK 0 — the first 32
    // doc_ids in sorted order as a CSV string. Scale shape: df comes from
    // a count aggregate (never a collect), the block is a per-term
    // row_number window filtered to ≤ 32 BEFORE any list materializes —
    // per-group state is bounded at the block size no matter how hot the
    // term (the stopword-skew guard), and the exchange is one hash
    // partition on term.
    Q("llm_inverted_index",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val pairs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
          .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("occ"))
        val df = pairs.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
        val block0 = pairs
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("term")).orderBy(col("doc_id"))))
          .filter(col("rn") <= 32)
          .groupBy(col("term"))
          .agg(expr("array_join(transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')")
            .as("block0"))
        df.join(block0, "term").orderBy(col("term"))
      },
      Some("""
        WITH pairs AS (
          SELECT term, doc_id FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
          WHERE term <> ''
          GROUP BY term, doc_id),
        df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM pairs GROUP BY term),
        block0 AS (
          SELECT term, string_agg(doc_id, ',' ORDER BY doc_id) AS block0
          FROM (SELECT term, doc_id,
                  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
                FROM pairs)
          WHERE rn <= 32
          GROUP BY term)
        SELECT df.term, df, block0
        FROM df JOIN block0 ON df.term = block0.term
        ORDER BY df.term""".trim)),

    // Bigram language-model training (r10): the statistical step past
    // llm_vocab_topk's unigram counting — conditional next-token
    // probabilities P(w2|w1) with add-½ smoothing over the corpus vocab,
    // the model behind perplexity filters (llm_lm_score consumes exactly
    // these tables) and classic n-gram decoders. Bigrams come from one
    // adjacent-pair explode (transform over the token array — no
    // self-join); counts are two hash aggregates; the unigram table joins
    // the bigram table on w1 and the 1-row vocab size broadcasts. All
    // counts are exact bigints; the single probability division is the
    // only double, computed identically in both engines. Top-100 by
    // count plans as TakeOrderedAndProject (no global sort). At 100 TB:
    // explode → two map-side-combined aggs → one join keyed on w1 — the
    // same shape as the TF-IDF/BM25 keys, nothing collects.
    Q("llm_ngram_lm",
      (spark, sfDir) => {
        val toks = Tables.documents(spark, sfDir)
          .select(filter(split(col("text"), " "),
            t => t =!= "").as("toks"))
        val bigrams = toks
          .select(explode(expr(
            """transform(slice(toks, 1, greatest(size(toks) - 1, 0)),
               (t, i) -> struct(t AS w1, toks[i + 1] AS w2))""")).as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
        val unigrams = toks
          .select(explode(col("toks")).as("w1"))
          .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val vocab = unigrams.agg(count(lit(1)).as("v"))
        bigrams.join(unigrams, "w1").crossJoin(broadcast(vocab))
          .select(col("w1"), col("w2"), col("cnt"), col("c1"),
            round((col("cnt").cast("double") + lit(0.5)) /
              (col("c1").cast("double") + lit(0.5) * col("v").cast("double")), 6)
              .as("p_smooth"))
          .orderBy(col("cnt").desc, col("w1"), col("w2"))
          .limit(100)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
          FROM documents),
        bg AS (
          SELECT w1, w2, COUNT(*) AS cnt FROM (
            SELECT unnest(l[1:len(l) - 1]) AS w1, unnest(l[2:len(l)]) AS w2
            FROM toks)
          GROUP BY 1, 2),
        ug AS (
          SELECT unnest(l) AS w1 FROM toks),
        u AS (
          SELECT w1, COUNT(*) AS c1 FROM ug GROUP BY w1),
        v AS (SELECT COUNT(*) AS v FROM u)
        SELECT w1, w2, cnt, c1,
          round((CAST(cnt AS DOUBLE) + 0.5)
                / (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)), 6) AS p_smooth
        FROM bg JOIN u USING (w1) CROSS JOIN v
        ORDER BY cnt DESC, w1, w2
        LIMIT 100""".trim)),

    // Stratified exact-k sampling (r10): exactly min(k=20, |stratum|)
    // documents per (lang, source) stratum, chosen by a SHARED
    // deterministic pseudo-random order — Knuth's multiplicative hash of
    // doc_id mod 2³², computed identically in both engines (no engine
    // hash function leaks into the contract). Unlike llm_doc_sample's
    // Bernoulli LCG (a RATE), this guarantees per-stratum COUNTS — the
    // eval-set / ablation-subset builder where every stratum must be
    // represented. One shuffle on the stratum key + row_number over the
    // hash order; strata are bounded-cardinality so no skew. Rank, not
    // the hash, is the output — reruns and engine upgrades reproduce the
    // exact subset.
    Q("llm_stratified_sample",
      (spark, sfDir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"), col("source")).orderBy(col("h"), col("doc_id"))
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            expr("pmod(doc_id * 2654435761L, 4294967296L)").as("h"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            col("rk"))
          .orderBy(col("lang"), col("source"), col("rk"))
      },
      Some("""
        SELECT doc_id, lang, source, n_chars, rk
        FROM (
          SELECT doc_id, lang, source, n_chars,
            CAST(row_number() OVER (PARTITION BY lang, source
              ORDER BY ((doc_id * 2654435761) % 4294967296 + 4294967296) % 4294967296,
                       doc_id) AS INT) AS rk
          FROM documents)
        WHERE rk <= 20
        ORDER BY lang, source, rk""".trim)),

    // Vocabulary coverage / OOV rate (r10): how much of each document a
    // top-100 word vocabulary covers — the tokenizer-evaluation metric
    // that decides vocab size (llm_vocab_topk builds the vocabulary;
    // this measures it). Per doc: token count, OOV count, OOV rate; the
    // corpus rolls up per lang. The vocabulary (100 rows) broadcasts
    // into a left-anti-style membership test (a LEFT JOIN + null check,
    // so the join stays broadcast and no token row is lost); counts are
    // exact bigints, the one rate division is the only double. At
    // 100 TB: explode → broadcast membership probe → two-phase agg —
    // zero data-bound joins beyond the token explode itself.
    Q("llm_oov_rate",
      (spark, sfDir) => {
        val toks = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token")).limit(100)
          .select(col("token").as("v_token"))
        val perDoc = toks.join(broadcast(vocab),
            col("token") === col("v_token"), "left")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("v_token").isNull, 1L).otherwise(0L)).as("n_oov"))
        perDoc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tokens"),
            sum(col("n_oov")).as("oov"),
            round(sum(col("n_oov")).cast("double") /
              sum(col("n_tokens")).cast("double"), 6).as("oov_rate"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
          FROM documents),
        tf AS (SELECT doc_id, lang, token FROM toks WHERE token <> ''),
        vocab AS (
          SELECT token FROM (
            SELECT token, COUNT(*) AS cnt FROM tf GROUP BY token
            ORDER BY cnt DESC, token LIMIT 100)),
        per_doc AS (
          SELECT tf.doc_id, tf.lang, COUNT(*) AS n_tokens,
                 CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov
          FROM tf LEFT JOIN vocab v ON tf.token = v.token
          GROUP BY tf.doc_id, tf.lang)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens,
               CAST(SUM(n_oov) AS BIGINT) AS oov,
               round(CAST(SUM(n_oov) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE), 6)
                 AS oov_rate
        FROM per_doc
        GROUP BY lang
        ORDER BY lang""".trim)),

    // Tokenizer fertility (r12): subword tokens emitted per whitespace
    // word, by language — THE metric a multilingual tokenizer is judged
    // on (a vocab trained on English spends 2-4× the tokens per word on
    // underrepresented scripts, which silently taxes their context
    // budget and training compute). Per lang: docs, BPE-ish tokens
    // (llm_token_count's regex), whitespace words, fertility as floor-ppm
    // tokens/word, and chars-per-token ppm (the compression rate the
    // chars/4 heuristic assumes). All-integer; one documents scan + one
    // |langs|-row hash-agg — at 100 TB this is a map-side-combined pass.
    Q("llm_tokenizer_fertility",
      (spark, sfDir) => {
        val perDoc = Tables.documents(spark, sfDir)
          .select(col("lang"),
            size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)"))
              .cast("long").as("toks"),
            size(split(col("text"), " ")).cast("long").as("words"),
            col("n_chars").cast("long").as("chars"))
        perDoc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("tokens"),
            sum(col("words")).as("words"),
            sum(col("chars")).as("chars"))
          .withColumn("fertility_ppm", expr("tokens * 1000000 div words"))
          .withColumn("chars_per_token_ppm", expr("chars * 1000000 div tokens"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH per_doc AS (
          SELECT lang,
                 CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS toks,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
                 CAST(n_chars AS BIGINT) AS chars
          FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS tokens,
               CAST(SUM(words) AS BIGINT) AS words,
               CAST(SUM(chars) AS BIGINT) AS chars,
               CAST(SUM(toks) * 1000000 // SUM(words) AS BIGINT) AS fertility_ppm,
               CAST(SUM(chars) * 1000000 // SUM(toks) AS BIGINT) AS chars_per_token_ppm
        FROM per_doc
        GROUP BY lang
        ORDER BY lang""".trim)),

    // Sentence-level dedup / boilerplate detection (r12): the CCNet move
    // — deduplicate at SENTENCE granularity, where nav chrome, cookie
    // banners, and license footers repeat across documents that are not
    // themselves duplicates (doc-level dedup never sees them). Split on
    // '. ', hash each sentence (grouping rides the 32-byte sha256 digest,
    // never text — the dataset_card policy), count distinct docs per
    // sentence, and report per doc: sentences, sentences shared with ≥1
    // other doc, and the boilerplate floor-ppm. One explode + one
    // digest-keyed agg + one digest join — explode multiplies rows, not
    // shuffle width; at 100 TB the sentence-frequency table is itself a
    // maintained artifact (the llm_dedup_incremental argument).
    Q("llm_sentence_dedup",
      (spark, sfDir) => {
        val sent = Tables.documents(spark, sfDir)
          .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("s"))
          .filter(length(trim(col("s"))) > 0)
          .select(col("doc_id"), sha2(col("s"), 256).as("h"))
        val freq = sent.groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("nd"))
        sent.join(freq, "h")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sent"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_boiler"))
          .withColumn("boiler_ppm", expr("n_boiler * 1000000 div n_sent"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH sent AS (
          SELECT doc_id, sha256(s) AS h
          FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS s
                FROM documents)
          WHERE length(trim(s)) > 0
        ), freq AS (
          SELECT h, COUNT(DISTINCT doc_id) AS nd FROM sent GROUP BY h
        )
        SELECT s.doc_id, COUNT(*) AS n_sent,
               CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_boiler,
               CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS boiler_ppm
        FROM sent s JOIN freq f ON s.h = f.h
        GROUP BY s.doc_id
        ORDER BY s.doc_id""".trim)),
  )

  /** Integer-exact BM25 scores for the fixed query {hash, join, vector}
    * over `documents` — shared by llm_bm25 (top-k) and llm_rank_fusion
    * (list A). See the llm_bm25 entry for the arithmetic derivation. */
  private[graft] def bm25Scores(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val globals = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val tf = toks.filter(col("token").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "token")
      .join(lens, "doc_id")
      .crossJoin(broadcast(globals))
      .withColumn("s", expr(
        """((1000000L * (2*n - 2*df + 1)) div (2*df + 1))
           * ((1000000L * 22 * tf * sumdl) div (10*tf*sumdl + 3*sumdl + 9*dl*n))
           div 1000000L"""))
      .groupBy(col("doc_id")).agg(sum(col("s")).cast("long").as("score"))
  }

  private val Bm25Terms: Seq[String] = Seq("hash", "join", "vector")

  /** DuckDB CTE computing the same integer-exact BM25 scores (twin of
    * [[bm25Scores]]; WITH-prefix shared by the llm_bm25 / llm_rank_fusion
    * oracles). */
  private def bm25OracleCte: String = """
        WITH toks AS (
          SELECT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
          WHERE token <> ''),
        lens AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        globals AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM lens),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
               WHERE token IN ('hash', 'join', 'vector') GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        bm25_scores AS (
          SELECT t.doc_id,
            CAST(SUM(
              ((1000000 * (2*g.n - 2*d.df + 1)) // (2*d.df + 1))
              * ((1000000 * 22 * t.tf * g.sumdl) // (10*t.tf*g.sumdl + 3*g.sumdl + 9*l.dl*g.n))
              // 1000000) AS BIGINT) AS score
          FROM tf t
          JOIN df d ON t.token = d.token
          JOIN lens l ON t.doc_id = l.doc_id
          CROSS JOIN globals g
          GROUP BY t.doc_id)""".trim
}
