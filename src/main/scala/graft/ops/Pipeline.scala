package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Q, Tables}

/** Training-data pipeline operators, round 4 (§2.12 extensions): the
  * corpus-preparation stages between raw scraped text and a training run —
  * chunking, repetition-quality filtering, test-set decontamination, domain
  * mixing, embedding quantization, TF-IDF keywording, and IVF ANN.
  *
  * Every operator here is a narrow per-document projection or a
  * broadcast-joined filter: the shuffles that exist (tfidf's doc-term agg,
  * decontaminate's gram join) carry ids + short grams, never full text, so
  * each plan's network volume is a small fraction of the corpus and the
  * shapes survive a 100 TB / 1000-executor scale-up unchanged.
  */
object Pipeline {

  /** Word-window chunking shared shape: 1-based start positions at the
    * given stride; Spark `sequence`/`slice` and DuckDB
    * `generate_series`/list-slice agree on inclusive 1-based semantics. */
  private val ChunkLen = 32
  private val ChunkStride = 24

  /** Decontamination gram width: small enough to hit the fixture's planted
    * template overlaps, the production knob is the same expression at 8-13. */
  private val GramN = 5
  private val PackSeqTokens = 2048
  private val ShardCount = 16
  private val ShardHashMod = 1048576L

  def queries: Seq[Q] = Seq(

    // Chunk splitting: fixed word-window chunks with overlap (window 32,
    // stride 24 → 8-word overlap), the standard shaping step before
    // tokenization. Scale-safe by construction: pure per-row explode —
    // no shuffle at all except the presentation sort; chunk count per doc
    // is ceil(n_words/stride), bounded by document length.
    Q("llm_chunk_split",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(col("doc_id"), col("words"),
            explode(sequence(lit(1), size(col("words")), lit(ChunkStride))).as("chunk_start"))
          .select(col("doc_id"), col("chunk_start"),
            size(slice(col("words"), col("chunk_start"), lit(ChunkLen))).as("n_tokens"),
            array_join(slice(col("words"), col("chunk_start"), lit(ChunkLen)), " ").as("chunk_text"))
          .orderBy(col("doc_id"), col("chunk_start")),
      Some(s"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        s AS (SELECT doc_id, words, unnest(generate_series(1, len(words), $ChunkStride)) AS cs FROM w)
        SELECT doc_id, CAST(cs AS INT) AS chunk_start,
          CAST(len(words[cs:cs+${ChunkLen - 1}]) AS INT) AS n_tokens,
          array_to_string(words[cs:cs+${ChunkLen - 1}], ' ') AS chunk_text
        FROM s ORDER BY doc_id, chunk_start""".trim)),

    // Repetition-quality filter (Gopher-style): duplicate-word and
    // duplicate-bigram ratios per document, with a flag for the repetitive
    // tail. Entirely array-function arithmetic inside the row — no explode,
    // no shuffle; the ratios are single IEEE divisions of exact ints so the
    // oracle matches bit-for-bit. The empty-bigram guard returns
    // `slice(words, 1, 0)` (an empty ARRAY<STRING>) because a bare
    // `array()` would type as ARRAY<NULL> and break the CASE.
    Q("llm_quality_repetition",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .withColumn("bigrams",
            expr("CASE WHEN size(words) >= 2 THEN transform(sequence(1, size(words) - 1)," +
              " i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))" +
              " ELSE slice(words, 1, 0) END"))
          .select(col("doc_id"),
            size(col("words")).as("n_words"),
            size(array_distinct(col("words"))).as("n_distinct"),
            (lit(1.0) - size(array_distinct(col("words"))).cast("double") / size(col("words")))
              .as("dup_word_ratio"),
            when(size(col("bigrams")) === 0, lit(0.0))
              .otherwise(lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") / size(col("bigrams")))
              .as("dup_bigram_ratio"))
          .withColumn("flagged", col("dup_bigram_ratio") > 0.06)
          .orderBy(col("doc_id")),
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        b AS (SELECT doc_id, words,
          CASE WHEN len(words) >= 2 THEN list_transform(generate_series(1, len(words) - 1),
            i -> words[i] || ' ' || words[i + 1]) ELSE words[1:0] END AS bigrams FROM w)
        SELECT doc_id,
          CAST(len(words) AS INT) AS n_words,
          CAST(len(list_distinct(words)) AS INT) AS n_distinct,
          1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS dup_word_ratio,
          CASE WHEN len(bigrams) = 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams) END AS dup_bigram_ratio,
          (CASE WHEN len(bigrams) = 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams) END) > 0.06 AS flagged
        FROM b ORDER BY doc_id""".trim)),

    // Test-set decontamination: flag training documents sharing any word
    // 5-gram with the held-out set (doc_id < 20 here). The held-out gram
    // set is tiny relative to the corpus — broadcast it, so the corpus-side
    // gram explode never shuffles: each training gram probes the hash map
    // in place and only (doc_id, gram) survivors reach the count-distinct.
    // At production scale the gram string would be xxhash64'd before the
    // join (8 bytes instead of ~30); the string join keeps the DuckDB
    // oracle exact here and changes nothing about the plan shape.
    Q("llm_decontaminate",
      (spark, sfDir) => {
        val grams = Tables.documents(spark, sfDir)
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(col("doc_id"), explode(expr(
            s"CASE WHEN size(words) >= $GramN THEN transform(sequence(1, size(words) - ${GramN - 1})," +
              s" i -> array_join(slice(words, i, $GramN), ' '))" +
              " ELSE slice(words, 1, 0) END")).as("gram"))
        val heldout = grams.filter(col("doc_id") < 20).select(col("gram")).distinct()
        grams.filter(col("doc_id") >= 20)
          .join(broadcast(heldout), "gram")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("gram")).as("n_hits"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        g AS (SELECT doc_id, unnest(
          CASE WHEN len(words) >= $GramN THEN list_transform(generate_series(1, len(words) - ${GramN - 1}),
            i -> array_to_string(words[i:i+${GramN - 1}], ' ')) ELSE words[1:0] END) AS gram FROM w),
        h AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
        SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
        FROM g JOIN h USING (gram) WHERE g.doc_id >= 20
        GROUP BY g.doc_id ORDER BY g.doc_id""".trim)),

    // Domain mixing: per-language stratified sampling at inverse-frequency
    // rates (en is ~44% of the fixture corpus → 10%; the minority languages
    // → 30%), equalizing expected per-language counts in the training mix.
    // The same overflow-safe LCG predicate as llm_doc_sample, so the draw
    // is reproducible under retries and any partitioning, and the whole
    // operator is one pushed-down scan filter — zero shuffle.
    Q("llm_domain_mix",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .filter(expr("((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048" +
            " < CASE lang WHEN 'en' THEN 205 ELSE 614 END"))
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, lang, source
        FROM documents
        WHERE ((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048
          < CASE lang WHEN 'en' THEN 205 ELSE 614 END
        ORDER BY doc_id""".trim)),

    // Importance resampling (r11): materialize a domain-reweighted corpus
    // by REPLICATING each document ⌊w⌋ or ⌈w⌉ times — the "epochs per
    // domain" knob (DoReMi/Pile-style mixtures) that llm_domain_mix's
    // downsampling filter cannot express when a domain needs weight > 1.
    // Per-source weight in exact tenths (w10 ∈ {4,11,18,25,32} from the
    // source index), copies = w10 div 10 plus a deterministic Bernoulli
    // on the fractional tenth via an LCG keyed on doc_id — rerun- and
    // partition-stable, so E[copies] = w exactly and the SAME docs get
    // the extra copy on every run (the property downstream dedup and
    // train/test splits depend on). Pure map-side: weight lookup, copy
    // count, and sequence-explode are all codegen'd per-row work with
    // ZERO shuffle — at 100 TB the output write is the entire cost, and
    // replication multiplies bytes only where the mixture asks for it.
    Q("llm_importance_resample",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .withColumn("w10",
            expr("CAST(substring(source, 4) AS BIGINT) % 5 * 7 + 4"))
          .withColumn("n_copies",
            expr("w10 DIV 10 + CASE WHEN ((doc_id % 1000003) * 1103515245" +
              " + 12345) % 10 < w10 % 10 THEN 1 ELSE 0 END"))
          .filter(col("n_copies") >= 1)
          .select(col("doc_id"), col("source"), col("n_copies"),
            explode(expr("sequence(1L, n_copies)")).as("copy_idx"))
          .orderBy(col("doc_id"), col("copy_idx")),
      Some("""
        WITH t AS (
          SELECT doc_id, source,
            CAST(substring(source, 4) AS BIGINT) % 5 * 7 + 4 AS w10
          FROM documents),
        n AS (
          SELECT doc_id, source,
            w10 // 10 + CASE WHEN ((doc_id % 1000003) * 1103515245
              + 12345) % 10 < w10 % 10 THEN 1 ELSE 0 END AS n_copies
          FROM t)
        SELECT doc_id, source, n_copies,
               unnest(generate_series(1, n_copies)) AS copy_idx
        FROM n WHERE n_copies >= 1
        ORDER BY doc_id, copy_idx""".trim)),

    // Symmetric int8 embedding quantization: per-vector scale = 127/max|x|,
    // q_i = floor(x_i·scale + 0.5) ∈ [-127, 127], plus the max
    // reconstruction error — the storage/bandwidth step before ANN serving
    // (4 B → 1 B per dim). Pure per-row array arithmetic in double
    // precision (float inputs widen exactly), no shuffle; the two double
    // outputs go through the DECIMAL(18,6) emit policy like every other
    // float oracle.
    Q("llm_embed_quant",
      (spark, sfDir) =>
        Tables.embeddings(spark, sfDir)
          .withColumn("max_abs", expr("CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)"))
          .withColumn("scale", expr("CASE WHEN max_abs > 0 THEN 127.0 / max_abs ELSE 1.0 END"))
          .withColumn("q", expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5d) AS INT))"))
          .withColumn("err_max", expr(
            "array_max(zip_with(embedding, q, (x, qi) -> abs(CAST(x AS DOUBLE) - qi / scale)))"))
          .select(col("vec_id"), Det.emit(col("scale"), 6).as("scale_q"),
            // CSV, not ARRAY<INT>: oracle outputs stay scalar-typed (the
            // driver compare hashes scalar cells; same convention as
            // fn_array's top3) — information-identical to the array
            expr("array_join(transform(q, v -> CAST(v AS STRING)), ',')").as("q_csv"),
            Det.emit(col("err_max"), 6).as("err_max_q"))
          .orderBy(col("vec_id")),
      Some("""
        WITH b AS (
          SELECT vec_id, embedding,
            CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs
          FROM embeddings),
        c AS (SELECT vec_id, embedding,
          CASE WHEN max_abs > 0 THEN 127.0 / max_abs ELSE 1.0 END AS scale FROM b),
        d AS (SELECT vec_id, embedding, scale,
          list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INT)) AS q
          FROM c)
        SELECT vec_id,
          CAST(CAST(scale AS DECIMAL(18,6)) AS DOUBLE) AS scale_q,
          array_to_string(q, ',') AS q_csv,
          CAST(CAST(list_max(list_transform(generate_series(1, len(embedding)),
            i -> abs(CAST(embedding[i] AS DOUBLE) - q[i] / scale))) AS DECIMAL(18,6)) AS DOUBLE) AS err_max_q
        FROM d ORDER BY vec_id""".trim)),

    // TF-IDF keywording: top-3 terms per document by tf·idf. Two shuffles,
    // both narrow: the (doc, term) count carries ids + single terms, and
    // the document-frequency side collapses to |vocab| rows — broadcast
    // back onto the term counts, so the rank window is the only wide sort.
    // Scores are ranked on their DECIMAL(18,6)-rounded value with the term
    // as tiebreak: a last-ulp libm difference between engines cannot flip
    // an order the rounding has already coarsened.
    Q("llm_tfidf",
      (spark, sfDir) => {
        val docs = Tables.documents(spark, sfDir)
        val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dfreq = terms.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
        val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
        // no broadcast HINT on dfreq: |vocab| is small here and AQE picks
        // broadcast on its own, but at web scale the term dictionary is
        // heavy-tailed-huge and this must degrade to a shuffle join on
        // term — a forced broadcast would pin a multi-GB table to every
        // executor. The 1-row corpus count is always broadcast-safe.
        val scored = tf.join(dfreq, "term")
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            Det.emit(col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1))) + lit(1.0)), 6))
        scored
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("score"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM t),
        s AS (
          SELECT tf.doc_id, tf.term, tf.tf,
            CAST(CAST(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1)) + 1.0) AS DECIMAL(18,6)) AS DOUBLE) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n),
        r AS (SELECT doc_id, term, tf, score,
          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM s)
        SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, score
        FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".trim)),

    // PII scrubbing: regex redaction of emails and phone numbers with
    // per-document redaction counts — the privacy pass before any corpus
    // release. The fixture corpus carries no PII, so the query plants a
    // deterministic payload on a keyed subset first (same construction in
    // the oracle), then scrubs it; the patterns use [.]-style classes
    // instead of backslash escapes because Spark string parsing and DuckDB
    // literal semantics disagree on backslashes (the r3 fn_string trap).
    // Per-row projection, zero shuffle, scale-safe by construction.
    Q("llm_pii_scrub",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .withColumn("t", concat(col("text"), expr(
            "CASE WHEN doc_id % 7 = 0 THEN ' contact bob@example.com or x9@mail.org today'" +
              " WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 now' ELSE '' END")))
          .select(col("doc_id"),
            size(regexp_extract_all(col("t"),
              lit("[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+"), lit(0))).as("n_email"),
            size(regexp_extract_all(col("t"),
              lit("555-[0-9]{3}-[0-9]{4}"), lit(0))).as("n_phone"),
            regexp_replace(
              regexp_replace(col("t"), "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+", "[EMAIL]"),
              "555-[0-9]{3}-[0-9]{4}", "[PHONE]").as("clean"))
          .orderBy(col("doc_id")),
      Some("""
        WITH p AS (
          SELECT doc_id, text ||
            CASE WHEN doc_id % 7 = 0 THEN ' contact bob@example.com or x9@mail.org today'
              WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 now' ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+')) AS INT) AS n_email,
          CAST(len(regexp_extract_all(t, '555-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone,
          regexp_replace(regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+', '[EMAIL]', 'g'),
            '555-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS clean
        FROM p ORDER BY doc_id""".trim)),

    // Unigram-LM quality proxy (r4): score each document by the mean log
    // relative corpus frequency of its words — the cheap perplexity stand-in
    // used to rank corpus text for filtering (high = fluent/common, very
    // low = gibberish or OCR noise). The frequency table is |vocab|-sized
    // and carries no hint (same reasoning as llm_tfidf: AQE broadcasts it
    // here, a web-scale dictionary must shuffle-join). Scores rank on
    // their DECIMAL(18,6)-coarsened value so the libm log is ulp-proof.
    Q("llm_lm_score",
      (spark, sfDir) => {
        val docs = Tables.documents(spark, sfDir)
        val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val total = terms.agg(count(lit(1)).as("n_total"))
        val freq = terms.groupBy(col("term")).agg(count(lit(1)).as("tc"))
        // per-row decimal rounding BEFORE the sum (Det policy): a raw
        // avg(log(...)) is an order-dependent double fold under partial
        // aggregation and diverges from the oracle in the last ulp
        terms.join(freq, "term")
          .crossJoin(broadcast(total))
          .groupBy(col("doc_id"))
          .agg((Det.emit(sum(Det.val6(log(col("tc").cast("double") / col("n_total")))), 6)
              / count(lit(1))).as("lm_score"),
            count(lit(1)).as("n_terms"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        n AS (SELECT count(*) AS n_total FROM t),
        f AS (SELECT term, count(*) AS tc FROM t GROUP BY term)
        SELECT t.doc_id,
          ${Det.sqlEmit(s"SUM(${Det.sqlVal6("ln(CAST(f.tc AS DOUBLE) / n.n_total)")})", 6)} / count(*) AS lm_score,
          count(*) AS n_terms
        FROM t JOIN f USING (term) CROSS JOIN n
        GROUP BY t.doc_id ORDER BY t.doc_id""".trim)),

    // Embedding clustering (r4): the IVF coarse quantizer exposed as a
    // curation operator — every vector with its cell id and the cosine to
    // its centroid, the input to cluster-balanced sampling and coverage
    // analysis of a training corpus. Deterministic end to end (fixed
    // seeds, fixpoint-free 3-round Lloyd), so the output is rows-only
    // stable; PipelineSpec pins rerun-identity, the argmin property
    // against the returned centroids, and full coverage of the corpus.
    Q("llm_cluster_assign",
      (spark, sfDir) => {
        val model = ivfTrain(Tables.embeddings(spark, sfDir), nCells = 16)
        val cents = model.centroids
        val cosUdf = udf { (u: Seq[Double], cell: Int) =>
          val c = cents(cell)
          var d = 0.0; var i = 0
          while (i < u.length) { d += u(i) * c(i); i += 1 }
          BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        model.assigned
          .select(col("vec_id"), col("cell"), cosUdf(col("u"), col("cell")).as("centroid_cos"))
          .orderBy(col("vec_id"))
      },
      None),

    // IVF ANN (§2.12): the centroid-quantizer scale path for similarity
    // search, complementing the sign-LSH tables of llm_sim_ann. A 16-cell
    // coarse quantizer is trained by three deterministic Lloyd iterations
    // (seeded from fixed vec_ids, means reduced distributively — only the
    // 16×dim centroid table ever reaches the driver), every vector is
    // assigned to its nearest cell map-side against the broadcast
    // centroids, and probes search the nprobe=4 nearest cells: ~25% of the
    // corpus scanned per probe instead of 100%. No oracle (centroid
    // assignment is iteration-order-free but not SQL-expressible);
    // PipelineSpec measures recall vs brute force and pins the exactness
    // of the full-probe limit.
    Q("llm_ann_ivf",
      (spark, sfDir) =>
        ivfTopK(Tables.embeddings(spark, sfDir), col("vec_id") < 10,
          nCells = 16, nProbe = 4, k = 10)
          .orderBy(col("probe_id"), col("rank")),
      None),

    // Sequence packing (r5): assign documents to fixed 2048-token training
    // sequences by a per-language prefix sum — the GPT-style "concatenate
    // and split" packing where a document starts in sequence
    // floor(preceding_tokens / 2048). All integer arithmetic (`div`, never
    // IEEE division), so the assignment is bit-identical in both engines.
    // One shuffle on lang; the prefix sum is a per-partition window. At
    // 100 TB the partition key is the deterministic shard of
    // `llm_shard_assign` (bounded rows per window partition), not a whole
    // language — the shape is unchanged.
    Q("llm_pack_sequences",
      (spark, sfDir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("lang"),
            expr(s"greatest(1L, n_chars div 4)").as("tok"))
          .withColumn("cum", sum(col("tok")).over(w))
          .withColumn("seq_id", expr(s"(cum - tok) div $PackSeqTokens"))
          .groupBy(col("lang"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tok"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("lang"), col("seq_id"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, lang, greatest(CAST(1 AS BIGINT), n_chars // 4) AS tok
          FROM documents),
        c AS (
          SELECT doc_id, lang, tok,
            CAST(SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM t)
        SELECT lang, (cum - tok) // $PackSeqTokens AS seq_id,
          COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS sum_tok,
          MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM c GROUP BY 1, 2 ORDER BY lang, seq_id""".trim)),

    // Deterministic corpus shuffle + sharding (r5): the global "shuffle the
    // corpus, split into N shards" step before training, WITHOUT a global
    // sort — shard = hash % N is a plain hash partition, and the
    // within-shard order is a per-shard window over (hash, doc_id). The
    // hash is the overflow-safe keyed LCG of `llm_doc_sample` widened to 20
    // bits (pre-reduce mod 2^20 before the multiply keeps the product
    // under 2^51 — exact in both engines' int64). Rerun-stable,
    // retry-stable, partitioning-stable; at 100 TB this is
    // `write.partitionBy(shard)` + `sortWithinPartitions(h, doc_id)`.
    Q("llm_shard_assign",
      (spark, sfDir) => {
        val rnW = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("n_chars"),
            expr(s"((doc_id % $ShardHashMod + $ShardHashMod) % $ShardHashMod * 1103515245 + 12345) % $ShardHashMod").as("h"))
          .withColumn("shard", expr(s"h % $ShardCount"))
          .withColumn("rn", row_number().over(rnW))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            array_join(transform(array_sort(collect_list(
              when(col("rn") <= 5, struct(col("rn"), col("doc_id"))))),
              s => s.getField("doc_id").cast("string")), ",").as("head_docs"))
          .orderBy(col("shard"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, n_chars,
            ((doc_id % $ShardHashMod + $ShardHashMod) % $ShardHashMod * 1103515245 + 12345) % $ShardHashMod AS h
          FROM documents)
        SELECT h % $ShardCount AS shard, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          array_to_string((list(doc_id ORDER BY h, doc_id))[1:5], ',') AS head_docs
        FROM t GROUP BY 1 ORDER BY shard""".trim)),

    // Deterministic train/val/test split (r5): 90/5/5 by the overflow-safe
    // keyed LCG bucket (1843/103/102 of 2048) — the held-out assignment is
    // a pure function of doc_id, so it is rerun-stable, partitioning-
    // stable, and consistent across every pipeline that reads the corpus
    // (the property that makes eval decontamination POSSIBLE: a doc can
    // never drift from test into train between runs). Zero shuffle before
    // the per-(lang, split) audit aggregate; identical CASE arithmetic in
    // both engines.
    Q("llm_train_test_split",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .withColumn("b", expr(
            "((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048"))
          .withColumn("split", expr(
            "CASE WHEN b < 1843 THEN 'train' WHEN b < 1946 THEN 'val' ELSE 'test' END"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_doc"))
          .orderBy(col("lang"), col("split")),
      Some("""
        WITH t AS (
          SELECT lang, doc_id, n_chars,
            ((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048 AS b
          FROM documents)
        SELECT lang,
          CASE WHEN b < 1843 THEN 'train' WHEN b < 1946 THEN 'val' ELSE 'test' END AS split,
          COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          MIN(doc_id) AS min_doc
        FROM t
        GROUP BY 1, 2
        ORDER BY lang, split""".trim)),

    // End-to-end curation pipeline (r9): the flagship COMPOSITE — the
    // chain a real corpus-prep job runs, as ONE declarative plan so
    // Catalyst fuses the stages instead of materializing between them:
    //   quality filter (the two binding Gopher rules: ≥50 words,
    //   ≥2 distinct stopwords) → exact dedup on sha256(text), min doc_id
    //   survives → deterministic 50% LCG sample → LCG shard assign →
    //   per-shard manifest (docs, words, langs). Every stage reuses a
    //   proven standalone key's recipe (llm_gopher_filter,
    //   llm_dedup_exact, llm_doc_sample, llm_shard_assign), so the
    //   composite's oracle is the same CTE chain. Scale shape: the filter
    //   and both hashes are scan-side projections (sample prunes BEFORE
    //   the dedup shuffle); dedup groups on the 32-byte digest, never
    //   full text; the only exchanges are the dedup hash-agg and the
    //   16-row shard rollup.
    Q("llm_curation_pipeline",
      (spark, sfDir) => {
        val en = TextOps.stopwords("en")
        val kept = Tables.documents(spark, sfDir)
          .withColumn("n_words", size(expr("filter(split(text, ' '), t -> t <> '')")))
          .withColumn("stop_hits", size(array_intersect(
            array_distinct(split(col("text"), " ")),
            array(en.map(lit): _*))))
          .filter(col("n_words") >= 50 && col("stop_hits") >= 2)
          .withColumn("b",
            expr("((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048"))
          .filter(col("b") < 1024)
        kept.groupBy(sha2(col("text"), 256).as("h"))
          .agg(min(col("doc_id")).as("doc_id"), min(col("n_words")).as("n_words"),
            min(col("lang")).as("lang"))
          .withColumn("shard",
            expr("((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048 % 8"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words").cast("long")).as("sum_words"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy(col("shard"))
      },
      Some(s"""
        WITH kept AS (
          SELECT doc_id, text, lang,
            CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_words
          FROM documents
          WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) >= 50
            AND len(list_intersect(list_distinct(string_split(text, ' ')),
                  [${TextOps.stopwords("en").map(w => s"'$w'").mkString(", ")}])) >= 2
            AND ((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048 < 1024),
        deduped AS (
          SELECT min(doc_id) AS doc_id, min(n_words) AS n_words, min(lang) AS lang
          FROM kept
          GROUP BY sha256(text))
        SELECT ((doc_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048 % 8 AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS sum_words,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM deduped
        GROUP BY 1
        ORDER BY shard""".trim)),

    // Cross-source contamination matrix (r10): for every source pair,
    // how many distinct 5-gram shingles they share — the corpus-level
    // report that tells a curation run WHICH splits leak into which
    // (llm_decontaminate then scrubs the flagged pair). Distinct
    // (source, gram) pairs first, so the gram self-join fan-out is
    // bounded by #sources per gram (≤ C(|sources|,2) pairs per gram),
    // NEVER document-pair quadratic; per-source gram totals ride the
    // same aggregate for an overlap coefficient against the smaller
    // side. At 100 TB this is the dedup_ngram shape without candidate
    // verification — one explode, one distinct, one bounded self-join.
    Q("llm_contamination_matrix",
      (spark, sfDir) => {
        val grams = Tables.documents(spark, sfDir)
          .select(col("source"), split(col("text"), " ").as("words"))
          .select(col("source"), explode(expr(
            s"CASE WHEN size(words) >= $GramN THEN transform(sequence(1, size(words) - ${GramN - 1})," +
              s" i -> array_join(slice(words, i, $GramN), ' '))" +
              " ELSE slice(words, 1, 0) END")).as("gram"))
          .distinct()
        val totals = grams.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
        val right = grams.select(col("source").as("s2"), col("gram"))
        val shared = grams.join(right,
            grams("gram") === right("gram") && grams("source") < col("s2"))
          .groupBy(grams("source").as("s1"), col("s2"))
          .agg(count(lit(1)).as("shared_grams"))
        shared
          .join(broadcast(totals.select(col("source").as("s1"),
            col("n_grams").as("g1"))), "s1")
          .join(broadcast(totals.select(col("source").as("s2"),
            col("n_grams").as("g2"))), "s2")
          .select(col("s1"), col("s2"), col("shared_grams"), col("g1"), col("g2"),
            round(col("shared_grams").cast("double") /
              least(col("g1"), col("g2")).cast("double"), 6).as("overlap_coef"))
          .orderBy(col("s1"), col("s2"))
      },
      Some(s"""
        WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
        g AS (SELECT DISTINCT source, unnest(
          CASE WHEN len(words) >= $GramN THEN list_transform(generate_series(1, len(words) - ${GramN - 1}),
            i -> array_to_string(words[i:i+${GramN - 1}], ' ')) ELSE words[1:0] END) AS gram FROM w),
        t AS (SELECT source, COUNT(*) AS n_grams FROM g GROUP BY source),
        s AS (
          SELECT a.source AS s1, b.source AS s2, COUNT(*) AS shared_grams
          FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
          GROUP BY 1, 2)
        SELECT s1, s2, shared_grams, t1.n_grams AS g1, t2.n_grams AS g2,
          round(CAST(shared_grams AS DOUBLE)
                / CAST(least(t1.n_grams, t2.n_grams) AS DOUBLE), 6) AS overlap_coef
        FROM s
        JOIN t t1 ON s.s1 = t1.source
        JOIN t t2 ON s.s2 = t2.source
        ORDER BY s1, s2""".trim)),

    // Preference-pair construction (r11): the RLHF/DPO data-prep step —
    // within each candidate group (here doc_id div 100 stands in for
    // "responses to one prompt"), pair the highest-quality candidate
    // (chosen) with the lowest (rejected), keep only groups with a real
    // quality gap. One single-pass hash aggregate via max_by/min_by on
    // encoded composite order keys (agg_argmin's tie-break policy:
    // score·10⁶ ∓ doc_id makes the selection total-ordered and
    // partitioning-invariant — doc_id < 10⁶ in every fixture SF, and at
    // larger id spaces the multiplier widens like agg_argmin r11). Output
    // is group-bounded; no self-join, no window over the corpus. At
    // 100 TB this is one shuffle on the group key — the same shape as any
    // per-prompt dedup — and the gap filter prunes before emission.
    Q("llm_preference_pairs",
      (spark, sfDir) => {
        val ordMax = col("score") * 1000000L - col("doc_id")
        val ordMin = col("score") * 1000000L + col("doc_id")
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), expr("doc_id div 100").as("grp"),
            col("n_chars").as("score"))
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n_docs"),
            max_by(col("doc_id"), ordMax).as("chosen"),
            max(col("score")).as("chosen_score"),
            min_by(col("doc_id"), ordMin).as("rejected"),
            min(col("score")).as("rejected_score"))
          .filter(col("n_docs") >= 2 &&
            col("chosen_score") - col("rejected_score") >= 200)
          .orderBy(col("grp"))
      },
      Some("""
        SELECT grp, n_docs, chosen, chosen_score, rejected, rejected_score
        FROM (
          SELECT doc_id // 100 AS grp, COUNT(*) AS n_docs,
                 arg_max(doc_id, n_chars * 1000000 - doc_id) AS chosen,
                 MAX(n_chars) AS chosen_score,
                 arg_min(doc_id, n_chars * 1000000 + doc_id) AS rejected,
                 MIN(n_chars) AS rejected_score
          FROM documents
          GROUP BY 1
        )
        WHERE n_docs >= 2 AND chosen_score - rejected_score >= 200
        ORDER BY grp""".trim)),

    // Span-corruption masking plan (r11): T5/UL2-style denoising prep —
    // for each document, deterministically select ~15% of token positions
    // via a position-keyed LCG (doc_id is the seed, so the mask is
    // reproducible across reruns, retries, and partitionings — the
    // llm_doc_sample property) and report tokens/masked/span counts. A
    // span START is a masked position whose predecessor is unmasked, so
    // n_spans is computable from the SAME per-position predicate at i−1
    // — pure per-row array arithmetic over sequence(1, n_tokens) with
    // higher-order filters: ZERO explode, zero shuffle, zero window. The
    // LCG pre-mods the seed (doc_id % 9973) so every product stays far
    // below int64 under ANSI; the oracle reproduces the identical
    // arithmetic over generate_series. At 100 TB this is a map-only
    // stage — exactly what you want for the heaviest-volume shaping pass.
    Q("llm_span_mask",
      (spark, sfDir) => {
        def masked(i: String) =
          s"((doc_id % 9973) * 131 + ($i) * 17) % 101 < 15"
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
          .select(col("doc_id"), col("n_tokens"),
            expr(s"size(filter(sequence(1, n_tokens), i -> ${masked("i")}))")
              .as("n_masked"),
            expr(s"""size(filter(sequence(1, n_tokens),
                i -> ${masked("i")} AND (i = 1 OR NOT ${masked("i - 1")})))""")
              .as("n_spans"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(len(list_filter(generate_series(1, len(string_split(text, ' '))),
                 i -> ((doc_id % 9973) * 131 + i * 17) % 101 < 15)) AS INT)
                 AS n_masked,
               CAST(len(list_filter(generate_series(1, len(string_split(text, ' '))),
                 i -> ((doc_id % 9973) * 131 + i * 17) % 101 < 15
                      AND (i = 1 OR NOT (((doc_id % 9973) * 131 + (i - 1) * 17) % 101 < 15))))
                 AS INT) AS n_spans
        FROM documents
        ORDER BY doc_id""".trim)),

    // SemDeDup (r11): semantic dedup by cluster-then-compare (Abbas et
    // al. 2023) — k-means-cluster the embeddings (the deterministic IVF
    // quantizer), then compute exact pairwise cosine ONLY within each
    // cluster and drop the higher id of any pair ≥ τ. The clustering is
    // what makes semantic dedup tractable: pair work falls from O(N²) to
    // Σ|cell|² — with cells sized ~√N at 100 TB that is ~N·√N spread
    // across independent cells, each cell's pair join a separate shuffle
    // partition (and the standing mega-bucket cap applies to a skewed
    // cell, same policy as LSH buckets). Perturbed plants (the
    // llm_dedup_embed corpus) give the spec measurable recall; the
    // documented recall loss is a near-dup pair straddling a cell
    // boundary — SemDeDup's accepted trade, pinned in spec via the
    // same-cell qualifier. Not SQL-expressible (centroid training);
    // PipelineSpec pins rerun-determinism, plant recall, and that every
    // flagged dup really has a ≥ τ same-cell partner (precision = 1 by
    // construction, re-verified independently).
    // r18 scaling fix (VERDICT item 3): cells sized √N, not a constant.
    // With fixed 16 cells the within-cell pair work is Σ|cell|² ≈ N²/16 —
    // still quadratic; nCells = ⌈√N⌉ makes it ≈ N·√N. A skewed cell (a
    // semantic clique larger than `cellCap`) additionally salts into
    // ⌈n/cap⌉ sub-cells before the self-join — the standing mega-bucket
    // policy from the LSH paths ([[Llm.bandedPairs]]), bounding every
    // reducer regardless of corpus degeneracy; the forgone cross-salt
    // pairs inside such a clique are the accepted trade (the clique is
    // near-identical by construction — its members flag via their salt
    // peers). PipelineSpec pins the bound under a degenerate 10× corpus.
    Q("llm_semdedup",
      (spark, sfDir) => {
        val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
        val planted = emb.filter(col("vec_id") < 20)
          .select((col("vec_id") + 100000).as("vec_id"),
            expr("transform(embedding, (x, i) -> IF(i = size(embedding) - 1, -x, x))")
              .as("embedding"))
        val all = emb.unionByName(planted)
        val nCells = math.max(16,
          math.ceil(math.sqrt(all.count().toDouble)).toInt)
        val model = ivfTrain(all, nCells)
        val a = model.assigned
        val dup = semdedupDups(a, cellCap = 512, tau = 0.92)
        a.select(col("vec_id"), col("cell"))
          .join(dup.withColumn("is_dup", lit(1)), Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"),
            coalesce(col("is_dup"), lit(0)).as("is_dup"))
          .orderBy(col("vec_id"))
      },
      None),

    // Dataset datasheet (r11): the per-source governance card every
    // training corpus ships with — volume (docs, chars), language mix
    // (distinct langs, English floor-ppm), length distribution (lower-
    // median chars, the runs-test order-statistic recipe: an actual
    // element, no interpolation), and exact-duplicate exposure (docs
    // sharing a sha256 with another doc of the SAME source, floor-ppm).
    // Three bounded aggregates over one table (profile, median pick,
    // dup rollup) merged on the |sources| spine — every compared value
    // integer. At 100 TB the swaps are mechanical: median → the
    // approx_percentile sketch, exact distinct → HLL (both standing
    // keys); the exact forms stay the audit path, and the digest
    // grouping already aggregates 32-byte hashes, never text.
    Q("llm_dataset_card",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(spark, sfDir)
          .select(col("source"), col("lang"), col("n_chars"), col("doc_id"),
            sha2(col("text"), 256).as("h"))
        val base = docs.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
        val byLen = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        val med = docs
          .withColumn("rn", row_number().over(byLen))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("source"), col("n_chars").as("p50_chars"))
        val dups = docs.groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_docs"))
        base.join(med, Seq("source")).join(dups, Seq("source"))
          .select(col("source"), col("n_docs"), col("total_chars"),
            col("n_langs"), expr("n_en * 1000000 div n_docs").as("en_ppm"),
            col("p50_chars"),
            expr("dup_docs * 1000000 div n_docs").as("dup_ppm"))
          .orderBy(col("source"))
      },
      Some("""
        WITH d AS (
          SELECT source, lang, n_chars, doc_id, sha256(text) AS h FROM documents
        ), base AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                 COUNT(DISTINCT lang) AS n_langs,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
          FROM d GROUP BY 1
        ), ranked AS (
          SELECT source, n_chars,
                 row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM d
        ), med AS (
          SELECT source, n_chars AS p50_chars FROM ranked WHERE rn = (n + 1) // 2
        ), dups AS (
          SELECT source,
                 CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs
          FROM (SELECT source, h, COUNT(*) AS c FROM d GROUP BY 1, 2)
          GROUP BY 1
        )
        SELECT b.source, b.n_docs, b.total_chars, b.n_langs,
               CAST(b.n_en * 1000000 // b.n_docs AS BIGINT) AS en_ppm,
               m.p50_chars,
               CAST(du.dup_docs * 1000000 // b.n_docs AS BIGINT) AS dup_ppm
        FROM base b
        JOIN med m ON b.source = m.source
        JOIN dups du ON b.source = du.source
        ORDER BY b.source""".trim)),

    // Context-length histogram (r12): documents bucketed by
    // floor(log2(token_count)) — the power-of-2 length spectrum every
    // packing/truncation decision starts from (llm_pack_sequences' block
    // size, truncation loss, padding waste are all read off this table).
    // Per bucket: doc count, token total, and the cumulative token share
    // walked from short to long — "what fraction of tokens lives in docs
    // shorter than 2^k". Tokens use llm_token_count's BPE-ish regex;
    // floor(log2) = length(bin(n)) − 1 (the agg_log_histogram primitive,
    // exact in both engines). One documents scan + ≤20-bucket hash-agg;
    // the cumulative window runs over those ≤20 OUTPUT rows, never docs.
    Q("llm_seq_length_hist",
      (spark, sfDir) => {
        val hist = Tables.documents(spark, sfDir)
          .select(size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)"))
            .cast("long").as("toks"))
          .filter(col("toks") > 0)
          .withColumn("bucket", (length(expr("bin(toks)")) - 1).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
        hist
          .withColumn("cum_tokens", sum(col("tokens")).over(
            Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .orderBy(col("bucket"))
      },
      Some("""
        WITH per_doc AS (
          SELECT CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS toks
          FROM documents
        ), hist AS (
          SELECT CAST(length(bin(toks)) - 1 AS BIGINT) AS bucket,
                 COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens
          FROM per_doc
          WHERE toks > 0
          GROUP BY 1
        )
        SELECT bucket, n_docs, tokens,
               CAST(SUM(tokens) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_tokens
        FROM hist
        ORDER BY bucket""".trim)),

    // In-engine QUALITY CLASSIFIER (r17): the learned stage of a corpus
    // quality filter — a fastText/CCNet-style LINEAR classifier trained
    // DISTRIBUTED by IRLS (Newton) logistic regression over per-document
    // style features. Per iteration ONE aggregation pass computes the
    // d-dim gradient and d(d+1)/2 Hessian entries (d = 6: 27 map-side-
    // combined sums — control-plane numbers back to the driver, which
    // solves the 6x6 ridge system); the corpus never shuffles and no row
    // ever leaves the executors. The fixture's weak labels threshold a
    // LINEAR score of two features at the corpus median, so the trained
    // separator must recover them (in-body require: accuracy >= 0.95 and
    // the learned signs match the planted direction — a broken gradient,
    // Hessian, or solver fails loudly). Omit-by-design: iterative argmax
    // training is not SQL-expressible; PipelineSpec pins recovery,
    // direction, and rerun stability.
    Q("llm_quality_classifier",
      (spark, sfDir) => {
        val feats = qcFeatures(spark, sfDir).cache()
        try {
          val dim = 6
          val w = trainLogistic(spark, feats, dim, iters = 8, ridge = 1e-3)
          val dot = (0 until dim).map(i =>
            col("x").getItem(i) * lit(w(i))).reduce(_ + _)
          val scored = feats.withColumn("pred",
            (lit(1.0) / (lit(1.0) + exp(-dot)) > 0.5).cast("int"))
          val agg = scored.agg(
            count(lit(1)).as("n_docs"),
            sum(col("y")).cast("long").as("n_pos"),
            sum((col("pred") === col("y").cast("int")).cast("long"))
              .as("n_correct")).head
          val (n, pos, correct) =
            (agg.getLong(0), agg.getLong(1), agg.getLong(2))
          val acc = correct.toDouble / n
          require(acc >= 0.95,
            f"llm_quality_classifier: separator not recovered (acc $acc%.3f)")
          require(w(1) > 0,
            s"llm_quality_classifier: learned direction wrong: ${w.toSeq}")
          import spark.implicits._
          Seq((n, pos, correct, math.rint(acc * 1000) / 1000))
            .toDF("n_docs", "n_pos", "n_correct", "accuracy_3dp")
        } finally { feats.unpersist(blocking = false); () }
      },
      None),
  )

  /** Per-document style features for the quality classifier: bias,
    * alpha ratio, log1p tokens, mean token length, digit ratio, space
    * ratio — plus the planted weak label `y`: a threshold of alpha_ratio
    * at the corpus's EXACT median, so classes are balanced and perfectly
    * linearly separable (digit_ratio is constant 0 in the fixture and
    * stays in the feature vector as the null-feature control) —
    * training must recover the direction. */
  private def qcFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
        length(col("text"))).as("alpha_ratio"),
      log1p(size(split(col("text"), " ")).cast("double")).as("log_tokens"),
      (length(col("text")).cast("double") /
        size(split(col("text"), " "))).as("mean_tok_len"),
      (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        length(col("text"))).as("digit_ratio"),
      (length(regexp_replace(col("text"), "[^ ]", "")).cast("double") /
        length(col("text"))).as("space_ratio"))
      .withColumn("score", col("alpha_ratio")) // digit_ratio is constant-0
      // in the fixture corpus, so the planted direction is alpha alone
    val median = base.agg(expr("percentile(score, 0.5)")).head.getDouble(0)
    base.select(col("doc_id"),
      array(lit(1.0), col("alpha_ratio"), col("log_tokens"),
        col("mean_tok_len"), col("digit_ratio"), col("space_ratio")).as("x"),
      (col("score") > lit(median)).cast("double").as("y"))
  }

  /** Distributed IRLS (Newton) for ridge logistic regression: per
    * iteration one aggregation computes g = SUM x(y - p) and the upper
    * triangle of H = SUM p(1-p) x xT; the driver solves the d x d system
    * (Gaussian elimination, partial pivot) and steps. O(d^2) numbers per
    * pass leave the executors — nothing else. */
  private def trainLogistic(spark: SparkSession, feats: DataFrame, dim: Int,
      iters: Int, ridge: Double): Array[Double] = {
    val w = Array.fill(dim)(0.0)
    for (_ <- 1 to iters) {
      val dot = (0 until dim).map(i =>
        col("x").getItem(i) * lit(w(i))).reduce(_ + _)
      val withP = feats.withColumn("__p",
        lit(1.0) / (lit(1.0) + exp(-dot)))
      val gAggs = (0 until dim).map(i =>
        sum(col("x").getItem(i) * (col("y") - col("__p"))).as(s"g$i"))
      val hPairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
      val hAggs = hPairs.map { case (i, j) =>
        sum(col("x").getItem(i) * col("x").getItem(j) *
          col("__p") * (lit(1.0) - col("__p"))).as(s"h${i}_$j") }
      val all = gAggs ++ hAggs
      val row = withP.agg(all.head, all.tail: _*).head
      val g = (0 until dim).map(row.getDouble).toArray
      val h = Array.ofDim[Double](dim, dim)
      hPairs.zipWithIndex.foreach { case ((i, j), k) =>
        val v = row.getDouble(dim + k); h(i)(j) = v; h(j)(i) = v }
      (0 until dim).foreach(i => h(i)(i) += ridge)
      // solve h * d = g in place (partial-pivot Gaussian elimination)
      val a = h.map(_.clone()); val b = g.clone()
      for (c <- 0 until dim) {
        val piv = (c until dim).maxBy(r => math.abs(a(r)(c)))
        val t = a(c); a(c) = a(piv); a(piv) = t
        val tb = b(c); b(c) = b(piv); b(piv) = tb
        require(math.abs(a(c)(c)) > 1e-12, "trainLogistic: singular Hessian")
        for (r <- c + 1 until dim) {
          val f = a(r)(c) / a(c)(c)
          for (cc <- c until dim) a(r)(cc) -= f * a(c)(cc)
          b(r) -= f * b(c)
        }
      }
      val d = Array.fill(dim)(0.0)
      for (c <- dim - 1 to 0 by -1) {
        var acc = b(c)
        for (cc <- c + 1 until dim) acc -= a(c)(cc) * d(cc)
        d(c) = acc / a(c)(c)
      }
      (0 until dim).foreach(i => w(i) += d(i))
    }
    w
  }

  /** Train a deterministic IVF coarse quantizer and run top-k cosine search
    * over the probe rows' nprobe nearest cells.
    *
    * Scale shape: centroids are O(cells·dim) — broadcast; assignment and
    * per-cell candidate generation are map-side; the only shuffles are the
    * 16-key mean reduction per Lloyd iteration and the final per-probe
    * top-k window. The candidate join is an equi-join on cell id, so at
    * 1000 executors each probe touches only the partitions holding its
    * probed cells' vectors.
    */
  /** Trained coarse quantizer: unit-normalized vectors with their cell
    * assignment (materialized), plus the unit-norm centroid table. */
  final case class IvfModel(assigned: DataFrame, centroids: Array[Array[Double]])

  /** Memoized trained models: `llm_ann_ivf` and `llm_cluster_assign` both
    * quantize the same corpus, and training is the expensive part (~10
    * driver-coordinated jobs: 3 Lloyd rounds × assign/means + checkpoint).
    * Keyed by (session, canonicalized input plan, nCells) so a semantically
    * identical input reuses the model — the `assigned` member is a
    * localCheckpoint, valid for the life of the session. Training is
    * deterministic (PipelineSpec pins the uncached path), so the cache
    * changes no output bit, only removes the duplicated training.
    *
    * BOUNDED + ATOMIC (r6, ADVICE r5): the cache only ever needs the
    * CURRENT corpus' model, so inserting a new key evicts the session's
    * older entries (their pinned checkpoint blocks are freed when the
    * evicted `assigned` frames are GC'd by the ContextCleaner) instead of
    * accumulating checkpoints for the session lifetime; and lookup+train
    * runs under a lock — TrieMap.getOrElseUpdate is not atomic, so two
    * concurrent callers could both train and leak the loser's checkpoint. */
  private val ivfCache = scala.collection.mutable
    .Map.empty[(SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), IvfModel]

  /** Deterministic Lloyd training + assignment — shared by the IVF search
    * ([[ivfTopK]]) and the clustering operator (`llm_cluster_assign`). */
  /** Salted cell assignment for the SemDeDup pair stage: cells at or
    * under `cellCap` keep salt 0 (all pairs compared — within-cell recall
    * exact there); a cell above the cap splits into ⌈n/cap⌉ hash-salted
    * sub-cells, bounding the self-join's largest group at ~cap whatever
    * the corpus does. One window over the (cell) exchange — O(N). */
  private[graft] def semdedupSalted(assigned: DataFrame, cellCap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    assigned.withColumn("cn", count(lit(1)).over(w))
      .withColumn("salt", when(col("cn") <= cellCap, lit(0))
        .otherwise(pmod(xxhash64(col("vec_id")),
          ceil(col("cn") / cellCap).cast("int"))))
  }

  /** Within-(cell, salt) exact-cosine near-dup flags: the SemDeDup compare
    * stage as an equi self-join on the salted cell key — never an
    * all-pairs product. Returns the flagged (higher) `vec_id`s. */
  private[graft] def semdedupDups(assigned: DataFrame, cellCap: Int,
      tau: Double): DataFrame = {
    val salted = semdedupSalted(assigned, cellCap)
    salted.select(col("cell"), col("salt"), col("vec_id").as("a_id"), col("u").as("a_u"))
      .join(salted.select(col("cell"), col("salt"), col("vec_id").as("b_id"), col("u").as("b_u")),
        Seq("cell", "salt"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(a_u, b_u, (p, q) -> p * q), 0.0d, (acc, v) -> acc + v)"))
      .filter(round(col("cos"), 6) >= tau)
      .select(col("b_id").as("vec_id")).distinct()
  }

  def ivfTrain(emb: DataFrame, nCells: Int): IvfModel = {
    // keyed on the canonicalized plan itself (structural equality), not a
    // hash — a hash collision would silently serve the wrong model
    val key = (emb.sparkSession, emb.queryExecution.analyzed.canonicalized, nCells)
    ivfCache.synchronized {
      ivfCache.get(key) match {
        case Some(m) => m
        case None =>
          val m = ivfTrainUncached(emb, nCells)
          ivfCache.filterInPlace { case ((s, _, _), _) => s != emb.sparkSession }
          ivfCache.put(key, m)
          m
      }
    }
  }

  /** The actual training — exposed uncached so the spec can pin
    * train-twice determinism without the memo short-circuiting it. */
  private[graft] def ivfTrainUncached(emb: DataFrame, nCells: Int): IvfModel = {
    // Hoist the norm OUT of the transform lambda: an `aggregate` nested in
    // the lambda body re-evaluates per element — O(dim²) interpreted work
    // per row (measured: 73 s at sf0.1 before this, ~1 s after). Then
    // materialize: unit feeds every Lloyd round, the seeding collect, and
    // the final search — an unmaterialized lineage re-runs the normalize
    // per action.
    val unit = emb
      .withColumn("nrm", expr(
        "sqrt(aggregate(embedding, 0.0d, (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE) / nrm)").as("u"))
      .localCheckpoint()

    // Seed centroids deterministically: the nCells rows FIRST in the id-LCG
    // pseudo-random order (TakeOrdered top-k — O(N log k), no threshold to
    // mis-tune; the r18 √N-cells caller made the old filter-then-limit
    // seeding underdraw when nCells ≈ expected filter yield). Then 3 Lloyd
    // iterations: map-side argmin against the broadcast centroids,
    // distributed (cell, dim) mean, nCells×dim rows collected per round.
    var centroids: Array[Array[Double]] = unit
      .withColumn("__r", expr(
        "((vec_id % 2048 + 2048) % 2048 * 1103515245 + 12345) % 2048"))
      .orderBy(col("__r"), col("vec_id")).limit(nCells)
      .select(col("vec_id"), col("u"))
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.length == nCells, s"seeding drew ${centroids.length} of $nCells centroids")

    def assignUdf(cents: Array[Array[Double]]) = udf { (u: Seq[Double]) =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0; var i = 0
        while (i < u.length) { d += u(i) * cent(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }
    // Native argmax-dot when the extension is installed (r18, VERDICT item
    // 9): the centroid table rides in as ONE typed literal, the per-row
    // loop code-generates with zero array conversion — the UDF stays as
    // the bit-identical vanilla-session fallback (ArgmaxDotSpec pins the
    // equality). This was the last Scala UDF on an LLM-path hot loop.
    def assignCol(cents: Array[Array[Double]]): Column =
      if (emb.sparkSession.catalog.functionExists("ivf_argmax_dot"))
        call_function("ivf_argmax_dot", col("u"),
          typedLit(cents.map(_.toSeq).toSeq))
      else assignUdf(cents)(col("u"))

    for (_ <- 1 to 3) {
      // The assignment must be MATERIALIZED before the explode: projected
      // next to posexplode in one select, Catalyst collapses the projects
      // and the UDF re-evaluates per exploded OUTPUT row — dim× the calls,
      // each re-converting the array argument (measured: 23 s/iteration at
      // sf0.1 fused vs 0.7 s split). cache() is the barrier: the
      // InMemoryRelation stops the project collapse but fills lazily, so
      // the means collect is the only job this iteration runs.
      val cells = unit.select(col("u"), assignCol(centroids).as("cell"))
        .cache()
      val means = cells.select(col("cell"), posexplode(col("u")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
        .collect()
      cells.unpersist(blocking = false)
      val dim = centroids(0).length
      val next = Array.fill(nCells)(Array.fill(dim)(0.0))
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      // renormalize so assignment-by-dot stays cosine argmin (empty cells
      // keep their previous centroid)
      centroids = next.zip(centroids).map { case (m, prev) =>
        val n = math.sqrt(m.map(x => x * x).sum)
        if (n == 0.0) prev else m.map(_ / n)
      }
    }

    // materialized: probed twice (probe side + candidate side of the join)
    val assigned = unit.select(col("vec_id"), col("u"), assignCol(centroids).as("cell"))
      .localCheckpoint()
    IvfModel(assigned, centroids)
  }

  def ivfTopK(emb: DataFrame, probeFilter: Column, nCells: Int, nProbe: Int,
      k: Int): DataFrame = {
    val IvfModel(assigned, centroids) = ivfTrain(emb, nCells)

    def probeCellsUdf(cents: Array[Array[Double]]) = udf { (u: Seq[Double]) =>
      cents.indices
        .map(c => c -> cents(c).zip(u).map { case (a, b) => a * b }.sum)
        .sortBy { case (c, d) => (-d, c) }.take(nProbe).map(_._1).toArray
    }

    val probes = assigned.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("u").as("pu"),
        explode(probeCellsUdf(centroids)(col("u"))).as("cell"))
    // candidates are ~nProbe/nCells of the corpus per probe — the HOF dot
    // is off the corpus-wide hot path (vec_dot is ARRAY<FLOAT>-typed; the
    // unit vectors here are ARRAY<DOUBLE>)
    val dot = "aggregate(zip_with(pu, u, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)"
    broadcast(probes).join(assigned.withColumnRenamed("vec_id", "neighbor_id"), "cell")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(expr(dot), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
