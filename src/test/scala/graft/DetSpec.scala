package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Determinism policy (SURVEY §7.3) — the hash-match make-or-break. */
class DetSpec extends SparkFixture {
  import spark.implicits._

  test("decimal sum is order-independent (same result under any permutation)") {
    val xs = Seq(0.01, 123.45, -7.89, 1e9, 0.07, 42.42)
    val sums = Seq(xs, xs.reverse, xs.sortBy(identity)).map { perm =>
      perm.toDF("v").select(Det.sumMoney(col("v"))).head.getDouble(0)
    }
    assert(sums.distinct.size == 1)
  }

  test("sumMoney matches exact BigDecimal arithmetic") {
    checkAll(Gen.listOfN(50, Gen.chooseNum(-99999L, 99999L)), n = 5) { cents =>
      val doubles = cents.map(_ / 100.0)
      val expected = cents.sum / 100.0
      val got = doubles.toDF("v").select(Det.sumMoney(col("v"))).head.getDouble(0)
      assert(got == expected)
    }
  }

  test("avgMoney ignores NULLs exactly like SQL AVG (count(col) skips nulls)") {
    val df = Seq(Some(10.0), None, Some(20.0)).toDF("v")
    val got = df.select(Det.avgMoney(col("v")).as("a")).head.getDouble(0)
    assert(got == 15.0) // NULL excluded from both sum and count
  }

  test("emit narrows losslessly within DECIMAL(18,s) headroom") {
    // max magnitude that fits DECIMAL(12,2): 10 integer digits
    val df = Seq(1234567890.12).toDF("v")
    val got = df.select(Det.emit(Det.money(col("v")), 2)).head.getDouble(0)
    assert(got == 1234567890.12)
  }

  test("emit overflow fails loudly under ANSI mode (not silent NULL)") {
    // 10^16 overflows DECIMAL(18,2); ANSI mode must throw, not return NULL.
    val df = Seq(1e16).toDF("v")
    intercept[Exception] {
      df.select(Det.emit(sum(Det.money(col("v"))), 2)).collect()
    }
  }

  test("float-emitting r8 keys are bit-identical under different shuffle partitioning") {
    // The cluster-topology-independence claim, tested directly: the keys
    // whose doubles come from IEEE arithmetic on exact-decimal inputs
    // (weighted means, rolling z-score, EWMA lag chain) must produce the
    // SAME bits whether the shuffle fans out over 1 or 4 partitions —
    // parallel partial aggregation must never reassociate a float sum.
    val keys = Seq("agg_weighted", "window_zscore", "window_ewma")
    keys.foreach { k =>
      def run(): Seq[Seq[Any]] = SparkEntry.queries(k)(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      val base = run()
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        assert(run() == base, s"$k drifts at 1 shuffle partition")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(run() == base, s"$k drifts at 7 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  test("graph/bitmap/pattern r8 keys are partition-count-invariant") {
    // Integer-arithmetic keys (bitmap popcounts, floor-division PageRank,
    // oriented triangle join, lead-chain pattern) must be bit-identical
    // under any shuffle fanout: bit_or/sum are associative on longs, the
    // per-edge floor divisions touch only per-row values, and every output
    // carries a total ORDER BY. Partition-count drift here would mean a
    // nondeterministic tie-break leaked in.
    val keys = Seq("agg_bitmap_distinct", "agg_bitmap_overlap",
      "graph_pagerank", "graph_triangles", "window_pattern")
    keys.foreach { k =>
      def run(): Seq[Seq[Any]] = SparkEntry.queries(k)(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      val base = run()
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        assert(run() == base, s"$k drifts at 1 shuffle partition")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(run() == base, s"$k drifts at 7 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  test("r9 keys are invariant under AQE-off and different shuffle partitioning") {
    // The new keys' cluster-topology-independence sweep: the compaction
    // rewrite, the broadcast-merge-table encode, and the banded phash
    // dedup must produce identical rows whether AQE re-plans at runtime
    // or not, and under any shuffle fanout — drift would mean a
    // nondeterministic tie-break or partition-sensitive arithmetic leaked
    // into an output.
    val keys = Seq("sink_compact", "llm_bpe_encode", "llm_dedup_phash")
    keys.foreach { k =>
      def run(): Seq[Seq[Any]] = SparkEntry.queries(k)(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val beforeN = spark.conf.get("spark.sql.shuffle.partitions")
      val beforeAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val base = run()
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert(run() == base, s"$k drifts with AQE disabled")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(run() == base, s"$k drifts at 7 shuffle partitions, AQE off")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", beforeN)
        spark.conf.set("spark.sql.adaptive.enabled", beforeAqe)
      }
    }
  }

  test("late-r9 keys are invariant under AQE-off and different shuffle partitioning") {
    // Same cluster-topology-independence sweep for the second r9 batch:
    // runtime-filter joins (DPP, bloom), the iterative shortest path, the
    // integer BM25/fusion/index family, the CDC diff, the profiler, the
    // interpolation windows, and the fused curation composite. Drift
    // under re-planning or fanout would mean a nondeterministic tie-break
    // or partition-sensitive arithmetic leaked into an output.
    val keys = Seq("join_dpp", "join_bloom_prefilter", "graph_shortest_path",
      "llm_bm25", "llm_rank_fusion", "llm_inverted_index",
      "sink_snapshot_diff", "stats_profile", "window_interpolate",
      "llm_curation_pipeline", "join_asof_tolerance", "agg_rank_corr",
      "source_binary", "stats_ks_test", "stats_chi_square", "agg_entropy",
      "join_null_safe", "stats_psi", "window_drawdown", "source_jdbc",
      "stats_corr_matrix", "sink_scd2", "join_asof_forward",
      "source_csv_dirty", "window_rolling_corr", "stats_decile_lift")
    keys.foreach { k =>
      def run(): Seq[Seq[Any]] = SparkEntry.queries(k)(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val beforeN = spark.conf.get("spark.sql.shuffle.partitions")
      val beforeAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val base = run()
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert(run() == base, s"$k drifts with AQE disabled")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(run() == base, s"$k drifts at 7 shuffle partitions, AQE off")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", beforeN)
        spark.conf.set("spark.sql.adaptive.enabled", beforeAqe)
      }
    }
  }

  test("r9-continued keys are invariant under AQE-off and different shuffle partitioning") {
    // Third r9 batch: the exact-moment statistics family (Welch t,
    // per-group OLS, exact percentiles) and the scalar-subquery plan.
    // These keys' whole determinism story is "moments are exact decimals,
    // double arithmetic happens once on the driver-visible values" — so
    // topology invariance IS the property under test.
    val keys = Seq("stats_ttest", "stats_linreg", "agg_percentile_exact",
      "subquery_scalar")
    keys.foreach { k =>
      def run(): Seq[Seq[Any]] = SparkEntry.queries(k)(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val beforeN = spark.conf.get("spark.sql.shuffle.partitions")
      val beforeAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val base = run()
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert(run() == base, s"$k drifts with AQE disabled")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(run() == base, s"$k drifts at 7 shuffle partitions, AQE off")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", beforeN)
        spark.conf.set("spark.sql.adaptive.enabled", beforeAqe)
      }
    }
  }

  test("r10 keys are invariant under AQE-off and different shuffle partitioning") {
    // r10 batch: the k-group ANOVA (group-level decimal quantization is
    // the order-independence mechanism under test), the rank-formula Gini
    // (tie-invariance of Σi·x), the two-pass MAD (interpolated medians of
    // 2dp doubles), the OHLC bars (full-frame first/last on a total
    // order), the nearest-asof tie-break, and the bigram LM's exact
    // counts + single division.
    val keys = Seq("stats_anova", "stats_gini", "stats_outlier_mad",
      "window_ohlc", "join_asof_nearest", "llm_ngram_lm",
      "llm_stratified_sample", "fn_format", "window_cusum", "agg_apportion",
      "source_text", "llm_oov_rate", "stats_benford",
      "llm_contamination_matrix", "agg_activation_time", "fn_date_parse",
      "stats_wilson_ci", "agg_cohort_triangle", "agg_argmin",
      "window_wow_growth", "stats_ttest_paired")
    keys.foreach { k =>
      def run(): Seq[Seq[Any]] = SparkEntry.queries(k)(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val beforeN = spark.conf.get("spark.sql.shuffle.partitions")
      val beforeAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val base = run()
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert(run() == base, s"$k drifts with AQE disabled")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(run() == base, s"$k drifts at 7 shuffle partitions, AQE off")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", beforeN)
        spark.conf.set("spark.sql.adaptive.enabled", beforeAqe)
      }
    }
  }

  test("r11 keys are invariant under AQE-off and different shuffle partitioning") {
    // r11 batch: the lakehouse trio (zone-map pruned read, merge-on-read
    // anti-join, post-vacuum read — all land via Acid commits whose
    // CONTENT must not depend on how the writer was partitioned), dynamic
    // partition restatement, the integer transition matrix and
    // Mann-Kendall statistics, basket pair mining (bounded self-join +
    // exact counts), both dirty/format round-trips, and the variant
    // extraction pipeline. Drift under AQE-off or a different fanout
    // would mean partition-sensitive arithmetic or a nondeterministic
    // tie-break leaked into an output.
    val keys = Seq("scan_zonemap", "sink_merge_on_read", "sink_vacuum",
      "sink_dynamic_overwrite", "agg_transition_matrix", "stats_trend_mk",
      "agg_copurchase_pairs", "source_json_dirty", "source_avro",
      "source_xml", "fn_variant", "scan_nested_pushdown", "fn_collate",
      "llm_preference_pairs", "sink_incremental_mv")
    keys.foreach { k =>
      def run(): Seq[Seq[Any]] = SparkEntry.queries(k)(spark, sf001)
        .collect().map(_.toSeq).toSeq
      val beforeN = spark.conf.get("spark.sql.shuffle.partitions")
      val beforeAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val base = run()
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert(run() == base, s"$k drifts with AQE disabled")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(run() == base, s"$k drifts at 7 shuffle partitions, AQE off")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", beforeN)
        spark.conf.set("spark.sql.adaptive.enabled", beforeAqe)
      }
    }
  }

  test("events ts-sniff cache invalidates on in-session fixture regeneration (mtime/length key)") {
    // the r11 watch item: a path-only cache would silently misread a
    // fixture regenerated in place with the OTHER ts encoding mid-session
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("tssniff").toString
    val path = s"$dir/events.parquet"
    val tsUs = 1704067200000000L // 2024-01-01T00:00:00Z in epoch-µs
    def mkRow(id: Long) = (id, new Timestamp(tsUs / 1000), id % 3,
      "click", 1.5, "{}")
    // generation 1: native µs TimestampType (the current fixture encoding)
    Seq(mkRow(0), mkRow(1)).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(path)
    assert(!Tables.eventsTsIsNanos(spark, path), "µs fixture sniffed as ns")
    val got1 = Tables.events(spark, dir).select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSet
    assert(got1 == Set(tsUs), s"µs read wrong: $got1")
    // generation 2, SAME path: ns INT64 encoding (long ts column — exactly
    // what the legacy nanosAsLong read surfaces); more rows so both mtime
    // and content change
    Thread.sleep(50) // ensure a distinct mtime even on coarse filesystems
    Seq(3L, 4L, 5L).map(id => (id, tsUs * 1000L, id % 3, "view", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(path)
    assert(Tables.eventsTsIsNanos(spark, path),
      "regenerated ns fixture still served from the stale µs cache entry")
    val got2 = Tables.events(spark, dir).select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSet
    assert(got2 == Set(tsUs), s"ns read wrong after regeneration: $got2")
  }
}
