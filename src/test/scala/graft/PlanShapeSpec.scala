package graft

/** Plan-shape asserts (SURVEY §4 verification hooks): the optimizer must
  * actually produce the 100 TB-safe physical plans the operator docs claim —
  * pushdown reaching the scan, broadcast joins staying broadcast, top-k
  * avoiding a global sort, aggregates running partial+final.
  */
class PlanShapeSpec extends SparkFixture {

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf001).queryExecution.executedPlan.toString

  test("scan_pruned pushes the shipdate predicate into the parquet scan") {
    val p = plan("scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("scan_pruned prunes columns: scan reads only the 3 needed columns") {
    val p = plan("scan_pruned")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_shipdate"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"))
  }

  test("scan_nested_pushdown: nested-leaf predicate pushes to the scan and the untouched leaf is pruned") {
    val p = plan("scan_nested_pushdown")
    val scanLine = p.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    // the shard predicate reaches parquet as a nested-field pushed filter
    assert(scanLine.contains("meta.origin.shard"),
      s"nested predicate not pushed: $scanLine\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // nested schema pruning: the struct's touched leaves are read...
    assert(readSchema.contains("shard") && readSchema.contains("kind"), readSchema)
    // ...and the uid leaf never leaves the file
    assert(!readSchema.contains("uid"),
      s"untouched nested leaf read from parquet: $readSchema")
  }

  test("join_broadcast plans BroadcastHashJoin for both dims") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sort_limit_topk plans TakeOrderedAndProject (no global sort)") {
    val p = plan("sort_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg_hash_q1 plans two-phase HashAggregate (partial map-side combine)") {
    val p = plan("agg_hash_q1")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final")
  }

  test("agg_hash_q1 runs inside WholeStageCodegen") {
    // AQE wraps the plan lazily and hides codegen subtrees until runtime;
    // disable it for this inspection — codegen eligibility is what's tested.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val codegen = SparkEntry.queries("agg_hash_q1")(spark, sf001)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(codegen.contains("WholeStageCodegen subtrees") && !codegen.startsWith("Found 0"),
        codegen.take(200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("filter_pred predicate reaches the parquet scan as pushed filters") {
    val p = plan("filter_pred")
    // PushedFilters text is truncated in toString; assert the scan carries
    // data filters and the full compound predicate survives in the Filter.
    assert(p.contains("PushedFilters: [IsNotNull("), p)
    assert(p.contains("isnotnull(p_name"), p)
  }

  test("join_inner_equi aggregates after the join without extra exchanges") {
    val p = plan("join_inner_equi")
    // 3-way join + group + sort: expect no CartesianProduct anywhere.
    assert(!p.contains("CartesianProduct"), p)
  }

  test("llm_dedup_ngram generates candidates via LSH — no all-pairs product in the plan") {
    val p = plan("llm_dedup_ngram")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("join_spatial_grid joins on grid cells — no all-pairs product in the plan") {
    val p = plan("join_spatial_grid")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("join_fuzzy_blocked joins on the block key — no all-pairs product in the plan") {
    val p = plan("join_fuzzy_blocked")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("llm_sim_knn ranks via bounded partial aggregation — no Window, no full per-probe sort") {
    // r18 (VERDICT item 4): the top-10 must come from the TopKBySim
    // Aggregator's map-side partial phase (≤k rows per probe per partition
    // cross the exchange), never a row_number window over the whole
    // probes×corpus product.
    val p = plan("llm_sim_knn")
    assert(!p.contains("Window"), s"knn regressed to a window rank:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"no aggregate top-k in plan:\n$p")
  }

  test("join_spj_bucket_transform: the 16-bucket fact joins the 8-bucket dim shuffle-free") {
    // the key's own body REQUIRES zero exchange below the SortMergeJoin on
    // the executed adaptive plan (a failed SPJ throws there) — executing
    // it IS the plan assertion; this test keeps that execution in CI
    val rows = SparkEntry.queries("join_spj_bucket_transform")(spark, sf001).collect()
    assert(rows.nonEmpty)
  }

  test("join_spj_skew: the hot bucket runs partially-clustered — sliced scan, zero shuffle") {
    // in-body requires: shuffle-free SMJ AND fact scan planned with more
    // partitions than buckets (the per-file slices) — executing is the pin
    val rows = SparkEntry.queries("join_spj_skew")(spark, sf001).collect()
    assert(rows.nonEmpty)
  }

  test("join_cross is the only plan allowed a cartesian") {
    val p = plan("join_cross")
    assert(p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("window_running plans a single Window operator over one shuffle") {
    val p = plan("window_running")
    assert(p.contains("Window"), p)
    assert("RunningWindowFunction|Window".r.findFirstIn(p).isDefined)
  }

  test("runtime bloom-filter reduction injects might_contain on the big shuffle side") {
    import org.apache.spark.sql.functions._
    // The 100 TB shuffle-join reducer: a bloom filter built from the
    // filtered dim side is pushed into the fact side's scan stage, cutting
    // shuffled fact rows before the exchange. Thresholds floored so the
    // fixture-sized tables qualify; broadcast disabled so the join is a
    // genuine shuffle join (broadcast joins don't need the bloom).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation threshold is a MAX (the dim must be small enough to build
      // the bloom from); application threshold is a MIN (the fact must be
      // big enough to be worth filtering) — floor only the latter
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf001)
      val part = Tables.part(spark, sf001).filter(col("p_size") === 1)
      val q = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type")).agg(count(lit(1)).as("n"))
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        "expected a runtime bloom filter on the fact side:\n" + p.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // one key owns ~all fact rows; thresholds floored so the fixture-sized
    // skew qualifies; broadcast disabled so the join is a sort-merge join
    // AQE can rewrite
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000)
        .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(64).select(col("id").as("k"), (col("id") * 10).as("v"))
      val q = fact.join(dim, "k").groupBy(col("k") % 8).agg(count(lit(1)))
      q.collect() // AQE decides from RUNTIME shuffle sizes — must execute
      val finalPlan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        "expected AQE to mark the skewed SMJ side:\n" + finalPlan.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---- partitioned layout: the 100 TB scan story (graft.ops.Layout) ----

  private lazy val dppDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.ops.Layout.writeDatePartitionedEvents(spark, sf001, dir)
    dir
  }

  test("bucketed tables co-locate the join: no exchange on either side") {
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files.createTempDirectory("graft_buckets_wh").toString
    graft.ops.Layout.writeBucketed(spark, sf001, "graft_buckets", loc,
      Seq("orders" -> "o_custkey", "customer" -> "c_custkey"), nBuckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
    try {
      val q = spark.table("graft_buckets.orders")
        .join(spark.table("graft_buckets.customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(!p.contains("Exchange"),
        "bucketed-by-key join must not shuffle either side:\n" + p.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned events: a literal date predicate prunes partitions statically") {
    import org.apache.spark.sql.functions._
    val fact = graft.ops.Layout.readEvents(spark, dppDir)
    val nDates = fact.select(col("event_date")).distinct().count()
    assert(nDates > 1, "fixture must span multiple dates for pruning to mean anything")
    val d = fact.select(min(col("event_date"))).head.getDate(0)
    val p = fact.filter(col("event_date") === lit(d))
      .groupBy(col("event_type")).count()
      .queryExecution.executedPlan.toString
    // the date predicate must land in PartitionFilters (directory pruning),
    // not in PushedFilters (row-group evaluation inside every file)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_date"), p.take(2000))
  }

  test("date-partitioned layout round-trips the events table losslessly") {
    import org.apache.spark.sql.functions._
    val before = graft.Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect().map(_.toSeq).toSet
    val after = graft.ops.Layout.readEvents(spark, dppDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect().map(_.toSeq).toSet
    assert(after == before && before.nonEmpty)
  }

  test("join against a filtered date dim triggers dynamic partition pruning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fact = graft.ops.Layout.readEvents(spark, dppDir)
    val someDates = fact.select(col("event_date")).distinct().orderBy(col("event_date"))
      .limit(2).collect().map(_.getDate(0))
    // the dim must be scan-backed: a LocalRelation's filter constant-folds
    // away before the PartitionPruning rule looks for a selective predicate
    val dimPath = dppDir + "_dim"
    someDates.toSeq.map(d => (d, "promo")).toDF("d", "tag")
      .union(Seq((java.sql.Date.valueOf("1970-01-01"), "other")).toDF("d", "tag"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = fact.join(dim, col("event_date") === col("d"))
      .filter(col("tag") === "promo")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      "expected a dynamicpruningexpression partition filter on the fact scan:\n" + p.take(3000))
  }

  test("join_dpp's fact scan carries a dynamic partition-pruning filter") {
    // the contract key itself (not just the mechanics test above): the dim
    // filter is on a non-partition attribute, so only RUNTIME pruning can
    // skip fact directories — a regression to a full scan is a plan change
    val p = SparkEntry.queries("join_dpp")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      "expected dynamicpruningexpression on the join_dpp fact scan:\n" + p.take(3000))
  }

  test("join_bloom_prefilter's fact side is bloom-filtered before the exchange") {
    import org.apache.spark.sql.functions._
    // the key localCheckpoints its result (to execute while its conf
    // overrides are live), which erases the plan — pin the pre-checkpoint
    // shape by rebuilding the same join under the same confs
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = graft.ops.Joins.bloomPrefilterJoin(spark, sf001)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        "expected the runtime bloom prefilter on lineitem:\n" + p.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("llm_bm25 plans the top-k as TakeOrderedAndProject — no global sort") {
    val p = plan("llm_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      "BM25 top-10 must be a partial+final top-k, not a full sort:\n" + p.take(1500))
  }

  test("stats_profile is ONE scan of events with an Expand multi-distinct") {
    val p = plan("stats_profile")
    assert(p.contains("Expand"),
      "the three exact count-distincts must share one Expand pass:\n" + p.take(1500))
    val scans = "Scan parquet|FileScan".r.findAllIn(p).length
    assert(scans == 1, s"expected a single events scan, saw $scans:\n" + p.take(2000))
  }

  test("window_interpolate: backward and forward ignore-nulls passes share ONE hash exchange") {
    val p = plan("window_interpolate")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1,
      s"both neighbor windows must reuse one user_id exchange, saw $hashEx:\n" + p.take(2000))
  }

  test("llm_curation_pipeline fuses all stages over ONE documents scan") {
    val p = plan("llm_curation_pipeline")
    val scans = "Scan parquet|FileScan".r.findAllIn(p).length
    assert(scans == 1, s"expected a single fused scan, saw $scans:\n" + p.take(2000))
  }

  test("r4 per-row keys stay inside whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Seq("llm_pii_scrub", "fn_json_transform", "fn_url_parse").foreach { key =>
      val codegen = SparkEntry.queries(key)(spark, sf001)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(codegen.contains("WholeStageCodegen subtrees") && !codegen.startsWith("Found 0"),
        s"$key fell out of codegen: " + codegen.take(200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("window_topk_group pushes rank <= 3 into WindowGroupLimit (partial+final, no full-partition rank)") {
    // r5 bench timed this key 3.1x its r4 number with unchanged code; the
    // claim that it plans as a group limit was never pinned (unlike
    // window_throttle below). Pin it: a regression to a full-partition
    // Window + Filter is a plan change, not noise.
    val p = plan("window_topk_group")
    assert(p.contains("WindowGroupLimit"),
      "row_number <= k must run as a group limit:\n" + p.take(1500))
  }

  test("window_throttle pushes the quota into WindowGroupLimit (no full-partition sort survives)") {
    val p = plan("window_throttle")
    assert(p.contains("WindowGroupLimit"),
      "rank <= k must run as a group limit, partial+final:\n" + p.take(1500))
  }

  test("join_lateral decorrelates to WindowGroupLimit — never a per-row loop") {
    val p = plan("join_lateral")
    assert(p.contains("WindowGroupLimit"), "expected decorrelated ranked-window plan:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "correlated LATERAL must not plan as a loop join:\n" + p.take(1500))
  }

  test("join_multiway: every dimension broadcasts, the date filter reaches the orders scan") {
    val p = plan("join_multiway")
    // 5 joins total; the 4 dimension joins must be broadcast — at this size
    // the fact-fact (lineitem-orders) side may be broadcast too, so assert
    // no shuffle-based join appears at all and at least 4 broadcasts do
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || p.contains("GreaterThanOrEqual(o_orderdate"), "date filter must reach the scan:\n" + p.take(2000))
  }

  test("sink_partitioned read-back prunes to the one matching date partition") {
    val p = plan("sink_partitioned")
    val scanLine = p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(scanLine.contains("= 2024-01-12"),
      "literal date must reach the scan as a partition filter:\n" + scanLine)
    assert(scanLine.contains("PushedFilters: []"),
      "the date must prune partitions, not run as a data filter:\n" + scanLine)
  }

  test("subquery_in_notin plans NOT IN as a null-aware anti join, not a re-scan loop") {
    // the three joins live inside scalar-subquery plans, which a plan
    // collect() does not traverse — the printed tree does include them.
    // BroadcastHashJoin's last printed argument is isNullAwareAntiJoin.
    val p = plan("subquery_in_notin")
    assert(p.contains("LeftAnti, BuildRight, true"),
      "NOT IN over a nullable list must plan as a null-aware anti join:\n" + p)
    assert(p.contains("LeftSemi"), "IN must plan as a semi join:\n" + p)
  }

  test("dedup verify joins carry no user broadcast hint on the shingle-hash side") {
    // At 100 TB the shingle-hash table is corpus-sized; a user-forced
    // broadcast there is an executor OOM. The choice must be AQE's, so the
    // analyzed logical plans of both exact-dedup verify pipelines must be
    // hint-free (the candidate-pair side gets broadcast at runtime from
    // measured stats, not a pin).
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    val ngram = SparkEntry.queries("llm_dedup_ngram")(spark, sf001)
    assert(hints(ngram) == 0, "llm_dedup_ngram must not pin a broadcast side")
    val edges = ops.TextOps.componentEdges(spark,
      ops.TextOps.componentNodes(spark, sf001))
    assert(hints(edges) == 0, "llm_dedup_components edges must not pin a broadcast side")
  }

  test("window_percentile runs both frames in ONE Window over ONE exchange") {
    // The p25/p50 rolling percentiles share the same (partition, order,
    // frame) spec, so Catalyst must fuse them into a single Window operator
    // fed by a single hash exchange on l_returnflag — two Windows or two
    // exchanges would double the shuffle for the same answer.
    val p = plan("window_percentile")
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      "both percentile frames must fuse into one Window operator:\n" + p.take(1500))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1,
      s"expected exactly 1 hash exchange (partition key), got $shuffles:\n" + p.take(1500))
  }

  test("stream_backfill unify is a bare union — no distinct, no dedup state, no shuffle") {
    // The exactly-once seam is the `> hwm` offset filter, NOT a dedup: the
    // unified plan must be Union of the two legs with zero Exchange /
    // Aggregate / Deduplicate nodes. A distinct sneaking in here would be
    // a corpus-wide shuffle at 100 TB for rows that are disjoint by
    // construction.
    import org.apache.spark.sql.functions.col
    val full = Tables.events(spark, sf001)
    val archive = full.filter(col("event_id") <= 100)
    val tail = full.filter(col("event_id") > 100)
    val p = stream.Backfill.unify(archive, tail)
      .queryExecution.executedPlan.toString
    assert(p.contains("Union"), p.take(1000))
    assert(!p.contains("Exchange") && !p.contains("Aggregate")
      && !p.contains("Deduplicate") && !p.contains("SortMergeJoin"),
      "unify must stay a zero-shuffle bag union:\n" + p.take(1500))
  }

  test("window_zscore fuses all three moments into a single Window operator") {
    // sum, sum-of-squares, and count share one frame spec — if they split
    // into multiple Window nodes the frame walks (and possibly exchanges)
    // multiply. Catalyst fuses same-spec window functions; pin it.
    val p = plan("window_zscore")
    assert("(?s)Window".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("llm_vocab_topk plans TakeOrderedAndProject over a two-phase aggregate") {
    val p = plan("llm_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert("(?s)HashAggregate.*HashAggregate".r.findFirstIn(p).isDefined,
      "vocabulary count must be a partial+final aggregate:\n" + p.take(1200))
  }

  test("llm_gopher_filter is zero-shuffle up to the presentation sort") {
    // Every rule verdict is a per-row expression; the ONLY exchange allowed
    // is the final rangepartitioning for the ORDER BY doc_id output.
    val p = plan("llm_gopher_filter")
    val exchanges = "Exchange \\w+partitioning".r.findAllIn(p).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"expected one range exchange, got $exchanges:\n" + p.take(1200))
  }

  test("sort_zorder: the Morton key is projection arithmetic; one range exchange total") {
    val p = plan("sort_zorder")
    val exchanges = "Exchange \\w+partitioning".r.findAllIn(p).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"z-order layout must be projection + range sort, got $exchanges:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p.take(1200))
  }

  test("window_islands: both windows and both aggregates share ONE hash exchange") {
    // hashpartitioning(user_id) satisfies the (user), (user, type),
    // (user, type, grp) clusterings alike — the whole gaps-and-islands
    // pipeline (2 Windows + 2 aggregates) must reuse a single exchange.
    val p = plan("window_islands")
    assert("\\bWindow\\b".r.findAllIn(p).size == 2, p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "windows and aggregates must share one user_id exchange:\n" + p.take(1500))
  }

  test("window_drawdown: running-peak window and per-user aggregate share one exchange") {
    // hashpartitioning(user_id) satisfies both the window clustering and
    // the groupBy — the drawdown costs ONE data shuffle (the second
    // exchange in the full plan is the presentation sort's range
    // partitioning, not a data reshuffle).
    val p = plan("window_drawdown")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "window and aggregate must share one user_id exchange:\n" + p.take(1500))
  }

  test("join_range_binned plans an equi join — no nested loop, no cartesian") {
    // The key's whole reason to exist: a pure range predicate would plan
    // BroadcastNestedLoopJoin (O(n×m) compares); the week-bin column must
    // turn it into a hash-keyed equi join with the range as residual.
    val p = plan("join_range_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "bin key must prevent the nested-loop plan:\n" + p.take(1500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("join_null_safe keeps <=> as a hash-join key — no nested loop") {
    // EqualNullSafe must ride the join KEYS (nulls hash like values), not
    // degrade to a theta condition under a nested-loop join.
    val p = plan("join_null_safe")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "<=> must stay an equi-join key:\n" + p.take(1500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("window_pattern fuses both lead()s into one Window over one hash exchange") {
    // Both leads share (partition by user_id, order by ts, event_id) — the
    // whole pattern must cost a single shuffle + sort, not one per lead.
    val p = plan("window_pattern")
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      "pattern leads must fuse into one Window operator:\n" + p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("agg_bitmap_distinct partial-combines the block masks before the exchange") {
    // The whole point of the bitmap shape: bit_or partials combine
    // map-side, so the plan is two stacked two-phase HashAggregates and
    // NO Expand (COUNT(DISTINCT)'s expand would shuffle raw ids).
    val p = plan("agg_bitmap_distinct")
    assert(!p.contains("Expand"), "bitmap distinct must not plan Expand:\n" + p.take(1500))
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected two stacked partial+final HashAggregates:\n" + p.take(1500))
  }

  test("graph_pagerank: supersteps broadcast ranks; checkpoint truncates lineage") {
    // A superstep must plan as BroadcastHashJoin (ranks onto edges) + one
    // two-phase aggregate — never a sort-merge join; and the query's FINAL
    // plan must read a checkpointed RDD scan, proving localCheckpoint cut
    // the 10-step lineage (nested lineage would replay O(n²)).
    import org.apache.spark.sql.functions.{col, lit}
    val edges = Tables.nation(spark, sf001)
      .select(col("n_nationkey").as("src"), col("n_nationkey").as("dst"),
        lit(1L).as("cnt"), lit(1L).as("out_cnt"))
    val ranks = Tables.nation(spark, sf001)
      .select(col("n_nationkey").as("node"), lit(40000000L).as("rnk"))
    val step = ops.Graph.superstep(edges, ranks, 25L)
      .queryExecution.executedPlan.toString
    assert(step.contains("BroadcastHashJoin"),
      "rank relation must broadcast onto the edges:\n" + step.take(1500))
    assert(!step.contains("SortMergeJoin"), step.take(1500))
    val fin = plan("graph_pagerank")
    assert(fin.contains("Scan ExistingRDD"),
      "prior supersteps must be truncated to a checkpointed scan:\n" + fin.take(1500))
  }

  test("llm_bpe_encode is per-row projection work: no join, no aggregate, one range exchange") {
    // Training happens once at plan-build (memoized control-plane); the
    // encode pass itself must plan as scan → project over the broadcast
    // merge table, with only the presentation sort's range exchange.
    val p = plan("llm_bpe_encode")
    val exchanges = "Exchange \\w+partitioning".r.findAllIn(p).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"expected one range exchange, got $exchanges:\n" + p.take(1200))
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(1200))
  }

  test("llm_dedup_phash candidates come from banded equi joins — no all-pairs product") {
    val p = plan("llm_dedup_phash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // signatures are computed once and checkpointed, never re-decoded per join leg
    assert(p.contains("Scan ExistingRDD"),
      "signature reuse must read the localCheckpoint:\n" + p.take(1500))
  }

  test("llm_dedup_incremental broadcasts the batch side and never self-pairs the index") {
    // The incremental contract: per-day cost O(batch) + one broadcast —
    // the index side must stream through hash joins with the (small)
    // batch broadcast, and nothing may plan a cartesian.
    val p = plan("llm_dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"),
      "batch hashes/bands must broadcast against the streaming index:\n" + p.take(1500))
  }

  test("source_evolving merges schemas in ONE scan — no per-generation union of scans") {
    // mergeSchema reads the mixed directory through a single FileScan
    // whose ReadSchema is the unified union; a Union of two scans would
    // mean the evolution was resolved by hand, not by the reader.
    val p = plan("source_evolving")
    assert(!p.contains("Union"), "expected one merged scan, got a Union:\n" + p.take(1200))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("source") && readSchema.contains("quality"),
      s"unified schema must include evolved columns: $readSchema")
  }

  test("source_jdbc plans a 4-partition JDBC scan with pruned columns") {
    val p = plan("source_jdbc")
    assert(p.contains("JDBCRelation") && p.contains("numPartitions=4"),
      "expected a partitioned JDBCRelation scan:\n" + p.take(1200))
    // only the aggregate's two columns survive to the database query;
    // o_custkey must be pruned out of the pushed projection
    val scanLine = p.linesIterator.find(_.contains("JDBCRelation")).getOrElse("")
    assert(!scanLine.contains("o_custkey"), scanLine)
  }

  test("stats_corr_matrix runs all 3 pairs off ONE lineitem scan") {
    val p = plan("stats_corr_matrix")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      "stack() unpivot must not re-scan per pair:\n" + p.take(1200))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan must read only the 3 correlated columns: $readSchema")
  }

  test("sink_scd2 merge is all equi work — no nested loop, no cartesian") {
    val p = plan("sink_scd2")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("window_rolling_corr fuses all six moments into a single Window operator") {
    // n, Σx, Σy, Σxy, Σx², Σy² share one frame spec — same fusion pin as
    // window_zscore, doubled: six moments, one frame walk, one exchange.
    val p = plan("window_rolling_corr")
    assert("(?s)Window".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("window_ohlc: window and groupBy share ONE (user, hour) exchange") {
    // The bar aggregate must reuse the window's partitioning — a second
    // hash exchange between Window and HashAggregate would double the
    // shuffle cost of every downsample at scale.
    val p = plan("window_ohlc")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert("Window ".r.findAllIn(p).size == 1, p.take(1500))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final")
  }

  test("join_asof_nearest fuses both direction frames into one Window over one exchange") {
    // prev (preceding frame) and next (following frame) share the
    // (k; t, srt) sort order — Spark must plan ONE Window node and ONE
    // hash exchange over the union, and both event-type filters must
    // reach the parquet scans.
    val p = plan("join_asof_nearest")
    assert("Window ".r.findAllIn(p).size == 1, p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert(p.contains("EqualTo(event_type,view)") &&
      p.contains("EqualTo(event_type,purchase)"), "pushed filters")
  }

  test("llm_ngram_lm: top-100 plans as TakeOrderedAndProject with broadcast joins") {
    val p = plan("llm_ngram_lm")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), "w1 join must broadcast")
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("stats_outlier_mad broadcasts the median tables — the fact side shuffles once") {
    // Two BroadcastHashJoins (median, MAD) against the events scan; the
    // only hash exchanges are the per-group aggregates, never a re-shuffle
    // of the fact rows for the joins.
    val p = plan("stats_outlier_mad")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("stats_gini: row_number window and the group aggregate share one exchange") {
    val p = plan("stats_gini")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final")
  }

  test("agg_apportion: the grouped count is the only data-bound exchange") {
    // The allocation window runs over |cells| rows — everything after the
    // two-phase count is output-bound, never a re-shuffle of event rows.
    val p = plan("agg_apportion")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final count")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"one events scan expected, got $scans")
  }

  test("window_cusum: one window exchange on user_id plus a broadcast of the 1-row moments") {
    val p = plan("window_cusum")
    assert("Window ".r.findAllIn(p).size == 1, p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "global moments must broadcast")
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("source_acid_stream: predicate pushdown and column pruning survive into the micro-batch scan") {
    // the V1 source re-flags a REAL parquet relation as streaming; the
    // engine's per-micro-batch planning must still push a downstream
    // filter into that scan — captured from inside foreachBatch, where the
    // batch DataFrame's queryExecution IS the micro-batch plan
    import graft.ops.Acid
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files.createTempDirectory("acid_mb_plan").toString + "/t"
    (0 until 2).foreach { i =>
      Acid.appendTxn(spark, table,
        spark.range(i * 500L, i * 500L + 500L)
          .select(col("id").as("k"), (col("id") * 2).as("v")), txnId = i.toLong)
    }
    val q = spark.readStream.format("graft.stream.AcidStreamProvider")
      .option("table", table).load()
      .filter(col("k") > 100L)
      .select(col("k"))
      .writeStream.format("memory").queryName("acid_mb_plan_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("acid_mb_plan_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the engine's own last micro-batch plan (IncrementalExecution), where
    // the source's re-flagged parquet relation is planned as a real scan
    val p = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(p.contains("FileScan parquet"), s"no parquet scan in micro-batch plan:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,100)"),
      s"filter not pushed into the micro-batch scan:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("k") && !readSchema.contains("v"),
      s"column pruning lost in the micro-batch scan: $readSchema")
  }

  test("stream_change_feed: each micro-batch plans ONE wrapped leaf — the CDF joins never become stream-stream joins") {
    import graft.ops.Acid
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files.createTempDirectory("cdf_mb_plan").toString + "/t"
    Acid.appendTxn(spark, table,
      spark.range(0, 400).select(col("id").as("k")), txnId = 0L)
    Acid.deleteTxn(spark, table,
      spark.range(0, 50).select(col("id").as("k")), "k", txnId = 1L)
    val q = spark.readStream.format("graft.stream.AcidStreamProvider")
      .option("table", table).option("mode", "cdf").load()
      .writeStream.format("memory").queryName("cdf_mb_plan_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdf_mb_plan_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the delete-preimage semi/anti joins execute INSIDE getBatchCdf's own
    // batch plan; the micro-batch the ENGINE runs must see one wrapped RDD
    // leaf — a stream-stream join operator appearing here would mean the
    // streaming re-flag leaked through the join
    val p = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(!p.contains("StreamingSymmetricHashJoin"),
      s"CDF joins became stream-stream joins:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"CDF joins leaked into the engine's micro-batch plan:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the single wrapped CDF leaf in the micro-batch plan:\n$p")
  }

  test("mergeCow touched-file probe: change keys broadcast into a LEFT SEMI against the scan — the table side never shuffles") {
    import graft.ops.Acid
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files.createTempDirectory("merge_probe_plan").toString + "/t"
    Acid.appendTxn(spark, table,
      spark.range(0, 5000).select(col("id").as("k"), (col("id") * 2).as("v")),
      txnId = 0L)
    val files = graft.ops.Acid.skipFiles(table, 0L, "__none", 0L, 0L)._2
      .map(f => s"$table/$f")
    val keys = spark.range(0, 20).select(col("id").as("k"))
    val probe = Acid.touchedFilesPlan(spark, files, keys, "k")
    probe.collect() // materialize so AQE finalizes the join strategy
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"probe must broadcast the change keys into a left semi:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"probe shuffled the table side:\n$p")
    assert(p.contains("input_file_name"),
      s"probe lost the file-name capture on the scan:\n$p")
  }

  test("zorderColumn: pure codegen'd bit arithmetic, bit-identical to the driver twin") {
    import graft.ops.Acid
    import org.apache.spark.sql.functions.col
    val bounds = Seq((0L, 255L), (1000L, 1000L + 1234567L))
    val df = spark.range(0, 1000)
      .select((col("id") % 256).as("a"), (col("id") * 1234 + 1000).as("b"))
      .withColumn("z", Acid.zorderColumn(
        Seq((col("a"), bounds(0)._1, bounds(0)._2),
          (col("b"), bounds(1)._1, bounds(1)._2))))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("udf"),
      s"z-value must be pure expression arithmetic:\n$p")
    assert(p.contains("*(1) Project"),
      s"z-value fell out of whole-stage codegen (no starred project):\n$p")
    // bit-exact against the driver-side twin on every row
    df.collect().foreach { r =>
      val expect = Acid.zorderValue(Seq(r.getLong(0), r.getLong(1)), bounds)
      assert(r.getLong(2) == expect,
        s"z(${r.getLong(0)}, ${r.getLong(1)}) = ${r.getLong(2)}, twin says $expect")
    }
  }

  test("scan_row_policy: dims broadcast, masks stay in codegen, untouched columns pruned") {
    val p = plan("scan_row_policy")
    // governance as a view rewrite keeps the physical plan a reporting
    // query would get: broadcast dims, no sort-merge join
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
    // masks are plain expressions — no UDF, no codegen break
    assert(!p.toLowerCase.contains("udf"), p)
    // column pruning survives the policy: the customer scan must not read
    // c_mktsegment (untouched by filter, masks, or output)
    val custSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(custSchema.contains("c_acctbal"), custSchema)
    assert(!custSchema.contains("c_mktsegment"),
      s"policy view read an untouched column:\n$custSchema")
  }

  test("storage-partitioned join: zero shuffle below the join; pruning reaches the projected read; bucket-set mismatch stays correct") {
    import org.apache.spark.sql.functions._
    import graft.ops.Acid
    val tA = java.nio.file.Files.createTempDirectory("spjA").toString + "/t"
    val tB = java.nio.file.Files.createTempDirectory("spjB").toString + "/t"
    Acid.reset(tA); Acid.reset(tB)
    Acid.appendTxnHidden(spark, tA,
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 7 % 100).as("x"),
        concat(lit("row"), col("id")).as("s")),
      0L, Seq(Acid.bucketOf("k", 8)))
    // B deliberately covers only buckets {0..5}: a bucket-set MISMATCH —
    // pushPartValues alignment (or a fallback shuffle) must keep the
    // result identical to the logical join either way
    Acid.appendTxnHidden(spark, tB,
      spark.range(0, 200).select((col("id") * 8 + col("id") % 6).as("k"),
        (col("id") % 5).as("g")),
      0L, Seq(Acid.bucketOf("k", 8)))
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val src = classOf[graft.sources.AcidBucketedSource].getName
      def rd(t: String) = spark.read.format(src).option("path", t)
        .option("bucket", "b8_k").load()
      // 1) co-bucketed complete sets: zero shuffle below the join
      val dA = rd(tA)
      val tA2 = java.nio.file.Files.createTempDirectory("spjA2").toString + "/t"
      Acid.reset(tA2)
      Acid.appendTxnHidden(spark, tA2,
        spark.range(0, 1000).select(col("id").as("k2"), (col("id") * 3 % 50).as("x2")),
        0L, Seq(Acid.bucketOf("k2", 8)))
      val dA2 = spark.read.format(src).option("path", tA2)
        .option("bucket", "b8_k2").load()
      val j = dA.join(dA2, dA("b8_k") === dA2("b8_k2") && dA("k") === dA2("k2"))
        .agg(count(lit(1)).as("n"), sum(col("x") + col("x2")).as("sx"))
      val row = j.collect()(0)
      assert(row.getLong(0) == 1000L)
      def walk(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case _ => p.children.flatMap(walk)
        })
      val fin = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val smj = walk(fin).collectFirst {
        case x: org.apache.spark.sql.execution.joins.SortMergeJoinExec => x }
      assert(smj.nonEmpty, s"no SMJ:\n${fin.toString.take(2000)}")
      val shuffles = smj.get.children.flatMap(walk).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => q
      }
      assert(shuffles.isEmpty, s"join shuffled:\n${fin.toString.take(2000)}")
      // 2) column pruning reaches the projected parquet read: selecting
      // (k) must not surface x/s in the scan output columns
      val pruned = rd(tA).select(col("k")).filter(col("k") < 10)
      val scanLine = pruned.queryExecution.executedPlan.toString.linesIterator
        .find(_.contains("BatchScan")).getOrElse("")
      assert(scanLine.contains("k#") && !scanLine.contains("x#") && !scanLine.contains("s#"),
        s"scan not pruned: $scanLine")
      assert(pruned.count() == 10)
      // 3) bucket-set mismatch: result equals the logical join exactly
      val dB = rd(tB)
      val mm = dA.join(dB, dA("b8_k") === dB("b8_k") && dA("k") === dB("k"))
        .select(dA("k"), dA("x"), dB("g"))
      val expect = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 7 % 100).as("x"))
        .join(spark.range(0, 200).select((col("id") * 8 + col("id") % 6).as("k"),
          (col("id") % 5).as("g")), Seq("k"))
        .select(col("k"), col("x"), col("g"))
      assert(mm.collect().map(_.toSeq).toSet == expect.collect().map(_.toSeq).toSet)
      // 4) refusals: vectored and un-bucketed tables fail loudly
      import spark.implicits._
      Acid.deleteTxn(spark, tB, Seq(8L).toDF("k"), "k", txnId = 1L)
      val e1 = intercept[Exception] { rd(tB).collect() }
      assert(e1.getMessage.contains("delete vectors"), e1.getMessage)
      val tC = java.nio.file.Files.createTempDirectory("spjC").toString + "/t"
      Acid.reset(tC)
      Acid.appendTxn(spark, tC, spark.range(3).toDF("k"), 0L)
      val e2 = intercept[Exception] { rd(tC).collect() }
      assert(e2.getMessage.contains("no partition tuple"), e2.getMessage)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
