package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the headline queries to a markdown file
  * (PLANS.md) — the plan-audit artifact backing the 100 TB design claims.
  * Usage: runMain graft.tools.ExplainDump <outFile> [sfDir]
  */
object ExplainDump {

  val headline: Seq[(String, String)] = Seq(
    "agg_hash_q1" -> ("Two-phase HashAggregate: partial map-side combine, shuffle carries one row " +
      "per (partition, group); pushed shipdate filter reaches the parquet scan."),
    "scan_pruned" -> "PushedFilters + pruned ReadSchema — the scan reads 3 columns, not 11.",
    "join_broadcast" -> "Both dims broadcast: no shuffle of the fact side, BroadcastHashJoin ×2.",
    "join_inner_equi" -> ("Un-hinted 3-way star join: planner/AQE picks broadcast for the small dims " +
      "at this size; at 100 TB the same plan degrades gracefully to shuffled joins on the keys."),
    "join_interval" -> ("Equi join on user_id carries the shuffle; the time-range predicate is a " +
      "post-join residual — never a cartesian."),
    "join_asof" -> ("As-of composition: one shuffle of the tagged union on the key, one window pass; " +
      "no per-row probes, no broadcast of the big side."),
    "sort_limit_topk" -> "TakeOrderedAndProject: per-partition top-k + merge, no global sort.",
    "window_running" -> "Single Window operator over one hash-partition exchange on user_id.",
    "stream_tumbling" -> "Batch twin of the streaming tumbling window: expand-free single aggregate.",
    "llm_sim_knn" -> ("Brute-force baseline: broadcast of 10 probes against the corpus scan, native " +
      "vec_dot inside whole-stage codegen; top-10 via the BOUNDED TopKBySim " +
      "Aggregator (r18) — the partial (map-side) phase reduces every input " +
      "partition to \u226410 candidates per probe BEFORE the exchange, so the " +
      "shuffle carries O(probes \u00d7 k \u00d7 partitions) rows and no Window/full " +
      "sort exists anywhere (PlanShapeSpec-pinned). At 100 TB the old " +
      "row_number plan shuffled the whole probes\u00d7corpus product; this one " +
      "ships ~320 rows."),
    "llm_dedup_near" -> ("Banded MinHash-LSH: compiled signature kernel, bucket shuffle carries " +
      "(band, bucket, doc_id) only, exact-Jaccard verify on ~10³ candidate pairs."),
    "llm_dedup_ngram" -> ("Exact AllPairs prefix filter (r3): hashed-gram postings, smallest-hash " +
      "prefix index, size filter, single long-array intersect per pair — no cartesian anywhere."),
    "llm_dedup_embed" -> ("Multi-table sign-LSH (8×8-bit, OR-amplified): salted bucket-join " +
      "candidates shuffle (table, bucket, vec_id) only; vector dim broadcast back for exact cosine."),
    "llm_dedup_components" -> ("Dedup closure (r3): prefix-filter edges + min-label propagation — " +
      "the dumped plan is one propagation round (joins stay id-only; labels checkpoint per round)."),
    "llm_doc_sample" -> ("Deterministic LCG hash sampling: a pure scan predicate, no shuffle, " +
      "rerun- and partitioning-stable."),
    "join_stream_stream" -> ("Stream-stream join batch twin: one shuffle on user_id, event-time " +
      "range as a post-join residual — the same keying the watermarked streaming operator uses."),
    "llm_chunk_split" -> ("Word-window chunking (r4): pure per-row explode, zero shuffle before " +
      "the presentation sort — chunk fan-out never leaves the partition."),
    "llm_decontaminate" -> ("Decontamination (r4): corpus-side gram explode probes the BROADCAST " +
      "held-out gram set in place; only matching (doc_id, gram) rows reach the count-distinct."),
    "llm_tfidf" -> ("TF-IDF (r4): narrow (doc, term) aggregate; the |vocab|-row document-frequency " +
      "side joins back as a broadcast; ranking on DECIMAL-coarsened scores in one window."),
    "llm_ann_ivf" -> ("IVF ANN (r4): dumped plan is the nprobe cell search — broadcast probe rows " +
      "equi-joined on cell id against the checkpointed assignment, per-probe top-k window. " +
      "Centroid training (3 Lloyd rounds) happens before this plan; only 16×dim rows ever " +
      "reach the driver."),
    "agg_window_distinct" -> ("Windowed exact distinct (r4): two-phase distinct — partial dedup of " +
      "(window, type, user) map-side, the shuffle carries one row per distinct triple."),
    "join_multiway" -> ("Six-table Q5 shape (r4): fact side shuffles once on orderkey, all four " +
      "dims broadcast, date filter pushed to the scan, nationkey equality a post-join residual."),
    "agg_unpivot" -> ("Unpivot (r4): zero-shuffle Expand (3 output rows per input) feeding one " +
      "two-phase aggregate — the melt never moves data, only the aggregate does."),
    "window_gapfill" -> ("Gap-fill (r4): 1-row bounds broadcast, partition-local hour-grid explode, " +
      "grid←observations join and the last(ignoreNulls) ffill window each shuffle once on user_id."),
    "join_lateral" -> ("Correlated LATERAL (r4): Catalyst decorrelates the per-customer top-1 " +
      "subquery into WindowGroupLimit (partial+final) + one join — the SQL user's per-row " +
      "formulation runs as a ranked window, never a loop."),
    "join_bucketed" -> ("Co-located join (r5): both sides read pre-bucketed+sorted tables on the " +
      "join key — SortMergeJoin with ZERO Exchange on either side (dumped with broadcast " +
      "disabled: at fixture scale the dim would broadcast, at 100 TB neither side fits and " +
      "THIS is the plan); the write-time shuffle is amortized across every later join on " +
      "that key."),
    "sink_partitioned" -> ("Partitioned layout (r5): the dumped read-back plan shows the literal " +
      "date predicate as PartitionFilters (directory pruning) with empty PushedFilters — the " +
      "non-matching partitions are never opened."),
    "window_sessionize" -> ("Batch sessionization (r5): lag-mark + running-sum + session aggregate " +
      "all share ONE hash exchange on user_id — three logical steps, one shuffle."),
    "subquery_in_notin" -> ("NOT IN over a nullable list (r5): planned as a null-aware anti join, " +
      "IN as a semi join, NOT EXISTS as a plain anti join — never a per-row re-scan of the list."),
    "llm_shard_assign" -> ("Deterministic shuffle+shard (r5): shard comes from pure hash " +
      "arithmetic on the scan (no global sort); the per-shard order is a window inside each " +
      "shard's partition — one exchange on shard, everything else map-side."),
    "llm_pack_sequences" -> ("Sequence packing (r5): one exchange on the partition key, then the " +
      "prefix-sum window and the per-sequence aggregate run partition-local — integer " +
      "arithmetic end to end."),
    "llm_dedup_substring" -> ("Substring-contamination profile (r5): (gram, doc_id) postings " +
      "shuffle once; the >1-doc filter is a hash aggregate, the flag join is a semi join on " +
      "doc_id — the text never re-shuffles."),
    "agg_funnel" -> ("Ordered event funnel (r5): three stage aggregates chained by strict-time " +
      "joins, every one keyed on user_id — the stage row counts only shrink, and no stage " +
      "ever re-scans more than the events of users still in the funnel."),
    "agg_retention" -> ("Cohort retention (r5): distinct-day dedup, cohort min, and the " +
      "activity⋈cohort join all hash-partition on user_id; the (cohort, offset) matrix is " +
      "output-bound (days², independent of event volume)."),
    "agg_decay" -> ("Time-decayed trending (r5): 1-row max() broadcast fixes the reference " +
      "instant, per-row decimal-coarsened weights feed a standard two-phase aggregate — " +
      "zero shuffle beyond the 5-group agg."),
    "window_throttle" -> ("Rate limiting (r5): rank ≤ k runs as WindowGroupLimit " +
      "(partial+final) — each partition locally caps to k before the exchange, so a hot " +
      "key's overflow is dropped where it is produced, never shuffled."),
    "window_percentile" -> ("Rolling exact percentiles (r6): p25 and p50 share one frame spec, " +
      "so they fuse into a SINGLE Window operator over a single hash exchange on the " +
      "partition key — the O(21) frame walk is partition-local, and full-history quantiles " +
      "stay in agg_approx_quantile's mergeable sketch instead."),
    "stream_backfill" -> ("Batch-catchup → streaming handoff (r8): the dumped plan is the " +
      "unified consumer query — a bare Union of the archive leg and the offset-filtered " +
      "landed live leg feeding one two-phase aggregate. No Deduplicate, no extra Exchange: " +
      "the exactly-once seam is the `> hwm` offset filter plus idempotent batch=<id> " +
      "landing, not corpus-wide dedup state."),
    "agg_weighted" -> ("Weighted aggregates (r8): one two-phase HashAggregate — the decimal " +
      "products ride the partial (map-side) aggregate, the shuffle carries one partial row " +
      "per (partition, flag), and the divisions happen once per OUTPUT row."),
    "window_zscore" -> ("Rolling z-score (r8): sum, sum-of-squares, and count share one frame " +
      "spec, so all three moments fuse into a SINGLE Window operator over a single hash " +
      "exchange — the variance/z arithmetic is a post-window projection, codegen'd."),
    "sort_zorder" -> ("Z-order layout (r8): the Morton key is pure projection arithmetic " +
      "(codegen'd bit ops, zero shuffle); the only exchange is the final rangepartitioning " +
      "sort — exactly the repartitionByRange(zkey) write path that makes parquet min-max " +
      "skipping effective on both dimensions at 100 TB."),
    "sort_hilbert" -> ("Hilbert layout (r11): the xy2d walk is 8 unrolled rounds of pure " +
      "projection arithmetic (codegen'd CASE/bit ops, zero shuffle); like sort_zorder the " +
      "only exchange is the final rangepartitioning sort — the repartitionByRange(hkey) " +
      "write path, with connected per-file bounding boxes instead of Z-order's seam jumps."),
    "llm_importance_resample" -> ("Importance resampling (r11): weight lookup, copy count, " +
      "and sequence-explode are all map-side codegen'd per-row work — the plan must show " +
      "ZERO exchanges before the output sort; replication multiplies output bytes only, " +
      "never shuffle traffic."),
    "llm_vocab_topk" -> ("Vocabulary top-k (r8): partition-local explode, two-phase " +
      "HashAggregate bounded by vocabulary (not corpus) size, TakeOrderedAndProject for " +
      "the k-boundary — per-partition heaps, k rows to the driver, no global sort."),
    "llm_gopher_filter" -> ("Quality-rule filter (r8): a single zero-shuffle projection over " +
      "the scan — every rule verdict and the conjunctive keep are per-row expressions " +
      "inside one WholeStageCodegen span."),
    "stream_cdc_upsert" -> ("Streaming CDC apply (r8): the dumped plan is the materialized " +
      "latest-state read-back (version-chain snapshot scan + presentation sort). The " +
      "per-batch merge is one max_by hash aggregate keyed on user_id whose output is " +
      "bounded by key cardinality, not history length."),
    "window_ewma" -> ("Per-event EWMA (r8): all 21 lag terms share one window spec, so the " +
      "whole chain fuses into a SINGLE Window operator over one exchange on user_id — " +
      "the numerator/denominator folds are post-window projection arithmetic, codegen'd."),
    "stream_trending_topk" -> ("Trending top-k (r8): two-phase windowed count (state bounded " +
      "by windows × types), then the per-window rank — WindowGroupLimit-eligible fanout " +
      "equal to type cardinality, never the event volume."),
    "window_pattern" -> ("Event-sequence pattern match (r8): both lead() columns share one " +
      "window spec, so the whole pattern fuses into a SINGLE Window operator over one " +
      "user_id exchange — longer patterns add lead columns to the same sorted pass, never " +
      "joins or state."),
    "agg_bitmap_distinct" -> ("Bitmap exact distinct (r8): two stacked two-phase " +
      "HashAggregates — the bit_or block masks partial-combine map-side (absorbing " +
      "same-block duplicates BEFORE the exchange, which COUNT(DISTINCT)'s expand cannot), " +
      "then popcount-sum over id-space/32 mask rows per group."),
    "graph_pagerank" -> ("Iterative PageRank (r8): the dumped plan is the final superstep — " +
      "cached edges joined to a BroadcastExchange of the 25-row rank relation, one " +
      "output-bound groupBy(dst) HashAggregate; localCheckpoint truncated the prior " +
      "supersteps' lineage, so the plan depth is ONE step, not ten."),
    "agg_bitmap_overlap" -> ("Bitmap set algebra (r8): the (block, day) bitmaps build once " +
      "via a partial-combined bit_or aggregate, the day-pair overlap joins on the block " +
      "key carrying id-space/32 mask rows per day, and AND+popcount re-aggregates " +
      "partial — segment overlap without re-scanning raw events."),
    "graph_triangles" -> ("Triangle count (r8): edges oriented a<b so each triangle " +
      "materializes once as a<b<c — two self-joins on single int keys (broadcast by AQE " +
      "at this size, shuffle-hash at scale), then an output-bound explode+count; the " +
      "orientation is what caps the hot node's join fanout."),
    "join_range_binned" -> ("Binned pure range join (r8): with no equi key the naive plan " +
      "is BroadcastNestedLoopJoin (n×m compares); the week-bin column restores a hash " +
      "equi key (order probes 2 bins via explode, range residual inside the match) — the " +
      "plan must show a hash-keyed join and zero nested loops."),
    "window_islands" -> ("Gaps-and-islands (r8): the row_number-difference pipeline — two " +
      "Window ops and two stacked aggregates all clustered under hashpartitioning(" +
      "user_id), so the whole streak analysis reuses ONE exchange; island grouping is " +
      "pure arithmetic, never a self-join."),
    "llm_bpe_encode" -> ("BPE corpus tokenization (r9): training is a memoized control-plane " +
      "loop at plan build; the encode pass itself is scan → project over the broadcast " +
      "merge table — no join, no aggregate, only the presentation sort's range exchange."),
    "llm_dedup_phash" -> ("Perceptual-hash media near-dup (r9): partition-local batched decode " +
      "+ dHash, signatures localCheckpoint once (never re-decoded per join leg), banded " +
      "equi-join candidates shuffle (band, bucket, doc_id) only, exact bit_count(xor) " +
      "hamming verify — no all-pairs product anywhere."),
    "llm_dedup_incremental" -> ("Incremental dedup (r9): today's batch against the standing " +
      "index — batch hashes and LSH bands BROADCAST against the streaming index, so " +
      "candidates are batch×index only (never index self-pairs); per-day cost O(batch), " +
      "independent of corpus size."),
    "sink_compact" -> ("Small-file compaction (r9): one hash repartition on the partition " +
      "column routes every date's rows to a single task — each fragmented partition dir " +
      "collapses to one file; row-lossless by the per-date aggregate oracle."),
    "source_evolving" -> ("Schema evolution on read (r9): two writer generations read through " +
      "ONE mergeSchema FileScan whose ReadSchema is the union — pre-evolution files " +
      "surface NULLs, nothing re-writes, no per-generation scan union."),
    "join_dpp" -> ("Dynamic partition pruning (r9): the dim filter lives on a non-partition " +
      "attribute, so the fact scan must carry a dynamicpruningexpression partition " +
      "filter evaluated at runtime from the dim side's broadcast — the star-schema " +
      "scan reducer."),
    "join_bloom_prefilter" -> ("Runtime bloom-filter join (r9): neither side broadcasts; " +
      "InjectRuntimeFilter pushes might_contain(xxhash64(l_orderkey)) from the filtered " +
      "orders side into the lineitem scan so never-match rows drop BEFORE the exchange " +
      "(plan shown pre-checkpoint, injection confs live)."),
    "graph_shortest_path" -> ("Bounded shortest path (r9): pagerank's iterative-DataFrame " +
      "shape — cached edges joined to a broadcast |V|-row cost table per relaxation " +
      "round, one output-bound groupBy(dst) shuffle per round, localCheckpoint " +
      "truncating lineage; nothing but the MIN(src) scalar collects to the driver."),
    "llm_bm25" -> ("Integer-exact BM25 top-10 (r9): one explode + two hash aggregates, " +
      "query-term filter before the tf aggregate, tiny df/globals broadcasts, and the " +
      "top-k as TakeOrderedAndProject — never a global sort."),
    "llm_inverted_index" -> ("Posting-block inverted index (r9): df from a count aggregate, " +
      "block 0 from a per-term row_number window filtered to 32 BEFORE any list " +
      "materializes — bounded per-group state on arbitrarily hot terms."),
    "sink_snapshot_diff" -> ("Snapshot CDC diff (r9): ONE full outer join on the key + " +
      "D/I/U classification; feed size O(changes); bucket both snapshots on the key " +
      "and this join is exchange-free."),
    "stats_profile" -> ("Exact column profiler (r9): a single events scan feeding one " +
      "aggregate; the three exact count-distincts share one Expand pass; stack() " +
      "unpivots to one row per column with zero extra shuffles."),
    "window_interpolate" -> ("Integer-exact linear interpolation (r9): backward last + " +
      "forward first ignore-nulls passes share ONE user_id exchange; the pmod-floor " +
      "division keeps Spark div and DuckDB // bit-agreed on falling series."),
    "llm_curation_pipeline" -> ("Fused curation composite (r9): filter → sha256 dedup → " +
      "LCG sample → shard manifest in one declarative plan over ONE documents scan — " +
      "sample prunes before the dedup shuffle; exchanges are the digest hash-agg and " +
      "an 8-row rollup."),
    "join_asof_tolerance" -> ("Bounded-staleness as-of (r9): the same one-shuffle " +
      "union-tag window plan as join_asof; the 24 h tolerance is a post-window " +
      "projection — no second window, no probe."),
    "agg_rank_corr" -> ("Spearman rank correlation (r9): one event_type exchange feeds " +
      "both rank windows (two in-partition sorts); the Σd² aggregate partial-combines; " +
      "the only wide product runs in DECIMAL(38,0)."),
    "stats_ks_test" -> ("Two-sample KS drift statistic (r9): one bounded agg on the fact " +
      "scan (shuffle ≤ bin count); the cumulative-ECDF window and the 1-row totals " +
      "broadcast run over the ~500-row BIN table — the single-partition window never " +
      "sees the data, only its histogram."),
    "join_null_safe" -> ("Null-safe equi join (r9): EqualNullSafe rides the join KEYS, so " +
      "the plan is a plain hash join (broadcast here, SMJ at scale) — a theta-style " +
      "nested loop would be the failure mode; PlanShapeSpec pins its absence."),
    "window_drawdown" -> ("Max drawdown (r9): the running-peak window and the per-user " +
      "aggregate both cluster under hashpartitioning(user_id) — one exchange feeds " +
      "both; micro-scaled BIGINT values keep every op integer, no float policy at all."),
    "source_jdbc" -> ("Partitioned JDBC ingest (r9): the scan is a JDBCRelation with " +
      "numPartitions=4 — four stride predicates on o_orderkey open four parallel " +
      "database cursors, and the projection pushes down so only the aggregate's two " +
      "columns cross the wire; the rollup itself is a normal two-phase HashAggregate."),
    "stats_corr_matrix" -> ("Pearson correlation matrix (r9): stack() unpivots the 3 " +
      "column pairs inside the projection of ONE lineitem scan; the five exact-decimal " +
      "moments partial-combine map-side, so the shuffle carries 3 moment rows — " +
      "per-pair re-scans (the naive corr() loop) never appear."),
    "sink_scd2" -> ("SCD2 incremental merge (r9): history windows, the dimension " +
      "read-back, the batch lag/lead windows, and the first-change aggregate all key " +
      "on user_id — equi joins and windows only (no nested loop, pinned); closed " +
      "history rows pass through untouched, so the nightly merge cost tracks the " +
      "BATCH size, not the dimension's accumulated history."),
    "join_asof_forward" -> ("Forward as-of (r9): join_asof's union-tag plan with the " +
      "frame reversed — one exchange on the key, one window pass picking " +
      "first(ignoreNulls) over (currentRow, unboundedFollowing); the attribution " +
      "direction flips with zero new shuffles."),
    "source_csv_dirty" -> ("Malformed-record quarantine (r9): one PERMISSIVE CSV scan; " +
      "the corrupt-record column is derived alongside the data columns so good rows " +
      "and the quarantine bucket come out of a single fused two-phase aggregate — " +
      "no second scan, no cache, no dropped rows."),
    "window_rolling_corr" -> ("Rolling correlation (r9): all six moments share one " +
      "frame spec and fuse into a SINGLE Window operator over one hash exchange — " +
      "window_zscore's fusion story doubled; the r arithmetic is post-window " +
      "projection, codegen'd."),
    "stats_decile_lift" -> ("Decile lift table (r9): one partitioned ntile window " +
      "(the same exchange any per-segment analysis pays) feeding a two-phase " +
      "aggregate bounded by segments × 10 output rows; global deciles at scale go " +
      "through the binned-ECDF pattern, never an unpartitioned window."),
    "window_ohlc" -> ("OHLC resample (r10): the full-frame first/last window and the " +
      "bar aggregate share ONE (user, hour) exchange — Catalyst reuses the window's " +
      "partitioning for the groupBy; hour buckets bound partition size at any scale."),
    "join_asof_nearest" -> ("Nearest-asof (r10): both direction frames (prev via " +
      "preceding last, next via following first) fuse into a SINGLE Window over one " +
      "hash exchange of the tagged union; event-type filters pushed to both scans."),
    "llm_ngram_lm" -> ("Bigram LM (r10): adjacent-pair explode (no self-join), two " +
      "map-side-combined count aggregates, unigram side broadcast back on w1, 1-row " +
      "vocab scalar broadcast; top-100 plans as TakeOrderedAndProject."),
    "stats_outlier_mad" -> ("MAD outliers (r10): both nested-median passes join back " +
      "as BROADCASTS — the fact side is scanned, never re-shuffled for a join; the " +
      "only exchanges are the per-group aggregates."),
    "window_cusum" -> ("CUSUM drift (r10): 1-row global-moment broadcast, then one " +
      "window shuffle on user_id; the running sum stays in exact decimal so the " +
      "plan is topology-independent bit-for-bit."),
    "llm_stratified_sample" -> ("Stratified exact-k (r10): one shuffle on the " +
      "stratum key, row_number over the shared Knuth-hash order, rank filter — " +
      "no sort of the full table, no driver participation."),
    "agg_apportion" -> ("Largest-remainder apportionment (r10): the grouped count " +
      "is the only data-bound exchange; the integer quota window runs over " +
      "|cells| rows — allocation cost is output-bound at any scale."),
    "source_text" -> ("Line-text round-trip (r10): splittable per-line text scan, " +
      "zero-shuffle codegen'd parse projection; the presentation sort is the " +
      "only exchange."),
    "sink_upsert" -> ("ACID MERGE (r11): the copy-on-write anti-join + union " +
      "commits as v=1 through the Acid manifest-pointer seam; the dumped " +
      "read-back scan reads the manifest's EXPLICIT file list (pointer → " +
      "manifest → files, no directory listing — the object-store-safe read), " +
      "and AQE broadcasts the delta side of the merge."),
    "scan_zonemap" -> ("Manifest data skipping (r11): the scan's file list is the " +
      "zone-map SURVIVORS only — pruning happened in O(files) driver arithmetic " +
      "before Spark listed anything; the residual ts predicate stays on the scan " +
      "(skipping drops provably-dead files, never substitutes for the filter)."),
    "sink_merge_on_read" -> ("Equality-delete read path (r11): the dumped plan is the " +
      "merged read-back — data files scanned once, the tiny delete-key union " +
      "BROADCAST into a left-anti hash join; the snapshot side never shuffles, " +
      "which is why O(keys) delete commits stay cheap to read."),
    "agg_copurchase_pairs" -> ("Basket pair mining (r11): distinct (order, part) " +
      "dedup, then a self hash join on the order key — fan-out bounded by basket " +
      "size, never a cartesian; the pair aggregate partial-combines and the " +
      "support threshold prunes before the presentation sort."),
    "agg_transition_matrix" -> ("Markov transitions (r11): ONE hash exchange on " +
      "user_id feeds the lead() window; the (from, to) aggregate partial-combines " +
      "to a types² matrix and the ppm normalization window runs over that " +
      "output-bound relation — the second window never sees event-volume data."),
    "stats_trend_mk" -> ("Mann-Kendall (r11): the daily rollup is the only " +
      "table-sized aggregate; the quadratic sign join, tie groups, and variance " +
      "arithmetic all run on the 30-row-per-type daily OUTPUT — n is days, never " +
      "rows, and every statistic is integer."),
    "stats_changepoint" -> ("Pettitt change-point (r11): one table-sized rollup, " +
      "then the pair and k-grid joins expand ~n³/6 rows per type on DAYS — " +
      "output-bound like ks_test; the argmax is an integer row_number window " +
      "over the |k| relation, no float comparison anywhere."),
    "agg_assoc_rules" -> ("Association rules (r11): the basket-bounded pair join " +
      "from copurchase feeds one pair aggregate; item supports and the 1-row " +
      "basket count join back as BROADCASTs, so rule scoring never reshuffles " +
      "the pair relation; conf/lift are integer div in DECIMAL(38,0)."),
    "graph_common_neighbors" -> ("Link prediction (r11): wedge self-join on the " +
      "center node over the symmetric edge list (d1 < d2 counts each wedge " +
      "once), pair aggregate partial-combines, and the existing-edge anti-join " +
      "broadcasts the edge list — feasible exactly when the wedge join was."),
    "llm_span_mask" -> ("Span corruption (r11): map-only — the mask predicate and " +
      "span-start derivation run as higher-order filters over sequence(1,n) " +
      "inside one projection; no explode, no shuffle, no window. The heaviest-" +
      "volume shaping pass costs one scan."),
    "scan_bloom_skip" -> ("Manifest bloom skipping (r11): the dumped scan reads " +
      "only the files whose 4096-bit manifest bloom admits the probed key — " +
      "pruning was O(files) driver arithmetic before any footer I/O; the " +
      "residual user_id predicate stays pushed on the surviving scan."),
    "sink_concurrent_append" -> ("Optimistic multi-writer (r11): the dumped plan " +
      "is the read-back of four uncoordinated CAS-committed appends — pointer → " +
      "manifest → explicit file list across txn dirs; writer concurrency left " +
      "no trace in the plan, which is the point (commit-time coordination only)."),
    "join_spatial_grid" -> ("Grid-bucketed spatial neighbor join (r12): candidates " +
      "come from the 3x3-cell explode equi-joined on the home cell — the plan must " +
      "show hash/sort-merge joins only (no CartesianProduct, no BNLJ; spec-pinned); " +
      "the exact squared-distance residual is a codegen'd post-join filter."),
    "window_attribution" -> ("Multi-touch attribution (r12): one user_id equi-join " +
      "with the 7-day range residual (never a cartesian), one per-purchase window, " +
      "one hash-agg per click day; the three models ride the same joined rowset as " +
      "conditional projections — no per-model re-join."),
    "window_rfm_segments" -> ("RFM with distributed exact rank (r12): the plan must " +
      "show RANGE exchanges + partition-local windows for the three rank passes — " +
      "no single-partition WindowExec over the user rollup; offsets are a " +
      "broadcast-joined <=32-row aggregate."),
    "agg_log_histogram" -> ("Log2 magnitude histogram (r12): floor(log2) as " +
      "length(bin(v))-1 is per-row codegen'd projection; the only exchange is the " +
      "two-phase hash-agg on (type, bucket) — ~40 groups/type, map-side combined, " +
      "partials mergeable across days EXACTLY."),
    "fn_geo_grid" -> ("Geo grid heatmap (r12): trig-free integer cell arithmetic " +
      "inside one WholeStageCodegen span; one hash-agg on the packed cell id — the " +
      "shape a planetary heatmap aggregation keeps at 100 TB."),
    "join_fuzzy_blocked" -> ("Blocked fuzzy join (r12): equi-join on the two-word " +
      "block key with the levenshtein length prefilter in the join condition — no " +
      "cartesian (spec-pinned); the explicit repartition(64, blk) is load-bearing: " +
      "AQE coalesces by input bytes and cannot see the multiplicative pair fan-out, " +
      "so without it the verify runs nearly single-threaded."),
    "join_interval_overlap" -> ("Interval overlap (r12): the 6-row promo side is a " +
      "broadcast build (a nested loop against 6 rows is the right plan); the only " +
      "table-sized exchanges are the per-user session window and the final agg."),
    "llm_sentence_dedup" -> ("Sentence-level dedup (r12): explode multiplies rows " +
      "map-side; the shuffle carries 32-byte sentence digests, never text — one " +
      "digest-keyed aggregate + one digest join, the dataset_card policy applied " +
      "to boilerplate detection."),
    "sink_graft_log_compact" -> ("Log compaction (r12): the dumped plan is the " +
      "compacted-generation read-back; the compaction itself is one max-per-key " +
      "aggregate + an offset equi-join — O(keys) state, and every surviving row " +
      "crossed the TSV wire format twice."),
    "sink_acid_optimize" -> ("OPTIMIZE rewrite (r13): the dumped plan is the " +
      "post-rewrite read-back over targetFiles range-clustered files resolved " +
      "from the manifest — no delete-vector anti-join left (the rewrite folded " +
      "the vectors), and the per-file zone maps it harvested are provably " +
      "disjoint (spec-pinned), which is what makes readSkipping sharp at 100 TB."),
    "scan_change_feed" -> ("Change data feed through the SQL TVF (r13/r14): " +
      "table_changes('t', 0, 3) resolves through the manifest diff — inserts are " +
      "a scan of exactly the window's ADDED files anti-joined to the broadcast " +
      "standing vectors, delete preimages a semi-join of the window-start state " +
      "against the new vector keys; O(changes) I/O, never O(table), and the SQL " +
      "plan is bit-identical to the DataFrame seam's (SurfaceDocSpec parity pin)."),
    "stream_incremental_mv" -> ("Streaming incremental MV (r14): the dumped plan " +
      "is the maintained-state read-back; each refresh cycle's plan is one " +
      "O(changes) delta aggregate + a full-outer merge join against the O(groups) " +
      "standing state committed idempotently through the txn ledger — the base " +
      "table is never rescanned after v0, the whole point of consuming the CDF."),
    "sink_merge_cow" -> ("Row-level MERGE, copy-on-write (r15): the dumped plan " +
      "is the post-MERGE read-back — survivors + the rewrite's files resolved " +
      "from the manifest, the reconciled delete vector applied as one broadcast " +
      "anti-join. The MERGE itself ran as Delta's two jobs: a touched-file " +
      "semi-join probe grouped by input_file_name (O(files) to the driver) and " +
      "a rewrite of only those files — survivors byte-identical, spec-pinned."),
    "sink_acid_zorder" -> ("OPTIMIZE ZORDER (r15): the dumped plan's scan leaf " +
      "lists ONLY the z-tile survivors of the 2-D manifest prune " +
      "(readSkippingAll intersects per-dimension zone-map survivor sets) with " +
      "both residual predicates still on the scan; the rewrite that enabled it " +
      "was one repartitionByRange shuffle on a codegen'd bit-interleave — " +
      "multi-dimension skipping at single-dimension maintenance cost."),
    "stream_cdc_apply" -> ("Streaming CDC apply (r15): the dumped plan is the " +
      "maintained table's read-back after 6 MERGE micro-batches. Each cycle " +
      "planned as: window-ranked conflation to the last change per key " +
      "(O(batch keys) rows), a touched-file probe, and a rewrite of only the " +
      "touched files committed under txnId=batchId — per-cycle cost tracks the " +
      "batch and its key locality, never the table."),
    "scan_hidden_partition" -> ("Hidden partitioning (r15): the dumped plan's " +
      "scan lists only the files surviving the day(ts) × bucket8(user_id) " +
      "tuple prune, with the RAW residual predicates still on the scan — the " +
      "derived columns exist nowhere in the plan because they exist nowhere " +
      "in the schema, which is the whole point (a hive dt column the user " +
      "forgets to filter full-scans; here there is nothing to forget)."),
    "sink_expectations_quarantine" -> ("Write-time expectations (r15): the " +
      "dumped plan is the clean ∪ tagged-quarantine read-back from the two " +
      "catalog members pinned by ONE atomic commit. The split itself planned " +
      "as a single CASE projection over the batch (map-side, no extra " +
      "shuffle) feeding two filtered writes — O(batch), and the quarantine " +
      "ledger can never be torn from the data it explains."),
    "sink_snapshot_tag" -> ("Snapshot tags (r15): the dumped plan reads the " +
      "TAGGED manifest through the SQL entry path (VERSION AS OF " +
      "'quarterly-audit') AFTER a vacuum that expired the same version by " +
      "number — the scan lists the pinned version's files exactly; the tag " +
      "costs one O(1) file and O(tagged manifests) vacuum arithmetic."),
    "scan_branch_diff" -> ("Branch diff (r16): the publish preview plans as " +
      "two LEFT ANTI joins on the key — at fixture scale AQE broadcasts " +
      "the key sides; at 100 TB both degrade gracefully to shuffled anti " +
      "joins that carry keys, never payloads. Both inputs resolve from " +
      "manifests (branch head vs main head) with delete vectors applied " +
      "before the diff."),
    "scan_row_policy" -> ("Row policy + masks (r16): governance as a view " +
      "rewrite keeps the reporting-query plan — dims broadcast, the scoped " +
      "row predicate applied before any user expression, masks as plain " +
      "projections inside whole-stage codegen, and the untouched " +
      "c_mktsegment column pruned out of the customer scan entirely."),
    "scan_table_partitions" -> ("Partitions metadata table (r16): the exact " +
      "row counts come from ONE distributed scan grouped by " +
      "input_file_name — O(files) rows to the driver, folded to tuples " +
      "through the manifest's pval map; never a per-tuple scan."),
    "scan_change_feed_row" -> ("Row-granular CDF (r17): per version step a " +
      "manifest-diff full-outer join of the removed vs added files keyed " +
      "on the merge key — each step reads ONLY the files its commit " +
      "touched, the per-step frames union, and equal carried rows cancel " +
      "so maintenance rewrites contribute nothing. The join sides are " +
      "commit-sized, never table-sized. (join_storage_partitioned's " +
      "zero-exchange SPJ plan is pinned structurally in-body and in " +
      "PlanShapeSpec — its returned frame here is the materialized " +
      "summary, so the audit lives in the spec, not this dump.)"),
    "scan_change_feed_cdc" -> ("CDC-materialized positional deletes (r17): " +
      "the vector commit's step reads the pre-materialized preimage file " +
      "directly — O(changes) I/O with no reconstruction join at read " +
      "time; the insert steps stay manifest-diff scans of the appended " +
      "files only."),
    "sink_branch_dml" -> ("Branch DML (r17): the MERGE's probe is one " +
      "LEFT SEMI of the fork-base scan against the broadcast change keys " +
      "(Delta findTouchedFiles — O(files) rows back), the rewrite reads " +
      "ONLY the touched files and lands branch-local copies; main's plan " +
      "for the same read is untouched because main's manifest never " +
      "changes. At 100 TB the experiment pays O(touched), the publish " +
      "O(manifest)."),
    "sink_positional_delete" -> ("Positional delete vectors (r17): the " +
      "dedup-as-vector plan is a window over readPositions (file, pos " +
      "from _metadata.row_index) — one exchange keyed on the dedup key, " +
      "emitting O(duplicates) vector rows; the data files are never " +
      "rewritten until OPTIMIZE folds the vectors, and the fold is the " +
      "rewriteCommit merge plan, O(live rows in touched files)."),
    "sink_branch_rebase_dml" -> ("DML-branch rebase (r18): the replay " +
      "re-runs the recorded MERGE against main's head — the SAME " +
      "findTouchedFiles semi-join + touched-file rewrite plan as the " +
      "original DML, just over the new base's (possibly compacted) " +
      "files; appends/MoR deletes replay as manifest arithmetic with " +
      "zero data I/O. Rebase cost = the original DML's bill, publish " +
      "stays O(1) fast-forward. (The returned frame is the post-publish " +
      "read; the refusal/replay choreography is in-body pinned.)"),
    "sink_dml_evolved" -> ("DML across schema generations (r18): the " +
      "UPDATE/MERGE probe and rewrite run over the LOGICAL frame " +
      "(footer-union + colmap + defaults) — the dumped plan is the " +
      "post-DML evolved read: three file generations under one " +
      "mergeSchema scan, the rename stitched by coalesce and the " +
      "default filled as a projection, vectors as a broadcast " +
      "anti-join. Only predicate/key-touched files were rewritten; " +
      "at 100 TB ALTER TABLE stays metadata-only and DML stays " +
      "O(touched files)."),
    "join_spj_skew" -> ("Partially-clustered SPJ (r18): the fact's hot " +
      "bucket (4 files) scans as 4 input partitions with duplicate " +
      "partition keys; partiallyClusteredDistribution keeps the fact " +
      "side split and replicates the dim's matching groups — the hot " +
      "key family runs as 4 tasks, zero full shuffle (in-body pinned: " +
      "shuffle-free SMJ + >8 fact slices). The SPJ answer to what AQE " +
      "skew-split does for shuffle joins."),
    "join_spj_bucket_transform" -> ("Compatible-transform SPJ (r18): the " +
      "bucket(16) fact scan coarsens to bucket(8) at plan time (modular " +
      "family closure), so both sides report aligned " +
      "KeyGroupedPartitioning and the SortMergeJoin runs with ZERO " +
      "exchange below it — pinned in-body on the executed adaptive plan " +
      "and executed in PlanShapeSpec. At 100 TB this keeps a re-bucketed " +
      "fact joining its old dims in place across bucket-count " +
      "generations."),
    "sink_erase_evolved" -> ("Erase + lock-free CAS UPDATE across schema " +
      "generations (r19): the dumped plan is the post-erase evolved read " +
      "— three generations under one mergeSchema scan, rename stitched " +
      "by coalesce, default filled as a projection. The erase itself " +
      "bloom-pruned candidates across generations (2^31-domain hashes; " +
      "the sf1 gate caught the old 1e6 pre-mod saturating) and rewrote " +
      "only files that can contain a subject; the CAS probe/rewrite ran " +
      "the same logical frame with its commit-time commute check " +
      "narrowed to evolution-metadata deltas. O(subject files), never " +
      "O(table)."),
    "sink_lineage_evolved" -> ("Row lineage x schema evolution (r19): " +
      "the dumped plan is the id-range generation aggregate over " +
      "readLineage's logical frame — lazy files attach row_id as " +
      "firstrow + _metadata.row_index against a BROADCAST O(files) map " +
      "(data never shuffles for ids), materialized files read __row_id " +
      "back, and colmap/coldefault apply as projections per part before " +
      "the union. DML and compaction across the seam keep ids bit-stable " +
      "(in-body pinned); at 100 TB ALTER TABLE costs an id-carrying " +
      "table nothing."),
    "scan_time_travel_evolved" -> ("Logical-frame time travel (r19): " +
      "each readVersion resolves through that VERSION's own " +
      "colmap/coldefault lines — the dumped plan unions the v2 and v4 " +
      "summaries, each a single mergeSchema scan of that version's file " +
      "list with the mapping as projections; resolution is manifest " +
      "metadata, zero extra I/O. Pre-evolution versions read raw (the " +
      "table as it then was)."),
    "sql_txn" -> ("Multi-statement SQL transaction (r19; all FOUR DML " +
      "verbs native since r20): the dumped plan is the post-commit read " +
      "— the transaction ran INSERT/MERGE/UPDATE/DELETE against a " +
      "txn-private branch (the MERGE probe is the standard " +
      "findTouchedFiles semi-join over the BRANCH frame and the " +
      "UPDATE/DELETE are branch predicate-COW: probe + rewrite of only " +
      "the touched fork-base files into the branch namespace, statement " +
      "k seeing statement k-1's rows throughout) and published with one " +
      "metadata-only fast-forward flip. No lock spans the data phase; " +
      "abort costs a branch drop. At 100 TB the txn bill is its " +
      "statements' writes plus O(lines) manifest arithmetic."),
    "stream_across_evolution" -> ("Streaming across schema evolution " +
      "(r20): the dumped plan is the post-drain per-generation rollup — " +
      "the interesting plans ran inside the drains. The live query's " +
      "getBatch fences loudly when an evolution commit lands past its " +
      "pinned metadata; the RESTARTED source reads each batch as the " +
      "logical frame (one mergeSchema scan of exactly the batch's " +
      "committed files + the colmap/coldefault projections), so an " +
      "undrained pre-evolution append surfaces renamed/defaulted " +
      "columns with zero extra I/O — resolution is manifest metadata. " +
      "At 100 TB the restart re-reads nothing: versions are offsets, " +
      "and the evolved read costs the same file list it always did."),
    "sink_erase_lineage" -> ("GDPR erase on a row-lineage table (r19): " +
      "the dumped plan is the post-erase lineage read — surviving lazy " +
      "files attach ids via the broadcast firstrow map, the rewritten " +
      "candidates read their materialized __row_id back. The erase " +
      "itself bloom-pruned candidates and rewrote only files that can " +
      "contain a subject; every surviving id is bit-stable (in-body " +
      "exact-map pin) and retired ids never return. O(subject files), " +
      "never O(table)."),
    "sink_iceberg_export" -> ("Iceberg-format export (r19; r20: nested " +
      "types with tree field-ids, spec-shaped nested data_file manifest " +
      "entries, per-dir export lock): the dumped plan is " +
      "IcebergExport.readExport — an independent walk of the exported " +
      "chain (version-hint -> metadata.json -> manifest-list avro -> " +
      "manifest avro) resolving to a plain parquet scan of the " +
      "zero-copy file refs, struct/list columns included. Export-side " +
      "cost is O(manifest) metadata + O(vector-touched files) " +
      "reconciliation I/O; a mostly-clean nightly interop export moves " +
      "~zero bytes. Shape-faithful and self-verified (spec-strict " +
      "readers additionally need Avro-embedded field-ids spark-avro " +
      "cannot express)."),
    "sql_mv_rewrite" -> ("Materialized-view query rewrite (r20): the " +
      "dumped plan IS the proof — the user aggregates over the BASE acid " +
      "table, but the scan under the HashAggregate reads the registered " +
      "MV's parquet (O(groups) rows), not the base (O(table)). The " +
      "rewrite is a Rule[LogicalPlan] on the public " +
      "spark.experimental.extraOptimizations hook: count(1) compensates " +
      "to coalesce(sum(n),0), sum(cents) to sum(sum_cents), and the " +
      "key-column filter commutes because it selects whole groups. " +
      "Freshness is pinned to the base's acid version + exact file set — " +
      "a stale view or time-travel read declines and the same query runs " +
      "unrewritten on the base (never wrong, just unaccelerated). At " +
      "100 TB this turns every matching dashboard query from a lake scan " +
      "into a metadata-cost lookup; the freshness probe is one pointer " +
      "read. The roll-up algebra covers count, sum, and min/max " +
      "partials (extrema roll up as themselves, any orderable type). " +
      "The lifecycle is pure SQL (CREATE/REFRESH/DROP MATERIALIZED " +
      "VIEW) and SQL-entered aggregates over acid_table(...) route " +
      "exactly like DataFrame ones. REFRESH is incremental-first: the " +
      "change feed between the pinned and current versions merges as " +
      "O(groups) signed deltas — O(changes), never O(table) — falling " +
      "back to a full recompute across rewrite commits; MoR-delete " +
      "tables keep their route (the standing-vector subtraction is " +
      "recognized as part of the base read)."),
    "sql_mv_join_rewrite" -> ("Join-MV (star-schema summary table) " +
      "rewrite (r20): the user query joins the acid fact table to the " +
      "customer dim and aggregates — but the dumped plan contains NO " +
      "JOIN and scans NEITHER side: the registered fact-join-dim MV " +
      "answers it as a roll-up (the Calcite summary-table rewrite). " +
      "Inferred isnotnull(join-key) filters are recognized as subsumed " +
      "by the MV's own inner join; freshness pins the fact's acid " +
      "version + file set AND the dim's file set, so any movement on " +
      "either side falls back to the real join. At 100 TB this deletes " +
      "the two dominant star-query costs at once — the fact scan and " +
      "the join shuffle."),
  )

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PLANS.md")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of the headline queries\n\n")
    sb.append(s"Generated by `graft.tools.ExplainDump` over `$sfDir` " +
      "(plans are size-independent apart from AQE's runtime join choices; " +
      "the commentary per query is the 100 TB design claim the plan backs).\n")
    headline.foreach { case (key, note) =>
      // join_bucketed's whole point is the exchange-free plan when NEITHER
      // side broadcasts (the 100 TB case) — physical planning happens at
      // explainString time, so the conf must be off around it.
      // join_bloom_prefilter eagerly checkpoints inside the query (to
      // execute under its conf overrides), which erases the plan — audit
      // the pre-checkpoint builder under the same confs instead.
      val noBroadcast = key == "join_bucketed" || key == "join_bloom_prefilter"
      if (noBroadcast) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      if (key == "join_bloom_prefilter") spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val df =
        if (key == "join_bloom_prefilter") graft.ops.Joins.bloomPrefilterJoin(spark, sfDir)
        else SparkEntry.queries(key)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      if (noBroadcast) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      if (key == "join_bloom_prefilter") spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      sb.append(s"\n## $key\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
