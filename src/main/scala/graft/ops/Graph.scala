package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §2.12 — iterative graph computation.
  *
  * PageRank over the nation-level trade graph (supplier nation → customer
  * nation, edge weight = lineitem count), the DataFrame-loop shape GraphX's
  * Pregel uses underneath: a cached edge relation joined against a rank
  * relation that is re-materialized once per superstep. All arithmetic is
  * 64-bit integer (rank mass scaled by 1e9, damping 85/100, floor
  * division), so every iteration is bit-exact and order-independent —
  * reproducible across engines, partitionings, and retries, which
  * float-valued PageRank is not.
  *
  * Scale shape: edges shuffle once on src at build time and are cached;
  * each superstep is one broadcast of the rank table onto the edge
  * partitions plus one groupBy(dst) partial-aggregated shuffle of
  * per-partition contribution sums. With V nodes and E edges that is
  * O(E/p) work per partition per step and only |V|-bound rows through the
  * exchange; `localCheckpoint` truncates the lineage so step N never
  * replays steps 1..N-1 (the classic iterative-DataFrame trap). At 100 TB
  * the rank table outgrows the driver but never the executors — nothing
  * here collects to the driver.
  */
object Graph {

  /** Rank mass scale (1e9), damping 85%, 10 supersteps, |V|=25 nations. */
  private val Scale = 1000000000L
  private val Iters = 10

  private[graft] def pagerank(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val su = Tables.supplier(spark, sfDir)
    val or = Tables.orders(spark, sfDir)
    val cu = Tables.customer(spark, sfDir)
    val na = Tables.nation(spark, sfDir)

    // Edge list: supplier nation → customer nation, weighted by lineitem
    // count. Dimension sides broadcast; the only big shuffle is the
    // (src, dst) aggregation, output-bound at |V|².
    val edgesRaw = li
      .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(or, li("l_orderkey") === or("o_orderkey"))
      .join(broadcast(cu.select(col("c_custkey"), col("c_nationkey"))),
        or("o_custkey") === col("c_custkey"))
      .groupBy(su("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    val outdeg = edgesRaw.groupBy(col("src")).agg(sum(col("cnt")).as("out_cnt"))
    // Zero-weight self-loops keep every node present in each superstep's
    // aggregation (a node with no in-edges still emits its base rank);
    // GREATEST guards the dangling-src division (numerator is 0 there).
    val edges = edgesRaw.join(outdeg, "src")
      .select(col("src"), col("dst"), col("cnt"),
        greatest(col("out_cnt"), lit(1L)).as("out_cnt"))
      .unionByName(na.select(col("n_nationkey").as("src"),
        col("n_nationkey").as("dst"), lit(0L).as("cnt"), lit(1L).as("out_cnt")))
      .cache()

    val nNodes = 25L
    var ranks = na.select(col("n_nationkey").as("node"),
      lit(Scale / nNodes).as("rnk"))
    for (i <- 1 to Iters) {
      ranks = superstep(edges, ranks, nNodes)
      // localCheckpoint truncates lineage so superstep N never replays
      // 1..N-1 — but it is EAGER, and a checkpoint per step made the
      // 10-step loop 10 scheduled materializations (r8's most expensive
      // key, pure fixed cost at |V|=25 rows/step). Checkpointing every
      // OTHER step (always including the last) folds two supersteps into
      // each materialized job: replay depth stays bounded at 2, the
      // arithmetic is unchanged 64-bit integer work (bit-identical
      // output), and the fixed scheduling cost halves.
      if (i % 2 == 0 || i == Iters) ranks = ranks.localCheckpoint()
    }
    // the final ranks are already materialized (localCheckpoint is eager),
    // so the cached edges are dead — release them instead of accumulating
    // a fresh storage block per invocation for the session lifetime
    // (r8 advice; DetSpec alone runs this key 3×)
    edges.unpersist(blocking = false)
    ranks.orderBy(col("node"))
  }

  /** One PageRank superstep: broadcast the rank relation onto the cached
    * edges, floor-divide per edge, sum per destination. Exposed so the
    * plan-shape suite can pin the pre-checkpoint physical plan. */
  private[graft] def superstep(edges: DataFrame, ranks: DataFrame,
      nNodes: Long): DataFrame = {
    val base = Scale * 15L / 100L / nNodes // teleport mass per node
    edges
      .join(broadcast(ranks), edges("src") === col("node"))
      .groupBy(col("dst"))
      .agg(sum(expr("(rnk * 85 * cnt) div (100 * out_cnt)")).as("contrib"))
      .select(col("dst").as("node"), (lit(base) + col("contrib")).as("rnk"))
  }

  val queries: Seq[Q] = Seq(
    Q("graph_pagerank",
      (spark, sfDir) => pagerank(spark, sfDir),
      Some("""
        WITH RECURSIVE edges_raw AS (
          SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2),
        outdeg AS (
          SELECT src, SUM(cnt) AS out_cnt FROM edges_raw GROUP BY 1),
        edges AS (
          SELECT e.src, e.dst, e.cnt, GREATEST(d.out_cnt, 1) AS out_cnt
          FROM edges_raw e JOIN outdeg d ON e.src = d.src
          UNION ALL
          SELECT n_nationkey, n_nationkey, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
          FROM nation),
        pr AS (
          SELECT 0 AS iter, n_nationkey AS node, CAST(40000000 AS BIGINT) AS rnk
          FROM nation
          UNION ALL
          SELECT pr.iter + 1, e.dst,
                 6000000 + SUM((pr.rnk * 85 * e.cnt) // (100 * e.out_cnt))
          FROM pr JOIN edges e ON e.src = pr.node
          WHERE pr.iter < 10
          GROUP BY 1, 2)
        SELECT node, rnk FROM pr WHERE iter = 10 ORDER BY node""".trim)),

    // Per-node triangle participation over the undirected trade graph.
    // Edges are ORIENTED (a < b) before the two-hop join, so each triangle
    // materializes exactly once as (a < b < c) — the standard distributed
    // triangle-count trick that also caps join fanout (at real graph
    // scale the orientation is by degree, not id, bounding the hot node's
    // adjacency; by id suffices for the contract's semantics). Two
    // self-joins on the oriented edge list, both shuffle on a single int
    // key; the final explode + count is output-bound at |V|.
    Q("graph_triangles",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
        val su = Tables.supplier(spark, sfDir)
        val or = Tables.orders(spark, sfDir)
        val cu = Tables.customer(spark, sfDir)
        val und = li
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(or, li("l_orderkey") === or("o_orderkey"))
          .join(broadcast(cu.select(col("c_custkey"), col("c_nationkey"))),
            or("o_custkey") === col("c_custkey"))
          .select(least(su("s_nationkey"), col("c_nationkey")).as("a"),
            greatest(su("s_nationkey"), col("c_nationkey")).as("b"))
          .filter(col("a") < col("b"))
          .distinct()
        val e1 = und.select(col("a").as("t_a"), col("b").as("t_b"))
        val e2 = und.select(col("a").as("u_a"), col("b").as("u_b"))
        val e3 = und.select(col("a").as("v_a"), col("b").as("v_b"))
        val tri = e1
          .join(e2, col("u_a") === col("t_b"))
          .join(e3, col("v_a") === col("t_a") && col("v_b") === col("u_b"))
          .select(col("t_a").as("a"), col("t_b").as("b"), col("u_b").as("c"))
        tri.select(explode(array(col("a").cast("long"), col("b").cast("long"),
            col("c").cast("long"))).as("node"))
          .groupBy(col("node"))
          .agg(count(lit(1)).as("n_tri"))
          .orderBy(col("node"))
      },
      Some("""
        WITH dir_edges AS (
          SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey),
        und AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM dir_edges WHERE src <> dst),
        tri AS (
          SELECT e1.a AS a, e1.b AS b, e2.b AS c
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY node
        ORDER BY node""".trim)),

    // Cheapest ≤3-hop route (r9): single-source shortest path over the
    // weighted trade graph — edge cost = 1000000 div lineitem-count, so a
    // heavily-traded lane is cheap and a thin one expensive, and for 6 of
    // the 24 destinations a 2-hop route genuinely beats the direct edge
    // (the fixture trade graph is complete, which is why plain BFS would
    // be trivial here). Three Bellman-Ford relaxation rounds with
    // SIMULTANEOUS update: after round k, cost(v) is exactly the cheapest
    // walk from the source using ≤ k edges — the bounded-legs routing
    // semantic. All arithmetic is int64 floor-division (pagerank's
    // determinism policy), so every round is bit-exact.
    //
    // Scale shape: the same iterative-DataFrame Pregel loop as pagerank —
    // cached |V|²-bounded edges, per-round broadcast of the |V|-row cost
    // table, one output-bound groupBy(dst) shuffle per round,
    // localCheckpoint lineage truncation. The oracle is a DuckDB
    // recursive walk CTE (UNION-deduped on (node, cost, hops), so it
    // never enumerates the exponential path set).
    Q("graph_shortest_path",
      (spark, sfDir) => {
        val Inf = 1000000000000L
        val li = Tables.lineitem(spark, sfDir)
        val su = Tables.supplier(spark, sfDir)
        val or = Tables.orders(spark, sfDir)
        val cu = Tables.customer(spark, sfDir)
        val na = Tables.nation(spark, sfDir)
        val edges = li
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(or, li("l_orderkey") === or("o_orderkey"))
          .join(broadcast(cu.select(col("c_custkey"), col("c_nationkey"))),
            or("o_custkey") === col("c_custkey"))
          .filter(su("s_nationkey") =!= col("c_nationkey"))
          .groupBy(su("s_nationkey").as("src"), col("c_nationkey").as("dst"))
          .agg(expr("1000000 div count(*)").as("w"))
          .cache()
        // source = MIN(src) over the realized edges, not a hardcoded node —
        // at tiny scales most nations have no suppliers, so a fixed source
        // could have zero out-edges and the walk would degenerate (one
        // scalar to the driver; the oracle anchors on the same MIN)
        val src0 = edges.agg(min(col("src"))).head.getInt(0)
        var cost = na.select(col("n_nationkey").cast("long").as("node"),
          when(col("n_nationkey") === src0, 0L).otherwise(lit(Inf)).as("cost"))
        for (i <- 1 to 3) {
          val relaxed = edges
            .join(broadcast(cost.filter(col("cost") < Inf)),
              edges("src") === col("node"))
            .groupBy(col("dst"))
            .agg(min(col("cost") + col("w")).as("best"))
          cost = cost.join(relaxed, cost("node") === relaxed("dst"), "left")
            .select(cost("node"),
              least(col("cost"), coalesce(col("best"), lit(Inf))).as("cost"))
          if (i % 2 == 0 || i == 3) cost = cost.localCheckpoint()
        }
        edges.unpersist(blocking = false)
        cost.filter(col("cost") < Inf).orderBy(col("node"))
      },
      Some("""
        WITH RECURSIVE edges AS (
          SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                 1000000 // COUNT(*) AS w
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE s.s_nationkey <> c.c_nationkey
          GROUP BY 1, 2),
        walk AS (
          SELECT CAST(MIN(src) AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops
          FROM edges
          UNION
          SELECT e.dst, w.cost + e.w, w.hops + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.hops < 3)
        SELECT node, MIN(cost) AS cost
        FROM walk GROUP BY node ORDER BY node""".trim)),

    // Connected components (r11; large-star/small-star since r12): over
    // the co-purchase graph (parts sharing an order ≥2 times — the same
    // edge relation agg_copurchase_pairs mines) — the general-graph twin
    // of llm_dedup_components' dedup closure, here with a DuckDB
    // recursive-CTE oracle over a graph whose shape flips with scale
    // (sf0.01: a 1,860-node hairball among 9 components; sf0.1: 2,350
    // sparse components) so both the deep and the wide regime are
    // exercised. The closure runs [[Components]] — the star alternation
    // converges in O(log n) rounds instead of propagation's O(diameter)
    // (a path graph converges in ~log₂ length alternations; GraphSpec
    // pins this on a planted 64-node path), each round one groupBy-min +
    // one join, nothing data-sized at the driver.
    Q("graph_components",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
          .select(col("pa"), col("pb")).localCheckpoint()
        val nodes = pairs.select(col("pa").as("node"))
          .unionByName(pairs.select(col("pb").as("node"))).distinct()
        Components.run(nodes,
            pairs.select(col("pa").as("src"), col("pb").as("dst")))
          .orderBy(col("node"))
      },
      Some("""
        WITH RECURSIVE li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), pairs AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ), edges AS (
          SELECT pa AS s, pb AS d FROM pairs
          UNION ALL SELECT pb, pa FROM pairs
        ), nodes AS (SELECT DISTINCT s AS n FROM edges),
        walk(node, lbl) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.d, w.lbl FROM walk w JOIN edges e ON w.node = e.s
        )
        SELECT node, MIN(lbl) AS comp FROM walk
        GROUP BY node ORDER BY node""".trim)),

    // Link prediction by common neighbors (r11): over the co-purchase
    // graph (the components/copurchase edge relation), score every
    // NON-adjacent part pair by how many neighbors they share — the
    // classic common-neighbors recommender ("parts bought with both of
    // these") and the simplest link-prediction baseline. Shape: one
    // wedge self-join of the symmetric edge list on the CENTER node with
    // d1 < d2 so each wedge counts once, hash-agg per endpoint pair,
    // then an anti-join drops pairs that are already edges and the ≥2
    // threshold bounds the output. Cost is Σ_v C(deg(v),2) — at 100 TB
    // the standing hub guard applies (cap or sample a hot node's
    // adjacency before wedging; capping a hub only drops scores that
    // node inflates for everyone equally), same policy as the LSH
    // mega-bucket and copurchase mega-basket caps. The anti-join's
    // build side is the edge list itself — broadcastable exactly when
    // the wedge join was feasible at all.
    Q("graph_common_neighbors",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
          .select(col("pa"), col("pb"))
        val und = pairs.select(col("pa").as("s"), col("pb").as("d"))
          .unionByName(pairs.select(col("pb").as("s"), col("pa").as("d")))
        val wedges = und.as("e1").join(und.as("e2"),
            col("e1.s") === col("e2.s") && col("e1.d") < col("e2.d"))
          .groupBy(col("e1.d").as("a"), col("e2.d").as("b"))
          .agg(count(lit(1)).as("cn"))
        wedges
          .join(pairs, wedges("a") === pairs("pa") && wedges("b") === pairs("pb"),
            "left_anti")
          .filter(col("cn") >= 2)
          .orderBy(col("cn").desc, col("a"), col("b"))
      },
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        und AS (
          SELECT pa AS s, pb AS d FROM pairs
          UNION ALL SELECT pb, pa FROM pairs),
        wedges AS (
          SELECT e1.d AS a, e2.d AS b, COUNT(*) AS cn
          FROM und e1 JOIN und e2 ON e1.s = e2.s AND e1.d < e2.d
          GROUP BY 1, 2)
        SELECT w.a, w.b, w.cn
        FROM wedges w
        WHERE w.cn >= 2
          AND NOT EXISTS (SELECT 1 FROM pairs p
                          WHERE p.pa = w.a AND p.pb = w.b)
        ORDER BY w.cn DESC, w.a, w.b""".trim)),

    // Degree profile (r9): per-node in/out degree (distinct counterparts)
    // and weighted in/out strength over the same nation trade graph the
    // iterative keys walk — the first diagnostic every graph pipeline
    // computes (hub detection, dangling nodes, degree skew that decides
    // the partitioning strategy for pagerank itself). The edge build is
    // pagerank's: dimensions broadcast, ONE (src,dst) aggregation, and
    // the per-node profile is two tiny aggregations of the 625-row edge
    // relation full-outer-merged over the 25-nation spine — at 100 TB
    // the edge agg dominates and the profile stays |V|-bound.
    Q("graph_degree",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
        val su = Tables.supplier(spark, sfDir)
        val or = Tables.orders(spark, sfDir)
        val cu = Tables.customer(spark, sfDir)
        val na = Tables.nation(spark, sfDir)
        val edges = li
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(or, li("l_orderkey") === or("o_orderkey"))
          .join(broadcast(cu.select(col("c_custkey"), col("c_nationkey"))),
            or("o_custkey") === col("c_custkey"))
          .groupBy(su("s_nationkey").as("src"), col("c_nationkey").as("dst"))
          .agg(count(lit(1)).as("cnt"))
        val outp = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("out_deg"), sum(col("cnt")).as("out_wt"))
        val inp = edges.groupBy(col("dst").as("node"))
          .agg(count(lit(1)).as("in_deg"), sum(col("cnt")).as("in_wt"))
        na.select(col("n_nationkey").as("node"))
          .join(outp, Seq("node"), "left")
          .join(inp, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("out_deg"), lit(0L)).as("out_deg"),
            coalesce(col("out_wt"), lit(0L)).as("out_wt"),
            coalesce(col("in_deg"), lit(0L)).as("in_deg"),
            coalesce(col("in_wt"), lit(0L)).as("in_wt"))
          .orderBy(col("node"))
      },
      Some("""
        WITH e AS (
          SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                 COUNT(*) AS cnt
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2),
        outp AS (
          SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_deg,
                 CAST(SUM(cnt) AS BIGINT) AS out_wt
          FROM e GROUP BY src),
        inp AS (
          SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_deg,
                 CAST(SUM(cnt) AS BIGINT) AS in_wt
          FROM e GROUP BY dst)
        SELECT n.n_nationkey AS node,
               COALESCE(o.out_deg, 0) AS out_deg,
               COALESCE(o.out_wt, 0) AS out_wt,
               COALESCE(i.in_deg, 0) AS in_deg,
               COALESCE(i.in_wt, 0) AS in_wt
        FROM nation n
        LEFT JOIN outp o ON o.node = n.n_nationkey
        LEFT JOIN inp i ON i.node = n.n_nationkey
        ORDER BY node""".trim)),

    // Coreness decomposition (r12): every node's core number over the
    // co-purchase graph — the maximal k such that the node survives in
    // the k-core (the dense-community primitive: spam-ring and power-user
    // detection in the reference's domain). Level-by-level peeling: for
    // k = 2, 3, … iteratively remove degree<k nodes until fixpoint; a
    // node dropped while peeling to the k-core has coreness k−1. Each
    // peel round is one degree aggregate + two anti-joins against the
    // small shrinking weak set (AQE broadcasts it); total rounds are
    // bounded by Σ per-level peel depths, lineage checkpointed per round.
    // At 100 TB the bin-bucketed distributed algorithm (process nodes in
    // degree order per bucket) replaces the level loop without changing
    // the per-round plan shape. Iterated deletion is not
    // monotone-recursive SQL → oracle omitted per SURVEY §2's rule;
    // GraphSpec pins equality against a driver-side peeling recount plus
    // the k-core degree invariant.
    Q("graph_kcore",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
          .select(col("pa"), col("pb"))
        var e = pairs.select(col("pa").as("s"), col("pb").as("d"))
          .unionByName(pairs.select(col("pb").as("s"), col("pa").as("d")))
          .localCheckpoint()
        // per-round dropped-node frames accumulate driver-side and union
        // once at the end (each round's frame reads only that round's
        // CHECKPOINTED before/after edge sets, so the deferred union
        // replays nothing) — the r20 predecessor eagerly checkpointed the
        // growing union every peel level
        val labelParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        var k = 2
        var edgeCount = e.count()
        while (edgeCount > 0 && k < 64) {
          // peel to the k-core; nodes dropped on the way have coreness k-1.
          // The weak set is checkpointed ONCE per round — its count, and
          // both anti-join probes, reuse the same materialized rows
          // instead of re-running the degree aggregate three times.
          val before = e.select(col("s").as("node")).distinct()
          var weakCount = 1L
          while (weakCount > 0) {
            val weak = e.groupBy(col("s")).agg(count(lit(1)).as("deg"))
              .filter(col("deg") < k).select(col("s").as("w"))
              .localCheckpoint()
            weakCount = weak.count()
            if (weakCount > 0) {
              e = e.join(weak, e("s") === weak("w"), "left_anti")
              e = e.join(weak, e("d") === weak("w"), "left_anti")
                .localCheckpoint()
            }
          }
          // dropped = before − after; weak sets alone would miss a node
          // whose every edge vanished with its removed neighbors
          val after = e.select(col("s").as("node")).distinct()
          labelParts += before.join(after, Seq("node"), "left_anti")
            .withColumn("coreness", lit(k - 1))
          edgeCount = e.count()
          k += 1
        }
        require(edgeCount == 0, s"graph_kcore: max coreness exceeds $k")
        val empty = pairs.sparkSession.range(0)
          .select(col("id").as("node"), lit(0).as("coreness")).limit(0)
        labelParts.foldLeft(empty)(_ unionByName _).orderBy(col("node"))
      },
      None),

    // Incremental connected components (r12): the DAILY graph operation —
    // yesterday's components are a star forest (each node → its
    // component's min), so today's batch only needs the alternation run
    // on STAR ∪ DELTA, a graph whose old regions already have diameter 1
    // (the llm_dedup_incremental argument in graph space: per-day cost
    // is O(star + delta), never a full re-closure). Correctness is
    // EXACT, not approximate: min labels survive star contraction, so
    // the merged run must equal the full-graph closure bit-for-bit —
    // the oracle is the SAME recursive CTE over the full edge set as
    // graph_components. Base/delta split: basket pairs from orders
    // o_orderkey % 10 == 0 arrive as the delta.
    Q("graph_components_incremental",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"),
            (col("a.l_orderkey") % 10 === 0).as("is_delta"))
          .agg(count(lit(1)).as("c"))
        // the >= 2 support threshold is a property of the FULL pair
        // multiset — apply it on the (pa, pb) rollup, then split edges
        // by whether any contributing basket is in the delta
        val strong = pairs.groupBy(col("pa"), col("pb"))
          .agg(sum(col("c")).as("c"), max(col("is_delta")).as("has_delta"))
          .filter(col("c") >= 2).localCheckpoint()
        val base = strong.filter(!col("has_delta"))
          .select(col("pa").as("src"), col("pb").as("dst"))
        val delta = strong.filter(col("has_delta"))
          .select(col("pa").as("src"), col("pb").as("dst"))
        val baseNodes = base.select(col("src").as("node"))
          .unionByName(base.select(col("dst").as("node"))).distinct()
        // yesterday: full run on the base; keep only the star forest
        val labels0 = Components.run(baseNodes, base).localCheckpoint()
        val star = labels0.filter(col("node") =!= col("comp"))
          .select(col("node").as("src"), col("comp").as("dst"))
        // today: alternation on star ∪ delta only
        val nodes = strong.select(col("pa").as("node"))
          .unionByName(strong.select(col("pb").as("node"))).distinct()
        Components.run(nodes, star.unionByName(delta))
          .orderBy(col("node"))
      },
      Some("""
        WITH RECURSIVE li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), pairs AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ), edges AS (
          SELECT pa AS s, pb AS d FROM pairs
          UNION ALL SELECT pb, pa FROM pairs
        ), nodes AS (SELECT DISTINCT s AS n FROM edges),
        walk(node, lbl) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.d, w.lbl FROM walk w JOIN edges e ON w.node = e.s
        )
        SELECT node, MIN(lbl) AS comp FROM walk
        GROUP BY node ORDER BY node""".trim)),

    // Minimum spanning forest (r12): Borůvka's algorithm — the MST
    // algorithm that is NATURALLY distributed (Kruskal needs a global
    // sorted edge stream, Prim a frontier): each round EVERY component
    // picks its minimum outgoing edge simultaneously, components merge
    // along the picks, and the component count at least halves →
    // O(log n) rounds of two joins + one min-by aggregate. Edge weights
    // (basket co-support) are tie-broken by (weight, pa, pb) — a strict
    // total order, so the MSF is UNIQUE and the output reproducible
    // under any partitioning. Labels between rounds come from
    // Components.run on the forest-so-far (itself O(log) — the
    // star-alternation reused as a subroutine). GraphSpec pins equality
    // with a driver-side Kruskal union-find, the |V|−|components| edge
    // count, and the weight total. Oracle omitted per SURVEY §2's rule
    // (MST is not monotone-recursive SQL). The MSF is the backbone of
    // single-linkage clustering — cut its heaviest edges and you have
    // the dendrogram the dedup family's cluster step wants.
    Q("graph_mst",
      (spark, sfDir) => {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val edges = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
          .localCheckpoint()
        val nodes = edges.select(col("pa").as("node"))
          .unionByName(edges.select(col("pb").as("node"))).distinct()
          .localCheckpoint()
        // picked edges accumulate in a driver-side list of (checkpointed)
        // per-round frames, unioned once at the end — the r20 predecessor
        // checkpointed the GROWING forest union every round, an extra
        // eager materialization per round that nothing read until the end
        val forestParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        var labels = nodes.withColumn("comp", col("node")).localCheckpoint()
        // crossing-CANDIDATE edges, shrinking monotonically (r20, opt guide
        // §2.3): an edge whose endpoints share a component can never cross
        // again (labels only coarsen), so each round re-tags only the
        // PREVIOUS round's crossing set instead of the full edge set — the
        // per-round joins shuffle strictly fewer bytes as components merge.
        // Fixpoint identical; e2 is already checkpointed, so the carried
        // projection replays nothing.
        var live = edges
        var rounds = 0
        var crossing = 1L
        while (crossing > 0 && rounds < 20) {
          val la = labels.select(col("node").as("pa"), col("comp").as("ca"))
          val lb = labels.select(col("node").as("pb"), col("comp").as("cb"))
          val e2 = live.join(la, "pa").join(lb, "pb")
            .filter(col("ca") =!= col("cb")).localCheckpoint()
          crossing = e2.count()
          if (crossing > 0) {
            live = e2.select(col("pa"), col("pb"), col("c"))
            val tagged = e2.select(col("ca").as("comp"),
                struct(col("c"), col("pa"), col("pb"),
                  col("ca"), col("cb")).as("e"))
              .unionByName(e2.select(col("cb").as("comp"),
                struct(col("c"), col("pa"), col("pb"),
                  col("ca"), col("cb")).as("e")))
            val picked = tagged.groupBy(col("comp")).agg(min(col("e")).as("e"))
              .select(col("e.pa").as("pa"), col("e.pb").as("pb"),
                col("e.c").as("c"), col("e.ca").as("ca"), col("e.cb").as("cb"))
              .distinct().localCheckpoint()
            forestParts += picked.select("pa", "pb", "c")
            // relabel on the COMPONENT-level graph (|comps| nodes,
            // geometrically shrinking) — never re-close the full forest
            val compNodes = labels.select(col("comp").as("node")).distinct()
            val merged = Components.run(compNodes,
              picked.select(col("ca").as("src"), col("cb").as("dst")))
            labels = labels.join(merged.select(col("node").as("comp"),
                col("comp").as("newc")), Seq("comp"))
              .select(col("node"), col("newc").as("comp"))
              .localCheckpoint()
            rounds += 1
          }
        }
        require(crossing == 0, s"graph_mst: no fixpoint in $rounds rounds")
        val forest = forestParts.foldLeft(edges.limit(0).select("pa", "pb", "c"))(
          _ unionByName _)
        forest.orderBy(col("pa"), col("pb"))
      },
      None),
  )
}
