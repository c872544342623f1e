package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components by large-star/small-star alternation
  * (the MapReduce CC algorithm of Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — replacing min-label propagation's
  * O(diameter) rounds with O(log n) (r11 verdict item 2: a 100 TB graph
  * with one long chain pays diameter × (shuffle + checkpoint) under
  * propagation; the star operations contract chains exponentially).
  *
  * Edge set maintained CANONICAL (u > v, deduped). Each round:
  *
  *  - **large-star**: per node u over the SYMMETRIC neighborhood, connect
  *    every strictly-larger neighbor to m = min(N(u) ∪ {u}). Emitted
  *    (v, m) keeps v > m, so the output is canonical by construction.
  *  - **small-star**: per node u over canonical edges (all neighbors
  *    < u), connect u and every neighbor to m = min(N(u)). Again (x, m)
  *    with x > m — canonical.
  *
  * Both steps are one groupBy-min plus one join per round — the same
  * shuffle shape per round as propagation, but the round COUNT drops from
  * diameter to O(log n): each alternation at least halves the height of
  * any component's dependency tree (the paper's potential argument). At
  * the fixpoint the edge set is a star forest centered on each
  * component's minimum node, so labels read directly off the edges.
  *
  * Convergence detection: the canonical edge multiset is monotone under
  * the potential (Σ labels strictly decreases while anything changes), so
  * two consecutive identical (count, Σu, Σv) signatures ⟺ fixpoint — one
  * 3-scalar aggregate per round, no diff join. `localCheckpoint` per
  * round truncates lineage (the pagerank policy). Nothing data-sized
  * reaches the driver.
  */
object Components {

  /** One large-star + small-star alternation over a CANONICAL edge set
    * (u > v, deduped) — the loop body of [[runWithRounds]], exposed so the
    * plan-witness dump (plans/r20/cc_star_round_after.txt) explains exactly
    * the expression the fixpoint loop runs. Each star step is "per-hub min
    * attached back to every edge of the hub" — a WINDOW min over the hub
    * partition the edge set shuffles once per step, where the
    * groupBy-min-rejoin form shuffled it twice (once under the aggregate,
    * once under the join, non-reusable because the partial-agg subtree
    * differs). Skew behavior is unchanged — the join, too, had to
    * co-locate all of a hub's edges in one partition. No intermediate
    * dedup either: small-star min is duplicate-insensitive and the
    * round's closing distinct canonicalizes the output. */
  def round(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val ls = sym
      .withColumn("m", least(col("u"),
        min(col("v")).over(Window.partitionBy(col("u")))))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
    // small-star over canonical ls (every neighbor of u is < u)
    val ssm = ls.withColumn("m",
      min(col("v")).over(Window.partitionBy(col("u"))))
    ssm.select(col("v").as("u"), col("m").as("v"))
      .unionByName(ssm.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Labels for `nodes` ("node") given undirected `edges` ("src","dst"):
    * returns (node, comp) where comp = the component's minimum node id;
    * isolated nodes label themselves. Also returns the round count (the
    * O(log n) pin in GraphSpec). */
  def runWithRounds(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 30): (DataFrame, Int) = {
    var e = edges.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .distinct().localCheckpoint()
    def signature(d: DataFrame): (Long, Long, Long) = {
      val r = d.agg(count(lit(1)), coalesce(sum(col("u")), lit(0L)),
        coalesce(sum(col("v")), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var sig = signature(e)
    var rounds = 0
    var converged = sig._1 == 0L
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val ss = round(e).localCheckpoint()
      val next = signature(ss)
      // signature equality is the cheap per-round test; confirm the actual
      // fixpoint with ONE exact set compare when it fires (paid once):
      // both sides are distinct sets and the signatures carry their
      // counts, so equal counts + ss ⊆ e ⟺ set equality — the reverse
      // except was a second full-shuffle job proving nothing extra (r20)
      converged = next == sig && ss.except(e).isEmpty
      sig = next
      e = ss
    }
    require(converged, s"Components: no fixpoint in $maxRounds rounds")
    val labels = e.select(col("u").as("node"), col("v").as("comp"))
    val out = nodes.join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
    (out, rounds)
  }

  def run(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 30): DataFrame =
    runWithRounds(nodes, edges, maxRounds)._1
}
