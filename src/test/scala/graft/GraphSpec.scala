package graft

import org.apache.spark.sql.functions._

/** The r8 graph / pattern / bitmap keys, each pinned against an
  * independent driver-side exact recount (integer arithmetic throughout,
  * so equality is bit-exact, not approximate).
  */
class GraphSpec extends SparkFixture {

  test("graph_pagerank equals a driver-side integer recompute on the same edges") {
    val got = SparkEntry.queries("graph_pagerank")(spark, sf001)
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap

    // independent recount: collect the raw edge counts, run the same
    // integer recurrence in plain Scala maps
    val li = Tables.lineitem(spark, sf001)
    val su = Tables.supplier(spark, sf001).select("s_suppkey", "s_nationkey")
    val or = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
    val cu = Tables.customer(spark, sf001).select("c_custkey", "c_nationkey")
    val edges = li.join(su, li("l_suppkey") === su("s_suppkey"))
      .join(or, li("l_orderkey") === or("o_orderkey"))
      .join(cu, or("o_custkey") === cu("c_custkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2)))
    val nodes = Tables.nation(spark, sf001)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0))
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap

    var rnk = nodes.map(_ -> 40000000L).toMap
    for (_ <- 1 to 10) {
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, c) =>
        rnk(s) * 85L * c / (100L * out.getOrElse(s, 1L).max(1L))
      }.sum).toMap
      rnk = nodes.map(n => n -> (6000000L + contrib.getOrElse(n, 0L))).toMap
    }
    assert(got == rnk, s"spark=$got expected=$rnk")
    // mass is bounded above by the full scale (floor division and dangling
    // nodes only ever DROP mass) and below by the pure teleport floor
    // (25 × base) — at sf0.001 most nations have no suppliers, so the
    // dangling leak is large by construction
    val total = got.values.sum
    assert(total <= 1000000000L && total >= 25L * 6000000L, s"mass=$total")
  }

  test("window_pattern finds exactly the contiguous view→click→purchase triples") {
    val got = SparkEntry.queries("window_pattern")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val evs = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), col("ts").cast("long"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).toSeq
      sorted.sliding(3).collect {
        case Seq(a, b, c)
            if a._4 == "view" && b._4 == "click" && c._4 == "purchase" =>
          (u, a._2, b._2, c._2)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected, s"got ${got.length}, expected ${expected.length}")
  }

  test("agg_bitmap_distinct equals exact countDistinct per (day, type)") {
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf001)
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val exact = Tables.events(spark, sf001)
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got == exact)
    assert(got.nonEmpty)
  }

  test("agg_bitmap_overlap equals an exact distinct-user day-pair recount") {
    val got = SparkEntry.queries("agg_bitmap_overlap")(spark, sf001)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val daily = Tables.events(spark, sf001)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .collect().map(r => r.getDate(0).toString -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = daily.flatMap { case (d, users) =>
      val nxt = java.time.LocalDate.parse(d).plusDays(1).toString
      daily.get(nxt).map(u2 => d -> (users & u2).size.toLong)
        .filter(_._2 > 0)
    }
    assert(got == expected, s"got=${got.size} expected=${expected.size}")
  }

  test("graph_triangles equals a driver-side set recount, each triangle once") {
    val got = SparkEntry.queries("graph_triangles")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val li = Tables.lineitem(spark, sf001)
    val su = Tables.supplier(spark, sf001).select("s_suppkey", "s_nationkey")
    val or = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
    val cu = Tables.customer(spark, sf001).select("c_custkey", "c_nationkey")
    val und = li.join(su, li("l_suppkey") === su("s_suppkey"))
      .join(or, li("l_orderkey") === or("o_orderkey"))
      .join(cu, or("o_custkey") === cu("c_custkey"))
      .select(col("s_nationkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (s, c) if s != c => (s.min(c), s.max(c)) }.toSet
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triangles = for {
      (a, b) <- und.toSeq
      c <- adj.getOrElse(b, Set.empty) if und.contains((a, c))
    } yield (a, b, c)
    val expected = triangles.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected,
      s"got ${got.values.sum / 3} triangles, expected ${triangles.size}")
  }

  test("join_range_binned equals a driver-side per-order range recount") {
    val got = SparkEntry.queries("join_range_binned")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ships = Tables.lineitem(spark, sf001)
      .select(unix_micros(col("l_shipdate"))).collect().map(_.getLong(0)).sorted
    val week = 7L * 86400L * 1000000L
    val orders = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // recount per order: ships in [d, d+7d) over the sorted array
    val expected = orders.map { case (k, d) =>
      k -> (ships.count(_ < d + week) - ships.count(_ < d)).toLong
    }.toMap
    assert(got == expected)
  }

  test("window_islands equals a driver-side run-length recount") {
    val got = SparkEntry.queries("window_islands")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val evs = Tables.events(spark, sf001)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4).toList
      // run-length encode, take max run per type
      val runs = types.foldLeft(List.empty[(String, Long)]) {
        case ((t, n) :: rest, ty) if t == ty => (t, n + 1) :: rest
        case (acc, ty) => (ty, 1L) :: acc
      }
      runs.groupBy(_._1).map { case (t, rs) => (u, t) -> rs.map(_._2).max }
    }.toMap
    assert(got == expected)
  }

  test("graph_shortest_path equals a driver-side bounded Bellman-Ford recount") {
    val got = SparkEntry.queries("graph_shortest_path")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent recount: rebuild the weighted edges, relax 3 rounds in
    // plain Scala — same simultaneous-update semantics, same int64 math
    val li = Tables.lineitem(spark, sf001)
    val su = Tables.supplier(spark, sf001).select("s_suppkey", "s_nationkey")
    val or = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
    val cu = Tables.customer(spark, sf001).select("c_custkey", "c_nationkey")
    val edges = li.join(su, li("l_suppkey") === su("s_suppkey"))
      .join(or, li("l_orderkey") === or("o_orderkey"))
      .join(cu, or("o_custkey") === cu("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong, 1000000L / r.getLong(2)))
    val nodes = Tables.nation(spark, sf001)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0))

    val Inf = 1000000000000L
    val src0 = edges.map(_._1).min
    var cost = nodes.map(n => n -> (if (n == src0) 0L else Inf)).toMap
    for (_ <- 1 to 3) {
      val relaxed = edges.filter(e => cost(e._1) < Inf)
        .groupBy(_._2).view.mapValues(_.map(e => cost(e._1) + e._3).min).toMap
      cost = nodes.map(n => n -> math.min(cost(n), relaxed.getOrElse(n, Inf))).toMap
    }
    val expected = cost.filter(_._2 < Inf)
    assert(got == expected, s"spark=$got expected=$expected")

    // the fixture graph makes the relaxation non-trivial: the 3-round
    // answer must differ from plain 1-hop relaxation (either a cheaper
    // multi-leg route, or a destination only reachable in 2+ legs) —
    // otherwise the key degenerates to a single join
    val direct = edges.collect { case (`src0`, d, w) => d -> w }.toMap
    val oneHop = (Map(src0 -> 0L) ++ direct).filter(_._2 < Inf)
    assert(expected != oneHop,
      "3-round relaxation equals 1-hop — fixture degenerated to a single join")
  }

  test("graph_components: labels are a valid fixed point and equal a driver-side union-find") {
    val rows = SparkEntry.queries("graph_components")(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    // rebuild the same edge relation and union-find it independently
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey"), col("b.l_partkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    assert(rows == expected, "component labels diverge from union-find")
    // label semantics: every component's label is its minimum member
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min == comp,
        s"component $comp is not labeled by its min member")
    }
    // fixed point: both edge endpoints always share a component
    edges.foreach { case (a, b) =>
      assert(rows(a) == rows(b), s"edge ($a,$b) straddles components")
    }
  }

  test("graph_kcore: coreness equals a driver-side peeling recount and satisfies the core invariant") {
    val rows = SparkEntry.queries("graph_kcore")(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    // rebuild the same edge relation, peel on the driver
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey"), col("b.l_partkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val expected = scala.collection.mutable.Map.empty[Long, Int]
    var k = 2
    while (adj.nonEmpty && k < 64) {
      var changed = true
      while (changed) {
        val weak = adj.collect { case (n, nb) if nb.size < k => n }.toSeq
        changed = weak.nonEmpty
        weak.foreach { n =>
          expected(n) = k - 1
          adj.remove(n).foreach(_.foreach(m => adj.get(m).foreach(_ -= n)))
        }
      }
      k += 1
    }
    assert(rows == expected.toMap, "coreness diverges from driver peeling")
    // invariant: within the k-core induced subgraph, every member has >= k
    // neighbors that are also members (spot-check the max level)
    val kMax = rows.values.max
    val core = rows.filter(_._2 == kMax).keySet
    val adj2 = scala.collection.mutable.Map.empty[Long, Set[Long]]
    edges.foreach { case (a, b) =>
      if (core(a) && core(b)) {
        adj2(a) = adj2.getOrElse(a, Set.empty) + b
        adj2(b) = adj2.getOrElse(b, Set.empty) + a
      }
    }
    core.foreach { n =>
      assert(adj2.getOrElse(n, Set.empty).size >= kMax,
        s"node $n in the $kMax-core has degree ${adj2.getOrElse(n, Set.empty).size}")
    }
  }

  test("Components: a planted 64-node path converges in O(log n) rounds, not O(diameter)") {
    // path 0–1–…–63: min-label propagation needs 63 rounds (one hop per
    // round); the large-star/small-star alternation must close it in
    // ~log₂ 64 alternations — the r12 replacement's reason to exist
    val spark0 = spark
    import spark0.implicits._
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (0L to 63L).toDF("node")
    val (labels, rounds) = graft.ops.Components.runWithRounds(nodes, edges)
    assert(rounds <= 10, s"star alternation took $rounds rounds on a 64-path")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 63L).map(_ -> 0L).toMap, "path did not collapse to component 0")
    // isolated nodes label themselves; two components stay separate
    val e2 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val n2 = (Seq(1L, 2L, 3L, 10L, 11L, 99L)).toDF("node")
    val got2 = graft.ops.Components.run(n2, e2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("graph_mst equals the driver Kruskal forest under the (weight, pa, pb) total order") {
    val out = SparkEntry.queries("graph_mst")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey"), col("b.l_partkey")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Kruskal with union-find over the same strict total order: both
    // algorithms optimize the lexicographic (c, pa, pb) weights, which
    // are DISTINCT, so the forest is unique and must match exactly
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val mst = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((pa, pb, c) <- edges.sortBy(e => (e._3, e._1, e._2))) {
      val (ra, rb) = (find(pa), find(pb))
      if (ra != rb) { parent(ra) = rb; mst += ((pa, pb, c)) }
    }
    assert(out == mst.toSet, "Boruvka forest diverges from Kruskal")
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val nComps = nodes.map(find).size
    assert(out.size == nodes.size - nComps,
      s"forest size ${out.size} != |V| ${nodes.size} - components $nComps")
    assert(out.toSeq.map(_._3).sum == mst.toSeq.map(_._3).sum)
  }
}
