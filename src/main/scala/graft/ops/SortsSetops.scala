package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2.6–2.7 — sorts, limits, top-k, set operations.
  *
  * `sort_limit_topk` must plan as `TakeOrderedAndProject` (per-partition
  * top-k + merge of k·partitions rows — no global sort, no full shuffle);
  * asserted by a plan-shape test. `sort_global` is the real
  * range-partitioned exchange + per-partition sort. Set ops are
  * shuffle-on-all-columns; at scale prefer keyed EXCEPT/INTERSECT via
  * semi/anti joins when only a key column matters — both shapes covered
  * here and in JoinsSpec.
  */
object SortsSetops {

  /** Appends `hd` = Hilbert position of (`hx`, `hy`) on a 256×256 grid —
    * the standard xy2d walk as 8 unrolled rotation rounds of pure integer
    * CASE/bit arithmetic (whole-stage-codegen'd; no UDF). Consumes the
    * `hx`/`hy` columns as scratch (callers snapshot them first). Shared by
    * the `sort_hilbert` key and the OperatorSpec bijectivity/adjacency
    * pins so the tested walk IS the shipped walk.
    */
  private[graft] def hilbertWalk(in: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    var df = in.withColumn("hd", lit(0L))
    for (s <- Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)) {
      df = df
        .withColumn("rx", when(col("hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("ry", when(col("hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("hd", col("hd") +
          lit(s * s) * (col("rx") * 3).bitwiseXOR(col("ry")))
        .withColumn("nx", when(col("ry") === 1, col("hx"))
          .otherwise(when(col("rx") === 1, lit(s - 1) - col("hy"))
            .otherwise(col("hy"))))
        .withColumn("ny", when(col("ry") === 1, col("hy"))
          .otherwise(when(col("rx") === 1, lit(s - 1) - col("hx"))
            .otherwise(col("hx"))))
        .withColumn("hx", col("nx")).withColumn("hy", col("ny"))
    }
    df.drop("rx", "ry", "nx", "ny")
  }

  val queries: Seq[Q] = Seq(

    // Global top-100 without a global sort.
    Q("sort_limit_topk",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""".trim)),

    // Full multi-column sort (range-partition exchange); LIMIT bounds the
    // oracle output, large enough to exercise the sort across partitions.
    {
      // SQL-routed key (r12): one dialect-shared text drives both engines
      // (pure-SQL entry path, ops/SqlEntry.scala).
      val text = """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        ORDER BY l_quantity DESC, l_returnflag, l_orderkey, l_linenumber
        LIMIT 2000""".trim
      Q("sort_global",
        (spark, sfDir) => SqlEntry.sql(spark, sfDir, text),
        Some(text))
    },

    // Z-order layout key (r8): Morton-interleave the low 16 bits of
    // (o_custkey, order epoch-day) and order by the result — the
    // multi-dimensional clustering layout (Delta/Iceberg OPTIMIZE ZORDER)
    // that makes parquet min-max skipping effective on BOTH dimensions at
    // once, where a lexicographic (custkey, day) sort only prunes the
    // leading one. Pure int64 bit arithmetic (mask-spread via the
    // standard magic constants, identical in Spark and DuckDB) — exactly
    // deterministic, no float policy needed. The sort is the normal
    // range-partitioned exchange; at 100 TB the write path becomes
    // `repartitionByRange(zkey).sortWithinPartitions(zkey)` so each
    // output file covers a small rectangle in (custkey, day) space and a
    // predicate on EITHER column prunes most row groups (SortsSpec pins
    // the interleave bit-exactness and the rectangle-locality property).
    Q("sort_zorder",
      (spark, sfDir) => {
        def spread(c: Column): Column = {
          val m1 = c.bitwiseAND(lit(65535L))
          val m2 = (m1.bitwiseOR(shiftleft(m1, 8))).bitwiseAND(lit(16711935L))
          val m3 = (m2.bitwiseOR(shiftleft(m2, 4))).bitwiseAND(lit(252645135L))
          val m4 = (m3.bitwiseOR(shiftleft(m3, 2))).bitwiseAND(lit(858993459L))
          (m4.bitwiseOR(shiftleft(m4, 1))).bitwiseAND(lit(1431655765L))
        }
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"),
            unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
          .withColumn("zkey",
            spread(col("o_custkey")).bitwiseOR(shiftleft(spread(col("day")), 1)))
          .orderBy(col("zkey"), col("o_orderkey"))
      },
      Some("""
        WITH z0 AS (
          SELECT o_orderkey, o_custkey,
            CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
            o_custkey & 65535 AS cx,
            CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) & 65535 AS cy
          FROM orders),
        z1 AS (SELECT * REPLACE ((cx | (cx << 8)) & 16711935 AS cx, (cy | (cy << 8)) & 16711935 AS cy) FROM z0),
        z2 AS (SELECT * REPLACE ((cx | (cx << 4)) & 252645135 AS cx, (cy | (cy << 4)) & 252645135 AS cy) FROM z1),
        z3 AS (SELECT * REPLACE ((cx | (cx << 2)) & 858993459 AS cx, (cy | (cy << 2)) & 858993459 AS cy) FROM z2),
        z4 AS (SELECT * REPLACE ((cx | (cx << 1)) & 1431655765 AS cx, (cy | (cy << 1)) & 1431655765 AS cy) FROM z3)
        SELECT o_orderkey, o_custkey, day, cx | (cy << 1) AS zkey
        FROM z4
        ORDER BY zkey, o_orderkey""".trim)),

    // Hilbert-curve layout (r11): the locality-preserving twin of
    // sort_zorder — Iceberg's hilbert sort order. On a 256×256 grid of
    // (customer bucket, day bucket), consecutive Hilbert positions are
    // ALWAYS grid neighbors (Z-order jumps at every power-of-two seam),
    // so range-partitioning by hkey gives each file a tighter bounding
    // box in BOTH dimensions → sharper min/max zone maps for 2-D
    // predicates at 100 TB. The xy2d walk is 8 unrolled rounds of pure
    // integer CASE/bit arithmetic, generated from ONE Scala loop on the
    // Spark side and the textually-mirrored CTE chain in the oracle —
    // every round's (x, y, d) update reads only the PREVIOUS round's
    // values, so both engines compute the identical permutation.
    Q("sort_hilbert",
      (spark, sfDir) => {
        val base = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"),
            unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
          .withColumn("hx", pmod(col("o_custkey"), lit(256L)))
          .withColumn("hy", pmod(col("day"), lit(256L)))
          .withColumn("x0", col("hx")).withColumn("y0", col("hy"))
        hilbertWalk(base)
          .select(col("o_orderkey"), col("x0").as("hx"), col("y0").as("hy"),
            col("hd").as("hkey"))
          .orderBy(col("hkey"), col("o_orderkey"))
      },
      Some {
        val rounds = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex.map {
          case (s, i) =>
            s"""h${i + 1} AS (SELECT * REPLACE (
               |  hd + ${s * s} * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
               |                      CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END) AS hd,
               |  CASE WHEN (hy & $s) > 0 THEN hx
               |       WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END AS hx,
               |  CASE WHEN (hy & $s) > 0 THEN hy
               |       WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END AS hy
               |) FROM h$i)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH h0 AS (
          SELECT o_orderkey,
            o_custkey % 256 AS hx,
            CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) % 256 AS hy,
            o_custkey % 256 AS x0,
            CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) % 256 AS y0,
            CAST(0 AS BIGINT) AS hd
          FROM orders),
        $rounds
        SELECT o_orderkey, x0 AS hx, y0 AS hy, hd AS hkey
        FROM h8
        ORDER BY hkey, o_orderkey""".trim
      }),

    // Bag union (duplicates preserved) — ordered by key; duplicate rows are
    // identical so the order is total for comparison purposes.
    {
      // SQL-routed key (r12): one dialect-shared text drives both engines
      // (pure-SQL entry path, ops/SqlEntry.scala).
      val text = """
        SELECT o_custkey AS custkey FROM orders
        UNION ALL
        SELECT c_custkey AS custkey FROM customer
        ORDER BY custkey""".trim
      Q("setop_union_all",
        (spark, sfDir) => SqlEntry.sql(spark, sfDir, text),
        Some(text))
    },

    // Set intersection (distinct): custkeys that placed orders.
    Q("setop_intersect",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
        val c = Tables.customer(spark, sfDir).select(col("c_custkey").as("custkey"))
        c.intersect(o).orderBy(col("custkey"))
      },
      Some("""
        SELECT c_custkey AS custkey FROM customer
        INTERSECT
        SELECT o_custkey AS custkey FROM orders
        ORDER BY custkey""".trim)),

    // Set difference (distinct): customers with no URGENT order (the
    // unfiltered difference is empty in the fixtures — every customer has
    // an order — so the predicate keeps the result non-trivial).
    Q("setop_except",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
        val c = Tables.customer(spark, sfDir).select(col("c_custkey").as("custkey"))
        c.except(o).orderBy(col("custkey"))
      },
      Some("""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY custkey""".trim)),

    // Distinct union (r4): UNION's set semantics — dedup rides the same
    // hash-aggregate shuffle a groupBy would use, one row per distinct key
    // out of the exchange.
    Q("setop_union_distinct",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
        val c = Tables.customer(spark, sfDir).select(col("c_custkey").as("custkey"))
        o.union(c).distinct().orderBy(col("custkey"))
      },
      Some("""
        SELECT o_custkey AS custkey FROM orders
        UNION
        SELECT c_custkey AS custkey FROM customer
        ORDER BY custkey""".trim)),

    // Bag-semantics except (r4): EXCEPT ALL keeps multiplicities
    // (count(left) − count(right) copies survive) — the dedup-aware
    // difference a pipeline uses to subtract an already-processed batch.
    Q("setop_except_all",
      (spark, sfDir) => {
        val o = Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
        val all = Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
        all.exceptAll(o).orderBy(col("custkey"))
      },
      Some("""
        SELECT o_custkey AS custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY custkey""".trim)),

    // Bag-semantics intersect (r5): INTERSECT ALL keeps min(count(left),
    // count(right)) copies — completes the ALL-variant family next to
    // union_all/except_all. Same hash-agg shuffle shape as the distinct
    // variants (counts ride the partial aggregate, never row copies).
    Q("setop_intersect_all",
      (spark, sfDir) => {
        val urgent = Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
        val high = Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(col("o_custkey").as("custkey"))
        high.intersectAll(urgent).orderBy(col("custkey"))
      },
      Some("""
        SELECT o_custkey AS custkey FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        INTERSECT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY custkey""".trim)),
  )
}
