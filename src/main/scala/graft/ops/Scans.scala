package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.1–2.2 — scans, projection, filtering.
  *
  * All four are pure declarative plans: Catalyst pushes the predicates and
  * the column projection into the vectorized parquet scan (`PushedFilters` /
  * `ReadSchema` — asserted by plan-shape tests). At 100 TB these are the
  * operators where pushdown is the whole ballgame: a scan that reads all 11
  * lineitem columns for a 3-column projection is wrong, and a filter
  * evaluated post-scan instead of in the reader re-reads the table.
  */
object Scans {
  import Det._

  val queries: Seq[Q] = Seq(

    // Full scan + narrow projection; count-stable, totally ordered.
    Q("scan_parquet",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // Predicate pushed into the parquet reader + column pruning.
    Q("scan_pruned",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .filter(col("l_shipdate") <= to_timestamp(lit("1996-01-01 00:00:00")))
          .select(col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_date"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1996-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // Computed columns: exact-decimal revenue + string concat.
    Q("project_expr",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            emit(money(col("l_extendedprice")) * (factor(lit(1)) - factor(col("l_discount"))), 4)
              .as("revenue"),
            concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some(s"""
        SELECT l_orderkey, l_linenumber,
          ${sqlEmit(s"${sqlMoney("l_extendedprice")} * (${sqlFactor("1")} - ${sqlFactor("l_discount")})", 4)} AS revenue,
          l_returnflag || '/' || l_linestatus AS flag_status
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // JSON source (r4): round-trip through newline-delimited JSON — write
    // a projection of orders as JSONL, read it back with an explicit
    // schema (schema-on-read, no inference job at scale), aggregate. The
    // oracle runs the same aggregate over the parquet original, so the key
    // asserts format fidelity, not just rows. Exact-int aggregates only:
    // doubles through a text format are a round-trip hazard by design.
    Q("source_json",
      (spark, sfDir) => {
        val dir = "/tmp/graft_fmt_json_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
          .write.mode("overwrite").json(dir)
        spark.read
          .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderpriority STRING")
          .json(dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".trim)),

    // CSV source (r4): same round-trip through headered CSV with an
    // explicit schema — the other ubiquitous interchange format.
    Q("source_csv",
      (spark, sfDir) => {
        val dir = "/tmp/graft_fmt_csv_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
          .write.mode("overwrite").option("header", "true").csv(dir)
        spark.read
          .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderpriority STRING")
          .option("header", "true").csv(dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".trim)),

    // Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, IS NOT NULL.
    Q("filter_pred",
      (spark, sfDir) =>
        Tables.part(spark, sfDir)
          .filter(
            (col("p_size").between(10, 20) || col("p_brand").isin("Brand#1", "Brand#2"))
              && col("p_type").like("%O%")
              && col("p_name").isNotNull
              && !(col("p_size") === 15))
          .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE (p_size BETWEEN 10 AND 20 OR p_brand IN ('Brand#1', 'Brand#2'))
          AND p_type LIKE '%O%'
          AND p_name IS NOT NULL
          AND NOT (p_size = 15)
        ORDER BY p_partkey""".trim)),
  )
}
