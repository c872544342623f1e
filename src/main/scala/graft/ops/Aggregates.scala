package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 — aggregation operators.
  *
  * All declarative `groupBy.agg` — Catalyst plans these as two-phase
  * HashAggregate (partial map-side combine, then final after a shuffle on
  * the group keys), which is exactly the plan that scales: at 100 TB the
  * shuffle carries only one partial row per (partition, group), not data.
  */
object Aggregates {
  import Det._

  val queries: Seq[Q] = Seq(

    // Flagship: TPC-H-Q1-style scan + filter + 2-key group + sums/avgs.
    Q("agg_hash_q1",
      (spark, sfDir) => {
        Tables.lineitem(spark, sfDir)
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumMoney(col("l_quantity")).as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            emit(sum(money(col("l_extendedprice")) * (factor(lit(1)) - factor(col("l_discount")))), 4)
              .as("sum_disc_price"),
            emit(sum(money(col("l_extendedprice")) * (factor(lit(1)) - factor(col("l_discount")))
              * (factor(lit(1)) + factor(col("l_tax")))), 6)
              .as("sum_charge"),
            avgMoney(col("l_quantity")).as("avg_qty"),
            avgMoney(col("l_extendedprice")).as("avg_price"),
            avgMoney(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"),
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          ${sqlSumMoney("l_quantity")} AS sum_qty,
          ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
          ${sqlEmit(s"SUM(${sqlMoney("l_extendedprice")} * (${sqlFactor("1")} - ${sqlFactor("l_discount")}))", 4)} AS sum_disc_price,
          ${sqlEmit(s"SUM(${sqlMoney("l_extendedprice")} * (${sqlFactor("1")} - ${sqlFactor("l_discount")}) * (${sqlFactor("1")} + ${sqlFactor("l_tax")}))", 6)} AS sum_charge,
          ${sqlAvgMoney("l_quantity")} AS avg_qty,
          ${sqlAvgMoney("l_extendedprice")} AS avg_price,
          ${sqlAvgMoney("l_discount")} AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim)),
  )
}
