package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism policy helpers (SURVEY §7.3) — the hash-match make-or-break.
  *
  * Double sums are order-dependent under parallel partial aggregation, so
  * every oracle-checked aggregate goes through exact decimal arithmetic and
  * only the FINAL value is cast back to double. Fixture money columns are
  * verified to be exactly 2dp, so the decimal casts below are lossless.
  *
  * The final cast is routed through DECIMAL(18,s): with the unscaled value
  * below 2^53 both Spark (BigDecimal.doubleValue) and DuckDB (int64 →
  * double, then one division by 10^s) produce the correctly-rounded double.
  * Casting a WIDE decimal (int128) to double in DuckDB double-rounds and
  * diverges from Spark in the last ulp — observed on sum_charge before this
  * policy was added.
  *
  * At 100 TB this policy is also the *correct* one: decimal partial
  * aggregation is exact regardless of partitioning, retries, or AQE
  * re-planning, so results are stable across cluster topologies.
  */
object Det {
  /** Money / quantity values (2dp in fixtures). */
  val Money: DecimalType = DecimalType(12, 2)
  /** Small factors like (1 - discount) (≤4dp). */
  val Factor: DecimalType = DecimalType(8, 4)

  def money(c: Column): Column = c.cast(Money)
  def factor(c: Column): Column = c.cast(Factor)

  /** Final emit of an exact decimal aggregate as double: narrow to
    * DECIMAL(18,scale) (lossless when the true value has ≤ scale decimals
    * and |value| < 10^(15-scale)), then one correctly-rounded double cast —
    * identical in Spark and DuckDB. */
  def emit(c: Column, scale: Int): Column =
    c.cast(DecimalType(18, scale)).cast("double")

  /** Exact decimal SUM emitted as double (2dp inputs). */
  def sumMoney(c: Column): Column = emit(sum(money(c)), 2)

  /** Exact decimal AVG emitted as double: exact decimal sum narrowed and
    * cast, then one IEEE division — identical in both engines. */
  def avgMoney(c: Column): Column = emit(sum(money(c)), 2) / count(c)

  /** Full-precision doubles (e.g. `events.value`): deterministic per-row
    * rounding to 6dp decimal, then exact order-independent aggregation. */
  val Val6: DecimalType = DecimalType(18, 6)
  def val6(c: Column): Column = c.cast(Val6)
  def sumVal6(c: Column): Column = emit(sum(val6(c)), 6)

  // ---- SQL text twins (DuckDB side) ----
  def sqlMoney(x: String): String = s"CAST($x AS DECIMAL(12,2))"
  def sqlFactor(x: String): String = s"CAST($x AS DECIMAL(8,4))"
  def sqlEmit(x: String, scale: Int): String =
    s"CAST(CAST($x AS DECIMAL(18,$scale)) AS DOUBLE)"
  def sqlSumMoney(x: String): String = sqlEmit(s"SUM(CAST($x AS DECIMAL(12,2)))", 2)
  def sqlVal6(x: String): String = s"CAST($x AS DECIMAL(18,6))"
  def sqlSumVal6(x: String): String = sqlEmit(s"SUM(${sqlVal6(x)})", 6)
  def sqlAvgMoney(x: String): String =
    sqlEmit(s"SUM(CAST($x AS DECIMAL(12,2)))", 2) + s" / COUNT($x)"
}
