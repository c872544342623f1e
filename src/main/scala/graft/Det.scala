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
  * The final cast is routed through DECIMAL(18,s); the DuckDB oracle side
  * additionally routes through VARCHAR (see [[sqlEmit]]) so both engines
  * produce the correctly-rounded double over the FULL DECIMAL(18,s)
  * domain — DuckDB's native decimal→double double-rounds once the
  * unscaled value passes 2^53 (caught by the r12 sf1 scale probe), and
  * wide (int128) decimals double-round even earlier.
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
  /** DuckDB's decimal→double casts int64→double then divides by 10^scale —
    * two roundings, which diverges from Spark's single-rounded
    * BigDecimal.doubleValue once |unscaled| > 2^53 (observed on sum_charge
    * at the r12 sf1 scale probe: …722894 exact → Spark …893, DuckDB …897).
    * Routing through STRING (a type alias both engines parse) makes DuckDB parse the decimal digits with
    * strtod — correctly rounded, bit-identical to Spark — so the emit
    * policy now holds over the full DECIMAL(18,s) domain, not just the
    * int64-exact prefix. */
  def sqlEmit(x: String, scale: Int): String =
    s"CAST(CAST(CAST($x AS DECIMAL(18,$scale)) AS STRING) AS DOUBLE)"

  /** Wide emit for aggregates that outgrow DECIMAL(18,s)'s |value| <
    * 10^(18-s) domain AT SCALE — e.g. Gini's Σ i·xᵢ grows O(n²·x̄) and
    * passed 10^16 at the r13 sf1 full gate (ANSI overflow, caught loudly
    * rather than silently wrapping). Route through DECIMAL(38,s): Spark's
    * decimal→double (BigDecimal.doubleValue) is single-rounded at any
    * precision, and the SQL twin string-routes like [[sqlEmit]] because
    * int128 decimals double-round in DuckDB far earlier than 2^53.
    * Bit-identical to [[emit]] on values inside the narrow domain (same
    * quantization, same correctly-rounded double), so adopting it never
    * moves a small-SF hash. */
  def emitWide(c: Column, scale: Int): Column =
    c.cast(DecimalType(38, scale)).cast("double")
  def sqlEmitWide(x: String, scale: Int): String =
    s"CAST(CAST(CAST($x AS DECIMAL(38,$scale)) AS STRING) AS DOUBLE)"
  def sqlSumMoney(x: String): String = sqlEmit(s"SUM(CAST($x AS DECIMAL(12,2)))", 2)
  def sqlVal6(x: String): String = s"CAST($x AS DECIMAL(18,6))"
  def sqlSumVal6(x: String): String = sqlEmit(s"SUM(${sqlVal6(x)})", 6)
  def sqlAvgMoney(x: String): String =
    sqlEmit(s"SUM(CAST($x AS DECIMAL(12,2)))", 2) + s" / COUNT($x)"
}
