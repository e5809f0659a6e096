package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-parity-safe aggregation builders shared by the operator modules.
  */
private[operators] object OracleSafe {

  /** Order-independent money aggregation: per-row cast to DECIMAL(18,6),
    * exact decimal sum, round to cents, back to double. Two failure
    * classes this kills (both observed live): double sums are
    * partial-aggregation-order dependent (a cent off on a rounding
    * boundary at sf0.001); and a scale-4 cast rounds the 6-decimal-digit
    * price products at REAL midpoints, where Spark (HALF_UP) and DuckDB
    * (half-even) disagree — scale 6 holds the exact product, so the cast
    * never rounds. At 100 TB sums use DECIMAL(38,6). */
  def moneySum(e: Column): Column =
    round(sum(e.cast("decimal(18,6)")), 2).cast("double")

  /** DuckDB twin of [[moneySum]] for oracle SQL. */
  def moneySumSql(expr: String): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(18,6))), 2) AS DOUBLE)"

  /** Engine-parity-safe `round(avg(long_col), 4)`: Spark's `Average` over
    * longs accumulates in floating point (order-dependent) and DuckDB's
    * decimal division returns DOUBLE, so neither `avg` nor a decimal cast
    * survives the hash gate. Instead keep everything in exact BIGINT —
    * round-half-up of sum/count at scale 4 is `(20000*sum + n) div (2*n)`
    * — then both engines divide the SAME integer by 10000.0 (one shared
    * double op ⇒ bit-identical). `sumCol`/`cntCol` must be exact longs. */
  def avgRound4(sumCol: Column, cntCol: Column): Column =
    call_function("div", sumCol * lit(20000L) + cntCol, cntCol * lit(2L)) / lit(10000.0)

  /** DuckDB twin of [[avgRound4]] (`//` is floor division — equals
    * truncation here because every operand is positive). */
  def avgRound4Sql(sumExpr: String, cntExpr: String): String =
    s"(($sumExpr * 20000 + $cntExpr) // (2 * $cntExpr)) / 10000.0"
}
