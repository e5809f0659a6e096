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
}
