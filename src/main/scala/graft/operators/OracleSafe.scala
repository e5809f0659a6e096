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

/** Literal-hyperplane SQL builders shared by the Similarity and Dedup
  * oracles — the ONE home of the bit-exactness-critical rendering
  * (sequential `list_sum` accumulation matching the native `DotProduct`
  * loop, shortest-roundtrip double literals, `1L << i` bit packing,
  * `CAST(i AS INT)` list indexing). Two drifting copies of this would
  * silently break one oracle's hash parity. */
private[operators] object VectorSql {

  /** A literal DOUBLE[] list: `Double.toString` round-trips bit-exactly
    * through DuckDB's parser. */
  def planeSql(p: Seq[Double]): String = p.mkString("[", ", ", "]")

  /** `Σ vᵢ·pᵢ` over a DOUBLE[]-cast column `v` and a literal plane. */
  def dotSql(v: String, p: Seq[Double]): String =
    s"list_sum(list_transform(range(1, ${p.size + 1}), i -> $v[CAST(i AS INT)] * (${planeSql(p)})[CAST(i AS INT)]))"

  /** Signed-random-projection bucket: `nBits` sign bits over consecutive
    * planes starting at `offset`, packed little-endian like
    * [[graft.functions.VectorOps.srpBucket]]. */
  def srpBucketSql(v: String, planes: Seq[Seq[Double]], offset: Int, nBits: Int): String =
    (0 until nBits).map { i =>
      s"(CASE WHEN ${dotSql(v, planes(offset + i))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", "\n   + ", ")")
}
