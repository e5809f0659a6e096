package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns using codegen'd
  * higher-order functions (`zip_with`/`aggregate`/`transform`) — no Scala
  * UDFs, so everything stays inside whole-stage codegen and distributes
  * with zero serialization overhead.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ (computed in double) — a native codegen'd Catalyst expression
    * ([[graft.functions.expressions.DotProduct]]); see its Scaladoc for why
    * not `aggregate(zip_with(...))`. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.DotProduct(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) — callers should pre-compute norms when one side is reused
    * (e.g. the corpus side of a k-NN scan). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** cos given precomputed norms. */
  def cosinePrenormed(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Signed-random-projection LSH bucket: a bit per hyperplane
    * (`sign(v · rᵢ)`), packed into a long. Deterministic planes come from
    * [[hyperplanes]]. 100 TB note: bucketing reduces an O(n²) similarity
    * self-join to per-bucket joins; `nBits` trades recall for bucket size.
    */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      shiftleft(when(dot(v, plane) >= 0, 1L).otherwise(0L), i)
    }.reduce(_.bitwiseOR(_))

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed — results
    * must be reproducible run-to-run for the driver's checks). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
