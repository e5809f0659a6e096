package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.PqCodeDists

/** Unit laws of the native PQ distance expression (the round-10 codegen
  * fix) at the EXPRESSION level — the operator-level parity lives in
  * SimilaritySpec ("PQ encode matches a local argmin recomputation
  * exactly") and in the q_emb_pq_encode / q_emb_pq_adc / search_lit hash
  * gates; this spec pins the contracts those rely on: interpreted eval ≡
  * the codegen'd path, array_min-compatible tie-breaking, and loud
  * failure on model/input mismatches (a silent wrong-shape read would
  * return plausible-but-wrong codes). */
class PqCodeDistsSpec extends AnyFunSuite with SparkTestBase {

  private val m = 2
  private val subDim = 2
  private val k = 3
  // tiny literal model: books row-major (j*k + c)
  private val books: Seq[Seq[Double]] = Seq(
    Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0),   // subspace 0
    Seq(-1.0, 0.0), Seq(0.5, 0.5), Seq(2.0, -1.0)) // subspace 1
  private val bb: Seq[Double] = books.map(cb => cb.map(x => x * x).reduce(_ + _))

  private def pqCol(vec: Column, cid: Column, consts: Seq[Double],
                    includeXx: Boolean, argminOnly: Boolean): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PqCodeDists(
      ColumnBridge.expression(vec), ColumnBridge.expression(cid),
      books, consts, m, subDim, k, includeXx, argminOnly))
  }

  private def run(vecs: Seq[Seq[Float]], argminOnly: Boolean,
                  codegen: Boolean): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      vecs.toDF("v").select(explode(
          pqCol(col("v"), lit(0), bb, includeXx = true, argminOnly = argminOnly)).as("e"))
        .select(col("e.sub_idx"), col("e.code"), col("e.dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  private val vecs: Seq[Seq[Float]] =
    Seq(Seq(0.3f, -1.2f, 0.7f, 0.1f), Seq(1.0f, 1.0f, -0.5f, 2.0f), Seq(0f, 0f, 0f, 0f))

  test("interpreted eval and generated code agree bit-for-bit, both variants") {
    for (argmin <- Seq(true, false)) {
      val a = run(vecs, argmin, codegen = false)
      val b = run(vecs, argmin, codegen = true)
      assert(a == b, s"eval/codegen divergence (argminOnly=$argmin)")
      assert(a.size == vecs.size * (if (argmin) m else m * k))
    }
  }

  test("argmin matches array_min over struct(dist, code): smallest dist, then smallest code") {
    val full = run(vecs, argminOnly = false, codegen = true)
      .grouped(m * k).toSeq // per input vector
    val mins = run(vecs, argminOnly = true, codegen = true).grouped(m).toSeq
    full.zip(mins).foreach { case (all, got) =>
      (0 until m).foreach { j =>
        val cands = all.filter(_._1 == j)
        val expect = cands.minBy { case (_, code, d) => (d, code) }
        assert(got(j) == expect, s"argmin tie/order mismatch in subspace $j: " +
          s"got ${got(j)}, expected $expect of $cands")
      }
    }
  }

  test("residual variant selects the cid's constant slice") {
    import spark.implicits._
    // two lists: consts for cid 1 shift every distance by +10 relative to
    // cid 0, so the reported dist must follow the row's cid exactly
    val c0 = books.map(_ => 0.5)
    val consts = c0 ++ c0.map(_ + 10.0)
    val out = Seq((Seq(1f, 2f, 3f, 4f), 0), (Seq(1f, 2f, 3f, 4f), 1))
      .toDF("v", "cid")
      .select(col("cid"), explode(
        pqCol(col("v"), col("cid"), consts, includeXx = false, argminOnly = false)).as("e"))
      .select(col("cid"), col("e.dist")).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val byCid = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byCid(0).zip(byCid(1)).forall { case (a, b) => b == a + 10.0 },
      s"cid-1 distances must be cid-0 + 10.0 exactly: ${byCid(0)} vs ${byCid(1)}")
  }

  test("model/input mismatches fail loudly, never mis-read") {
    import spark.implicits._
    def exec(vec: Seq[Float], cid: Int, consts: Seq[Double]): Unit =
      Seq((vec, cid)).toDF("v", "c")
        .select(explode(pqCol(col("v"), col("c"), consts,
          includeXx = true, argminOnly = true)))
        .collect()
    val e1 = intercept[Exception](exec(Seq(1f, 2f, 3f), 0, bb)) // 3 dims < m*subDim
    assert(e1.getMessage.contains("dims") || e1.getCause != null)
    val e2 = intercept[Exception](exec(Seq(1f, 2f, 3f, 4f), 1, bb)) // cid 1, nLists 1
    assert(e2.getMessage.contains("cid") || e2.getCause != null)
    intercept[IllegalArgumentException](PqCodeDists(null, null, books, bb.tail,
      m, subDim, k, includeXx = true, argminOnly = true)) // consts wrong length
  }
}
