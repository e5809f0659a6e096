package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization code distances for one vector against a plan-time
  * codebook model, as ONE native Catalyst expression.
  *
  * The previous formulation built the per-(subspace, codeword) distance
  * `(xx − 2·x·b) + ‖b‖²` as a literal Catalyst expression tree — m·k dot
  * loops plus struct/array_min scaffolding, all inlined into the consuming
  * `Generate`'s whole-stage-codegen method. Expression splitting is
  * unavailable there (the operands live in local variables, not an input
  * row), so at m=8, k=16 the single generated method crossed Janino's
  * 64 KB limit and Spark retried the stage WITHOUT whole-stage codegen —
  * the "seven Generate-heavy fallback stages" of SURVEY §8.4. This class
  * moves the loops from the expression TREE into the generated code's
  * RUNTIME: codegen emits one call into [[compute]] (compiled JVM loops
  * over a broadcast-referenced `double[]` model — not per-row interpreted
  * expression walking, which is the CodegenFallback cost this repo
  * measures at ~10× elsewhere), so the stage stays inside whole-stage
  * codegen at any m/k/nCentroids and the encode remains the map-only scan
  * the 100 TB story requires.
  *
  * Bit parity with the literal tree (and therefore with the DuckDB oracles
  * of `q_emb_pq_encode` / `q_emb_pq_adc` / `q_sim_ann_ivf_pq_search_lit`)
  * is preserved operation-for-operation:
  *   - dots accumulate `0.0 + x₀y₀ + x₁y₁ + …` left-to-right in double,
  *     exactly like [[DotProduct]] (floats widened per element);
  *   - plain distance associates `(xx − 2.0·dot) + C`, residual
  *     rank-reduced distance `(−2.0·dot) + C`, matching the former
  *     `pqDist` / `residualArgminDists` column builders;
  *   - the additive constants `C` are computed by the CALLER with the
  *     exact Scala fold the literal builders used, and ride in as data;
  *   - the argmin tie-breaks via `Double.compare` (ascending code order,
  *     strict improvement), reproducing `array_min` over
  *     `struct(dist, code)` under Spark's double ordering (−0.0 < 0.0,
  *     NaN greatest).
  *
  * Inputs: `vec` is the FULL embedding (`array<float|double>`; subspace j
  * reads elements `[j·subDim, (j+1)·subDim)`), `cid` the coarse-list id
  * (literal 0 with `nLists = 1` for the non-residual tiers). Output is
  * `array<struct<sub_idx: long, code: long, dist: double>>` — m rows when
  * `argminOnly` (the encode argmin), m·k when not (the full ADC LUT of a
  * query vector); callers explode it and apply the e4 floor outside.
  *
  * @param books  m·k codeword subvectors, row-major `(j·k + c)`
  * @param consts additive constants, flattened `((cid·m + j)·k + c)`
  *               (`nLists·m·k` values; `‖b‖²` for the plain tier,
  *               `2·a·b + ‖b‖²` for the residual tier)
  */
case class PqCodeDists(vec: Expression, cid: Expression,
                       books: Seq[Seq[Double]], consts: Seq[Double],
                       m: Int, subDim: Int, k: Int,
                       includeXx: Boolean, argminOnly: Boolean)
    extends BinaryExpression {

  require(m > 0 && subDim > 0 && k > 0,
    s"model shape: m, subDim, k must all be positive, got ($m, $subDim, $k)")
  require(books.length == m * k, s"books: expected ${m * k} rows, got ${books.length}")
  require(books.forall(_.length == subDim), s"books: every row must have $subDim dims")
  require(consts.length % (m * k) == 0 && consts.nonEmpty,
    s"consts: expected a multiple of ${m * k} values, got ${consts.length}")

  override def left: Expression = vec
  override def right: Expression = cid

  private val nLists: Int = consts.length / (m * k)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub_idx", LongType, nullable = false),
    StructField("code", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cidOk = cid.dataType match {
      case IntegerType | LongType => true
      case _ => false
    }
    if (vecOk && cidOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_code_dists expects (array<float|double>, int|long), got (${vec.dataType}, ${cid.dataType})")
  }

  private def isFloatVec: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val flatBooks: Array[Double] = {
    val a = new Array[Double](m * k * subDim)
    var r = 0
    while (r < m * k) {
      val row = books(r)
      var i = 0
      while (i < subDim) { a(r * subDim + i) = row(i); i += 1 }
      r += 1
    }
    a
  }
  @transient private lazy val flatConsts: Array[Double] = consts.toArray

  /** The whole per-row computation — called once per input row from the
    * generated code (and from [[nullSafeEval]] in interpreted contexts). */
  def compute(x: ArrayData, cidRaw: Long): ArrayData = {
    val cidV = cidRaw.toInt
    if (cidV < 0 || cidV >= nLists) {
      throw new IllegalArgumentException(
        s"pq_code_dists: cid $cidV outside [0, $nLists) — model/assignment mismatch")
    }
    if (x.numElements() < m * subDim) {
      throw new IllegalArgumentException(
        s"pq_code_dists: vector has ${x.numElements()} dims, need ${m * subDim}")
    }
    val fl = isFloatVec
    val bk = flatBooks
    val cs = flatConsts
    val out = new Array[Any](if (argminOnly) m else m * k)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var xx = 0.0
      if (includeXx) {
        var i = 0
        while (i < subDim) {
          val v = if (fl) x.getFloat(base + i).toDouble else x.getDouble(base + i)
          xx += v * v
          i += 1
        }
      }
      var bestD = 0.0
      var bestC = -1
      var c = 0
      while (c < k) {
        val bBase = (j * k + c) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val v = if (fl) x.getFloat(base + i).toDouble else x.getDouble(base + i)
          dot += v * bk(bBase + i)
          i += 1
        }
        val cst = cs((cidV * m + j) * k + c)
        val d = if (includeXx) xx - 2.0 * dot + cst else -2.0 * dot + cst
        if (argminOnly) {
          if (bestC < 0 || java.lang.Double.compare(d, bestD) < 0) { bestD = d; bestC = c }
        } else {
          out(j * k + c) = new GenericInternalRow(Array[Any](j.toLong, c.toLong, d))
        }
        c += 1
      }
      if (argminOnly) {
        out(j) = new GenericInternalRow(Array[Any](j.toLong, bestC.toLong, bestD))
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cidV = b match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => other.asInstanceOf[Number].longValue()
    }
    compute(a.asInstanceOf[ArrayData], cidV)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqCodeDists", this, classOf[PqCodeDists].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = $self.compute($a, (long) $b);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cid = newRight)
}
