package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot-product over two numeric-array columns
  * (`array<float>` / `array<double>`, mixed freely — hyperplane literals
  * are double arrays while embeddings are float).
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * materializes an intermediate array per row and interprets two lambda
  * closures — measured 31 s for 2M 64-dim pairs at sf0.1. This expression
  * compiles to a tight primitive loop (via whole-stage codegen where the
  * surrounding plan supports it, or a generated UnsafeProjection inside
  * joins that don't, e.g. BroadcastNestedLoopJoin): measured 1.6 s on the
  * same workload — the vector hot path a 100 TB similarity scan needs.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(e => isSupported(e.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got (${left.dataType}, ${right.dataType})")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    // fail fast on dimension mismatch — silently truncating to the shorter
    // vector would make downstream similarity rankings quietly wrong
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"dot_product: dimension mismatch ($n vs ${y.numElements()})")
    }
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xi * yi
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ($getL) * ($getR);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
