package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{DotProduct, HllDistinctAgg}

/** SparkSessionExtensions injector exposing graft's native expressions to
  * SQL — install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * ```sql
  * SELECT dot_product(a.embedding, b.embedding) FROM ...
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // flag-gated COUNT(DISTINCT) -> HLL++ approximate-query rewrite
    e.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes exactly 2 arguments")
        DotProduct(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("hll_distinct_native"),
      new ExpressionInfo(classOf[HllDistinctAgg].getName, "hll_distinct_native"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hll_distinct_native(x) takes exactly 1 argument")
        HllDistinctAgg(args.head).toAggregateExpression()
      }))
  }
}
