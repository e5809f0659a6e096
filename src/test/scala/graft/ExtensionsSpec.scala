package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("dot_product is SQL-callable (extension injection path)") {
    // the extension's builder lambda must apply cleanly
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    // getOrCreate would return the already-running test session without
    // applying extensions, so register through the same expression builder
    // on the live session and drive it via SQL
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => graft.functions.expressions.DotProduct(exprs(0), exprs(1)),
      "built-in")
    val r = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 11.0) < 1e-9)
  }

  test("approx-distinct rewrite rule swaps COUNT(DISTINCT) for HLL++ only when enabled") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.ApproxDistinctRewrite
    // a Dataset caches its QueryExecution, so build a FRESH plan after
    // each conf flip — the rewrite is decided at optimization time
    def df = Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    try {
      // disabled (default): the exact distinct plan survives
      spark.conf.set(graft.plans.ApproxDistinctRewrite.EnabledKey, "false")
      val exactDf = df
      val exactPlan = exactDf.queryExecution.executedPlan.toString
      assert(exactPlan.contains("distinct"), exactPlan.take(500))
      val exact = exactDf.collect().map(r => r.get(0) -> r.getLong(1)).toMap

      // enabled: plan rewrites to approx_count_distinct, no Expand
      spark.conf.set(graft.plans.ApproxDistinctRewrite.EnabledKey, "true")
      val approxDf = df
      val approxPlan = approxDf.queryExecution.executedPlan.toString
      assert(approxPlan.contains("approx_count_distinct"), approxPlan.take(500))
      assert(!approxPlan.contains("Expand"), "distinct expansion survived the rewrite")
      val approx = approxDf.collect().map(r => r.get(0) -> r.getLong(1)).toMap

      assert(approx.keySet == exact.keySet)
      approx.foreach { case (k, est) =>
        val ex = exact(k)
        assert(math.abs(est - ex) <= math.max(1.0, 4 * 0.0081 * ex),
          s"bucket $k: approx $est vs exact $ex")
      }
    } finally {
      spark.conf.set(graft.plans.ApproxDistinctRewrite.EnabledKey, "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.ApproxDistinctRewrite)
    }
  }

  test("streaming file-source replay: JSONL directory drives the pipeline (README.md:27 workflow)") {
    import graft.streaming.CardinalityStream
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    val f = new java.io.File(dir, "stream.jsonl")
    val w = new java.io.PrintWriter(f)
    (0 until 50).foreach(i => w.println(s"""{"uid":"u${i % 7}","ts":${1468244384L + i * 30}}"""))
    w.println("not json") // dropped
    w.close()
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))
      .text(dir.getAbsolutePath)
    val q = CardinalityStream.aggregated(CardinalityStream.parse(raw), "minute")
      .writeStream.format("memory").queryName("filesrc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("filesrc").collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getLong(2)).max <= 7) // never more than 7 distinct uids
      assert(rows.forall(_.getString(0) == "minute_count"))
    } finally q.stop()
  }
}
