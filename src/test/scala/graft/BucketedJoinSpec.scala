package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Bucketing

class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join with zero shuffle exchanges") {
    val li = Tables(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
    val o = Tables(spark, sf, "orders").withColumnRenamed("o_orderkey", "orderkey")
    Bucketing.writeBucketed(li, "li_bkt", "orderkey", 8)
    Bucketing.writeBucketed(o, "o_bkt", "orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the co-location is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "li_bkt", "o_bkt", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(1500)}")
      // and it is correct: row count equals the plain join
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
