package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SparkTestBase {

  test("customer order distribution includes the zero-order bucket") {
    val nCust = Tables(spark, sf, "customer").count()
    val withOrders = Tables(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    val rows = Relational.customerOrderDistribution(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // histogram covers every customer exactly once
    assert(rows.values.sum == nCust)
    // customers without orders land in the 0 bucket, not nowhere
    assert(rows.getOrElse(0L, 0L) == nCust - withOrders)
  }

  test("small-quantity revenue matches a local correlated-average computation") {
    val li = Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong, r.getDouble(2)))
    val brand = Tables(spark, sf, "part").select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byPart = li.groupBy(_._1)
    // the operator's exact integer predicate: 5·qty·cnt < Σqty ⇔ qty < 0.2·avg
    val qualifying = li.filter { case (pk, q, _) =>
      val g = byPart(pk); q * 5 * g.length < g.map(_._2).sum
    }
    assert(qualifying.nonEmpty, "test data should contain small-quantity rows")
    val expect = qualifying.groupBy(x => brand(x._1))
      .view.mapValues(_.length.toLong).toMap
    val got = Relational.smallQuantityRevenue(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_small")).toMap
    assert(got == expect)
  }

  test("approx quantiles observe the percentile_approx rank-error bound per group") {
    // q_rel_quantiles_approx is rows-only by construction (the GK/quantile
    // summary is engine-specific — DuckDB's approx sketch is a different
    // algorithm), so THIS is its gate: percentile_approx(accuracy = A)
    // guarantees a returned value whose rank is within n/A of the target
    // rank, and the value must be an actual group member (the sketch
    // stores observed values, never interpolates).
    val byFlag = Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Relational.quantilesApprox(spark, sf).collect()
    assert(got.length == byFlag.size)
    val ps = Seq(("q25", 0.25), ("q50", 0.5), ("q75", 0.75), ("q99", 0.99))
    got.foreach { r =>
      val vs = byFlag(r.getString(0))
      val n = vs.length
      val tol = n / 10000 + 1 // accuracy = 10000, +1 for rank discreteness
      ps.foreach { case (colName, p) =>
        val v = r.getAs[Double](colName)
        assert(vs.contains(v), s"$colName=$v is not an observed value of the group")
        // rank window of v among the sorted group vs the target rank p·n
        val lo = vs.indexWhere(_ == v)
        val hi = vs.lastIndexWhere(_ == v)
        val target = p * (n - 1)
        assert(target >= lo - tol && target <= hi + tol,
          s"$colName rank [$lo,$hi] misses target $target by more than $tol (n=$n)")
      }
    }
  }
}
