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
}
