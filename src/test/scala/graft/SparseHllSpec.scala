package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Hll, SparseHll}

class SparseHllSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("sparse mode is EXACT up to the cap, with duplicate inserts deduped") {
    check(Prop.forAll(Gen.chooseNum(0, SparseHll.SparseCap), Gen.long) { (n, salt) =>
      var st = SparseHll.empty()
      (0 until n).foreach { i =>
        val h = Hll.hash(s"$salt-$i")
        st = SparseHll.add(st, h)
        st = SparseHll.add(st, h) // duplicate must not count
      }
      SparseHll.estimate(st) == n && st.length != Hll.M
    })
  }

  test("densification crosses the cap consistently with a dense-only sketch") {
    val n = SparseHll.SparseCap * 4
    var st = SparseHll.empty()
    val dense = Hll.emptyRegisters()
    (0 until n).foreach { i =>
      val h = Hll.hash(s"cross-$i")
      st = SparseHll.add(st, h)
      Hll.add(dense, h)
    }
    assert(st.length == Hll.M, "should have densified past the cap")
    assert(SparseHll.estimate(st) == Hll.estimate(dense),
      "densified sketch must equal the dense-only sketch on the same inserts")
  }

  test("merge is a union in all mode combinations") {
    check(Prop.forAll(
      Gen.chooseNum(0, 700), Gen.chooseNum(0, 700), Gen.chooseNum(0L, 1000L)) {
      (na, nb, salt) =>
        def build(prefix: String, n: Int): Array[Byte] = {
          var st = SparseHll.empty()
          (0 until n).foreach(i => st = SparseHll.add(st, Hll.hash(s"$prefix-$i")))
          st
        }
        // overlap: b reuses a's prefix for half its entries
        val a = build(s"a$salt", na)
        var b = build(s"b$salt", nb / 2)
        (0 until math.min(na, nb / 2)).foreach(i => b = SparseHll.add(b, Hll.hash(s"a$salt-$i")))
        val trueDistinct = na + nb / 2 // a ∪ b
        val est = SparseHll.estimate(SparseHll.merge(a, b))
        // exact when merged stays sparse; HLL-bounded when dense
        if (trueDistinct <= SparseHll.SparseCap) est == trueDistinct
        else math.abs(est - trueDistinct).toDouble <= math.max(2.0, 0.05 * trueDistinct)
    }, n = 15)
  }
}
