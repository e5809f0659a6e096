package graft

import java.time.{LocalDateTime, ZoneOffset}

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Hll
import graft.streaming.DataDrivenWindows

/** ScalaCheck property tests (SURVEY.md §5 rebuild test plan). */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("HLL estimate within 4x rsd bound for arbitrary uid sets") {
    check(Prop.forAll(Gen.chooseNum(100, 20000), Gen.chooseNum(0L, Long.MaxValue / 2)) {
      (n: Int, salt: Long) =>
        val regs = Hll.emptyRegisters()
        (0 until n).foreach(i => Hll.add(regs, Hll.hash(s"$salt-uid-$i")))
        math.abs(Hll.estimate(regs) - n).toDouble / n <= 4 * 0.0081
    }, n = 20)
  }

  test("HLL merge is commutative and idempotent") {
    check(Prop.forAll(Gen.chooseNum(1, 5000), Gen.chooseNum(1, 5000)) { (na: Int, nb: Int) =>
      def sketch(prefix: String, n: Int): Array[Byte] = {
        val r = Hll.emptyRegisters()
        (0 until n).foreach(i => Hll.add(r, Hll.hash(s"$prefix$i")))
        r
      }
      val ab = Hll.merge(sketch("a", na), sketch("b", nb))
      val ba = Hll.merge(sketch("b", nb), sketch("a", na))
      ab.toSeq == ba.toSeq && Hll.merge(ab.clone(), ab.clone()).toSeq == ab.toSeq
    }, n = 20)
  }

  test("goAddDate(+1 month) is 28-35 days ahead and preserves clock time") {
    check(Prop.forAll(Gen.chooseNum(0L, 4102444800L)) { ts => // 1970..2100
      val next = DataDrivenWindows.goAddDate(ts, 0, 1)
      val days = (next - ts) / 86400.0
      val clockKept =
        LocalDateTime.ofEpochSecond(ts, 0, ZoneOffset.UTC).toLocalTime ==
          LocalDateTime.ofEpochSecond(next, 0, ZoneOffset.UTC).toLocalTime
      days >= 28.0 && days <= 35.0 && clockKept
    })
  }

  test("12 successive month-adds land within 3 days of one year-add") {
    check(Prop.forAll(Gen.chooseNum(0L, 4102444800L)) { ts =>
      val year = DataDrivenWindows.goAddDate(ts, 1, 0)
      var m = ts
      (0 until 12).foreach(_ => m = DataDrivenWindows.goAddDate(m, 0, 1))
      math.abs(m - year) <= 3 * 86400L
    })
  }
}
