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

  test("winnowing MOSS guarantee: shared substring >= w+k-1 chars implies a shared fingerprint") {
    val lowerStr = (min: Int, max: Int) => for {
      len <- Gen.chooseNum(min, max)
      cs <- Gen.listOfN(len, Gen.alphaLowerChar)
    } yield cs.mkString
    check(Prop.forAll(lowerStr(8, 24), lowerStr(0, 30), lowerStr(0, 30),
                      lowerStr(0, 30), lowerStr(0, 30)) {
      (shared, p1, s1, p2, s2) =>
        import graft.operators.TextAnalysis.winnow
        val a = winnow(p1 + shared + s1).toSet
        val b = winnow(p2 + shared + s2).toSet
        a.intersect(b).nonEmpty
    })
  }

  test("SimHashAggregator: merge(a,b) == reduce over concatenation; finish matches brute sign") {
    val agg = new graft.functions.SimHashAggregator(64)
    check(Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs: List[Long], ys: List[Long]) =>
      def reduceAll(hs: List[Long]) =
        hs.foldLeft(agg.zero)((b, h) => agg.reduce(b, (0L, h)))
      val merged = agg.merge(reduceAll(xs), reduceAll(ys))
      val together = reduceAll(xs ++ ys)
      val mergeLaw = merged.toSeq == together.toSeq
      // brute-force fingerprint: bit j set iff strictly more set-bits than not
      val brute = (0 until 64).foldLeft(0L) { (fp, j) =>
        val sum = (xs ++ ys).map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
        if (sum > 0) fp | (1L << j) else fp
      }
      mergeLaw && agg.finish(together) == brute
    })
  }

  test("calendar bucket ends are strictly ahead and re-truncate to the same bucket") {
    import graft.streaming.CalendarAppendWindows.bucketEnd
    val gran = Gen.oneOf("minute", "day", "week", "month", "year")
    check(Prop.forAll(gran, Gen.chooseNum(0L, 4102444800L)) { (g, ts) =>
      // truncate ts to a legitimate bucket start for g
      val dt = LocalDateTime.ofEpochSecond(ts, 0, ZoneOffset.UTC)
      val start = (g match {
        case "minute" => dt.withSecond(0)
        case "day"    => dt.toLocalDate.atStartOfDay
        case "week"   => dt.toLocalDate.minusDays(dt.getDayOfWeek.getValue - 1).atStartOfDay
        case "month"  => dt.toLocalDate.withDayOfMonth(1).atStartOfDay
        case "year"   => dt.toLocalDate.withDayOfYear(1).atStartOfDay
      }).toEpochSecond(ZoneOffset.UTC)
      val end = bucketEnd(g, start)
      end > start && end - start <= 366L * 86400 && ts < end && ts >= start
    })
  }

  test("bucketEnd honors non-UTC session zones, including DST-transition days") {
    import java.time.{ZonedDateTime, ZoneId}
    import graft.streaming.CalendarAppendWindows.bucketEnd
    // IST (+05:30, no DST): July bucket must end exactly at Aug 1 00:00 IST
    val ist = ZoneId.of("Asia/Kolkata")
    val julStartIst = ZonedDateTime.of(2016, 7, 1, 0, 0, 0, 0, ist).toEpochSecond
    val augStartIst = ZonedDateTime.of(2016, 8, 1, 0, 0, 0, 0, ist).toEpochSecond
    assert(bucketEnd("month", julStartIst, ist) == augStartIst)
    // UTC arithmetic on the same start would misplace the boundary by 0 only
    // if the offset were 0 — assert the bug class is actually exercised
    assert(bucketEnd("month", julStartIst) != augStartIst)
    // America/New_York DST end (2025-11-02): that calendar day is 25 hours
    val ny = ZoneId.of("America/New_York")
    val dstDay = ZonedDateTime.of(2025, 11, 2, 0, 0, 0, 0, ny).toEpochSecond
    assert(bucketEnd("day", dstDay, ny) - dstDay == 25 * 3600)
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
