package graft

import java.time.{LocalDateTime, ZoneOffset}

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Arbitrary.arbitrary

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

  test("SimHash.simhash64 matches the brute per-bit sign law over tokenHash") {
    import graft.functions.SimHash
    val token = for {
      len <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(len, Gen.frequency(
        8 -> Gen.alphaLowerChar, 2 -> Gen.oneOf('é', 'ß', '中', 'é')))
    } yield cs.mkString
    check(Prop.forAll(Gen.listOf(token)) { toks =>
      val text = toks.mkString(" ")
      // brute-force: split/hash/vote independently of the production loop
      val hs = text.split(" ", -1).toList.filter(_.nonEmpty).map(SimHash.tokenHash)
      val brute = (0 until SimHash.Bits).foldLeft(0L) { (fp, j) =>
        val sum = hs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
        if (sum > 0) fp | (1L << j) else fp
      }
      SimHash.simhash64(text) == brute
    })
  }

  test("SimHash.tokenHash is non-negative with bit 63 clear (the oracle packing bound)") {
    val anyStr = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', '中'), 1 -> arbitrary[Char])).map(_.mkString)
    check(Prop.forAll(anyStr) { t =>
      val h = graft.functions.SimHash.tokenHash(t)
      h >= 0L && (h >>> 63) == 0L
    })
  }

  test("SimHash.tokenHash iterates code points: non-BMP chars hash as one symbol") {
    import graft.functions.SimHash.{tokenHash, Mod, BaseA, BaseB, BaseC}
    val cp = 0x1F600 // 😀 — one code point, two UTF-16 units
    val expected = {
      val h1 = cp % Mod; val h2 = cp % Mod; val h3 = cp % Mod
      h1 | (h2 << 30) | ((h3 & 7L) << 60)
    }
    assert(tokenHash(new String(Character.toChars(cp))) == expected)
    assert(BaseA != BaseB && BaseB != BaseC) // three genuinely distinct hashes
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
