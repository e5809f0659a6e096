package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite with SparkTestBase {

  test("curation pipeline = dedup-collapse, gates, then budgeted prefix — vs local recomputation") {
    val budget = 600L
    val got = Curation.curatedTokenSample(spark, sf, budget).collect()
    assert(got.nonEmpty, "curation should keep something on the synthetic corpus")

    // local recomputation of the survivor set
    val rows = Tables(spark, sf, "documents").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    val keep = rows.groupBy(_._2).values.map(_.map(_._1).min).toSet
    def survives(t: String): Boolean = {
      val words = """[^ \t\n\r\f\x0B]+""".r.findAllIn(t).toSeq
      val n = words.length.toLong
      val chars = words.map(w => w.codePointCount(0, w.length).toLong).sum
      val sym = t.count(_ == '#').toLong + """\.\.\.""".r.findAllIn(t).length
      val alpha = words.count(_.exists(Character.isLetter)).toLong
      n >= 50 && n <= 100000L && 3 * n <= chars && chars <= 10 * n &&
        10 * sym <= n && 5 * alpha >= 4 * n
    }
    val expectedSurvivors = rows.collect {
      case (id, t, src) if keep(id) && survives(t) => (id, src, t.split(" ", -1).length.toLong)
    }
    // every emitted doc is a surviving doc, within budget, forming a
    // contiguous per-source prefix in the deterministic hash order
    val survivorIds = expectedSurvivors.map(_._1).toSet
    got.foreach { r =>
      assert(survivorIds(r.getLong(0)), s"doc ${r.getLong(0)} should not survive")
      assert(r.getAs[Long]("tok_before") < budget)
    }
    got.groupBy(_.getString(1)).foreach { case (src, rs) =>
      rs.sortBy(_.getAs[Long]("tok_before")).foldLeft(0L) { (expected, r) =>
        assert(r.getAs[Long]("tok_before") == expected, s"gap in $src prefix")
        expected + r.getAs[Long]("n_tok")
      }
    }
    // sources with enough surviving tokens fill their budget; smaller ones
    // ship all their survivors
    val bySourceTokens = expectedSurvivors.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val gotBySource = got.groupBy(_.getString(1))
    bySourceTokens.foreach { case (src, total) =>
      val kept = gotBySource.get(src).map(_.map(_.getAs[Long]("n_tok")).sum).getOrElse(0L)
      if (total >= budget) assert(kept >= budget, s"$src under-filled: $kept")
      else assert(kept == total, s"$src should ship all survivors: $kept vs $total")
    }
  }
}
