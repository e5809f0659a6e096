package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite with SparkTestBase {

  test("full 7-gate curation: every gate is LIVE on the augmented corpus and survivors ship") {
    val gates = graft.operators.TextAnalysis.gopherGatesOn(
      spark, Curation.augmentedDocs(spark, sf)).collect()
    // each augmentation makes its gate discriminate: some pass, some fail
    def passFail(gate: String): (Long, Long) = {
      val p = gates.count(_.getAs[Boolean](gate)).toLong
      (p, gates.length - p)
    }
    for (g <- Seq("gate_stop", "gate_bullet", "gate_ellipsis")) {
      val (p, f) = passFail(g)
      info(s"$g: $p pass / $f fail")
      assert(p > 0, s"$g never passes — gate not live")
      assert(f > 0, s"$g never fails — gate not live")
    }
    // the stop gate passes exactly the docs given the stopword tail
    gates.foreach { r =>
      assert(r.getAs[Boolean]("gate_stop") == (r.getLong(0) % 2 == 0),
        s"doc ${r.getLong(0)} stop gate")
    }
    // and the full pipeline still ships a budgeted sample
    val got = Curation.curatedTokenSampleFull(spark, sf).collect()
    assert(got.nonEmpty, "full-gate curation should keep something")
    val passesAll = gates.filter(_.getAs[Boolean]("passes_all")).map(_.getLong(0)).toSet
    got.foreach(r => assert(passesAll(r.getLong(0)),
      s"doc ${r.getLong(0)} shipped but fails a gate"))
    assert(got.forall(_.getAs[Long]("tok_before") < 600L))
  }

  test("per-gate attrition counters ride the curation scan and match a direct aggregation") {
    import org.apache.spark.sql.functions._
    val df = Curation.curatedTokenSample(spark, sf)
    df.collect() // run an action so the observation collects
    val obs = graft.Observed.metrics(df).collectFirst {
      case (name, row) if name.startsWith("graft_curation_") => row
    }.getOrElse(fail("no graft_curation observation in the executed plan"))
    // direct recomputation: gates over the collapsed corpus
    val d = Tables(spark, sf, "documents")
    val keep = d.groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val gateRows = graft.operators.TextAnalysis
      .gopherGatesOn(spark, d.join(keep, "doc_id")).collect()
    assert(obs.getAs[Long]("docs_in") == gateRows.length.toLong)
    Curation.SyntheticGates.foreach { g =>
      assert(obs.getAs[Long](s"pass_$g") == gateRows.count(_.getAs[Boolean](g)).toLong, g)
    }
    val passAll = gateRows.count(r => Curation.SyntheticGates.forall(r.getAs[Boolean](_)))
    assert(obs.getAs[Long]("docs_pass") == passAll.toLong)
  }

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

  test("attrition attribution is provably consistent with the pipeline it explains") {
    import graft.operators.Curation
    val budget = 600L
    val rows = Curation.attrition(spark, sf, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // totality: one row per input document
    assert(rows.length == docs.length && rows.map(_._1).distinct.length == docs.length)
    // kept set == the pipeline's output set (the identity that makes the
    // audit trustworthy)
    val kept = rows.filter(_._4 == "kept").map(_._1).toSet
    val pipeline = Curation.curatedTokenSample(spark, sf, budget)
      .collect().map(_.getLong(0)).toSet
    assert(kept == pipeline, "attrition 'kept' must equal the pipeline output")
    // exact_dup stage == exactly the non-minimum ids of multi-doc text groups
    val dupIds = docs.groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.tail).toSet
    assert(rows.filter(_._4 == "exact_dup").map(_._1).toSet == dupIds)
    // every stage label is legal, and gate labels name gates from the battery
    val legal = Set("exact_dup", "budget", "kept") ++ Curation.SyntheticGates
    rows.foreach { case (id, _, _, st) => assert(legal(st), s"doc $id stage $st") }
  }

  test("selection-rung curation keeps only DSIR-admitted, gated docs under budget") {
    import graft.operators.{Curation, Selection}
    val k = 40; val budget = 300L
    val admitted = Selection.dsirGumbelTopK(spark, sf, k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gatedPool = Curation.curatedTokenSample(spark, sf,
      budgetPerSource = Long.MaxValue).collect().map(_.getLong(0)).toSet
    val got = Curation.curatedSelectedSample(spark, sf, budget, k = k).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(admitted(id), s"doc $id not in the DSIR top-$k pool")
      assert(gatedPool(id), s"doc $id does not pass the gates")
      assert(r.getAs[Long]("tok_before") < budget)
    }
    // the composition is the curation of the restricted pool, not a
    // re-derivation: an unlimited-budget run ships exactly admitted ∩ gated
    val unlimited = Curation.curatedSelectedSample(spark, sf, Long.MaxValue, k = k)
      .collect().map(_.getLong(0)).toSet
    assert(unlimited == (admitted intersect gatedPool))
  }
}
