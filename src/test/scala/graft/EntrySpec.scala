package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract, pinned in CI: `SparkEntry.entry` must
  * return rows on sf0.001, and every registered query name must have
  * resolvable plumbing (an oracle entry implies a queries entry — a
  * dangling oracle would silently never be checked). */
class EntrySpec extends AnyFunSuite with SparkTestBase {

  test("entry returns rows on sf0.001 (the driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query, and names collide nowhere") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"dangling oracles: ${os.diff(qs).toSeq.sorted.mkString(", ")}")
    // the per-operator maps must not shadow each other: the merged map's
    // size equals the sum of the parts' sizes
    val parts = Seq(
      graft.operators.Relational.queries, graft.operators.Temporal.queries,
      graft.operators.Skew.queries, graft.operators.TextAnalysis.queries,
      graft.operators.Dedup.queries, graft.operators.Similarity.queries,
      graft.operators.Sampling.queries, graft.operators.Curation.queries,
      graft.multimodal.Multimodal.queries)
    val partTotal = parts.map(_.size).sum
    // qs also contains the cardinality/streaming entries registered
    // directly in SparkEntry — the merged size must be the full sum
    assert(qs.size >= partTotal,
      s"query-name collision across operator modules: ${qs.size} < $partTotal")
    val dupAcross = parts.flatMap(_.keys).groupBy(identity).filter(_._2.size > 1).keys
    assert(dupAcross.isEmpty, s"duplicate query names: ${dupAcross.mkString(", ")}")
  }
}
