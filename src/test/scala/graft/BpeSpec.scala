package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite with SparkTestBase {

  test("segment: rank-order leftmost-merge fixpoint on hand cases") {
    // cascade within one rank: merging creates a fresh occurrence
    assert(Bpe.segment("aaaa", Seq(("a", "a"))) == Vector("aa", "aa"))
    // odd run: leftmost-first leaves the tail unmerged
    assert(Bpe.segment("aaa", Seq(("a", "a"))) == Vector("aa", "a"))
    // chained ranks: later merge consumes an earlier product
    assert(Bpe.segment("abc", Seq(("a", "b"), ("ab", "c"))) == Vector("abc"))
    // a merge whose pair never occurs is a no-op
    assert(Bpe.segment("xyz", Seq(("a", "b"))) == Vector("x", "y", "z"))
    // single char and empty-ish tokens
    assert(Bpe.segment("a", Bpe.Merges) == Vector("a"))
    // full-table spot checks against the oracle-verified segmentations
    assert(Bpe.segment("the") == Vector("the"))
    assert(Bpe.segment("customer") == Vector("c", "u", "st", "o", "m", "er"))
    assert(Bpe.segment("window") == Vector("w", "in", "d", "ow"))
    assert(Bpe.segment("hash") == Vector("hash"))
  }

  test("merge table is valid: every side is a char or an earlier product") {
    val products = scala.collection.mutable.Set.empty[String]
    for ((a, b) <- Bpe.Merges) {
      assert(a.length == 1 || products.contains(a), s"left side '$a' has no earlier rank")
      assert(b.length == 1 || products.contains(b), s"right side '$b' has no earlier rank")
      products += (a + b)
    }
  }

  test("segmentVocab covers the corpus and conserves characters") {
    val rows = Bpe.segmentVocab(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, pieces, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(pieces.split(" ").mkString == tok, s"pieces of '$tok' must concatenate back")
      assert(pieces.split(" ").length.toLong == n)
    }
  }

  test("distributed trainer matches an independent local BPE trainer exactly") {
    import org.apache.spark.sql.functions._
    val nMerges = 12
    // independent local reference: same objective (max pair count, ties by
    // pair ascending), straightforward in-memory loop over token counts
    val counts = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var local = Vector.empty[(String, String, Long)]
    var segs = counts.map { case (t, n) => t.map(_.toString).toVector -> n }.toVector
    for (_ <- 0 until nMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((pcs, n) <- segs; Vector(x, y) <- pcs.sliding(2))
        pairCounts((x, y)) = pairCounts.getOrElse((x, y), 0L) + n
      if (pairCounts.nonEmpty) {
        val ((a, b), c) = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        local :+= ((a, b, c))
        // re-segment with the grown table (leftmost-fixpoint, same as Bpe.segment)
        val table = local.map(m => (m._1, m._2))
        segs = counts.map { case (t, n) => Bpe.segment(t, table) -> n }.toVector
      }
    }
    val dist = Bpe.learnMerges(spark, sf, nMerges).map(m => (m._2, m._3, m._4))
    assert(dist == local, s"distributed $dist vs local $local")
  }
}
