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

  test("segment seeds by code points: non-BMP chars are single symbols") {
    // U+1F600 is 2 UTF-16 units; a charAt seed would yield surrogate halves
    val emoji = new String(Character.toChars(0x1f600))
    assert(Bpe.segment(emoji + "a" + emoji, Nil) == Vector(emoji, "a", emoji))
    // merges apply across/around non-BMP symbols unchanged
    assert(Bpe.segment(emoji + "th" + emoji, Seq(("t", "h"))) ==
      Vector(emoji, "th", emoji))
    // a pair of identical emoji merges like any other pair
    assert(Bpe.segment(emoji + emoji, Seq((emoji, emoji))) == Vector(emoji + emoji))
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
    var segs = counts.map { case (t, n) => Bpe.segment(t, Nil) -> n }.toVector
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

  test("batched trainer: batch=1 degenerates to the sequential trainer") {
    val seq = Bpe.learnMerges(spark, sf, 8)
    val b1 = Bpe.learnMergesBatched(spark, sf, 8, batch = 1)
    assert(b1 == seq, s"batch=1 $b1 vs sequential $seq")
  }

  test("batched trainer equals sequential (ranks, counts and all) where the classic equivalence holds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // fixture where batched == sequential PROVABLY: each word is one
    // disjoint pair family, so adoptions never interact — no shared
    // symbols across candidates, and a fully-merged word emits no product
    // pairs. On general corpora the two contracts diverge (an adopted
    // pair's symbols block same-round neighbors the sequential trainer
    // would take — the documented batched-BPE caveat on learnMergesBatched).
    val dir = java.nio.file.Files.createTempDirectory("bpe_batch").toString
    val words = Seq(("ab", 100), ("cd", 90), ("ef", 80), ("gh", 70), ("xy", 5))
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    Seq((0L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("bpefix"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val seq = Bpe.learnMerges(spark, dir, 5)
    val bat = Bpe.learnMergesBatched(spark, dir, 5, batch = 4)
    assert(seq == Seq((0, "a", "b", 100L), (1, "c", "d", 90L), (2, "e", "f", 80L),
      (3, "g", "h", 70L), (4, "x", "y", 5L)))
    assert(bat == seq, s"batched $bat vs sequential $seq")
    // and the batch dial does what it claims: 5 merges in 2 vocab rounds
    // (4 + 1) instead of 5 — the O(R²) → O(R²/B) re-segmentation saving
  }

  test("batched trainer on the corpus: valid merge table, true counts, deterministic") {
    // general-corpus contract: the result is a VALID merge table (each
    // side a char or earlier product), every within-round adoption group
    // is symbol-disjoint (the soundness condition for its recorded count
    // being the true pair count at round start), and the run is a pure
    // function of the corpus
    val bat = Bpe.learnMergesBatched(spark, sf, 12, batch = 4)
    assert(bat.length == 12)
    val products = scala.collection.mutable.Set.empty[String]
    for ((_, a, b, _) <- bat) {
      assert(a.codePointCount(0, a.length) == 1 || products.contains(a), s"invalid left '$a'")
      assert(b.codePointCount(0, b.length) == 1 || products.contains(b), s"invalid right '$b'")
      products += (a + b)
    }
    assert(bat == Bpe.learnMergesBatched(spark, sf, 12, batch = 4), "must be deterministic")
  }
}
