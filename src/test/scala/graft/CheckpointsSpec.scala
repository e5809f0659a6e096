package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class CheckpointsSpec extends AnyFunSuite with SparkTestBase {

  test("local registers pinned blocks and releaseAll frees them") {
    val sc = spark.sparkContext
    Checkpoints.releaseAll() // drain leftovers from earlier suites
    val before = sc.getPersistentRDDs.size
    val cp = Checkpoints.local(Tables(spark, sf, "documents").select(col("doc_id")))
    assert(cp.count() > 0)
    assert(sc.getPersistentRDDs.size > before,
      "localCheckpoint should pin blocks the catalog cache cannot see")
    Checkpoints.releaseAll()
    assert(sc.getPersistentRDDs.size <= before,
      "releaseAll must unpersist every registered checkpoint RDD")
  }

  test("release frees one checkpoint without touching others") {
    val sc = spark.sparkContext
    Checkpoints.releaseAll()
    val base = sc.getPersistentRDDs.size
    val a = Checkpoints.local(Tables(spark, sf, "documents").select(col("doc_id")))
    val b = Checkpoints.local(Tables(spark, sf, "documents").select(col("lang")))
    a.count(); b.count()
    val withBoth = sc.getPersistentRDDs.size
    assert(withBoth >= base + 2)
    Checkpoints.release(a)
    assert(sc.getPersistentRDDs.size == withBoth - 1)
    // the surviving checkpoint still serves reads after its sibling's release
    assert(b.count() > 0)
    Checkpoints.releaseAll()
  }
}
