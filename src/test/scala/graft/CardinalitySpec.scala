package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Buckets, Cardinality}

class CardinalitySpec extends AnyFunSuite with SparkTestBase {

  private def ev = Tables(spark, sf, "events")

  test("both approx tiers stay within 5x the HLL rsd bound per day bucket") {
    val exact = Cardinality.exactPerBucket(ev, "day", col("ts"), col("user_id"))
    Seq(
      Cardinality.approxPerBucket(ev, "day", col("ts"), col("user_id")),
      Cardinality.approxPerBucketSketch(ev, "day", col("ts"), col("user_id"))
    ).foreach { approx =>
      val joined = exact.join(approx, "bucket").collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        val e = r.getAs[Long]("n_users")
        val a = r.getAs[Long]("n_users_approx")
        // rsd = 0.81%; 5 sigma margin (deterministic data, fixed hash — this
        // is a sanity envelope, not a statistical test)
        assert(math.abs(a - e) <= math.max(1.0, 5 * 0.0081 * e),
          s"bucket ${r.get(0)}: approx $a vs exact $e")
      }
    }
  }

  test("sketch rollup matches exact counts within HLL bound for every granularity") {
    val exact = Cardinality.statsAllGranularities(ev, col("ts"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val est = Cardinality.sketchRollup(ev, col("ts"), col("user_id")).collect()
    assert(est.length == exact.size)
    est.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val e = exact(key)
      val a = r.getLong(2)
      assert(math.abs(a - e) <= math.max(1.0, 5 * 0.0081 * e), s"$key: sketch $a vs exact $e")
    }
  }

  test("statsAllGranularities emits exactly the five reference StatTypes") {
    val types = Cardinality.statsAllGranularities(ev, col("ts"), col("user_id"))
      .select("Type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Buckets.granularities.map(Buckets.label).toSet)
  }

  test("every event lands in exactly one bucket per granularity (partition law)") {
    Buckets.granularities.foreach { g =>
      val total = Cardinality.exactPerBucket(ev, g, col("ts"), col("event_id"))
        .agg(sum("n_users")).collect()(0).getLong(0)
      assert(total == ev.count(), s"granularity $g loses/duplicates events")
    }
  }
}
