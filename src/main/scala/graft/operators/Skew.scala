package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-mitigation patterns made explicit.
  *
  * At 100 TB, hot join keys (one user producing 1% of all events) turn a
  * hash join into a straggler. Three escalation levels:
  *   1. broadcast the small side (no shuffle of the big side at all) —
  *      what [[Relational]] does for every dimension join;
  *   2. AQE skew-join splitting (`spark.sql.adaptive.skewJoin`) — free,
  *      but only applies to shuffle joins in batch;
  *   3. explicit salting (this module) — the manual fallback that also
  *      works where AQE cannot re-plan (stream-static joins, stateful
  *      aggregations): the big side adds a deterministic salt in
  *      [0, N), the small side is replicated N times, and the join key
  *      becomes (key, salt) — hot keys spread over N tasks.
  */
object Skew {

  val Salts = 8

  /** Salted equi-join of events (big, potentially hot user_ids) against
    * customer (small dim), produced WITHOUT broadcasting so the salting is
    * actually exercised. Result is identical to the plain join — the salt
    * is an execution detail, which is exactly the point (and what the
    * DuckDB oracle checks). */
  def saltedEventCustomerJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables(s, dir, "events")
      // deterministic salt: spreads each hot user's rows over N buckets
      .withColumn("salt", pmod(col("event_id"), lit(Salts)))
    val dim = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
    big.hint("shuffle_hash")
      .join(dim, col("user_id") === col("c_custkey") && big("salt") === dim("salt"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"))
  }

  val saltedEventCustomerJoinSql: String =
    """SELECT event_id, user_id, c_mktsegment
      |FROM events JOIN customer ON user_id = c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_join" -> (saltedEventCustomerJoin _))

  val oracles: Map[String, String] = Map(
    "q_skew_salted_join" -> saltedEventCustomerJoinSql)
}
