package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Internal salt column — prefixed so it cannot collide with (and
    * silently replace) a caller's own `salt` column, and dropped from the
    * output so the join's schema is exactly big ⋈ dim. */
  private val SaltCol = "__graft_salt"

  /** The salting core over arbitrary inputs: `big` gains a deterministic
    * salt derived from `saltSrc` (a per-row column uncorrelated with the
    * join key — an id or hash), `dim` is exploded `salts`× so every
    * (key, salt) combination exists, and the shuffle keys become
    * (key, salt) — a hot key's rows spread over `salts` tasks instead of
    * one straggler. `hint("shuffle_hash")` keeps the join a shuffle join
    * (broadcasting the dim would bypass the technique; at real scale the
    * dim that needs salting is one that does NOT fit in memory).
    * Result rows and schema are identical to the unsalted join — the salt
    * is purely an execution-layout detail (SkewSpec pins the row parity
    * AND the task-balance win on a skewed fixture). */
  def saltedJoinOf(big: DataFrame, saltSrc: Column, bigKey: Column,
                   dim: DataFrame, dimKey: Column, salts: Int = Salts): DataFrame = {
    require(!big.columns.contains(SaltCol) && !dim.columns.contains(SaltCol),
      s"inputs must not already carry the internal column $SaltCol")
    val b = big.withColumn(SaltCol, pmod(saltSrc, lit(salts)))
    val d = dim.withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    b.hint("shuffle_hash")
      .join(d, bigKey === dimKey && b(SaltCol) === d(SaltCol))
      .drop(b(SaltCol)).drop(d(SaltCol))
  }

  /** Salted equi-join of events (big, potentially hot user_ids) against
    * customer (small dim), produced WITHOUT broadcasting so the salting is
    * actually exercised. Result is identical to the plain join — the salt
    * is an execution detail, which is exactly the point (and what the
    * DuckDB oracle checks). */
  def saltedEventCustomerJoin(s: SparkSession, dir: String): DataFrame =
    saltedJoinOf(
      Tables(s, dir, "events"), col("event_id"), col("user_id"),
      Tables(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
      col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"))

  val saltedEventCustomerJoinSql: String =
    """SELECT event_id, user_id, c_mktsegment
      |FROM events JOIN customer ON user_id = c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_join" -> (saltedEventCustomerJoin _))

  val oracles: Map[String, String] = Map(
    "q_skew_salted_join" -> saltedEventCustomerJoinSql)
}
