package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal operators beyond plain tumbling windows: as-of join, sliding
  * windows, session windows, range join.
  *
  * The as-of join is the "operator Spark lacks" case (SURVEY.md guidance
  * tier (a)): composed from a tagged union + running `last(ignoreNulls)`
  * window — a single sort-based pass per key, which is exactly how a
  * native as-of join executes. One shuffle on the key, no point-in-time
  * self-join blowup; at 100 TB this beats the naive
  * `JOIN ... ON a.ts > b.ts` + argmax formulation by orders of magnitude.
  */
object Temporal {

  private def events(s: SparkSession, dir: String) = Tables(s, dir, "events")

  /** AS-OF JOIN: for every purchase event, the most recent STRICTLY-prior
    * click of the same user (DuckDB `ASOF JOIN` semantics with `p.ts >
    * c.ts`). Tagged union sorted by (ts, tag) — purchases sort before
    * same-timestamp clicks so strictness holds — then a running
    * `last(click_id, ignoreNulls)` per user. */
  def asOfJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
              col("event_id").as("click_event_id"), lit(null).cast("long").as("purchase_event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
              lit(null).cast("long").as("click_event_id"), col("event_id").as("purchase_event_id"))
    // tag order 0-before-1 at equal ts ⇒ a purchase never sees a
    // same-instant click (strict inequality); click_event_id breaks ties
    // among same-timestamp clicks deterministically (highest id wins —
    // DuckDB's ASOF tie-winner is unspecified, so equal-ts click pairs are
    // the one case the oracle can't pin; event timestamps are ns-unique in
    // the testdata)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("click_event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionAll(purchases)
      .withColumn("last_click", last(col("click_event_id"), ignoreNulls = true).over(w))
      .filter(col("purchase_event_id").isNotNull)
      .select(col("purchase_event_id"), col("user_id"), col("last_click").as("click_event_id"))
  }

  val asOfJoinSql: String =
    """SELECT p.event_id AS purchase_event_id, p.user_id,
      |       c.event_id AS click_event_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts > c.ts""".stripMargin

  /** Sliding windows: 10-minute windows every 5 minutes (each event lands
    * in exactly two windows). Spark expands window instances map-side;
    * one shuffled aggregation. */
  def slidingWindowCounts(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(unix_timestamp(window(col("ts"), "10 minutes", "5 minutes")
        .getField("start")).as("w_start"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  val slidingWindowCountsSql: String =
    """WITH x AS (
      |  SELECT user_id, CAST(floor(floor(epoch(ts)) / 300) * 300 AS BIGINT) AS w_start FROM events
      |  UNION ALL
      |  SELECT user_id, CAST(floor(floor(epoch(ts)) / 300) * 300 - 300 AS BIGINT) AS w_start FROM events)
      |SELECT w_start, count(DISTINCT user_id) AS n_users FROM x GROUP BY 1""".stripMargin

  /** Session windows: per-user sessions with a 30-minute inactivity gap —
    * `session_window` is Spark's native merging-window state machine; the
    * oracle reproduces it with the classic gaps-and-islands formulation
    * (lag + running sum of breaks), microsecond-exact via epoch_us. */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_timestamp(col("sw.start")).as("session_start"),
              col("n_events"))

  val sessionWindowsSql: String =
    """WITH e AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id, CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS session_start,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** Range join (equi + interval predicate): lineitems shipped within 60
    * days of their order's date, revenue per order month. The equi key
    * carries the join (hash/broadcast); the range predicate is a residual
    * filter — no interval-join blowup. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    Tables(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey") &&
               col("l_shipdate") >= col("o_orderdate") &&
               col("l_shipdate") < date_add(col("o_orderdate"), 60))
      .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate"))).as("order_month"))
      .agg(count(lit(1)).as("n_lineitems"),
           OracleSafe.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  val rangeJoinSql: String =
    """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS order_month,
      |  count(*) AS n_lineitems,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1""".stripMargin

  /** CUBE over (mktsegment, orderpriority): all four grouping sets. */
  def cubeOrders(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           round(avg(col("o_totalprice")), 4).as("avg_price"))

  val cubeOrdersSql: String =
    """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
      |  round(avg(o_totalprice), 4) AS avg_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY CUBE(c_mktsegment, o_orderpriority)""".stripMargin

  /** Explicit GROUPING SETS (a set the rollup/cube shorthands can't
    * express: totals by segment-and-priority, by segment, and grand). */
  def groupingSetsOrders(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupingSets(
        Seq(Seq(col("c_mktsegment"), col("o_orderpriority")), Seq(col("c_mktsegment")), Seq()),
        col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  val groupingSetsOrdersSql: String =
    """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (c_mktsegment), ())""".stripMargin

  /** Conversion funnel view → click → purchase: per user, the first view,
    * the first click STRICTLY AFTER it, the first purchase strictly after
    * that — ordered-step semantics, not mere event presence. Three
    * filtered aggregations chained by keyed joins (each stage's table
    * shrinks to the surviving users); all timestamps are floored epoch
    * seconds, so stage membership is integer-exact in both engines. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(
      col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("tss"))
    // each stage is checkpointed: the three stage counts share subplans
    // (v feeds c feeds p AND its own count), and Spark does not dedupe
    // common subtrees across a union — without materialization the events
    // scan would run ~6x per action
    val v = graft.Checkpoints.local(
      e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tss")).as("t_view")))
    val c = graft.Checkpoints.local(
      e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("tss") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("tss")).as("t_click")))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("tss") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("tss")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_users")).select(lit("view").as("stage"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users")).select(lit("click").as("stage"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users")).select(lit("purchase").as("stage"), col("n_users")))
  }

  val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events),
      |v AS (SELECT user_id, min(tss) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(tss) AS t_click FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND tss > t_view GROUP BY 1),
      |p AS (SELECT e.user_id, min(tss) AS t_purchase FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND tss > t_click GROUP BY 1)
      |SELECT 'view' AS stage, count(*) AS n_users FROM v
      |UNION ALL SELECT 'click', count(*) FROM c
      |UNION ALL SELECT 'purchase', count(*) FROM p""".stripMargin

  /** Day-7 cohort retention: cohort = a user's first-seen epoch day;
    * retained = the user has ANY event ≥ 7 days later. Two keyed
    * aggregations (per-user first/last day, then per-cohort counts); the
    * retention rate exports via [[OracleSafe.avgRound4]]. Day arithmetic
    * is FLOOR division for any sign — `(t − pmod(t, 86400)) div 86400`
    * (pmod is non-negative, so the numerator is the floor multiple):
    * Spark's bare `div` truncates toward zero, which diverges from
    * DuckDB's floor `//` on pre-epoch timestamps. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val tss = unix_timestamp(col("ts"))
    val days = events(s, dir).select(
      col("user_id"),
      call_function("div", tss - pmod(tss, lit(86400L)), lit(86400L)).as("day"))
    val per = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("dmax"))
    per.groupBy(col("d0").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
           count_if(col("dmax") >= col("d0") + 7).as("n_retained"))
      .select(col("cohort_day"), col("n_users"), col("n_retained"),
              OracleSafe.avgRound4(col("n_retained"), col("n_users")).as("retention"))
  }

  val retentionSql: String =
    s"""WITH d AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |per AS (SELECT user_id, min(day) AS d0, max(day) AS dmax FROM d GROUP BY 1)
      |SELECT d0 AS cohort_day, count(*) AS n_users,
      |  CAST(count(*) FILTER (WHERE dmax >= d0 + 7) AS BIGINT) AS n_retained,
      |  ${OracleSafe.avgRound4Sql("CAST(count(*) FILTER (WHERE dmax >= d0 + 7) AS BIGINT)", "count(*)")} AS retention
      |FROM per GROUP BY d0""".stripMargin

  /** Top-k clickstream paths: each user's event stream in deterministic
    * `(ts, event_id)` order, sliding 3-event windows of event types
    * (`lead` ×2 over a PARTITIONED window), corpus-wide path counts,
    * top-k with a lexical tie-break. The event_id tie-break is
    * load-bearing for parity: same-second events would otherwise order
    * differently across engines. Plans as partitioned window →
    * partial+final agg → TakeOrderedAndProject. */
  def eventPaths(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tss"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"),
              unix_timestamp(col("ts")).as("tss"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  def eventPathsSql(k: Int = 20): String =
    s"""WITH o AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM (SELECT user_id, event_id, event_type,
      |          CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
      |FROM o WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT $k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tmp_event_paths" -> ((s: SparkSession, d: String) => eventPaths(s, d)),
    "q_tmp_funnel" -> (funnel _),
    "q_tmp_retention" -> (retention _),
    "q_tmp_grouping_sets" -> (groupingSetsOrders _),
    "q_tmp_asof_join" -> (asOfJoin _),
    "q_tmp_sliding_window" -> (slidingWindowCounts _),
    "q_tmp_session_window" -> (sessionWindows _),
    "q_tmp_range_join" -> (rangeJoin _),
    "q_tmp_cube" -> (cubeOrders _))

  val oracles: Map[String, String] = Map(
    "q_tmp_event_paths" -> eventPathsSql(),
    "q_tmp_funnel" -> funnelSql,
    "q_tmp_retention" -> retentionSql,
    "q_tmp_grouping_sets" -> groupingSetsOrdersSql,
    "q_tmp_asof_join" -> asOfJoinSql,
    "q_tmp_sliding_window" -> slidingWindowCountsSql,
    "q_tmp_session_window" -> sessionWindowsSql,
    "q_tmp_range_join" -> rangeJoinSql,
    "q_tmp_cube" -> cubeOrdersSql)
}
