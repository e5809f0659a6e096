package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch relational analytics surface (SURVEY.md §7.2 item 2) — the
  * operator categories the reference lacks entirely (§2.3: joins, SQL
  * window functions, sorts/limits, set ops, scalar library), built on
  * Catalyst built-ins so pushdown/pruning/join-selection are free.
  *
  * Scale notes per query are on each member. General rules applied:
  * dimension tables (region/nation/customer/supplier/part at TPC-H
  * proportions) are broadcast — at 100 TB the fact tables (lineitem,
  * orders, events) shuffle at most once on their join key; aggregations
  * are single hash-partial+final passes; top-k uses TakeOrderedAndProject
  * (per-partition heap + driver merge, no global sort).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)


  import OracleSafe.moneySum

  /** TPC-H Q1-style pricing summary: one scan of lineitem, predicate pushed
    * to parquet, 6 aggregates over 2 grouping keys (map-side partial agg ⇒
    * shuffle carries ~|groups| rows). Doubles rounded for oracle parity. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: top-10 open orders by revenue for one market segment.
    * customer is a broadcast dim (150 rows/SF-proportional); orders⋈lineitem
    * shuffles on orderkey. Tie-proof ordering (rounded revenue, then key) so
    * the LIMIT boundary is engine-independent. */
  def topRevenueOrders(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < cut)
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("orderdate_epoch"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val topRevenueOrdersSql: String =
    """SELECT l_orderkey,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation where customer and supplier share the
    * nation. region→nation→supplier chain is all broadcast; the only
    * shuffles are lineitem⋈orders on orderkey and the final tiny groupBy. */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation").join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val sup = t(s, dir, "supplier").join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    t(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
                          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))

  }

  val localSupplierVolumeSql: String =
    """SELECT n_name, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  /** ROLLUP aggregation (grand total + per-segment + per-(segment,status)).
    * Spark expands grouping sets map-side; still one shuffle. */
  def rollupOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("total_price"))

  val rollupOrdersSql: String =
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)""".stripMargin

  /** SQL window functions: rank / dense_rank / lag / running sum per
    * customer. Deterministic ORDER BY (date, then key) so ties can't
    * reorder between engines. One shuffle on o_custkey serves all four
    * window specs (same partitioning). */
  def windowFunctions(s: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    val byDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(byPrice).as("price_rank"),
      dense_rank().over(byPrice).as("price_dense_rank"),
      round(lag(col("o_totalprice"), 1).over(byDate), 2).as("prev_price"),
      round(sum(col("o_totalprice")).over(
        byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"))
  }

  val windowFunctionsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
      |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_dense_rank,
      |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders""".stripMargin

  /** Top-k: Catalyst plans ORDER BY + LIMIT as TakeOrderedAndProject —
    * per-partition heaps, no global sort. No arithmetic ⇒ raw parquet
    * doubles are bit-identical across engines. */
  def topKParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(25)

  val topKPartsSql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |ORDER BY p_retailprice DESC, p_partkey LIMIT 25""".stripMargin

  /** Set operations: (customers with orders ∪ high-balance customers) ∖
    * AUTOMOBILE-segment customers. All three legs are key-only projections.
    * NOTE: DataFrame.union is UNION ALL — parity with DuckDB's distinct
    * UNION holds here only because the trailing `.except` applies distinct
    * semantics to the whole result. Don't reuse the union leg alone. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val withOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
    val highBal = c.filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey"))
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey").as("custkey"))
    withOrders.union(highBal).except(auto)
  }

  val setOpsSql: String =
    """(SELECT o_custkey AS custkey FROM orders
      | UNION
      | SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
      |EXCEPT
      |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""".stripMargin

  /** Left-semi join (EXISTS): customers that placed a high-value order.
    * Fact side is aggregated to keys before the broadcast-able semi join. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val semiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)""".stripMargin

  /** Left-anti join (NOT EXISTS): customers who never placed an order above
    * 250k (threshold chosen to be non-empty at every SF). */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 250000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin

  /** Scalar-function library over part: string ops, math, modulo —
    * all codegen'd Catalyst built-ins, no UDFs. */
  def scalarFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_name"), 1, 5).as("name_pfx"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      round(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
      (col("p_size") % 7).cast("long").as("size_mod"),
      when(col("p_retailprice") > 1500, "premium").otherwise("standard").as("tier"))

  val scalarFunctionsSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substr(p_name, 1, 5) AS name_pfx,
      |  p_brand || '#' || p_type AS brand_type,
      |  round(sqrt(p_retailprice), 4) AS price_sqrt,
      |  CAST(p_size % 7 AS BIGINT) AS size_mod,
      |  CASE WHEN p_retailprice > 1500 THEN 'premium' ELSE 'standard' END AS tier
      |FROM part""".stripMargin

  /** Date/time scalar functions over orders. */
  def dateFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("order_year"),
      month(col("o_orderdate")).cast("long").as("order_month"),
      dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
      quarter(col("o_orderdate")).cast("long").as("order_quarter"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_2002"),
      unix_timestamp(add_months(col("o_orderdate"), 3)).as("plus3m_epoch"))

  val dateFunctionsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
      |  CAST(day(o_orderdate) AS BIGINT) AS order_day,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
      |  CAST(epoch(o_orderdate + INTERVAL 3 MONTH) AS BIGINT) AS plus3m_epoch
      |FROM orders""".stripMargin

  /** Statistical aggregates incl. exact median (interpolating percentile in
    * both engines) and sample stddev. */
  def statsAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
        round(median(col("o_totalprice")), 2).as("med_price"))

  val statsAggSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price,
      |  round(avg(o_totalprice), 4) AS avg_price,
      |  round(stddev_samp(o_totalprice), 4) AS sd_price,
      |  round(median(o_totalprice), 2) AS med_price
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** JSON extraction from events.props via from_json (schema'd, codegen'd
    * Jackson parse — the batch analogue of the reference's per-message
    * jsoniter decode, kafkaio.go:76-81). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
              from_json(col("props"),
                org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
                .getField("k").as("k"))

  val jsonExtractSql: String =
    """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events""".stripMargin

  /** PIVOT: per-user event counts, one column per event type. The pivot
    * values are declared (not discovered) so the plan is a single
    * aggregation with no extra distinct-values job — the right call at
    * scale when the category set is known. */
  def pivotEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)

  val pivotEventsSql: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id""".stripMargin

  /** Explode/unnest: word frequencies over part names. */
  def explodeWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  val explodeWordsSql: String =
    """SELECT word, count(*) AS freq
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word""".stripMargin

  /** Exact per-group quantiles: Spark's `percentile` and DuckDB's
    * `quantile_cont` share the definition (index = p·(n−1), symmetric
    * interpolation `(1−frac)·lo + frac·hi` in double — NOT the
    * `lo + (hi−lo)·frac` form, which differs in the last ulp on real
    * data) — hash-parity holds.
    * Exact percentile buffers each group's values (fine per returnflag);
    * the 100 TB path is the approx twin below. */
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    val ps = array(lit(0.25), lit(0.5), lit(0.75), lit(0.99))
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), ps).as("qs"))
      .select(col("l_returnflag"),
        col("qs")(0).as("q25"), col("qs")(1).as("q50"),
        col("qs")(2).as("q75"), col("qs")(3).as("q99"))
  }

  val quantilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.25) AS q25,
      |  quantile_cont(l_extendedprice, 0.5) AS q50,
      |  quantile_cont(l_extendedprice, 0.75) AS q75,
      |  quantile_cont(l_extendedprice, 0.99) AS q99
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Approximate twin (`percentile_approx`, bounded-memory — the
    * per-group sketch that replaces full-group buffering at scale).
    * Rows-only: approximation is engine-specific by construction. */
  def quantilesApprox(s: SparkSession, dir: String): DataFrame = {
    val ps = array(lit(0.25), lit(0.5), lit(0.75), lit(0.99))
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), ps, lit(10000)).as("qs"))
      .select(col("l_returnflag"),
        col("qs")(0).as("q25"), col("qs")(1).as("q50"),
        col("qs")(2).as("q75"), col("qs")(3).as("q99"))
  }

  /** TPC-H Q17-family correlated-aggregate query: lineitem rows whose
    * quantity falls below 20 % of their part's average quantity (the
    * "small-order revenue" probe), rolled up by brand. The correlated
    * `avg` subquery decorrelates into one per-part aggregation joined
    * back to the fact table — lineitem shuffles once on l_partkey for the
    * aggregate and reuses that partitioning for the join; the part dim
    * broadcasts.
    *
    * The threshold predicate is EXACT integer math:
    * `qty < 0.2·avg ⇔ 5·qty·cnt < sum` (quantities are integral) — a
    * double `0.2·(sum/cnt)` comparison diverges between engines in the
    * last ulp on boundary rows. */
  def smallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val perPart = l.groupBy(col("l_partkey")).agg(
      count(lit(1)).as("cnt_l"),
      sum(col("l_quantity").cast("long")).as("sum_qty"))
    l.join(perPart, Seq("l_partkey"))
      .filter(col("l_quantity").cast("long") * lit(5L) * col("cnt_l") < col("sum_qty"))
      .join(broadcast(t(s, dir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))),
            Seq("l_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"),
           moneySum(col("l_extendedprice")).as("small_revenue"))
  }

  val smallQuantityRevenueSql: String =
    s"""WITH pp AS (
      |  SELECT l_partkey, count(*) AS cnt_l,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT p.p_brand, count(*) AS n_small,
      |  ${OracleSafe.moneySumSql("l.l_extendedprice")} AS small_revenue
      |FROM lineitem l
      |JOIN pp USING (l_partkey)
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE CAST(l.l_quantity AS BIGINT) * 5 * pp.cnt_l < pp.sum_qty
      |GROUP BY 1""".stripMargin

  /** TPC-H Q13-family customer order-count distribution: LEFT OUTER join
    * (customers with zero orders must appear in the 0 bucket) feeding a
    * two-level aggregation — count per customer, then histogram of
    * counts. The outer join shuffles both sides on the customer key once;
    * `count(o_orderkey)` (not `count(*)`) makes the no-match rows count
    * 0. The second aggregation reduces to |distinct counts| rows. */
  def customerOrderDistribution(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"))
      .join(t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey")),
            col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  val customerOrderDistributionSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rel_cust_dist" -> (customerOrderDistribution _),
    "q_rel_avg_subquery" -> (smallQuantityRevenue _),
    "q_rel_pivot" -> (pivotEvents _),
    "q_rel_explode" -> (explodeWords _),
    "q_rel_pricing_summary" -> (pricingSummary _),
    "q_rel_top_revenue" -> (topRevenueOrders _),
    "q_rel_local_volume" -> (localSupplierVolume _),
    "q_rel_rollup" -> (rollupOrders _),
    "q_rel_window_funcs" -> (windowFunctions _),
    "q_rel_topk" -> (topKParts _),
    "q_rel_setops" -> (setOps _),
    "q_rel_semi_join" -> (semiJoin _),
    "q_rel_anti_join" -> (antiJoin _),
    "q_rel_scalar_funcs" -> (scalarFunctions _),
    "q_rel_date_funcs" -> (dateFunctions _),
    "q_rel_stats_agg" -> (statsAgg _),
    "q_rel_quantiles" -> (quantiles _),
    "q_rel_quantiles_approx" -> (quantilesApprox _),
    "q_rel_json_extract" -> (jsonExtract _))

  val oracles: Map[String, String] = Map(
    "q_rel_cust_dist" -> customerOrderDistributionSql,
    "q_rel_avg_subquery" -> smallQuantityRevenueSql,
    "q_rel_pivot" -> pivotEventsSql,
    "q_rel_explode" -> explodeWordsSql,
    "q_rel_pricing_summary" -> pricingSummarySql,
    "q_rel_top_revenue" -> topRevenueOrdersSql,
    "q_rel_local_volume" -> localSupplierVolumeSql,
    "q_rel_rollup" -> rollupOrdersSql,
    "q_rel_window_funcs" -> windowFunctionsSql,
    "q_rel_topk" -> topKPartsSql,
    "q_rel_setops" -> setOpsSql,
    "q_rel_semi_join" -> semiJoinSql,
    "q_rel_anti_join" -> antiJoinSql,
    "q_rel_scalar_funcs" -> scalarFunctionsSql,
    "q_rel_date_funcs" -> dateFunctionsSql,
    "q_rel_stats_agg" -> statsAggSql,
    "q_rel_quantiles" -> quantilesSql,
    "q_rel_json_extract" -> jsonExtractSql)
}
