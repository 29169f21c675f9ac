package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Layer-B relational operator library (SURVEY.md §2.6).
  *
  * The reference delegates every relational operation to its MySQL sink
  * (/root/reference/main.go:128-135); here each one is a native, declarative
  * Spark plan so Catalyst gets predicate pushdown, column pruning, join
  * selection and AQE for free.
  *
  * Determinism contract with the DuckDB oracle (driver hash-compares):
  *   - every aggregate over a double goes through an exact DECIMAL cast on
  *     BOTH sides, so no result depends on floating summation order;
  *   - averages are derived as double(decimal_sum)/count — single IEEE ops;
  *   - per-row double arithmetic (price * (1-discount)) is bitwise
  *     deterministic and used freely;
  *   - every query ends in a total ORDER BY.
  *
  * Scale notes (100 TB design intent, graded per query below):
  *   - dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *     broadcast explicitly — no shuffle of the fact side;
  *   - window queries shuffle once on the partition key;
  *   - top-k goes through TakeOrderedAndProject (no global sort of the
  *     fact table).
  */
object Relational {

  private val dec2 = DecimalType(18, 2)
  private val dec2w = DecimalType(38, 2)
  private val dec6 = DecimalType(18, 6)
  private val dec6w = DecimalType(38, 6)

  /** Exact sum of a 2-dp-ish double column: decimal in, wide decimal out. */
  private def dsum2(c: Column): Column = sum(c.cast(dec2)).cast(dec2w)
  private def dsum6(c: Column): Column = sum(c.cast(dec6)).cast(dec6w)

  /** Hash-stable terminal form of an exact decimal: its plain string
    * rendering (identical digits on Spark and DuckDB at matching scale).
    * The driver's hash compare stringifies values per engine reader, which
    * makes DECIMAL columns hash-unstable even when numerically equal
    * (CORRECTNESS_r02: all 14 mismatches were terminal DECIMAL columns) —
    * and a double cast would double-round once the unscaled value passes
    * 2^53. Strings are exact at any magnitude.
    */
  private def dsum2s(c: Column): Column = dsum2(c).cast("string")
  private def dsum6s(c: Column): Column = dsum6(c).cast("string")

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: scan → filter → hash agg (partial+final
    * map-side combine is automatic) → tiny sort. Scales linearly; the only
    * shuffle carries 4 groups.
    */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("qty_dec"),
        dsum2(col("l_extendedprice")).as("base_dec"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_dec"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charge_dec"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("qty_dec").cast("string").as("sum_qty"),
        col("base_dec").cast("string").as("sum_base_price"),
        col("disc_dec").cast("string").as("sum_disc_price"),
        col("charge_dec").cast("string").as("sum_charge"),
        col("count_order"),
        (col("qty_dec").cast("double") / col("count_order")).as("avg_qty"),
        (col("base_dec").cast("double") / col("count_order")).as("avg_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(qty_dec AS VARCHAR) AS sum_qty,
      |  CAST(base_dec AS VARCHAR) AS sum_base_price,
      |  CAST(disc_dec AS VARCHAR) AS sum_disc_price,
      |  CAST(charge_dec AS VARCHAR) AS sum_charge,
      |  count_order,
      |  CAST(qty_dec AS DOUBLE)/count_order AS avg_qty,
      |  CAST(base_dec AS DOUBLE)/count_order AS avg_price
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty_dec,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS base_dec,
      |    CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS disc_dec,
      |    CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS charge_dec,
      |    count(*) AS count_order
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |  GROUP BY l_returnflag, l_linestatus)
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Filter + projection with per-row computed column. Predicate and the
    * 4-column ReadSchema push all the way into the parquet scan.
    */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice*(1.0-l_discount) AS revenue
      |FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Top-k: Catalyst plans TakeOrderedAndProject — per-partition heaps, no
    * global sort, constant memory at any scale.
    */
  def q03TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val q03Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Star join: fact(customer) ⋈ broadcast(nation) ⋈ broadcast(region).
    * Zero shuffles on the build sides; one shuffle for the final agg.
    */
  def q04JoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), dsum2s(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("r_name")

  val q04Sql: String =
    """SELECT r_name, count(*) AS n_customers,
      |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5-style multi-join: two big-fact shuffles (lineitem⋈orders on
    * orderkey, then ⋈customer on custkey), everything else broadcast. AQE
    * re-plans the middle joins at runtime stats.
    */
  def q05RevenueByNation(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA"
        && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(dsum6s(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("n_name")

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue
      |FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Left-semi join (EXISTS). The filtered orders side is aggregated to
    * distinct keys by the semi-join itself; no duplicate blowup.
    */
  def q06SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  val q06Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Left-anti join (NOT EXISTS): customers with no high-value order.
    * (Every customer has *some* order in this data, so the plain
    * never-ordered variant would be a vacuous 0-row check.)
    */
  def q07AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val q07Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Window ranking: top-3 orders per customer. One shuffle on the window
    * partition key; at 100 TB the per-customer partitions stay small so no
    * skew concern.
    */
  def q08WindowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  val q08Sql: String =
    """SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Running aggregates: cumulative sum + lag per user ordered by event id.
    * Exact DECIMAL accumulation so the running values hash-match. Ordering
    * key is event_id (monotone with ts) — raw ns timestamps are avoided
    * because Spark truncates parquet ns→µs while DuckDB keeps ns.
    */
  def q09WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("running_value",
        sum(col("value").cast(dec2)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(dec2w).cast("string"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select("user_id", "event_id", "value", "running_value", "prev_value")
      .orderBy("user_id", "event_id")
  }

  val q09Sql: String =
    """SELECT user_id, event_id, value,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
      |         OVER (PARTITION BY user_id ORDER BY event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS VARCHAR) AS running_value,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Set ops: UNION (distinct) then EXCEPT. Spark plans these as aggregates /
    * left-anti joins — no quadratic behavior.
    */
  def q10UnionExcept(s: SparkSession, d: String): DataFrame = {
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("c_custkey"))
    val nation3 = Tables.customer(s, d).filter(col("c_nationkey") === 3).select(col("c_custkey"))
    rich.union(big).distinct().except(nation3).orderBy("c_custkey")
  }

  val q10Sql: String =
    """(SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      | UNION
      | SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000)
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_nationkey = 3
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** ROLLUP with subtotal rows; NULL group markers are coalesced to 'ALL' on
    * both sides so hashing and ordering are engine-independent.
    */
  def q11Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum2s(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val q11Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n_rows,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q12
  /** CUBE over two order dims. */
  def q12Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum2s(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("sum_price"))
      .orderBy("orderstatus", "orderpriority")

  val q12Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
      |       coalesce(o_orderpriority, 'ALL') AS orderpriority,
      |       count(*) AS n_orders,
      |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin

  // ---------------------------------------------------------------- q13
  /** GROUPING SETS via SQL on registered views (Catalyst Expand operator). */
  def q13GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  val q13Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q14
  /** HAVING: group filter after aggregation. */
  def q14Having(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum2s(col("o_totalprice")).as("sum_price"))
      .filter(col("n_orders") >= 15)
      .orderBy("o_custkey")

  val q14Sql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 15
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Scalar subquery: orders above 1.5× the global average price. The
    * 1-row aggregate is cross-broadcast, not collected on the driver.
    * The average is derived from an exact decimal sum (one IEEE division),
    * not avg() over raw doubles — a summation-order-dependent float
    * accumulation could flip rows within 1 ulp of the threshold between
    * engines.
    */
  def q15ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val avgDf = o.agg(
      (dsum2(col("o_totalprice")).cast("double") / count(lit(1))).as("av"))
    o.crossJoin(broadcast(avgDf))
      .filter(col("o_totalprice") > lit(1.5) * col("av"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val q15Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) / count(*)
      |  FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Conditional aggregation (pivot-style counting) per user. */
  def q16ConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        count(when(col("event_type") === "error", 1)).as("n_errors"),
        sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)).cast(dec2)).cast(dec2w).cast("string").as("purchase_value"))
      .orderBy("user_id")

  val q16Sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
      |  CAST(CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS purchase_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q17
  /** String scalar functions over part; all codegen'd built-ins. */
  def q17StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_type").like("%PROMO%") || col("p_type").like("%ECONOMY%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 12).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"))
      .orderBy("p_partkey")

  val q17Sql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_u,
      |  substring(p_name, 1, 12) AS name_pfx, CAST(length(p_name) AS INT) AS name_len,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  regexp_replace(p_type, ' ', '_', 'g') AS type_u
      |FROM part WHERE p_type LIKE '%PROMO%' OR p_type LIKE '%ECONOMY%'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Date bucketing: monthly order stats. date_trunc is a codegen'd
    * built-in; at scale this is partition-prunable if the table is
    * date-partitioned.
    */
  def q18DateAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("order_month"))
      .agg(count(lit(1)).as("n_orders"), dsum2s(col("o_totalprice")).as("sum_price"))
      .orderBy("order_month")

  val q18Sql: String =
    """SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month,
      |  count(*) AS n_orders,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
      |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin

  // ---------------------------------------------------------------- q19
  /** JSON extraction from the events.props column. */
  def q19Json(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .groupBy("k_val").agg(count(lit(1)).as("n"))
      .orderBy("k_val")

  val q19Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_val, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY k_val""".stripMargin

  // ---------------------------------------------------------------- q20
  /** As-of join: for each purchase, the latest prior view of the same user.
    * Implemented as ONE shuffle (union + running last over the user
    * partition), not a pairwise inequality join — at 100 TB the pairwise
    * form explodes, this form is linear. Ordering key is event_id (monotone
    * with ts; avoids ns-vs-µs timestamp mismatch between engines).
    */
  def q20AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    e.withColumn("last_view_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "last_view_id")
      .orderBy("event_id")
  }

  val q20Sql: String =
    """SELECT p.event_id, p.user_id, v.event_id AS last_view_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.event_id > v.event_id
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Theta-ish self join: nation pairs within a region (equi key + residual
    * inequality — hash join, not nested loop).
    */
  def q21ThetaJoin(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d)
    val a = n.select(col("n_nationkey").as("ka"), col("n_name").as("nation_a"),
      col("n_regionkey").as("ra"))
    val b = n.select(col("n_nationkey").as("kb"), col("n_name").as("nation_b"),
      col("n_regionkey").as("rb"))
    a.join(b, col("ra") === col("rb") && col("ka") < col("kb"))
      .select("nation_a", "nation_b")
      .orderBy("nation_a", "nation_b")
  }

  val q21Sql: String =
    """SELECT a.n_name AS nation_a, b.n_name AS nation_b
      |FROM nation a JOIN nation b
      |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      |ORDER BY nation_a, nation_b""".stripMargin

  // ---------------------------------------------------------------- q22
  /** INTERSECT: customers having both fulfilled and open orders. */
  def q22Intersect(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  val q22Sql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Multi count-distinct (Catalyst expands to a single pass). */
  def q23DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q23Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Range (band) join against a tiny in-memory bins dimension — broadcast
    * nested loop on a 5-row side, then hash agg.
    */
  def q24RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bins = Seq((0.0, 100.0, "b0"), (100.0, 200.0, "b1"), (200.0, 300.0, "b2"),
      (300.0, 400.0, "b3"), (400.0, 1000.0, "b4"))
      .toDF("lo", "hi", "bin")
    Tables.events(s, d)
      .join(broadcast(bins), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), dsum2s(col("value")).as("sum_value"))
      .orderBy("bin")
  }

  val q24Sql: String =
    """SELECT bin, count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
      |FROM events JOIN (VALUES (0.0, 100.0, 'b0'), (100.0, 200.0, 'b1'),
      |                         (200.0, 300.0, 'b2'), (300.0, 400.0, 'b3'),
      |                         (400.0, 1000.0, 'b4')) AS bins(lo, hi, bin)
      |  ON value >= lo AND value < hi
      |GROUP BY bin ORDER BY bin""".stripMargin

  /** All relational queries, keyed for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_topk" -> (q03TopK _),
    "q04_join_agg" -> (q04JoinAgg _),
    "q05_revenue_by_nation" -> (q05RevenueByNation _),
    "q06_semi_join" -> (q06SemiJoin _),
    "q07_anti_join" -> (q07AntiJoin _),
    "q08_window_topn" -> (q08WindowTopN _),
    "q09_window_running" -> (q09WindowRunning _),
    "q10_union_except" -> (q10UnionExcept _),
    "q11_rollup" -> (q11Rollup _),
    "q12_cube" -> (q12Cube _),
    "q13_grouping_sets" -> (q13GroupingSets _),
    "q14_having" -> (q14Having _),
    "q15_scalar_subquery" -> (q15ScalarSubquery _),
    "q16_conditional_agg" -> (q16ConditionalAgg _),
    "q17_string_funcs" -> (q17StringFuncs _),
    "q18_date_agg" -> (q18DateAgg _),
    "q19_json" -> (q19Json _),
    "q20_asof_join" -> (q20AsofJoin _),
    "q21_theta_join" -> (q21ThetaJoin _),
    "q22_intersect" -> (q22Intersect _),
    "q23_distinct_agg" -> (q23DistinctAgg _),
    "q24_range_join" -> (q24RangeJoin _))

  /** Matching DuckDB oracle SQL. */
  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_topk" -> q03Sql,
    "q04_join_agg" -> q04Sql,
    "q05_revenue_by_nation" -> q05Sql,
    "q06_semi_join" -> q06Sql,
    "q07_anti_join" -> q07Sql,
    "q08_window_topn" -> q08Sql,
    "q09_window_running" -> q09Sql,
    "q10_union_except" -> q10Sql,
    "q11_rollup" -> q11Sql,
    "q12_cube" -> q12Sql,
    "q13_grouping_sets" -> q13Sql,
    "q14_having" -> q14Sql,
    "q15_scalar_subquery" -> q15Sql,
    "q16_conditional_agg" -> q16Sql,
    "q17_string_funcs" -> q17Sql,
    "q18_date_agg" -> q18Sql,
    "q19_json" -> q19Sql,
    "q20_asof_join" -> q20Sql,
    "q21_theta_join" -> q21Sql,
    "q22_intersect" -> q22Sql,
    "q23_distinct_agg" -> q23Sql,
    "q24_range_join" -> q24Sql)
}
