package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational layer (SURVEY §2.6): joins, keyed aggregation, SQL
  * window functions, sorts, set ops, scalar functions — all Catalyst
  * built-ins; the design work is scale-shape (broadcast the dimension
  * sides, aggregate before join where possible, keep expressions inside
  * whole-stage codegen).
  */
object Relational extends QueryGroup {
  import Sql._

  /** TPC-H Q1-style pricing summary — the flagship aggregation. */
  private val pricingSummary = Q(
    "q01_pricing_summary",
    "grouped aggregation with exact decimal sums (TPC-H Q1 shape)",
    (s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
             ${oSum("l_quantity")} AS sum_qty,
             ${oSum("l_extendedprice")} AS sum_base_price,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
             ${oSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
             ${oAvg("l_quantity")} AS avg_qty,
             ${oAvg("l_discount")} AS avg_disc,
             COUNT(*) AS count_order
             FROM lineitem GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus"""))

  /** TPC-H Q3-style: selective dimension join → fact aggregation.
    * `customer` and `orders` are small relative to `lineitem`; the
    * filtered customer side is broadcast (no shuffle of the fact table
    * for the dimension join at 100 TB).
    */
  private val joinAgg = Q(
    "q02_join_agg",
    "customer ⋈ orders ⋈ lineitem revenue per order, top 10 (TPC-H Q3 shape)",
    (s, dir) => {
      val t = Tables(s, dir)
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      t.lineitem
        .join(t.orders.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), asc("o_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT o_orderkey,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
             FROM customer
             JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
             WHERE c_mktsegment = 'BUILDING'
             GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  /** TPC-H Q5-style multi-join through the full snowflake, with the
    * colocated-nation condition; all dimension sides broadcastable.
    */
  private val multiJoin = Q(
    "q03_multi_join",
    "5-way snowflake join, revenue by nation (TPC-H Q5 shape)",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy("r_name", "n_name")
    },
    Some(s"""SELECT r_name, n_name,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Left-semi join (EXISTS). */
  private val semiJoin = Q(
    "q04_semi_join",
    "orders having a high-quantity lineitem (left-semi / EXISTS)",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem.filter(col("l_quantity") >= 49.0)
        .select(col("l_orderkey"))
      t.orders.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
            ORDER BY o_orderkey"""))

  /** Left-anti join (NOT EXISTS). */
  private val antiJoin = Q(
    "q05_anti_join",
    "customers with no urgent orders (left-anti / NOT EXISTS)",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** Left-outer join with null handling. */
  private val outerJoin = Q(
    "q06_outer_join",
    "customer left join order counts, nulls → 0",
    (s, dir) => {
      val t = Tables(s, dir)
      val perCust = t.orders.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_ord"),
          dsum(col("o_totalprice")).as("spend"))
      t.customer
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          coalesce(col("n_ord"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey,
             COALESCE(n_ord, 0) AS n_orders,
             COALESCE(spend, 0.0) AS total_spend
             FROM customer LEFT JOIN
             (SELECT o_custkey, COUNT(*) AS n_ord,
                     ${oSum("o_totalprice")} AS spend
              FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
             ORDER BY c_custkey"""))

  /** SQL window functions: ranking within partitions. */
  private val windowRank = Q(
    "q07_window_rank",
    "top-3 orders per customer by price (row_number window function)",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables(s, dir).orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM
            (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Analytic window frame: per-user running sum (exact decimal so the
    * frame-accumulation order can't produce FP drift).
    */
  private val windowRunning = Q(
    "q08_window_running",
    "running per-user event value sum (cumulative window frame)",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .withColumn("running",
          sum(col("value").cast(DecimalType(28, 6))).over(w).cast("double"))
        .select("user_id", "event_id", "running")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
            CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              AS running
            FROM events ORDER BY user_id, event_id"""))

  /** lag/lead analytics. */
  private val windowLagLead = Q(
    "q09_window_lag",
    "per-user inter-event gap in seconds (lag window function)",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir).events
        .withColumn("prev_id", lag(col("event_id"), 1).over(w))
        .withColumn("gap_s",
          (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long")))
        .select("user_id", "event_id", "prev_id", "gap_s")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
            lag(event_id, 1) OVER w AS prev_id,
            CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) AS gap_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, event_id"""))

  /** count-distinct aggregation. */
  private val countDistinctQ = Q(
    "q10_count_distinct",
    "exact distinct counts per group",
    (s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
            COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** ROLLUP grouping sets (null markers coalesced so ordering is
    * engine-independent).
    */
  private val rollupQ = Q(
    "q11_rollup",
    "ROLLUP over (returnflag, linestatus) with coalesced totals rows",
    (s, dir) => {
      Tables(s, dir).lineitem
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")
    },
    Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
             COALESCE(l_linestatus, 'ALL') AS status,
             COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
             FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             ORDER BY flag, status"""))

  /** CUBE grouping sets. */
  private val cubeQ = Q(
    "q12_cube",
    "CUBE over (orderstatus, orderpriority)",
    (s, dir) => {
      Tables(s, dir).orders
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy("status", "priority")
    },
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
            COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""))

  /** INTERSECT / EXCEPT set operations (both distinct-semantics). */
  private val setOps = Q(
    "q13_set_ops",
    "nations with customers INTERSECT/EXCEPT nations with suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val custN = t.customer.select(col("c_nationkey").as("nationkey"))
      val suppN = t.supplier.select(col("s_nationkey").as("nationkey"))
      custN.intersect(suppN).select(col("nationkey"), lit("both").as("tag"))
        .union(custN.except(suppN).select(col("nationkey"), lit("cust_only").as("tag")))
        .orderBy("tag", "nationkey")
    },
    Some("""SELECT * FROM (
            SELECT nationkey, 'both' AS tag FROM
              (SELECT c_nationkey AS nationkey FROM customer
               INTERSECT SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT nationkey, 'cust_only' AS tag FROM
              (SELECT c_nationkey AS nationkey FROM customer
               EXCEPT SELECT s_nationkey FROM supplier))
            ORDER BY tag, nationkey"""))

  /** Scalar string functions. */
  private val scalarString = Q(
    "q14_scalar_string",
    "string functions: upper/substr/length/concat/replace/trim",
    (s, dir) => {
      Tables(s, dir).part
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 8).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, upper(p_name) AS uname,
            substr(p_name, 1, 8) AS prefix, CAST(length(p_name) AS INT) AS name_len,
            p_brand || '|' || p_type AS brand_type,
            replace(p_name, ' ', '_') AS snake
            FROM part ORDER BY p_partkey"""))

  /** Scalar date/time functions. */
  private val scalarDate = Q(
    "q15_scalar_datetime",
    "date parts + truncation on order dates",
    (s, dir) => {
      Tables(s, dir).orders
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("tot"))
        .orderBy("y", "m")
    },
    Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             COUNT(*) AS n, ${oSum("o_totalprice")} AS tot
             FROM orders GROUP BY 1, 2 ORDER BY y, m"""))

  /** Scalar math functions (only IEEE-exact ones: sqrt is correctly
    * rounded per IEEE 754; ln/exp/pow are libm-dependent and excluded).
    */
  private val scalarMath = Q(
    "q16_scalar_math",
    "math functions: abs/floor/ceil/sqrt/mod/round",
    (s, dir) => {
      Tables(s, dir).lineitem
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25.0).as("dev"),
          floor(col("l_extendedprice")).cast("long").as("price_floor"),
          ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          (col("l_linenumber") % 3).as("ln_mod"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
            abs(l_quantity - 25.0) AS dev,
            CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
            CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
            sqrt(l_quantity) AS qty_sqrt,
            l_linenumber % 3 AS ln_mod
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** CASE / conditional logic. */
  private val caseWhen = Q(
    "q17_case_when",
    "CASE-based bucketing with aggregation",
    (s, dir) => {
      Tables(s, dir).orders
        .select(
          when(col("o_totalprice") < 50000.0, "small")
            .when(col("o_totalprice") < 150000.0, "medium")
            .otherwise("large").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },
    Some("""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
                        WHEN o_totalprice < 150000.0 THEN 'medium'
                        ELSE 'large' END AS bucket, COUNT(*) AS n
            FROM orders GROUP BY 1 ORDER BY bucket"""))

  /** Range-predicate join (non-equi condition on top of an equi key). */
  private val rangeJoin = Q(
    "q18_range_join",
    "lineitems shipped within 30 days of their order date (range join)",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               AND l_shipdate >= o_orderdate
               AND l_shipdate < o_orderdate + INTERVAL 30 DAY
             GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Correlated scalar-subquery shape. Computed as a window over the
    * group key — one shuffle — instead of the aggregate+self-join form
    * (two hash exchanges of the fact table) the SQL subquery would
    * naively rewrite into; same exact-decimal average, same result.
    */
  private val aboveAvg = Q(
    "q19_scalar_subquery",
    "lineitems above their order's average quantity",
    (s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
      Tables(s, dir).lineitem
        .withColumn("avg_qty",
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
            .over(w).cast("double") / count(lit(1)).over(w))
        .filter(col("l_quantity") > col("avg_qty"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n
             FROM lineitem JOIN
             (SELECT l_orderkey AS k, ${oAvg("l_quantity")} AS avg_qty
              FROM lineitem GROUP BY l_orderkey) ON l_orderkey = k
             WHERE l_quantity > avg_qty
             GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** JSON extraction from the events props payload. */
  private val jsonExtract = Q(
    "q20_json_extract",
    "extract int field from JSON props, aggregate per event_type",
    (s, dir) => {
      Tables(s, dir).events
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
            CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
            MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
            MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[Q] = Seq(
    pricingSummary, joinAgg, multiJoin, semiJoin, antiJoin, outerJoin,
    windowRank, windowRunning, windowLagLead, countDistinctQ, rollupQ,
    cubeQ, setOps, scalarString, scalarDate, scalarMath, caseWhen,
    rangeJoin, aboveAvg, jsonExtract)
}
