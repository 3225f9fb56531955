package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-4 third relational batch: ordered string aggregation (Spark 4
  * `listagg ... WITHIN GROUP`), grouping-function disambiguation on
  * rollups, array higher-order functions, and Spark 4's SQL pipe syntax
  * — the remaining mainstream SQL surfaces the earlier batches didn't
  * exercise.
  */
object Relational4 extends QueryGroup {
  import Sql._

  /** Ordered listagg: comma-joined nation names per region. The WITHIN
    * GROUP order makes the string deterministic; the concatenated value
    * grows with group size, so this only belongs on bounded groups —
    * which is also why Spark plans it as a sort-based aggregate (the
    * buffer is the collected group, not a scalar).
    */
  private val listAgg = Q(
    "q45_listagg",
    "listagg WITHIN GROUP: ordered nation list per region",
    (s, dir) => {
      val t = Tables(s, dir)
      t.nation.createOrReplaceTempView("g_nation")
      t.region.createOrReplaceTempView("g_region")
      s.sql("""SELECT r.r_name,
                 listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations
               FROM g_region r JOIN g_nation n
                 ON n.n_regionkey = r.r_regionkey
               GROUP BY r.r_name ORDER BY r.r_name""")
    },
    Some("""SELECT r_name,
              string_agg(n_name, ',' ORDER BY n_name) AS nations
            FROM region r JOIN nation n ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** `grouping_id` over a rollup: the bitmask that tells subtotal rows
    * apart from genuine NULL data — without it, rollup output is
    * ambiguous the moment a grouping column is nullable. COALESCE'd
    * labels keep the compare deterministic; gid is the machine-readable
    * truth. Both engines put the first rollup column in the high bit.
    */
  private val groupingId = Q(
    "q46_grouping_id",
    "rollup with grouping_id disambiguating subtotal rows",
    (s, dir) => Tables(s, dir).orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id(col("o_orderstatus"), col("o_orderpriority")).as("gid"),
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("sum_price"))
      .orderBy("gid", "status", "priority"),
    Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
             FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             ORDER BY gid, status, priority"""))

  /** Array higher-order functions (transform / filter / aggregate /
    * exists) over a per-order quantity array. The lambdas run inside
    * whole-stage codegen — no UDF, no serialization boundary; at scale
    * the array build is one hash aggregate and every HOF is a per-row
    * loop over an in-memory array. sort_array pins the collect_list
    * order (collection order is partition-dependent, the sorted array
    * is not).
    */
  private val higherOrder = Q(
    "q47_higher_order",
    "array HOFs: per-order quantity array reduced four ways",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_quantity").cast("int"))).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).as("n_items"),
        aggregate(col("qs"), lit(0), (acc, x) => acc + x).as("qty_sum"),
        size(filter(col("qs"), _ > 25)).as("n_big"),
        exists(col("qs"), _ === 50).cast("int").as("has_max"))
      .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey,
              CAST(COUNT(*) AS INT) AS n_items,
              CAST(SUM(CAST(l_quantity AS INT)) AS INT) AS qty_sum,
              CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS INT)
                AS n_big,
              CAST(MAX(CASE WHEN l_quantity = 50 THEN 1 ELSE 0 END) AS INT)
                AS has_max
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** Spark 4 SQL pipe syntax: the same logical plan as a nested SELECT,
    * authored as a linear dataflow. Pipe stages lower to ordinary
    * Catalyst operators (WHERE → Filter, AGGREGATE → Aggregate), so the
    * optimized plan — pushdown, partial aggregation, AQE — is identical
    * to the classic form; the oracle states the classic form.
    */
  private val pipeSyntax = Q(
    "q48_pipe_syntax",
    "SQL pipe syntax: filter |> extend |> aggregate |> order",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("g_lineitem")
      s.sql("""FROM g_lineitem
               |> WHERE l_shipdate >= DATE '1997-01-01'
               |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
               |> AGGREGATE COUNT(*) AS n,
                    CAST(SUM(CAST(disc_price AS DECIMAL(28,6))) AS DOUBLE)
                      AS revenue
                  GROUP BY l_returnflag
               |> ORDER BY l_returnflag""")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n,
               ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
             FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
             GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** `try_divide` / `try_cast`: element-level failure becomes NULL
    * instead of failing the query — the SQL face of the reference's
    * ADR-0003 recover semantics (a throwing element converts to a
    * recoverable value, the stream continues). The oracle states the
    * same relation with NULLIF guards / TRY_CAST. Also exercises
    * GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB shared syntax).
    */
  private val tryFunctions = Q(
    "q49_try_functions",
    "try_divide/try_cast: per-element failure -> NULL, aggregated",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("g_events")
      s.sql("""WITH parsed AS (
                 SELECT event_type, value,
                   CAST(get_json_object(props, '$.k') AS INT) AS k
                 FROM g_events)
               SELECT event_type,
                 COUNT(*) AS n,
                 SUM(CASE WHEN try_divide(value, k - 50) IS NULL
                     THEN 1 ELSE 0 END) AS n_div0,
                 SUM(CASE WHEN try_cast(
                       CASE WHEN k % 3 = 0 THEN event_type
                            ELSE CAST(k AS STRING) END AS INT) IS NULL
                     THEN 1 ELSE 0 END) AS n_badcast,
                 MIN(try_divide(value, k - 50)) AS min_ratio,
                 MAX(try_divide(value, k - 50)) AS max_ratio
               FROM parsed GROUP BY ALL ORDER BY ALL""")
    },
    Some(s"""WITH parsed AS (
               SELECT event_type, value,
                 CAST(json_extract_string(props, '$$.k') AS INT) AS k
               FROM events)
             SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN value / NULLIF(k - 50, 0) IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_div0,
               CAST(SUM(CASE WHEN TRY_CAST(
                     CASE WHEN k % 3 = 0 THEN event_type
                          ELSE CAST(k AS VARCHAR) END AS INT) IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_badcast,
               MIN(value / NULLIF(k - 50, 0)) AS min_ratio,
               MAX(value / NULLIF(k - 50, 0)) AS max_ratio
             FROM parsed GROUP BY 1 ORDER BY 1"""))

  /** SQL-standard aggregate FILTER clause — per-aggregate predicates in
    * one pass over the fact table (the alternative is N scans or N
    * CASE-wrapped columns; FILTER keeps the plan one partial+final hash
    * aggregate with the predicates evaluated map-side).
    */
  private val filterClause = Q(
    "q50_filter_clause",
    "aggregate FILTER (WHERE ...) — conditional aggs in one pass",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("g_orders")
      s.sql("""SELECT o_orderpriority,
                 COUNT(*) AS n,
                 COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
                 COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                   FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS sum_open
               FROM g_orders
               GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                 FILTER (WHERE o_orderstatus = 'O') AS VARCHAR) AS DOUBLE)
                 AS sum_open
             FROM orders
             GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Null semantics end-to-end: nulls minted by a full outer join, kept
    * (no COALESCE — contrast with q40), compared with null-safe equality
    * (`<=>` / IS NOT DISTINCT FROM), and counted with the
    * count(*)-vs-count(col) distinction. These are the semantics that
    * silently diverge between engines if anything in the stack treats
    * NULL as a value — pinning them cross-engine is the point.
    */
  private val nullSemantics = Q(
    "q51_null_semantics",
    "outer-join nulls + null-safe equality + count(col) null-skipping",
    (s, dir) => {
      val ev = Tables(s, dir).events
      def perDay(t: String, as: String) = ev
        .filter(col("event_type") === t)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as(as))
      val joined = perDay("view", "nv").join(
          perDay("purchase", "np"), Seq("user_id", "day"), "full_outer")
      joined.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_days"),
          count(col("nv")).as("n_view_days"),     // count(col) skips nulls
          count(col("np")).as("n_purchase_days"),
          sum((col("nv") <=> col("np")).cast("long")).as("n_equal_days"))
        .orderBy("user_id")
    },
    Some("""WITH v AS (SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
                       FROM events WHERE event_type = 'view' GROUP BY 1, 2),
                 p AS (SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
                       FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
                 j AS (SELECT COALESCE(v.user_id, p.user_id) AS user_id,
                         v.n AS nv, p.n AS np
                       FROM v FULL JOIN p
                         ON v.user_id = p.user_id AND v.d = p.d)
            SELECT user_id, COUNT(*) AS n_days,
              COUNT(nv) AS n_view_days,
              COUNT(np) AS n_purchase_days,
              CAST(SUM(CASE WHEN nv IS NOT DISTINCT FROM np
                THEN 1 ELSE 0 END) AS BIGINT) AS n_equal_days
            FROM j GROUP BY user_id ORDER BY user_id"""))

  /** TPC-H Q7 shape: bilateral trade volume between two nations by
    * year — a 6-way snowflake with a DISJUNCTIVE cross-dimension
    * predicate ((A,B) OR (B,A)) that cannot be pushed to either scan
    * alone. The optimizer's job: broadcast all five dimension sides,
    * scan the fact once, apply the nation-pair filter post-join.
    */
  private val nationVolume = Q(
    "q52_nation_volume",
    "TPC-H Q7 shape: NATION_0 <-> NATION_1 shipped volume by year",
    (s, dir) => {
      val t = Tables(s, dir)
      val li = t.lineitem.select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"))
      val n1 = t.nation.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = t.nation.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      li.join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_0" && col("cust_nation") === "NATION_1") ||
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_0"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("o_orderdate")).as("l_year"))
        .agg(count(lit(1)).as("n"), dsum(col("vol")).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(o_orderdate) AS INT) AS l_year, COUNT(*) AS n,
               ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
             FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE (n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
                OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0')
             GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** TPC-H Q8 shape: one nation's market share inside a region for one
    * part type — a 7-way join whose aggregate is a RATIO of two
    * conditional sums. Share = Σ(vol | supplier ∈ nation) / Σ(vol),
    * both sums decimal-exact, divided once per group (single-rounded
    * double, engine-stable).
    */
  private val marketShare = Q(
    "q53_market_share",
    "TPC-H Q8 shape: NATION_1 share of PROMO-part volume in AMERICA",
    (s, dir) => {
      val t = Tables(s, dir)
      val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"))
      val amNation = t.nation.join(broadcast(
          t.region.filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val suppNation = t.nation.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      li.join(broadcast(t.part.filter(col("p_type") === "PROMO")
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(amNation), col("c_nationkey") === col("c_nk"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("l_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_1", col("vol"))
            .otherwise(lit(0.0))).as("nation_vol"),
          dsum(col("vol")).as("total_vol"))
        .select(col("l_year"),
          (col("nation_vol") / col("total_vol")).as("mkt_share"),
          col("total_vol"))
        .orderBy("l_year")
    },
    Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS l_year,
               ${oSum("CASE WHEN n1.n_name = 'NATION_1' " +
                 "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} /
               ${oSum("l_extendedprice * (1 - l_discount)")} AS mkt_share,
               ${oSum("l_extendedprice * (1 - l_discount)")} AS total_vol
             FROM lineitem
             JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             JOIN region ON n2.n_regionkey = r_regionkey
               AND r_name = 'AMERICA'
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             GROUP BY 1 ORDER BY 1"""))

  /** MapType end-to-end: build a per-group map column with
    * map_from_entries, transform it with map_filter (codegen'd lambda
    * over the map), read it back with explode — the full life cycle of
    * the one container type no other query touches. The map stays
    * group-sized (days per event type), never row-scaled. The oracle
    * states the same relation without maps (group + HAVING) — identical
    * rows prove the map round-trip lost nothing.
    */
  private val mapType = Q(
    "q54_map_type",
    "map_from_entries -> map_filter -> explode round-trip per event type",
    (s, dir) => Tables(s, dir).events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(map_from_entries(sort_array(collect_list(
        struct(date_format(col("day"), "yyyy-MM-dd").as("k"),
          col("n").as("v"))))).as("by_day"))
      .select(col("event_type"),
        explode(map_filter(col("by_day"), (_, v) => v >= 20)).as(Seq("day", "n")))
      .orderBy("event_type", "day"),
    Some("""SELECT event_type, CAST(day AS VARCHAR) AS day, n
            FROM (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
                  FROM events GROUP BY 1, 2)
            WHERE n >= 20 ORDER BY event_type, day"""))

  /** The analytic window functions q07–q09/q28/q29 don't touch:
    * nth_value under the default running frame, lead with an explicit
    * default, last_value over the full-partition frame. All pure
    * per-row selections from the sorted run — one shuffle on the
    * partition key, no aggregation, engine-exact doubles.
    */
  private val windowValueFns = Q(
    "q55_window_value_fns",
    "nth_value / lead-with-default / full-frame last_value per customer",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_totalprice"), 3).over(w).as("third_price"),
          lead(col("o_totalprice"), 2, -1.0).over(w).as("lead2"),
          last(col("o_totalprice")).over(full).as("final_price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
              nth_value(o_totalprice, 3) OVER w AS third_price,
              lead(o_totalprice, 2, -1.0) OVER w AS lead2,
              last_value(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING) AS final_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  val all: Seq[Q] = Seq(listAgg, groupingId, higherOrder, pipeSyntax,
    tryFunctions, filterClause, nullSemantics, nationVolume, marketShare,
    mapType, windowValueFns)
}
