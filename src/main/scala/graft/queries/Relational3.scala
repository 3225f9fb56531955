package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 relational additions: RANGE-frame windows (value-based frames
  * vs the ROWS frames of q08/q28) and Expand-based multi-distinct
  * aggregation — both common OLAP shapes the earlier batches didn't
  * exercise. Reference capability anchor: the reference's windowing is
  * count/event-time based (`Node.scala:283,327`); a value-range frame is
  * the relational generalization of its event-time window, expressed
  * here with Spark's native `rangeBetween` so Catalyst plans one
  * partitioned sort instead of a per-row self-join.
  */
object Relational3 extends QueryGroup {
  import Sql._

  /** Trailing 1-hour per-user sum via a RANGE frame on epoch seconds.
    * Scale shape: one shuffle on user_id + one sort per partition; the
    * frame is evaluated by a sliding accumulator over the sorted run
    * (O(n) per partition), never a self-join. The windowed double sum
    * goes through DECIMAL(28,6) so peer-group accumulation order cannot
    * show up in the last bits (same FP policy as Sql.dsum).
    */
  private val rangeFrame = Q(
    "q37_range_frame",
    "per-user trailing 1-hour RANGE-frame count and sum over events",
    (s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("sec"), col("value"))
      val w = Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-3599L, 0L)
      ev.select(col("event_id"), col("user_id"), col("sec"),
          count(lit(1)).over(w).as("trail_n"),
          sum(col("value").cast(DecimalType(28, 6))).over(w)
            .cast("double").as("trail_sum"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS sec,
              COUNT(*) OVER w AS trail_n,
              CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w
                AS VARCHAR) AS DOUBLE) AS trail_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id
              ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
              RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  /** Several DISTINCT aggregates with different keys in one GROUP BY —
    * Spark plans this with Expand (one input row fans out per distinct
    * group) + two-level aggregation, keeping map-side partials for the
    * non-distinct metrics. One shuffle keyed on (event_type, expand-id,
    * distinct key); no join, no double scan.
    */
  private val multiDistinct = Q(
    "q38_multi_distinct",
    "count(distinct user), count(distinct day) and plain aggs in one pass",
    (s, dir) => Tables(s, dir).events
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"))
      .orderBy("event_type"),
    Some(s"""SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               COUNT(*) AS n, ${oSum("value")} AS sum_value
             FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Correlated EXISTS / NOT EXISTS written as SQL text so Catalyst's
    * subquery decorrelation runs: both subqueries rewrite to a semi and
    * an anti join against orders (no per-row re-execution — `.explain`
    * shows the joins). Scale shape after decorrelation: two equi-joins
    * on c_custkey, broadcast or shuffled by AQE like any other join.
    */
  private val correlatedSubquery = Q(
    "q39_correlated_subquery",
    "correlated EXISTS + NOT EXISTS, decorrelated to semi/anti joins",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.createOrReplaceTempView("g_customer")
      t.orders.createOrReplaceTempView("g_orders")
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n_customers
               FROM g_customer c
               WHERE EXISTS (SELECT 1 FROM g_orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 400000.0)
                 AND NOT EXISTS (SELECT 1 FROM g_orders o2
                                 WHERE o2.o_custkey = c.c_custkey
                                   AND o2.o_orderstatus = 'F'
                                   AND o2.o_totalprice < 50000.0)
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000.0)
              AND NOT EXISTS (SELECT 1 FROM orders o2
                              WHERE o2.o_custkey = c.c_custkey
                                AND o2.o_orderstatus = 'F'
                                AND o2.o_totalprice < 50000.0)
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** FULL OUTER join — the one join type the earlier batches skipped.
    * Both inputs are pre-aggregated to (user, day) grain, so both null
    * directions genuinely occur (~1k view-only and ~1k purchase-only
    * rows at sf0.01). Scale shape: full outer cannot broadcast either
    * side; Spark plans a shuffle join on the key — both sides are
    * already aggregate-reduced before the exchange.
    */
  private val fullOuter = Q(
    "q40_full_outer_join",
    "per-(user, day) views FULL OUTER purchases, nulls -> 0",
    (s, dir) => {
      val ev = Tables(s, dir).events
      def perDay(t: String, as: String) = ev
        .filter(col("event_type") === t)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as(as))
      perDay("view", "nv").join(
          perDay("purchase", "np"), Seq("user_id", "day"), "full_outer")
        .select(col("user_id"),
          // VARCHAR day: Spark DATE arrives as a python date object in
          // the compare, DuckDB DATE as datetime64 — strings match (the
          // q24 convention); ISO format keeps the sort order
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("nv"), lit(0L)).as("n_views"),
          coalesce(col("np"), lit(0L)).as("n_purchases"))
        .orderBy("user_id", "day")
    },
    Some("""WITH v AS (SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
                       FROM events WHERE event_type = 'view' GROUP BY 1, 2),
                 p AS (SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
                       FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
            SELECT COALESCE(v.user_id, p.user_id) AS user_id,
              CAST(COALESCE(v.d, p.d) AS VARCHAR) AS day,
              COALESCE(v.n, 0) AS n_views, COALESCE(p.n, 0) AS n_purchases
            FROM v FULL JOIN p ON v.user_id = p.user_id AND v.d = p.d
            ORDER BY user_id, day"""))

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`, planned as UnionLoop):
    * calendar-spine densification — recursively generate every day
    * between the corpus min and max event date, left-join the daily
    * aggregate of rare high-value events, zero-fill the gap days. The
    * classic OLAP densification that windowing cannot express (missing
    * days have no row to window over). Spark 4.1 restricts recursion to
    * UNION ALL, so the recursive member must be acyclic (a ladder, not
    * a graph closure); depth 30 sits well under the default
    * cteRecursionLevelLimit of 100.
    *
    * Scale shape: the date bounds are computed ONCE (one scan with
    * map-side partial min/max; two scalars to the driver — the k-means
    * codebook pattern) and inlined as literals, so every UnionLoop
    * iteration is pure literal arithmetic on a one-row local relation.
    * Leaving `bounds` as a CTE instead makes each of the ~30 iterations
    * re-evaluate the `(SELECT hi FROM bounds)` scalar subquery — a full
    * fact-table scan per recursion step (measured 4.8s vs 1.3s at
    * sf0.1; at 100 TB it would be 30 extra full scans).
    */
  private val recursiveCte = Q(
    "q41_recursive_cte",
    "WITH RECURSIVE daily spine, zero-filling days without rare events",
    (s, dir) => {
      val ev = Tables(s, dir).events
      ev.createOrReplaceTempView("g_events")
      val b = ev.agg(min(to_date(col("ts"))).as("lo"),
        max(to_date(col("ts"))).as("hi")).head()
      val (lo, hi) = (b.getDate(0), b.getDate(1))
      s.sql(s"""WITH RECURSIVE
               spine(day) AS (
                 SELECT DATE '$lo'
                 UNION ALL
                 SELECT date_add(day, 1) FROM spine
                 WHERE day < DATE '$hi'),
               daily AS (
                 SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s
                 FROM g_events WHERE value >= 480.0 GROUP BY 1)
               SELECT date_format(spine.day, 'yyyy-MM-dd') AS day,
                 COALESCE(daily.n, 0) AS n_highvalue,
                 COALESCE(daily.s, CAST(0 AS DOUBLE)) AS sum_value
               FROM spine LEFT JOIN daily ON spine.day = daily.day
               ORDER BY day""")
    },
    Some(s"""WITH RECURSIVE bounds AS (
               SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
               FROM events),
             spine(day) AS (
               SELECT lo FROM bounds
               UNION ALL
               SELECT day + 1 FROM spine
               WHERE day < (SELECT hi FROM bounds)),
             daily AS (
               SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
                 ${oSum("value")} AS s
               FROM events WHERE value >= 480.0 GROUP BY 1)
             SELECT CAST(spine.day AS VARCHAR) AS day,
               COALESCE(daily.n, 0) AS n_highvalue,
               COALESCE(daily.s, CAST(0 AS DOUBLE)) AS sum_value
             FROM spine LEFT JOIN daily ON spine.day = daily.day
             ORDER BY day"""))

  /** Unpivot (melt): wide per-flag measure columns to long
    * (flag, metric, value) form — the inverse of q22's pivot. Spark
    * plans `Dataset.unpivot` as Expand (each input row fans out once
    * per measure column) directly over the aggregate, so the long form
    * costs no join and no second scan; the fan-out happens AFTER
    * aggregation, on #groups × #measures rows, not on the fact table.
    * The oracle states the same relation as UNION ALL — same rows,
    * engine-neutral syntax.
    */
  private val unpivot = Q(
    "q42_unpivot",
    "wide aggregate melted to (flag, metric, value) via Dataset.unpivot",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy("l_returnflag", "metric"),
    Some(s"""WITH a AS (SELECT l_returnflag,
               ${oSum("l_quantity")} AS sum_qty,
               ${oSum("l_extendedprice")} AS sum_price,
               ${oSum("l_discount")} AS sum_disc
             FROM lineitem GROUP BY 1)
             SELECT l_returnflag, metric, value FROM (
               SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
               UNION ALL
               SELECT l_returnflag, 'sum_price', sum_price FROM a
               UNION ALL
               SELECT l_returnflag, 'sum_disc', sum_disc FROM a)
             ORDER BY l_returnflag, metric"""))

  /** LATERAL subquery join — for each nation, the top-2 customers by
    * account balance. Catalyst rewrites the correlated LIMIT-per-row
    * subquery into a window (rank over partition) + filter, so the
    * execution is one shuffle on the correlation key and a
    * per-partition sort — no per-outer-row re-execution, which is what
    * makes LATERAL survive a fact-table-sized outer side.
    */
  private val lateralJoin = Q(
    "q43_lateral_join",
    "LATERAL top-2 customers by balance per nation",
    (s, dir) => {
      val t = Tables(s, dir)
      t.nation.createOrReplaceTempView("g_nation")
      t.customer.createOrReplaceTempView("g_customer")
      s.sql("""SELECT n.n_name, c.c_name, c.c_acctbal
               FROM g_nation n,
               LATERAL (SELECT c_name, c_acctbal FROM g_customer
                        WHERE c_nationkey = n.n_nationkey
                        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
               ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""")
    },
    Some("""SELECT n.n_name, c.c_name, c.c_acctbal
            FROM nation n,
            LATERAL (SELECT c_name, c_acctbal FROM customer
                     WHERE c_nationkey = n.n_nationkey
                     ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
            ORDER BY n.n_name, c.c_acctbal DESC, c.c_name"""))

  /** Spark 4 VariantType: `parse_json` decodes the JSON string ONCE
    * into the shredded binary variant encoding; every downstream
    * `variant_get` is a typed path lookup into that binary, not a
    * re-parse of the string. At 100 TB that is the difference between
    * one decode pass and one string parse per extraction per query —
    * and variant columns persisted to parquet keep the binary form, so
    * later queries skip even the initial parse. Output is plain typed
    * columns, so the DuckDB oracle states the same relation with its
    * own JSON extraction.
    */
  private val variantExtract = Q(
    "q44_variant",
    "parse_json -> VariantType -> typed variant_get extraction + aggregate",
    (s, dir) => Tables(s, dir).events
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(when(col("k") % 2 === 0, col("k")).otherwise(lit(0))
          .cast("long")).as("sum_even_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n,
              MIN(k) AS min_k, MAX(k) AS max_k,
              CAST(SUM(CASE WHEN k % 2 = 0 THEN k ELSE 0 END) AS BIGINT)
                AS sum_even_k
            FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS INT) AS k
                  FROM events)
            GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[Q] = Seq(rangeFrame, multiDistinct, correlatedSubquery,
    fullOuter, recursiveCte, unpivot, lateralJoin, variantExtract)
}
