package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational batch: grouping sets, pivot, array aggregation,
  * date arithmetic, schema-based JSON parsing, regexp extraction,
  * SQL-parser subqueries, and the remaining analytic window functions —
  * rounding out SURVEY §2.6.
  */
object Relational2 extends QueryGroup {
  import Sql._

  private val groupingSets = Q(
    "q21_grouping_sets",
    "explicit GROUPING SETS ((flag), (status), ()) via the SQL surface",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("gs_lineitem")
      s.sql(s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
                COALESCE(l_linestatus, 'ALL') AS status,
                COUNT(*) AS n
                FROM gs_lineitem
                GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                ORDER BY flag, status""")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
            COALESCE(l_linestatus, 'ALL') AS status, COUNT(*) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY flag, status"""))

  /** Pivot — DataFrame `pivot` with pinned values (pinned so the output
    * schema is static, the scale-safe form: dynamic pivot needs a
    * values-discovery pass).
    */
  private val pivotQ = Q(
    "q22_pivot",
    "orders count pivoted by orderstatus per priority",
    (s, dir) => {
      Tables(s, dir).orders
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
            CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
            CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
            CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Array aggregation + array functions, compared via a canonical
    * string join (array columns don't hash stably across engines).
    */
  private val arrayAgg = Q(
    "q23_array_agg",
    "collect_list + sort_array + array_join per order",
    (s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_orderkey")
        .agg(
          sort_array(collect_list(col("l_linenumber"))).as("lines"),
          count(lit(1)).as("n"))
        .select(col("l_orderkey"),
          array_join(transform(col("lines"), _.cast("string")), ",").as("line_list"),
          size(col("lines")).as("n_lines"),
          element_at(col("lines"), 1).as("first_line"),
          element_at(col("lines"), -1).as("last_line"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey,
            array_to_string(list_sort(list(l_linenumber)), ',') AS line_list,
            CAST(len(list(l_linenumber)) AS INT) AS n_lines,
            list_sort(list(l_linenumber))[1] AS first_line,
            list_sort(list(l_linenumber))[-1] AS last_line
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** Date arithmetic: datediff / add_months / ISO day-of-week. */
  private val dateArith = Q(
    "q24_date_arith",
    "date arithmetic on order dates",
    (s, dir) => {
      Tables(s, dir).orders
        .select(
          col("o_orderkey"),
          datediff(lit(java.sql.Date.valueOf("1996-01-01")),
            col("o_orderdate")).as("days_to_96"),
          add_months(col("o_orderdate"), 3).cast("date").cast("string").as("plus3m"),
          (weekday(col("o_orderdate")) + 1).as("isodow"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
            CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS INT)
              AS days_to_96,
            CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
            CAST(isodow(o_orderdate) AS INT) AS isodow
            FROM orders ORDER BY o_orderkey"""))

  /** Schema-based JSON parsing (from_json with an explicit schema —
    * q20 covers path extraction).
    */
  private val fromJson = Q(
    "q25_from_json",
    "from_json with explicit schema, filter on parsed field",
    (s, dir) => {
      Tables(s, dir).events
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .filter(col("k") > 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
            CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
            GROUP BY event_type ORDER BY event_type"""))

  /** Regexp extraction over part types. */
  private val regexpExtract = Q(
    "q26_regexp_extract",
    "regexp_extract of the trailing word of p_type, grouped",
    (s, dir) => {
      Tables(s, dir).part
        .select(regexp_extract(col("p_type"), "([A-Za-z]+)$", 1).as("last_word"))
        .groupBy("last_word").agg(count(lit(1)).as("n"))
        .orderBy("last_word")
    },
    Some("""SELECT regexp_extract(p_type, '([A-Za-z]+)$', 1) AS last_word,
            COUNT(*) AS n FROM part GROUP BY 1 ORDER BY last_word"""))

  /** IN-subquery through the SQL parser (Catalyst rewrites to semi join). */
  private val inSubquery = Q(
    "q27_in_subquery",
    "IN (subquery) via spark.sql, rewritten to a semi join by Catalyst",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders.createOrReplaceTempView("sq_orders")
      t.customer.createOrReplaceTempView("sq_customer")
      s.sql("""SELECT o_orderstatus, COUNT(*) AS n FROM sq_orders
               WHERE o_custkey IN
                 (SELECT c_custkey FROM sq_customer WHERE c_acctbal > 5000.0)
               GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
            WHERE o_custkey IN
              (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Remaining analytic window functions: ntile / percent_rank /
    * cume_dist over a total order (exact rational values — engine-safe
    * doubles).
    *
    * NOT a `Window.orderBy(...)` with no partition — that serializes the
    * whole table through one task. The order key here is unique
    * (totalprice, orderkey), so each analytic has a closed form over the
    * scalable global rank (range partition + zipWithIndex offsets,
    * operators/GlobalOrder.scala) and a broadcast total count:
    * pr = (rank−1)/(n−1), cd = rank/n, and ntile via SQL's uneven-bucket
    * rule (the first n mod k buckets hold ⌈n/k⌉ rows).
    */
  private val analyticWindows = Q(
    "q28_window_analytics",
    "ntile/percent_rank/cume_dist over total price order (closed forms, no global window)",
    (s, dir) => {
      val orders = Tables(s, dir).orders
      val n = orders.count() // parquet metadata count — no data scan
      val ranked = graft.operators.GlobalOrder.withGlobalIndex(
        orders.select("o_orderkey", "o_totalprice"),
        Seq("o_totalprice", "o_orderkey"))
      val r = col("_global_rank")
      val base = n / 4
      val rem = n % 4
      val big = rem * (base + 1) // rows living in the ⌈n/4⌉-sized buckets
      // integer DIV (not floor of a double) so ranks beyond 2^53 stay exact
      val quartile = expr(
        s"""CASE WHEN _global_rank <= $big
           |  THEN (_global_rank - 1) DIV ${base + 1} + 1
           |  ELSE (_global_rank - 1 - $big) DIV ${math.max(base, 1L)} + $rem + 1
           |END""".stripMargin)
      val pr =
        if (n <= 1) lit(0.0)
        else (r - 1).cast("double") / lit((n - 1).toDouble)
      ranked.select(col("o_orderkey"),
        quartile.cast("int").as("quartile"),
        pr.as("pr"),
        (r.cast("double") / lit(n.toDouble)).as("cd"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
            CAST(ntile(4) OVER w AS INT) AS quartile,
            percent_rank() OVER w AS pr,
            cume_dist() OVER w AS cd
            FROM orders
            WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderkey"""))

  /** first/last value window frames. */
  private val firstLast = Q(
    "q29_window_first_last",
    "first_value/last_value per customer by order date",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
            first_value(o_orderkey) OVER w AS first_order,
            last_value(o_orderkey) OVER w AS last_order
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_custkey, o_orderkey"""))

  /** Approximate distinct count (HLL++): deterministic per engine but
    * not across engines — rows-only check; AggregatesSpec bounds its
    * error against the exact count.
    */
  private val approxDistinct = Q(
    "q30_approx_distinct",
    "approx_count_distinct vs exact per returnflag (rows-only)",
    (s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag")
    },
    None)

  /** Salted two-stage aggregation under key skew — result identical to a
    * plain GROUP BY by construction (the oracle checks exactly that).
    * events.event_type is the skew case: 5 hot keys over the whole table.
    */
  private val saltedAgg = Q(
    "q31_salted_agg",
    "salted two-stage aggregation over hot keys == plain GROUP BY",
    (s, dir) => {
      graft.operators.Skew.saltedAgg(
        Tables(s, dir).events, "event_type", "value", 16)
        .orderBy("event_type")
    },
    Some(s"""SELECT event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value
             FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Salted JOIN against a unique dimension == the plain join — the
    * invariant that makes the pattern safe to deploy on a hot fact key.
    */
  private val saltedJoin = Q(
    "q36_salted_join",
    "hot-key-only salted fact-dim join == plain join (aggregated)",
    (s, dir) => {
      val fact = Tables(s, dir).lineitem
        .select(col("l_orderkey").as("okey"), col("l_quantity"))
      val dim = Tables(s, dir).orders
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      // threshold 4 makes multi-lineitem orders take the salted path and
      // the rest the plain join — both branches execute on the fixture
      graft.operators.Skew.saltedJoinHotKeys(fact, dim, "okey", 16, 4L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Sql.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
             ${oSum("l_quantity")} AS sum_qty
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Exact interpolated percentiles (quantities are integral-valued, so
    * the linear-interpolation arithmetic is engine-stable).
    */
  private val percentiles = Q(
    "q32_percentile",
    "exact median / p90 per returnflag",
    (s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
            quantile_cont(l_quantity, 0.9) AS p90, COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Multiset set-ops (INTERSECT ALL / EXCEPT ALL keep duplicates). */
  private val setOpsAll = Q(
    "q33_set_ops_all",
    "INTERSECT ALL / EXCEPT ALL on nation keys (multiset semantics)",
    (s, dir) => {
      val t = Tables(s, dir)
      val custN = t.customer.select(col("c_nationkey").as("nationkey"))
      val suppN = t.supplier.select(col("s_nationkey").as("nationkey"))
      custN.intersectAll(suppN)
        .groupBy("nationkey").agg(count(lit(1)).as("n_inter"))
        .join(
          custN.exceptAll(suppN)
            .groupBy("nationkey").agg(count(lit(1)).as("n_except")),
          Seq("nationkey"), "outer")
        .select(col("nationkey"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          coalesce(col("n_except"), lit(0L)).as("n_except"))
        .orderBy("nationkey")
    },
    Some("""WITH i AS (SELECT nationkey, COUNT(*) AS n_inter FROM
              (SELECT c_nationkey AS nationkey FROM customer
               INTERSECT ALL SELECT s_nationkey FROM supplier)
              GROUP BY nationkey),
            e AS (SELECT nationkey, COUNT(*) AS n_except FROM
              (SELECT c_nationkey AS nationkey FROM customer
               EXCEPT ALL SELECT s_nationkey FROM supplier)
              GROUP BY nationkey)
            SELECT COALESCE(i.nationkey, e.nationkey) AS nationkey,
              COALESCE(n_inter, 0) AS n_inter,
              COALESCE(n_except, 0) AS n_except
            FROM i FULL OUTER JOIN e ON i.nationkey = e.nationkey
            ORDER BY nationkey"""))

  /** Pearson correlation from exact decimal component sums (built-in
    * `corr()` accumulates doubles in partition order — not reproducible
    * across engines; the manual form is: every Σ is exact, the final
    * double formula is identical IEEE arithmetic on both sides).
    */
  private val corrManual = Q(
    "q34_correlation",
    "exact-sum Pearson correlation of quantity vs extendedprice",
    (s, dir) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(x).as("sx"), dsum(y).as("sy"),
          dsum(x * y).as("sxy"), dsum(x * x).as("sxx"), dsum(y * y).as("syy"))
        .select(col("l_returnflag"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_price"),
          col("n").cast("long").as("n_rows"))
        .orderBy("l_returnflag")
    },
    Some(s"""WITH sums AS (
               SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 ${oSum("l_quantity")} AS sx,
                 ${oSum("l_extendedprice")} AS sy,
                 ${oSum("l_quantity * l_extendedprice")} AS sxy,
                 ${oSum("l_quantity * l_quantity")} AS sxx,
                 ${oSum("l_extendedprice * l_extendedprice")} AS syy
               FROM lineitem GROUP BY l_returnflag)
             SELECT l_returnflag,
               (n * sxy - sx * sy) /
                 (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                 AS corr_qty_price,
               CAST(n AS BIGINT) AS n_rows
             FROM sums ORDER BY l_returnflag"""))

  /** Deterministic argmax via max(struct): the struct comparison makes
    * the tiebreak explicit (price, then orderkey), unlike max_by whose
    * tie choice is undefined. Oracle expresses the same via rank=1.
    */
  private val argmax = Q(
    "q35_argmax",
    "most expensive order per customer via max(struct) with explicit tiebreak",
    (s, dir) => {
      Tables(s, dir).orders
        .groupBy("o_custkey")
        .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"))
        .select(col("o_custkey"),
          col("m.o_orderkey").as("top_order"),
          col("m.o_totalprice").as("top_price"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey AS top_order, o_totalprice AS top_price
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
                  FROM orders)
            WHERE rn = 1 ORDER BY o_custkey"""))

  val all: Seq[Q] = Seq(
    groupingSets, pivotQ, arrayAgg, dateArith, fromJson, regexpExtract,
    inSubquery, analyticWindows, firstLast, approxDistinct, saltedAgg,
    percentiles, setOpsAll, corrManual, argmax, saltedJoin)
}
