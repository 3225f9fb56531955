package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core stream combinators (SURVEY §2.1 — `Stream.scala`
  * map/filter/flatMap/append/fold/grouped/recover/toList) re-expressed as
  * declarative Spark plans over the driver tables. Each is a narrow,
  * codegen-friendly transform; Catalyst pushes filters/projections into
  * the parquet scan.
  */
object CoreOps extends QueryGroup {
  import Sql._

  /** `Stream.map` (Stream.scala:14-23): per-element projection. */
  private val mapProject = Q(
    "c01_map_project",
    "per-row computed projection (reference Stream.map)",
    (s, dir) => {
      Tables(s, dir).lineitem
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") * 2.0).as("qty2"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity * 2.0 AS qty2,
            l_extendedprice * (1.0 - l_discount) AS net_price
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** `Stream.filter` (Stream.scala:36-47): predicate pushdown to parquet. */
  private val filterPredicate = Q(
    "c02_filter",
    "predicate filter, pushed to the parquet scan (reference Stream.filter)",
    (s, dir) => {
      Tables(s, dir).lineitem
        .filter(col("l_discount") > 0.08 && col("l_quantity") >= 30.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem WHERE l_discount > 0.08 AND l_quantity >= 30.0
            ORDER BY l_orderkey, l_linenumber"""))

  /** `Stream.flatMap` (Stream.scala:25-34): 1→N expansion via explode. */
  private val flatMapExplode = Q(
    "c03_flatmap_tokens",
    "explode documents into tokens, count by token (reference Stream.flatMap)",
    (s, dir) => {
      Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("token"))
        .limit(100)
    },
    Some("""SELECT token, COUNT(*) AS n FROM
            (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 100"""))

  /** `Stream.append` (Stream.scala:49-54): ordered this-then-that concat.
    * Spark `union` has no inter-operand order, so the operand is tagged —
    * the reference's ordering contract is carried by the `src` column.
    */
  private val unionAppend = Q(
    "c04_union_append",
    "ordered UNION ALL with operand tag (reference Stream.append)",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), lit("a").as("src"))
      val b = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("b").as("src"))
      a.union(b).orderBy("src", "o_orderkey")
    },
    Some("""SELECT * FROM (
            SELECT o_orderkey, 'a' AS src FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey, 'b' AS src FROM orders WHERE o_orderstatus = 'O')
            ORDER BY src, o_orderkey"""))

  /** `Stream.fold` / `Sink` (Stream.scala:56-68, Node.scala:439): terminal
    * fold → distributed partial+final aggregation (map-side combine).
    */
  private val foldSum = Q(
    "c05_fold_global_agg",
    "global fold to one row (reference Stream.fold / Sink)",
    (s, dir) => {
      Tables(s, dir).lineitem.agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
    },
    Some(s"""SELECT ${oSum("l_quantity")} AS sum_qty,
             ${oSum("l_extendedprice")} AS sum_price, COUNT(*) AS n
             FROM lineitem"""))

  /** `Stream.grouped` / `windowByCount` (Stream.scala:230-256): tumbling
    * count windows over a global order — via the scalable global rank
    * (range-partitioned sort + zipWithIndex offsets,
    * graft.operators.GlobalOrder) instead of a single-partition
    * `row_number`. The keyed streaming variant is
    * graft.streaming.CountWindows.
    */
  private val countWindow = Q(
    "c06_count_window",
    "tumbling count windows of 500 rows over global order (reference grouped)",
    (s, dir) => {
      graft.operators.GlobalOrder.withGlobalIndex(
        Tables(s, dir).lineitem.select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey", "l_linenumber"))
        .withColumn("win_id",
          floor((col("_global_rank") - 1) / lit(500)).cast("long"))
        .groupBy("win_id")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("win_id")
    },
    Some(s"""SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS win_id,
             COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
             FROM (SELECT l_quantity,
                   row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
                   FROM lineitem)
             GROUP BY 1 ORDER BY 1"""))

  /** `Stream.recover` (Stream.scala:90-93): element-level recovery — the
    * failing lambda is guarded and replaced by a fallback value, the
    * distributed analog of "emit one fallback then continue" (SURVEY
    * §7.4.3: per-element Either-style recovery).
    */
  private val recoverCase = Q(
    "c07_recover_fallback",
    "guarded division with fallback value (reference Stream.recover)",
    (s, dir) => {
      Tables(s, dir).lineitem
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") === 30.0, lit(-1.0))
            .otherwise(lit(100.0) / (col("l_quantity") - 30.0)).as("risky"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
            CASE WHEN l_quantity = 30.0 THEN -1.0
                 ELSE 100.0 / (l_quantity - 30.0) END AS risky
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** `toList` / iterator (Stream.scala:81-88): ordered materialization —
    * global sort + limit (top-k runs as a distributed TakeOrdered).
    */
  private val orderedTake = Q(
    "c08_ordered_take",
    "ordered take: top 20 orders by totalprice (reference toList/iterator)",
    (s, dir) => {
      Tables(s, dir).orders
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))

  /** Exact distinct (reference has none — SURVEY §2.6 set-ops row). */
  private val distinctRows = Q(
    "c09_distinct",
    "distinct (returnflag, linestatus) pairs",
    (s, dir) => {
      Tables(s, dir).lineitem
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""))

  /** `Stream.parMap` (Stream.scala:103-186) through the real Flow API:
    * explicit parallelism re-width + typed per-element map. The oracle is
    * a plain projection — parMap must be a pure parallelism knob with no
    * semantic effect on the result set.
    */
  private val parMapProject = Q(
    "c10_parmap",
    "Flow.parMap(8): re-widthed typed map over lineitem (reference parMap)",
    (s, dir) => {
      import s.implicits._
      val src = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .as[(Long, Int, Double)]
      graft.api.Flow.fromDataset(src, "c10")
        .parMap(8) { case (ok, ln, qty) => (ok, ln, qty * 3.0) }
        .ds.toDF("l_orderkey", "l_linenumber", "qty3")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity * 3.0 AS qty3
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** `Stream.iterator` (Stream.scala:268-302): the lazy driver-side pull
    * terminal. The top-k runs distributed (TakeOrderedAndProject); the
    * 20-row result is then genuinely drained through
    * `toLocalIterator` — the operator under test — and re-lifted so the
    * driver can hash-compare it.
    */
  private val iteratorDrain = Q(
    "c11_iterator_take",
    "top-20 drained through Flow.iterator (reference iterator terminal)",
    (s, dir) => {
      import s.implicits._
      val topk = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)
        .as[(Long, Long, Double)]
      val drained = graft.api.Flow.fromDataset(topk, "c11").iterator().toList
      drained.toDF("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))

  /** `ManagedSink` / `foreach` (Node.scala:370-437, Stream.scala:70-79):
    * rows leave the engine through toManagedSink (open-once / close-always
    * per partition), land in an in-process sink, and are re-lifted for
    * the hash compare. The in-JVM registry stands in for the external
    * system a managed sink writes to (valid in local mode, where
    * executors share the JVM); the lifecycle contract itself is
    * cluster-safe and pinned by LifecycleSpec/ExecutionSpec.
    */
  private val managedSinkRoundtrip = Q(
    "c12_managed_sink",
    "customer rows through toManagedSink into a collecting resource",
    (s, dir) => {
      import s.implicits._
      val key = java.util.UUID.randomUUID().toString
      val q = LocalSink.open(key)
      try {
        val src = Tables(s, dir).customer
          .select(col("c_custkey"), col("c_name"))
          .as[(Long, String)]
        graft.api.Flow.fromDataset(src, "c12")
          .toManagedSink(() => LocalSink.resource(key)) {
            (r, row) => r.write(row)
          }
        q.iterator().asScala.toSeq
          .toDF("c_custkey", "c_name")
          .orderBy("c_custkey")
      } finally LocalSink.close(key)
    },
    Some("""SELECT c_custkey, c_name FROM customer ORDER BY c_custkey"""))

  /** `Stream.ensuring` (Stream.scala:188-228) on the executed path: the
    * per-task finalizer (close-once contract pinned by LifecycleSpec)
    * must be result-transparent — the oracle is the bare projection.
    */
  private val ensuringFinalizer = Q(
    "c13_ensuring",
    "projection under a per-task ensuring finalizer (reference ensuring)",
    (s, dir) => {
      import s.implicits._
      val src = Tables(s, dir).nation
        .select(col("n_nationkey"), col("n_name"))
        .as[(Int, String)] // n_nationkey is int32 in the parquet schema
      graft.api.Flow.fromDataset(src, "c13")
        .ensuring(() => EnsuringProbe.fired.incrementAndGet())
        .map { case (k, n) => (k, n.toLowerCase) }
        .ds.toDF("n_nationkey", "name_lower")
        .orderBy("n_nationkey")
    },
    Some("""SELECT n_nationkey, lower(n_name) AS name_lower FROM nation
            ORDER BY n_nationkey"""))

  /** `Stream.recoverWith` (Stream.scala:95-101): on the first failure
    * switch to a fallback *stream* and halt the original — prefix before
    * the failure ++ the fallback sequence (docs/examples.md:138-143).
    * The ordered attempt stream comes from the real surface
    * ([[graft.api.Flow.mapAttempt]] over the sorted source);
    * [[graft.api.Attempt.recoverWithPrefix]] reconstructs the
    * reference's halt-and-switch semantics from it (SURVEY §7.4.3), and
    * the re-lifted result is hash-compared against the oracle's
    * prefix-UNION-fallback form.
    */
  private val recoverWithFallback = Q(
    "c14_recover_with",
    "prefix before failure ++ fallback stream (reference Stream.recoverWith)",
    (s, dir) => {
      import s.implicits._
      val src = Tables(s, dir).nation
        .select(col("n_nationkey"), col("n_name"))
        .orderBy("n_nationkey")
        .as[(Int, String)]
      val attempts = graft.api.Flow.fromDataset(src, "c14")
        .mapAttempt { case (k, n) =>
          if (k == 20) throw new IllegalStateException("boom at 20")
          (k, n.toLowerCase)
        }
        .iterator().toSeq // source is sorted: the drain is in global order
      val recovered = graft.api.Attempt.recoverWithPrefix(attempts) {
        case ("java.lang.IllegalStateException", _) =>
          Seq((900, "fallback_0"), (901, "fallback_1"), (902, "fallback_2"))
      }
      recovered.toDF("n_nationkey", "name_lower").orderBy("n_nationkey")
    },
    Some("""SELECT n_nationkey, lower(n_name) AS name_lower FROM nation
            WHERE n_nationkey < 20
            UNION ALL
            SELECT * FROM (VALUES (900, 'fallback_0'), (901, 'fallback_1'),
              (902, 'fallback_2')) AS t(n_nationkey, name_lower)
            ORDER BY n_nationkey"""))

  /** `takeUntilCancelled` / `runCancellableIterator` (reference
    * Node.scala:92-117) on the executed path: the consumer drains a
    * known prefix through the REAL cancellable iterator and then
    * cancels — consumption halts, in-flight jobs abort, and the
    * already-drained prefix is exactly what a plain LIMIT would have
    * produced (the iterator pulls the sorted stream in order, so the
    * cancel point is deterministic). The cancel trichotomy itself
    * (Completed/Failed/Cancelled, latched hasNext, mid-pull abort) is
    * ExecutionSpec/LifecycleSpec; this entry puts the surface under the
    * driver's hash gate.
    */
  private val cancellableIterDrain = Q(
    "c15_cancellable_iterator",
    "top-20 drained via runCancellableIterator then cancelled (reference takeUntilCancelled)",
    (s, dir) => {
      import s.implicits._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      // the plan offers 40 rows; the consumer takes 20 and cancels —
      // the tail is never pulled, which IS takeUntilCancelled
      val top40 = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(40)
        .as[(Long, Long, Double)]
      val (it, cancel) =
        graft.api.Flow.fromDataset(top40, "c15").runCancellableIterator()
      val drained =
        try it.take(20).toList
        finally cancel()
      drained.toDF("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))

  private[queries] object EnsuringProbe {
    val fired = new java.util.concurrent.atomic.AtomicLong()
  }

  /** In-process managed-sink target: a JVM-static registry so executor
    * tasks (same JVM in local mode) and the driver see one queue — the
    * closure captures only the key string, never the queue.
    */
  private[queries] object LocalSink {
    import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
    private val sinks =
      new ConcurrentHashMap[String, ConcurrentLinkedQueue[(Long, String)]]()

    def open(key: String): ConcurrentLinkedQueue[(Long, String)] = {
      val q = new ConcurrentLinkedQueue[(Long, String)]()
      sinks.put(key, q)
      q
    }

    def close(key: String): Unit = sinks.remove(key)

    /** One writer per partition task, closed by toManagedSink's ADR-0005
      * lifecycle.
      */
    def resource(key: String): Writer = new Writer(key)

    final class Writer(key: String) extends AutoCloseable {
      def write(row: (Long, String)): Unit = {
        val q = sinks.get(key)
        require(q != null, s"sink $key used after close")
        q.add(row)
      }
      override def close(): Unit = () // no buffered state; registry-owned
    }
  }

  private implicit class JIterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  val all: Seq[Q] = Seq(
    mapProject, filterPredicate, flatMapExplode, unionAppend, foldSum,
    countWindow, recoverCase, orderedTake, distinctRows,
    parMapProject, iteratorDrain, managedSinkRoundtrip, ensuringFinalizer,
    recoverWithFallback, cancellableIterDrain)
}
