package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Metrics facade publishing the reference's stable metric schema
  * (docs/adr/metric-schema.md:5-13) from Spark's native observability:
  *
  * | reference metric                | source here                          |
  * |---------------------------------|--------------------------------------|
  * | ssp_late_event_dropped_total    | progress.stateOperators.numRowsDroppedByWatermark |
  * | ssp_watermark_regression_total  | monotonicity check on progress.eventTime.watermark |
  * | ssp_boundary_queue_depth        | ≈ progress.numInputRows per trigger (micro-batch is the boundary) |
  * | ssp_boundary_producer_block_ms  | ≈ durationMs.triggerExecution        |
  * | ssp_unhandled_error_total       | query-terminated-with-exception count |
  * | ssp_resource_close_fail_total   | ResourceCloseException markers: counted by Flow.toManagedSink(metrics=...) and on query termination |
  * | ssp_parmap_inflight             | [[ParMapInflightGauge]]: live running-task count from scheduler task events (parMap's pool IS the Spark scheduler here) |
  *
  * Scoping follows the reference's per-execution collectors
  * (Metrics.scala:96-111): metrics are keyed by query name, global
  * totals aggregate across queries.
  */
final class GraftMetrics extends StreamingQueryListener {
  final case class Snapshot(
      lateEventDroppedTotal: Long,
      watermarkRegressionTotal: Long,
      unhandledErrorTotal: Long,
      resourceCloseFailTotal: Long,
      lastInputRows: Long,
      lastTriggerMs: Long)

  private val lateDropped = new ConcurrentHashMap[String, AtomicLong]()
  private val regressions = new ConcurrentHashMap[String, AtomicLong]()
  private val errors = new AtomicLong()
  private val closeFails = new AtomicLong()
  private val lastWatermark = new ConcurrentHashMap[String, String]()
  @volatile private var lastRows = 0L
  @volatile private var lastMs = 0L

  private def bump(m: ConcurrentHashMap[String, AtomicLong], k: String, by: Long): Unit =
    m.computeIfAbsent(k, _ => new AtomicLong()).addAndGet(by)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
    if (dropped > 0) bump(lateDropped, name, dropped)
    Option(p.eventTime.get("watermark")).foreach { wm =>
      val prev = lastWatermark.put(name, wm)
      // regressing watermarks are ignored by Spark (as by the reference,
      // Node.scala:336) — count any observed non-monotonic report
      if (prev != null && wm < prev) bump(regressions, name, 1)
    }
    lastRows = p.numInputRows
    lastMs = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    event.exception.foreach { msg =>
      errors.incrementAndGet()
      if (msg.contains(classOf[graft.api.ResourceCloseException].getSimpleName))
        closeFails.incrementAndGet()
    }

  def recordCloseFailure(): Unit = closeFails.incrementAndGet()

  private def total(m: ConcurrentHashMap[String, AtomicLong]): Long = {
    var t = 0L
    m.forEach((_, v) => t += v.get())
    t
  }

  def snapshot(): Snapshot = Snapshot(
    total(lateDropped), total(regressions), errors.get(), closeFails.get(),
    lastRows, lastMs)

  def lateDroppedFor(queryName: String): Long =
    Option(lateDropped.get(queryName)).map(_.get()).getOrElse(0L)
}

object GraftMetrics {
  /** Install a fresh listener on the session and return it. */
  def install(spark: SparkSession): GraftMetrics = {
    val m = new GraftMetrics
    spark.streams.addListener(m)
    m
  }
}

/** `ssp_parmap_inflight` (reference `Metrics.scala:6-15`,
  * `docs/adr/metric-schema.md:5-13`): the reference gauges elements
  * in-flight inside parMap's private worker pool. In this engine parMap's
  * pool IS the Spark scheduler (one element batch per task), so the
  * equivalent executor-derived gauge is the live running-task count,
  * tracked from scheduler task start/end events. `peak` records the
  * high-water mark — the observed effective parallelism of the run.
  */
final class ParMapInflightGauge extends org.apache.spark.scheduler.SparkListener {
  import org.apache.spark.scheduler.{SparkListenerTaskEnd, SparkListenerTaskStart}
  private val running = new AtomicLong()
  private val high = new AtomicLong()

  override def onTaskStart(event: SparkListenerTaskStart): Unit = {
    val v = running.incrementAndGet()
    high.accumulateAndGet(v, (a: Long, b: Long) => math.max(a, b))
  }

  override def onTaskEnd(event: SparkListenerTaskEnd): Unit =
    // clamp at zero: tasks already running when the listener is
    // installed deliver only their end event, and a permanent negative
    // offset would misreport every later reading
    running.accumulateAndGet(-1L, (a: Long, d: Long) => math.max(0L, a + d))

  /** Current ssp_parmap_inflight value. */
  def inflight: Long = running.get()

  /** High-water mark since install. */
  def peak: Long = high.get()
}

object ParMapInflightGauge {
  def install(spark: SparkSession): ParMapInflightGauge = {
    val g = new ParMapInflightGauge
    spark.sparkContext.addSparkListener(g)
    g
  }
}
