package graft

import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.ExecutionContext.Implicits.global
import graft.api.Flow
import org.scalatest.funsuite.AnyFunSuite

object FinalizerProbe {
  val runs = new AtomicInteger(0)
  def reset(): Unit = runs.set(0)
}

/** Flow lifecycle surface: ensuring (exactly-once finalizer),
  * cancellable iterator, topology rendering.
  */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ensuring runs once per task on success (Stream.scala:188-228)") {
    FinalizerProbe.reset()
    val out = Flow.fromDataset(spark.createDataset(1 to 100).repartition(2))
      .ensuring(() => FinalizerProbe.runs.incrementAndGet())
      .runToList()
    assert(out.size == 100)
    assert(FinalizerProbe.runs.get() == 2, "one finalizer run per task")
  }

  test("ensuring still runs when downstream processing fails") {
    FinalizerProbe.reset()
    intercept[Throwable] {
      Flow.fromDataset(spark.createDataset(1 to 10).coalesce(1))
        .ensuring(() => FinalizerProbe.runs.incrementAndGet())
        .map(i => if (i == 5) throw new IllegalStateException("boom") else i)
        .runToList()
    }
    assert(FinalizerProbe.runs.get() >= 1, "finalizer must run on failure")
  }

  test("runCancellableIterator yields elements and exposes cancel") {
    val (it, cancel) = Flow.fromDataset(
      spark.createDataset(1 to 50).coalesce(1)).runCancellableIterator()
    assert(it.take(5).toList == List(1, 2, 3, 4, 5))
    cancel() // must not throw; remaining jobs (if any) are aborted
  }

  test("ssp_parmap_inflight gauge tracks live task concurrency") {
    import graft.streaming.ParMapInflightGauge
    val gauge = ParMapInflightGauge.install(spark)
    import spark.implicits._
    // 8-way parMap with per-element latency: tasks must overlap
    Flow.fromDataset(spark.createDataset(1 to 64))
      .parMap(8) { i => Thread.sleep(50); i * 2 }
      .fold(0L)((a, b) => a + b, _ + _)
    // listener events are delivered async — poll for quiescence
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (gauge.inflight != 0 && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(gauge.inflight == 0, "gauge returns to zero after the job")
    assert(gauge.peak >= 2,
      s"8 concurrent 50ms tasks must overlap, peak=${gauge.peak}")
  }

  test("runCancellableIterator: cancel after a true hasNext still delivers") {
    val (it, cancel) = Flow.fromDataset(
      spark.createDataset(1 to 10).coalesce(1)).runCancellableIterator()
    assert(it.hasNext)
    cancel()
    // Iterator contract: the latched true hasNext guarantees this next()
    assert(it.next() == 1)
    // and after the latch is consumed, cancellation means clean exhaustion
    assert(!it.hasNext)
    intercept[NoSuchElementException](it.next())
  }

  test("ManagedSource: happy path closes once, rows parallelize") {
    SinkProbe.reset()
    val flow = graft.api.ManagedSource.read(spark,
      () => new SinkProbe.Ok)(_ => (1 to 5).toList)
    assert(SinkProbe.closed.get(), "resource closed after read")
    assert(flow.runToList().sorted == List(1, 2, 3, 4, 5))
  }

  test("ManagedSource: read error primary, close error suppressed (ADR-0005)") {
    SinkProbe.reset()
    val e = intercept[IllegalArgumentException] {
      graft.api.ManagedSource.read[SinkProbe.BrokenClose, Int](spark,
        () => new SinkProbe.BrokenClose)(_ =>
        throw new IllegalArgumentException("read boom"))
    }
    assert(e.getMessage == "read boom")
    assert(e.getSuppressed.exists(_.getMessage == "close boom"))
    assert(SinkProbe.closed.get())
  }

  test("ManagedSource: close-only failure surfaces") {
    SinkProbe.reset()
    val e = intercept[IllegalStateException] {
      graft.api.ManagedSource.read(spark,
        () => new SinkProbe.BrokenClose)(_ => List(1))
    }
    assert(e.getMessage == "close boom")
  }

  test("foldTyped (Aggregator UDAF surface) agrees with fold") {
    val f = Flow.fromSeq(spark, (1 to 500).toList)
    val viaAgg = f.foldTyped(0L)((b, a) => b + a, _ + _)
    val viaRdd = f.fold(0L)((b, a) => b + a, _ + _)
    assert(viaAgg == viaRdd && viaAgg == 125250L)
  }

  test("observe attaches named metrics without changing rows") {
    import org.apache.spark.sql.functions._
    val out = Flow.fromSeq(spark, List(1, 2, 3))
      .observe("flow_metrics", count(lit(1)), sum(col("value")))
      .runToList()
    assert(out.sorted == List(1, 2, 3))
  }

  test("topology renders the logical plan (JobGraph.printTopology analog)") {
    val topo = Flow.fromSeq(spark, List(1, 2, 3))
      .map(_ * 2).filter(_ > 2).topology
    assert(topo.contains("Filter"))
    assert(topo.toLowerCase.contains("localrelation") ||
      topo.contains("SerializeFromObject"))
  }
}
