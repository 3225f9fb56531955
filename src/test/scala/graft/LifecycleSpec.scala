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

  test("topology renders the logical plan (JobGraph.printTopology analog)") {
    val topo = Flow.fromSeq(spark, List(1, 2, 3))
      .map(_ * 2).filter(_ > 2).topology
    assert(topo.contains("Filter"))
    assert(topo.toLowerCase.contains("localrelation") ||
      topo.contains("SerializeFromObject"))
  }
}
