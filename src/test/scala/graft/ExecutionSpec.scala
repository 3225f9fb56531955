package graft

import java.util.concurrent.atomic.AtomicBoolean
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import graft.api._
import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

/** Resource used by managed-sink tests; static state is visible because
  * local mode shares one JVM (the reference tests use plain buffers the
  * same way, SimpleStreamProcessorTest.scala:157-266).
  */
object SinkProbe {
  val closed = new AtomicBoolean(false)
  val processedCount = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { closed.set(false); processedCount.set(0) }

  final class Ok extends AutoCloseable {
    def write(i: Int): Unit = { processedCount.incrementAndGet(); () }
    def close(): Unit = closed.set(true)
  }
  final class BrokenClose extends AutoCloseable {
    def write(i: Int): Unit = { processedCount.incrementAndGet(); () }
    def close(): Unit = { closed.set(true); throw new IllegalStateException("close boom") }
  }
}

class ExecutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("runToListAsync completes (Execution.scala:8-11 Completed)") {
    val h = Flow.fromSeq(spark, List(1, 2, 3)).map(_ * 2).runToListAsync()
    h.await(60.seconds) match {
      case ExecutionCompleted(vs) => assert(vs.sorted == List(2, 4, 6))
      case other => fail(s"unexpected outcome $other")
    }
  }

  test("failure classifies as Failed with cause (ADR-0003)") {
    val h = Flow.fromSeq(spark, List(1, 0))
      .map(10 / _)
      .runToListAsync()
    h.await(60.seconds) match {
      case ExecutionFailed(e) =>
        assert(e.isInstanceOf[SparkException] || e.getCause != null)
      case other => fail(s"unexpected outcome $other")
    }
  }

  test("cancel classifies as Cancelled (test :355-400)") {
    val slow = Flow.fromDataset(
      spark.createDataset(1 to 2000).repartition(2))
      .map { i => Thread.sleep(5); i }
    val h = slow.runToListAsync()
    Thread.sleep(300) // let jobs start
    h.cancel()
    h.await(60.seconds) match {
      case ExecutionCancelled => succeed
      case ExecutionCompleted(_) =>
        fail("completed before cancellation took effect")
      case ExecutionFailed(e) => fail(s"expected Cancelled, got Failed($e)")
    }
  }

  test("cancel is idempotent (Execution.scala:26-50)") {
    val h = Flow.fromSeq(spark, List(1)).runToListAsync()
    h.cancel(); h.cancel()
    assert(h.isCancelRequested)
  }

  test("managed sink: happy path closes exactly once per partition") {
    SinkProbe.reset()
    Flow.fromDataset(spark.createDataset(1 to 10).coalesce(1))
      .toManagedSink(() => new SinkProbe.Ok)((r, i) => r.write(i))
    assert(SinkProbe.closed.get())
    assert(SinkProbe.processedCount.get() == 10)
  }

  test("managed sink: processing error primary, close still runs (ADR-0005)") {
    SinkProbe.reset()
    val e = intercept[SparkException] {
      Flow.fromDataset(spark.createDataset(1 to 10).coalesce(1))
        .toManagedSink(() => new SinkProbe.Ok) { (r, i) =>
          if (i == 5) throw new IllegalArgumentException("process boom")
          r.write(i)
        }
    }
    assert(SinkProbe.closed.get(), "resource must be closed on failure")
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).map(_.getMessage).mkString("; ")
    assert(messages.contains("process boom"))
  }

  test("close failures report into the metrics accumulator") {
    SinkProbe.reset()
    val metrics = graft.streaming.GraftMetrics.install(spark)
    try {
      intercept[SparkException] {
        Flow.fromDataset(spark.createDataset(1 to 3).coalesce(1))
          .toManagedSink(() => new SinkProbe.BrokenClose,
            Some(metrics))((r, i) => r.write(i))
      }
      assert(metrics.snapshot().resourceCloseFailTotal >= 1L)
    } finally spark.streams.removeListener(metrics)
  }

  test("managed sink: close-only failure surfaces (ADR-0005)") {
    SinkProbe.reset()
    val e = intercept[SparkException] {
      Flow.fromDataset(spark.createDataset(1 to 3).coalesce(1))
        .toManagedSink(() => new SinkProbe.BrokenClose)((r, i) => r.write(i))
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).map(_.getMessage).mkString("; ")
    assert(messages.contains("close boom"))
    assert(SinkProbe.processedCount.get() == 3, "all elements processed before close")
  }

  test("managed sink: processing error suppresses close error (matrix row 3)") {
    SinkProbe.reset()
    val e = intercept[SparkException] {
      Flow.fromDataset(spark.createDataset(1 to 3).coalesce(1))
        .toManagedSink(() => new SinkProbe.BrokenClose) { (r, i) =>
          if (i == 2) throw new IllegalArgumentException("process boom")
          r.write(i)
        }
    }
    // ADR-0005: processing error is primary; the close error is attached
    // as suppressed at throw time, but Spark's task-failure transport
    // re-creates exceptions from (class, message, stacktrace) and drops
    // the suppressed list — so observable precedence is what we assert:
    // the surfaced error chain names the processing failure, not close.
    val root = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).toList.last
    assert(root.getMessage == "process boom",
      s"processing error must be the root cause, got: $root")
    assert(root.isInstanceOf[IllegalArgumentException])
    assert(SinkProbe.closed.get(), "close must still run")
  }
}
