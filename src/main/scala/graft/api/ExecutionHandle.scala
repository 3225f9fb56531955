package graft.api

import java.util.concurrent.atomic.AtomicBoolean
import scala.concurrent.{ExecutionContext, Future}
import org.apache.spark.sql.SparkSession

/** Execution outcome trichotomy — reference `ExecutionOutcome`
  * (Execution.scala:8-11).
  */
sealed trait ExecutionOutcome[+A]
final case class ExecutionCompleted[A](value: A) extends ExecutionOutcome[A]
final case class ExecutionFailed(error: Throwable) extends ExecutionOutcome[Nothing]
case object ExecutionCancelled extends ExecutionOutcome[Nothing]

/** Async execution handle — reference `ExecutionHandle`
  * (Execution.scala:13-17) rebuilt on Spark job groups: `cancel()` is
  * idempotent cooperative cancellation via `cancelJobGroup`, and the
  * outcome classifies completion vs failure vs cancellation, including
  * the stop-vs-failure race (a failure arriving after `cancel()` is
  * reported as Cancelled, matching the reference's token semantics).
  */
final class ExecutionHandle[A](
    val outcome: Future[ExecutionOutcome[A]],
    cancelFn: () => Unit) {
  private val cancelled = new AtomicBoolean(false)

  def cancel(): Unit =
    if (cancelled.compareAndSet(false, true)) cancelFn()

  def isCancelRequested: Boolean = cancelled.get()

  def await(atMost: scala.concurrent.duration.Duration): ExecutionOutcome[A] =
    scala.concurrent.Await.result(outcome, atMost)
}

object ExecutionHandle {
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Run `body` asynchronously inside a dedicated Spark job group so the
    * handle can cancel all its jobs — reference `RuntimeControl.runAsync`
    * (Execution.scala:69-91).
    */
  def run[A](spark: SparkSession, tag: String)(body: () => A)(
      implicit ec: ExecutionContext): ExecutionHandle[A] = {
    val group = s"graft-$tag-${counter.incrementAndGet()}"
    val sc = spark.sparkContext
    @volatile var cancelRequested = false
    val fut = Future {
      sc.setJobGroup(group, s"graft execution $tag", interruptOnCancel = true)
      try ExecutionCompleted(body())
      catch {
        case _: InterruptedException => ExecutionCancelled
        case e: Throwable if cancelRequested => ExecutionCancelled
        case e: Throwable => ExecutionFailed(e)
      } finally sc.clearJobGroup()
    }
    new ExecutionHandle[A](fut, () => {
      cancelRequested = true
      sc.cancelJobGroup(group)
    })
  }
}
