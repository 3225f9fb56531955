package graft.api

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed fluent pipeline over `Dataset[T]` — the Spark-native equivalent
  * of the reference's `Node[I, O]` chain (`Node.scala:14-42`): the chain
  * of transformations IS the logical plan, Catalyst is the (previously
  * nonexistent) optimizer, and the physical execution is distributed
  * tasks instead of a pull-driven cons-list.
  *
  * Semantics carried over from the reference ADRs:
  *   - ordering (ADR-0002): intra-partition order is preserved by all
  *     narrow ops, matching the reference's per-element order contract;
  *     [[Flow.zipWithOrdinal]] pins a global order where a test needs it.
  *   - fail-fast errors (ADR-0003): a throwing lambda fails the query;
  *     [[Flow.mapAttempt]] is the element-level recovery surface
  *     (SURVEY §7.4.3) — errors become in-band `Attempt` values.
  *   - resource lifecycle (ADR-0005): [[Flow.toManagedSink]].
  */
final case class Flow[T](ds: Dataset[T], name: String) {
  private def spark: SparkSession = ds.sparkSession

  def withName(n: String): Flow[T] = copy(name = n)

  /** Reference `map` (Stream.scala:14-23). Runs concurrently across
    * partitions — the reference's `parMap` parallelism is the default
    * execution mode here, with order kept per partition.
    */
  def map[U: Encoder](f: T => U): Flow[U] =
    Flow(ds.map(f), s"$name.map")

  /** Reference `flatMap` (Stream.scala:25-34). */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): Flow[U] =
    Flow(ds.flatMap(f), s"$name.flatMap")

  /** Reference `filter` (Stream.scala:36-47). */
  def filter(p: T => Boolean): Flow[T] =
    Flow(ds.filter(p), s"$name.filter")

  /** Reference `append` (Stream.scala:49-54): this-then-that
    * concatenation. Spark `union` keeps no inter-operand order — callers
    * needing the reference's strict ordering sort on [[zipWithOrdinal]]
    * ordinals (operand rank is the high-order key).
    */
  def append(that: Flow[T]): Flow[T] =
    Flow(ds.union(that.ds), s"$name.append")

  /** Reference `parMap` (Stream.scala:103-186): explicit parallelism
    * width. Spark already runs `map` concurrently per partition;
    * `parallelism` here just re-widths the stage. Fail-fast on
    * non-positive parallelism, like the reference.
    */
  def parMap[U: Encoder](parallelism: Int)(f: T => U): Flow[U] = {
    require(parallelism > 0, s"parallelism must be > 0, got $parallelism")
    Flow(ds.repartition(parallelism).map(f), s"$name.parMap")
  }

  /** Reference `parMap` with the full ADR-0002 ordering contract:
    * output order == input order even under skewed per-element latency
    * (the reference's order-restoring gather, Stream.scala:116-165).
    * Ordinals are pinned before the shuffle, work spreads over
    * `parallelism` tasks, and the global order is restored by a range
    * sort on the ordinal.
    */
  def parMapOrdered[U: Encoder](parallelism: Int)(f: T => U)(
      implicit eto: Encoder[(T, Long)], euo: Encoder[(U, Long)]): Flow[U] = {
    require(parallelism > 0, s"parallelism must be > 0, got $parallelism")
    import org.apache.spark.sql.functions.col
    val mapped = zipWithOrdinal.ds
      .repartition(parallelism)
      .map { case (t, ord) => (f(t), ord) }
    Flow(
      mapped.orderBy(col("_2")).map(_._1),
      s"$name.parMapOrdered")
  }

  /** Element-level recovery surface: a throwing `f` yields an in-band
    * [[Attempt]] failure instead of failing the query — the distributed
    * analog of the reference's `recover` family, whose error source is
    * always the user lambda (docs/examples.md:131-143).
    */
  def mapAttempt[U: Encoder](f: T => U)(
      implicit e: Encoder[Attempt[U]]): Flow[Attempt[U]] =
    Flow(ds.map(t => Attempt(f, t)), s"$name.mapAttempt")

  /** Reference `grouped` (Stream.scala:230-256) — scalable form: tumbling
    * count windows *per partition* (intra-partition order, final partial
    * window per partition). The exact global-order form is
    * [[Flow.groupedGlobal]]; the keyed streaming form is
    * `graft.streaming.CountWindows`.
    */
  def grouped(size: Int)(implicit e: Encoder[Seq[T]]): Flow[Seq[T]] = {
    require(size > 0, s"grouped size must be > 0, got $size")
    Flow(ds.mapPartitions(_.grouped(size).map(_.toSeq)), s"$name.grouped")
  }

  /** Pins the current global order (single pass, no shuffle): pairs each
    * element with a global ordinal derived from partition-local indexes.
    */
  def zipWithOrdinal(implicit e: Encoder[(T, Long)]): Flow[(T, Long)] =
    Flow(
      spark.createDataset(ds.rdd.zipWithIndex())(e),
      s"$name.zipWithOrdinal")

  /** Reference `ensuring` (Stream.scala:188-228): a finalizer that runs
    * exactly once per task on any terminal path — completion, failure,
    * or cancellation — via Spark's task-completion listener (the
    * distributed analog of the reference's close-once guarantee).
    */
  def ensuring(finalizer: () => Unit): Flow[T] =
    Flow(
      ds.mapPartitions { it =>
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => finalizer()))
        it
      }(ds.encoder),
      s"$name.ensuring")

  /** Reference `runCancellableIterator` (Node.scala:92-117): a lazy
    * iterator plus a cancel handle; cancelling aborts the backing jobs
    * and the iterator terminates with the partitions already fetched.
    * `toLocalIterator` launches its per-partition jobs lazily from the
    * consuming thread, so the job group is (re)set around each pull and
    * cleared after — it can't leak onto unrelated work on this thread.
    * A cancelled flag is checked on every pull, so a cancel issued
    * *between* pulls terminates the iterator too (cancelJobGroup alone
    * only aborts jobs already running).
    *
    * Iterator-contract guarantees (matching the reference's clean
    * QueueEnd termination, Node.scala:92-117):
    *   - a `true` hasNext is latched: a cancel arriving before the
    *     following next() does not turn it into NoSuchElementException —
    *     the already-fetched element is delivered;
    *   - a cancel landing mid-pull surfaces as exhaustion
    *     (hasNext = false), not as the scheduler's job-cancelled
    *     SparkException.
    */
  def runCancellableIterator()(
      implicit ec: scala.concurrent.ExecutionContext): (Iterator[T], () => Unit) = {
    val group = s"graft-iter-$name-${System.identityHashCode(this)}"
    val sc = spark.sparkContext
    val base = ds.toLocalIterator().asScala
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    def inGroup[A](f: => A): A = {
      sc.setJobGroup(group, s"cancellable iterator $name", interruptOnCancel = true)
      try f finally sc.clearJobGroup()
    }
    val it = new Iterator[T] {
      private var ready = false // latched: base.hasNext returned true
      override def hasNext: Boolean = ready || (!cancelled.get() && {
        ready =
          try inGroup(base.hasNext)
          catch {
            // our own cancellation aborting the in-flight partition fetch
            // is clean termination, not an error
            case e: org.apache.spark.SparkException if cancelled.get() => false
          }
        ready
      })
      override def next(): T = {
        if (!hasNext) throw new NoSuchElementException("iterator exhausted")
        ready = false
        try inGroup(base.next())
        catch {
          case e: org.apache.spark.SparkException if cancelled.get() =>
            throw new NoSuchElementException("iterator cancelled mid-pull")
        }
      }
    }
    (it, () => { cancelled.set(true); sc.cancelJobGroup(group) })
  }

  /** Reference `JobGraph.printTopology` (JobGraph.scala:16-68): render
    * the operator tree — here the analyzed logical plan, which IS the
    * pipeline topology in this engine.
    */
  def topology: String = ds.queryExecution.analyzed.treeString

  // --- terminals (reference Sink / toList / iterator / foreach) ---------

  /** Distributed fold (reference `Sink`, Node.scala:439): requires an
    * associative `combine` for partial+final aggregation — the
    * distributed contract SURVEY §7.4.5 documents. Order-sensitive folds
    * use [[foldOrdered]].
    */
  def fold[B: scala.reflect.ClassTag](zero: B)(
      seqOp: (B, T) => B, combine: (B, B) => B): B =
    ds.rdd.aggregate(zero)(seqOp, combine)

  /** Strict left-to-right fold in the exact current order — the
    * reference's sequential fold semantics (Stream.scala:56-68). Streams
    * partitions to the driver one at a time; use only where order
    * sensitivity genuinely requires it.
    */
  def foldOrdered[B](zero: B)(f: (B, T) => B): B =
    ds.toLocalIterator().asScala.foldLeft(zero)(f)

  /** Observed named metrics on the stream — reference per-node metrics
    * (§2.5) via `Dataset.observe`; values surface in query listeners.
    */
  def observe(metricName: String,
      exprs: org.apache.spark.sql.Column*): Flow[T] =
    Flow(ds.observe(metricName, exprs.head, exprs.tail: _*),
      s"$name.observe")

  /** Typed fold through the `Aggregator` UDAF surface (distributed
    * partial+final; SURVEY §7.3): same contract as [[fold]] but executed
    * as a Catalyst aggregate rather than an RDD action.
    */
  def foldTyped[B: Encoder](zero: B)(f: (B, T) => B, combine: (B, B) => B): B = {
    val agg = new ManagedSource.FoldAggregator[T, B](zero, f, combine)
    ds.select(agg.toColumn).head()
  }

  /** Reference `toList` (Stream.scala:81-88). */
  def runToList(): List[T] = ds.collect().toList

  /** Reference `iterator` (Stream.scala:268-302): lazy pull iterator. */
  def iterator(): Iterator[T] = ds.toLocalIterator().asScala

  /** Reference `foreach` terminal (Stream.scala:70-79). */
  def foreach(f: T => Unit): Unit = ds.foreach(f)

  /** Reference `ManagedSink` (Node.scala:370-437): per-partition resource
    * lifecycle with ADR-0005 precedence — open once, close always;
    * processing error is primary with close error suppressed; a
    * close-only failure surfaces.
    */
  def toManagedSink[R <: AutoCloseable](
      open: () => R,
      metrics: Option[graft.streaming.GraftMetrics] = None)(
      process: (R, T) => Unit): Unit = {
    def run(): Unit = ds.foreachPartition { (it: Iterator[T]) =>
      val resource = open()
      var primary: Throwable = null
      try it.foreach(t => process(resource, t))
      catch { case e: Throwable => primary = e }
      finally {
        try resource.close()
        catch {
          case ce: Throwable =>
            if (primary != null) primary.addSuppressed(ce)
            else primary = new ResourceCloseException(ce)
        }
        if (primary != null) throw primary
      }
    }
    try run()
    catch {
      case e: Throwable =>
        // close-only failures travel as the marker class; count on the
        // driver (executor accumulators are dropped for failed tasks)
        val marker = classOf[ResourceCloseException].getSimpleName
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .take(10).toList
        if (chain.exists(t => t.getClass.getSimpleName == marker ||
            (t.getMessage != null && t.getMessage.contains(marker))))
          metrics.foreach(_.recordCloseFailure())
        throw e
    }
  }

  // --- async execution (reference ExecutionHandle, Execution.scala) ----

  /** Async collect with cooperative cancellation — reference
    * `runToListAsync` (Node.scala:44-65).
    */
  def runToListAsync()(
      implicit ec: scala.concurrent.ExecutionContext): ExecutionHandle[List[T]] =
    ExecutionHandle.run(spark, s"flow-$name")(() => runToList())

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}

object Flow {
  /** Reference `Source` / `Stream.fromList` (Node.scala:129,
    * Stream.scala:320-323).
    */
  def fromSeq[T: Encoder](spark: SparkSession, values: Seq[T],
      name: String = "source"): Flow[T] =
    Flow(spark.createDataset(values), name)

  def fromDataset[T](ds: Dataset[T], name: String = "source"): Flow[T] =
    Flow(ds, name)

  /** Exact reference `grouped` semantics: tumbling count windows over a
    * given global order (sorted on `orderCols`); forces the ordered
    * row_number through a single partition — correct, documented
    * non-scalable (SURVEY §7.4.1); prefer [[Flow.grouped]] at scale.
    */
  def groupedGlobal[T](ds: Dataset[T], size: Int, orderCols: Seq[String])(
      implicit e: Encoder[Seq[T]]): Dataset[Seq[T]] = {
    require(size > 0, s"grouped size must be > 0, got $size")
    ds.orderBy(orderCols.map(col): _*)
      .coalesce(1)
      .mapPartitions(_.grouped(size).map(_.toSeq))
  }
}

/** In-band element-level outcome for [[Flow.mapAttempt]]: either a value
  * or the captured error (class + message — Throwables aren't
  * Encoder-friendly). The reference's `recover`/`recoverWith` golden
  * behavior ("prefix before failure ++ fallback", Stream.scala:90-101)
  * is reconstructed from the ordered Attempt stream by
  * [[Attempt.recoverPrefix]].
  */
final case class Attempt[U](value: Option[U], errorClass: Option[String],
    errorMessage: Option[String]) {
  def isSuccess: Boolean = value.isDefined
}

object Attempt {
  def apply[T, U](f: T => U, t: T): Attempt[U] =
    try Attempt(Some(f(t)), None, None)
    catch {
      case e: Throwable =>
        Attempt(None, Some(e.getClass.getName), Some(String.valueOf(e.getMessage)))
    }

  /** Reference `recover` semantics over an ordered attempt list: emit
    * values up to the first failure, then the fallback for that failure,
    * then halt (docs/examples.md:131-137).
    */
  def recoverPrefix[U](attempts: Seq[Attempt[U]])(
      fallback: PartialFunction[(String, String), U]): Seq[U] = {
    val (ok, rest) = attempts.span(_.isSuccess)
    val prefix = ok.flatMap(_.value)
    rest.headOption match {
      case Some(Attempt(_, Some(cls), Some(msg))) if fallback.isDefinedAt((cls, msg)) =>
        prefix :+ fallback((cls, msg))
      case Some(a @ Attempt(_, Some(_), _)) =>
        throw new RuntimeException(
          s"unrecovered error: ${a.errorClass.get}: ${a.errorMessage.getOrElse("")}")
      case _ => prefix
    }
  }

  /** Reference `recoverWith` semantics: prefix before failure ++ a
    * fallback *sequence* (docs/examples.md:138-143).
    */
  def recoverWithPrefix[U](attempts: Seq[Attempt[U]])(
      fallback: PartialFunction[(String, String), Seq[U]]): Seq[U] = {
    val (ok, rest) = attempts.span(_.isSuccess)
    val prefix = ok.flatMap(_.value)
    rest.headOption match {
      case Some(Attempt(_, Some(cls), Some(msg))) if fallback.isDefinedAt((cls, msg)) =>
        prefix ++ fallback((cls, msg))
      case Some(a @ Attempt(_, Some(_), _)) =>
        throw new RuntimeException(
          s"unrecovered error: ${a.errorClass.get}: ${a.errorMessage.getOrElse("")}")
      case _ => prefix
    }
  }
}
