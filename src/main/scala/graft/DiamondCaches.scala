package graft

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Automatic release of operator diamond persists.
  *
  * Several operators persist an intermediate frame because the RETURNED
  * lazy plan reads it from more than one branch (the jaccardPairs
  * diamond rule) — the persist's useful life therefore ends when the
  * caller is done with the returned plan, but the operator has no hook
  * at that point: under Bench/Verify the harness's
  * [[GraftSession.dropAllBlocks]] reaps between queries, while a
  * long-lived caller session accumulated every diamond ever built (the
  * r16 residual). An EAGER unpersist inside the operator is not an
  * option (it would re-open the diamond before the caller ever
  * executes the plan), and a release-on-first-completed-read listener
  * is RACY: build-time legs like GlobalOrder's zipWithIndex job read
  * the cache inside their own SQL execution scope, so "a query that
  * read the cache completed" fires before the real consumer ever runs
  * (observed: it un-substituted n154's scored frame mid-build).
  *
  * The race-free release signal is REACHABILITY. [[register]] holds a
  * [[WeakReference]] to the returned plan's analyzed tree (the
  * witness): every caller-side derivation (orderBy, select, write)
  * incorporates that tree by reference, so as long as the caller can
  * still execute the plan the witness is strongly reachable and the
  * diamond stays cached. Once the caller drops the query — the
  * long-lived-session moment the cache became garbage — a GC clears
  * the weak reference and the next sweep unpersists the frame. Sweeps
  * piggyback on query-completion events and on subsequent
  * registrations (no polling thread), and
  * [[GraftSession.dropAllBlocks]] drains everything as the harness
  * backstop.
  */
object DiamondCaches {

  private final case class Entry(
      witness: WeakReference[LogicalPlan], diamond: Dataset[_])

  private val entries = new ConcurrentLinkedQueue[Entry]()
  private val installed = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Tie the persisted `diamond`'s cache lifetime to the reachability
    * of `witness`'s plan (the frame the operator returns — its tree is
    * what every caller-side derivation retains). Returns `witness` for
    * chaining.
    */
  def register[T](diamond: Dataset[_], witness: Dataset[T]): Dataset[T] = {
    entries.add(
      Entry(new WeakReference(witness.queryExecution.analyzed), diamond))
    if (installed.add(witness.sparkSession))
      witness.sparkSession.listenerManager.register(listener)
    sweep()
    witness
  }

  /** Unpersist every registered diamond whose witness plan has been
    * garbage-collected (the caller can no longer execute it).
    */
  def sweep(): Unit = {
    val it = entries.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.witness.get() == null) {
        it.remove()
        try e.diamond.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }

  /** Unpersist and forget every registered diamond regardless of
    * witness reachability — the [[GraftSession.dropAllBlocks]]
    * backstop.
    */
  def drain(): Unit = {
    val it = entries.iterator()
    while (it.hasNext) {
      val e = it.next()
      it.remove()
      try e.diamond.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
  }

  private val listener: QueryExecutionListener = new QueryExecutionListener {
    override def onSuccess(
        funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      sweep()
    override def onFailure(
        funcName: String, qe: QueryExecution, exception: Exception): Unit =
      sweep()
  }
}
