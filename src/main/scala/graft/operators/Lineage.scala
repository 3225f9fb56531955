package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpoint lifecycle for iterative operators.
  *
  * `localCheckpoint()` materializes outside the SQL cache manager, so
  * `spark.catalog.clearCache()` never frees those blocks and every loop
  * round would otherwise pin a superseded node-table-sized copy in
  * executor storage for the session lifetime — at corpus scale the
  * superseded copies, not the live one, become the storage bill.
  * [[ckpt]] returns the exact RDD a checkpoint persisted (the
  * `LogicalRDD` the returned Dataset wraps — NOT a before/after diff of
  * `sc.getPersistentRDDs`, which over-captures caches that happen to
  * materialize inside the checkpoint job, e.g. the loop's own persisted
  * edge table on round one); [[release]] drops a superseded generation
  * the moment its successor is materialized (a checkpointed successor
  * has no lineage back to it, so the blocks can never be re-requested).
  */
object Lineage {

  /** Count of ckpt calls that could NOT identify the persisted RDD.
    * Spec-asserted (NorthStarSpec "Lineage.ckpt…"): on this Spark
    * version it must stay zero, so a minor upgrade that changes the
    * checkpoint plan shape fails CI instead of silently reintroducing
    * the superseded-generation leak behind a stderr WARN that log
    * captures may drop.
    */
  val noOpCkpts = new java.util.concurrent.atomic.AtomicLong()

  /** localCheckpoint + the persisted RDD backing the result. */
  def ckpt(df: DataFrame): (DataFrame, Option[RDD[_]]) = {
    val out = df.localCheckpoint()
    val rdd = out.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD => lr.rdd
    }
    // loud, not silent: if a Spark upgrade changes the checkpoint plan
    // shape, release() becoming a no-op should be visible, or the
    // superseded-generation leak this class exists to fix comes back
    if (rdd.isEmpty) {
      noOpCkpts.incrementAndGet()
      System.err.println(
        "[graft.Lineage] WARN: checkpoint plan is not a LogicalRDD; " +
          "superseded-generation release is a no-op")
    }
    (out, rdd)
  }

  /** Drop the blocks of superseded checkpoint generations. */
  def release(gens: Option[RDD[_]]*): Unit =
    gens.flatten.foreach(_.unpersist(blocking = false))
}
