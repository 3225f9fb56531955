package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Checkpoint lifecycle for iterative operators.
  *
  * `localCheckpoint()` materializes outside the SQL cache manager, so
  * `spark.catalog.clearCache()` never frees those blocks and every loop
  * round would otherwise pin a superseded node-table-sized copy in
  * executor storage for the session lifetime — at corpus scale the
  * superseded copies, not the live one, become the storage bill.
  * [[ckpt]] tags which persisted RDDs a checkpoint created; [[release]]
  * drops a superseded generation the moment its successor is
  * materialized (a checkpointed successor has no lineage back to it, so
  * the blocks can never be re-requested).
  */
object Lineage {

  /** localCheckpoint + the ids of the persisted RDDs it created (the
    * before/after diff is race-free inside a driver-side loop).
    */
  def ckpt(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    (out, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  /** Drop the blocks of a superseded checkpoint generation. */
  def release(sc: SparkContext, ids: Set[Int]): Unit =
    ids.foreach(id => sc.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))
}
