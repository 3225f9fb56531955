package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state beyond windows — the `mapGroupsWithState` face of
  * SURVEY §2.6's streaming row (CountWindows covers the
  * flatMapGroupsWithState face). State per key is one scalar — bounded
  * by construction.
  */
object StatefulOps {

  /** Running per-key maximum: every batch emits the max seen so far for
    * keys present in the batch.
    */
  def runningMax[K](ds: Dataset[(K, Double)])(implicit
      ek: Encoder[K], eo: Encoder[(K, Double)],
      et: Encoder[Double]): Dataset[(K, Double)] =
    ds.groupByKey(_._1)
      .mapGroupsWithState[Double, (K, Double)](
        GroupStateTimeout.NoTimeout()) {
        (key: K, values: Iterator[(K, Double)], state: GroupState[Double]) =>
          val batchMax = values.map(_._2).max
          val newMax = state.getOption.fold(batchMax)(math.max(_, batchMax))
          state.update(newMax)
          (key, newMax)
      }
}
