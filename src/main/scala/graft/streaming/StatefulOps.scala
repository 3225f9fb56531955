package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Running per-key (count, max) through `transformWithState`
    * (SPARK-40434, the Spark 4 successor to `mapGroupsWithState`):
    * explicit named `ValueState` on the handle, composable with more
    * state variables / timers / TTL, and backed by the RocksDB state
    * store (the provider the API requires — changelog-checkpointed,
    * state no longer bounded by executor heap). Count and max are
    * order-insensitive, so the last emission per key equals the
    * relational aggregate regardless of batch slicing (the s09
    * argument).
    */
  private class RunningStatsProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("stats",
        Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, mx) =
        if (st.exists()) st.get() else (0L, Double.NegativeInfinity)
      rows.foreach { r => n += 1; mx = math.max(mx, r._2) }
      st.update((n, mx))
      Iterator.single((key, n, mx))
    }
  }

  /** (user, value) stream → (user, running n, running max) per batch. */
  def runningStats(
      ds: Dataset[(Long, Double)]): Dataset[(Long, Long, Double)] =
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaDouble))
}
