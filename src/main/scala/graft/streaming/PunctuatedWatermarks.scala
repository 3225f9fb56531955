package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import scala.collection.mutable

/** In-band watermark punctuation — the reference's `TimedEvent` protocol
  * (`Node.scala:282-340`: `WatermarkPipe` + `EventTimeWindowPipe`),
  * previously the one semantic surface mapped to query-level
  * `withWatermark` as a documented divergence (SURVEY §7.4.2). Here the
  * punctuation rules run natively, exactly:
  *
  *   - `WatermarkPipe(emitEveryN)` (`Node.scala:289-313`): after every N
  *     records emit `Watermark(max ts so far)`; a tail punctuation
  *     follows a non-multiple remainder.
  *   - `EventTimeWindowPipe(windowSizeMs)` (`Node.scala:315-340`): a
  *     record with `ts >= currentWatermark` joins window
  *     `floor(ts/size)*size`; a late record (`ts < watermark`) is
  *     dropped and counted; a watermark only advances forward (a
  *     regressing one is counted, not applied) and emits — in ascending
  *     start order — every open window with `end <= watermark`, stamped
  *     with the emitting watermark; open windows are NOT flushed at
  *     end-of-stream (ADR-0006).
  *
  * Scale shape: punctuation is a *sequential* protocol — a watermark row
  * orders against the records around it — so the Spark-native carrier of
  * that order is the partition (ADR-0002). Streams are keyed: every key
  * is an independent punctuated stream, keys spread across partitions
  * (`repartition(key)` + `sortWithinPartitions(key, seq)`), and the
  * state machine runs embarrassingly parallel in `mapPartitions` with a
  * per-key reset — no state store, no global order, state bounded by
  * the open windows of the keys in flight. The reference's single
  * stream is the one-key special case (golden-pinned in
  * PunctuatedWatermarkSpec).
  *
  * Metrics ride Spark accumulators (per-execution scoping, the
  * reference's handle-scoped snapshot analog): late drops and watermark
  * regressions, named after the reference schema.
  */
object PunctuatedWatermarks {

  /** One in-band element of a keyed punctuated stream: a record
    * (`isWatermark = false`, `value` present) or a watermark punctuation
    * (`isWatermark = true`, `value` ignored). `seq` is the in-band
    * position — records at `2·rn`, a punctuation following record rn at
    * `2·rn + 1` — so sorting by (key, seq) reproduces interleave order.
    */
  final case class Timed(
      key: Long, seq: Long, isWatermark: Boolean, value: Double, ts: Long)

  /** Reference `EventTimeWindow` per key: `[startMs, endMs)`, values in
    * arrival order, stamped with the watermark that emitted the window.
    */
  final case class Win(
      key: Long, startMs: Long, endMs: Long, values: Seq[Double], wmMs: Long)

  /** `WatermarkPipe` per key, relationally: order each key's records by
    * (`ts`, `tieCol`), then interleave `Watermark(max ts so far)` after
    * every `emitEveryN` records plus the tail. Because each key's stream
    * is ordered by ts, the running max IS the current row's ts — so the
    * punctuation row simply carries the ts of the record it follows.
    * Input columns: key, value, ts, tieCol. One window function
    * partitioned BY KEY (never partition-less), one union — pure
    * relational fan-out, no driver involvement.
    */
  def punctuateByKey(
      events: DataFrame, emitEveryN: Int, tieCol: String): Dataset[Timed] = {
    require(emitEveryN > 0, s"emitEveryN must be > 0, got $emitEveryN")
    import events.sparkSession.implicits._
    val w = Window.partitionBy("key").orderBy(col("ts"), col(tieCol))
    val r = events
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("total",
        count(lit(1)).over(Window.partitionBy("key")).cast("long"))
    val records = r.select(col("key"), (col("rn") * 2).as("seq"),
      lit(false).as("isWatermark"), col("value").cast("double").as("value"),
      col("ts").cast("long").as("ts"))
    val punctuation = r
      .filter(col("rn") % emitEveryN === 0 || col("rn") === col("total"))
      .select(col("key"), (col("rn") * 2 + 1).as("seq"),
        lit(true).as("isWatermark"), lit(0.0).as("value"),
        col("ts").cast("long").as("ts"))
    records.union(punctuation).as[Timed]
  }

  /** Co-locate each key's stream in one partition and sort it by
    * in-band position. This MUST be the RDD secondary-sort pattern
    * (`repartitionAndSortWithinPartitions`), not
    * `repartition(key).sortWithinPartitions(...)`: [[punctuateByKey]]
    * unions two branches that are each hash-partitioned by key (their
    * window functions), Spark's union propagates that co-partitioning,
    * and Catalyst then ELIDES the logical repartition — but a union
    * CONCATENATES its children's partitions rather than zipping them,
    * so key k's records sit in partition h(k) and its punctuation in
    * numPartitions + h(k), and the state machine sees watermarks with
    * no records. (Observed at sf0.1; at smaller SFs AQE's coalescing
    * broke the co-partitioning claim, kept the exchange, and masked
    * the bug.) The explicit partitioner cannot be optimized away —
    * one of the brief's genuine per-partition-imperative RDD cases.
    */
  private final class KeyPartitioner(n: Int) extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key match {
      case (k: Long, _) =>
        val h = java.lang.Long.hashCode(k) % n
        if (h < 0) h + n else h
      case other =>
        throw new IllegalArgumentException(s"unexpected key shape: $other")
    }
  }

  /** `EventTimeWindowPipe` over keyed punctuated streams: the exact
    * reference state machine per key, run per partition after the
    * secondary-sort arrangement (see [[KeyPartitioner]]). Accumulators
    * (optional) count late drops and regressions with per-execution
    * scoping.
    *
    * One deliberate divergence from the reference: window assignment uses
    * `math.floorDiv` where the reference uses truncating integer division
    * (`(ts / windowSizeMs) * windowSizeMs`). The two agree for ts ≥ 0
    * (every fixture and every epoch-micros timestamp); for a NEGATIVE
    * event time, truncation assigns ts = −500 ms with a 1000 ms window to
    * start 0 — the interval [0, 1000) does not contain the event — while
    * floorDiv assigns [−1000, 0), which does. We keep the correct
    * interval semantics rather than reproducing the reference's
    * pre-epoch misassignment.
    */
  def windowsPerKey(
      timed: Dataset[Timed],
      windowSizeMs: Long,
      lateDropped: Option[LongAccumulator] = None,
      regressions: Option[LongAccumulator] = None): Dataset[Win] = {
    require(windowSizeMs > 0, s"windowSizeMs must be > 0, got $windowSizeMs")
    val spark = timed.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val arranged = timed.rdd
      .map(t => ((t.key, t.seq), t))
      .repartitionAndSortWithinPartitions(new KeyPartitioner(parts))
      .values
    spark.createDataset(arranged.mapPartitions { it =>
        var curKey = Long.MinValue
        var hasKey = false
        var wmCur = Long.MinValue
        val open = mutable.Map.empty[Long, mutable.ListBuffer[Double]]
        it.flatMap { t =>
          if (!hasKey || t.key != curKey) {
            // a new key begins a fresh stream; the previous key's still-
            // open windows are dropped — ADR-0006's no-end-of-stream-flush
            curKey = t.key; hasKey = true
            wmCur = Long.MinValue
            open.clear()
          }
          if (!t.isWatermark) {
            if (t.ts >= wmCur) {
              val start = math.floorDiv(t.ts, windowSizeMs) * windowSizeMs
              open.getOrElseUpdate(start, mutable.ListBuffer.empty) += t.value
              Nil
            } else {
              lateDropped.foreach(_.add(1)); Nil
            }
          } else if (t.ts > wmCur) {
            wmCur = t.ts
            open.keys.filter(s => s + windowSizeMs <= wmCur).toList.sorted
              .map { s =>
                Win(curKey, s, s + windowSizeMs, open.remove(s).get.toSeq, wmCur)
              }
          } else {
            if (t.ts < wmCur) regressions.foreach(_.add(1))
            Nil
          }
        }
      })
  }
}
