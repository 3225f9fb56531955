package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowing for streams — reference `windowByEventTime` /
  * `WatermarkPipe` (Node.scala:289-356, ADR-0006/0007) mapped onto
  * Structured Streaming:
  *
  *   - reference watermark policy: watermark = max event time seen,
  *     allowed lateness 0 → `withWatermark(ts, "0 seconds")`;
  *   - late events (`ts < watermark`) are dropped and counted →
  *     watermark filtering + `numRowsDroppedByWatermark` in progress;
  *   - windows emit once the watermark passes their end, in start order
  *     → append output mode's emission rule, exactly;
  *   - end-of-stream does NOT flush open windows (ADR-0006) — append
  *     mode never emits a window the watermark hasn't closed, matching;
  *     the reference's `Watermark(Long.MaxValue)` flush is reproduced in
  *     tests by feeding a far-future sentinel row.
  *
  * The reference's punctuation watermarks (every N records) are a policy
  * the per-micro-batch watermark subsumes: tests drive one batch per
  * punctuation via MemoryStream + processAllAvailable, making watermark
  * advances deterministic (SURVEY §7.4.2).
  */
object EventTimeWindows {

  /** Tumbling event-time windows with the reference's zero-lateness
    * policy, collecting each window's values in event order — the
    * streaming analog of `EventTimeWindow(start, end, values)`
    * (Node.scala:283).
    */
  def tumblingCollect(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      windowSize: String,
      delay: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowSize).as("w"))
      .agg(sort_array(collect_list(struct(col(tsCol), col(valueCol))))
        .as("ordered"))
      .select(
        col("w.start").as("w_start"),
        col("w.end").as("w_end"),
        transform(col("ordered"), r => r.getField(valueCol)).as("values"))

  /** Tumbling windowed aggregation (count + sum) — the scalable form:
    * partial aggregation map-side, bounded state (one row per open
    * window), never a collect_list at scale.
    */
  def tumblingAgg(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      windowSize: String,
      delay: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowSize).as("w"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("n"), col("sum_value"))

  /** Keyed sliding-window aggregation with watermark. */
  def slidingAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowSize: String,
      slide: String,
      delay: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowSize, slide).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("w_start"), col(keyCol), col("n"),
        col("sum_value"))
}
