package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The s33/s35/s36 final-state collapse, proven under GENUINELY
  * multi-batch processing: an update-mode memory sink APPENDS each
  * batch's updated rows, so a (key, bin) touched in several
  * micro-batches leaves several rows in the sink — the r12 ADVICE
  * failure mode where the cumulative-ECDF report half silently
  * double-counts. The registered queries' single-file sources happen
  * to make one batch today; this spec feeds the SAME streaming half
  * through a MemoryStream in three batches with overlapping bins,
  * asserts the sink really retained stale rows, and pins that the
  * collapsed report equals the batch closed form bit-for-bit —
  * trigger slicing cannot move the statistic.
  */
class MultiBatchMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three arrival chunks that keep re-touching the same (type, bin)
  // state rows: bin 1 ("a") is updated in all three batches
  private val chunks = Seq(
    Seq(("a", 1L, 1.2), ("a", 2L, 1.7), ("b", 3L, 4.0)),
    Seq(("a", 4L, 1.9), ("a", 5L, 9.5), ("b", 6L, 4.2)),
    Seq(("a", 7L, 1.1), ("a", 8L, 9.9), ("b", 9L, 4.8), ("b", 10L, 5.5)))

  private def runMonitor(qName: String): org.apache.spark.sql.DataFrame = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val binned = graft.operators.Drift.ksBinCounts(
      input.toDF().toDF("event_type", "event_id", "value"),
      "event_type", "value", col("event_id") % 2 === 0)
    val q = binned.writeStream.outputMode("update")
      .format("memory").queryName(qName).start()
    try chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    finally q.stop()
    val sink = spark.table(qName)
    // the hazard must actually exist in this run: more sink rows than
    // distinct state keys proves stale intermediate rows were retained
    val distinctKeys = sink.select("event_type", "bin").distinct().count()
    assert(sink.count() > distinctKeys,
      s"sink kept ${sink.count()} rows for $distinctKeys keys — " +
        "multi-batch retention did not occur, the spec is vacuous")
    // the collapse under test (verbatim from the s33/s35 queries)
    sink.groupBy("event_type", "bin")
      .agg(max(col("ca")).as("ca"), max(col("cb")).as("cb"))
  }

  test("s33 collapse: multi-batch KS monitor equals the batch closed form") {
    val finalState = runMonitor("mb_ks")
    val streamed = graft.operators.Drift
      .ksFromBinCounts(finalState, "event_type")
      .orderBy("event_type").collect().toSeq
    val batch = graft.operators.Drift
      .ksDrift(chunks.flatten.toDF("event_type", "event_id", "value"),
        "event_type", "value", col("event_id") % 2 === 0)
      .orderBy("event_type").collect().toSeq
    assert(streamed == batch,
      s"KS drift moved under trigger slicing:\n$streamed\nvs\n$batch")
  }

  test("s35 collapse: multi-batch Hellinger monitor equals the batch closed form") {
    val finalState = runMonitor("mb_hel")
    val streamed = graft.operators.Drift
      .hellingerFromBinCounts(finalState, "event_type")
      .orderBy("event_type").collect().toSeq
    val batch = graft.operators.Drift
      .hellingerDrift(chunks.flatten.toDF("event_type", "event_id", "value"),
        "event_type", "value", col("event_id") % 2 === 0)
      .orderBy("event_type").collect().toSeq
    assert(streamed == batch,
      s"Hellinger drift moved under trigger slicing:\n$streamed\nvs\n$batch")
  }

  test("s36 collapse: multi-batch occupancy monitor equals the batch closed form") {
    implicit val sql = spark.sqlContext
    // tiny 4-dim embedding space, 2 centroids from the STATIC side
    def emb(id: Long): (Long, Array[Float]) =
      (id, if (id % 3 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, id * 0.01f))
    val all = (0L until 12L).map(emb)
    val statics = all.toDF("id", "embedding")
    val cents = graft.operators.Similarity.lowIdCents(statics, 2)
    val input = MemoryStream[(Long, Array[Float])]
    val occ = graft.operators.Similarity.centOccupancy(
      input.toDF().toDF("id", "embedding"), col("id") % 2 === 0, cents)
    val q = occ.writeStream.outputMode("update")
      .format("memory").queryName("mb_occ").start()
    try all.grouped(4).foreach { c => input.addData(c: _*); q.processAllAvailable() }
    finally q.stop()
    val sink = spark.table("mb_occ")
    assert(sink.count() > sink.select("cent_id").distinct().count(),
      "multi-batch retention did not occur")
    val finalState = sink.groupBy("cent_id")
      .agg(max(col("ca")).as("ca"), max(col("cb")).as("cb"))
    val streamed = graft.operators.Similarity.occupancyGapReport(finalState)
      .orderBy("cent_id").collect().toSeq
    val batch = graft.operators.Similarity.occupancyGapReport(
      graft.operators.Similarity.centOccupancy(
        statics, col("id") % 2 === 0, cents))
      .orderBy("cent_id").collect().toSeq
    assert(streamed == batch,
      s"occupancy drift moved under trigger slicing:\n$streamed\nvs\n$batch")
  }

  test("s39 collapse: multi-batch packing monitor equals the batch closed form") {
    implicit val sql = spark.sqlContext
    // three batches that keep re-touching source "a"'s state rows —
    // varying token counts so every monotone sum really changes
    val docChunks = Seq(
      Seq((1L, "a", "w w w"), (2L, "b", "w w w w w")),
      Seq((3L, "a", "w w w w w w w"), (4L, "a", "w")),
      Seq((5L, "a", "w w"), (6L, "b", "w w w w w w w w w")))
    val contexts = Seq(4L, 8L)
    val input = MemoryStream[(Long, String, String)]
    val counts = graft.operators.Packing.packingStateCounts(
      input.toDF().toDF("doc_id", "source", "text"), contexts)
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("mb_pack").start()
    try docChunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    finally q.stop()
    val sink = spark.table("mb_pack")
    assert(sink.count() >
      sink.select("source", "context_len").distinct().count(),
      "multi-batch retention did not occur")
    val finalState = sink.groupBy("source", "context_len")
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("total_tokens")).as("total_tokens"),
        max(col("pad_seqs")).as("pad_seqs"))
    val streamed = graft.operators.Packing
      .packingReportFromCounts(finalState)
      .orderBy("source", "context_len").collect().toSeq
    val batch = graft.operators.Packing.packingEfficiencySweep(
      docChunks.flatten.toDF("doc_id", "source", "text"), contexts)
      .orderBy("source", "context_len").collect().toSeq
    assert(streamed == batch,
      s"packing card moved under trigger slicing:\n$streamed\nvs\n$batch")
  }
}
