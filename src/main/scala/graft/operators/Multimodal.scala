package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2.7): media payloads travel as
  * opaque `binary` columns with typed metadata alongside; decode /
  * feature-extraction runs batched per partition so a real decoder
  * (libjpeg, ffmpeg, …) could amortize initialization per task.
  *
  * The decode itself is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake that derives "features" from
  * the raw bytes. Everything around it (schema, encoders, partition
  * batching, the mapPartitions plumbing, and the repartition-by-size
  * skew guard) is real and is what matters at 100 TB: media blobs are
  * wildly size-skewed, so the operator re-balances by cumulative byte
  * size, not row count, before the expensive per-row decode.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted metadata/features per media item. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** STUB decoder — deterministic fake standing in for a real image /
    * audio / video decode. Reads actual bytes (so the binary plumbing is
    * exercised) and fabricates dimensions from simple byte statistics.
    * Replace the body with a real decoder where libraries exist.
    */
  private[graft] def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    var sum = 0L
    var i = 0
    val limit = math.min(n, 16)
    while (i < limit) { sum += payload(i) & 0xff; i += 1 }
    val width = 16 + (sum % 640).toInt
    val height = 16 + (n % 480)
    val frames = kind match {
      case "video" => 1 + (n % 30)
      case "audio" => 1 + (n % 1000)
      case _ => 1
    }
    (width, height, frames)
  }

  private def checksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Batched feature extraction: one decoder "session" per partition
    * (per-task init amortized, the mapInPandas-batch shape in Scala).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoders would open a native context here, once per task
      it.map { r =>
        val (w, h, f) = decodeStub(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, f,
          checksum(r.payload))
      }
    }
  }

  /** Resize stub: clamps decoded dimensions into a bounding box
    * preserving aspect ratio (integer math only — deterministic). The
    * real pixel work would live in the same typed map.
    */
  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      if (f.width <= maxW && f.height <= maxH) f
      else {
        // scale = min(maxW/w, maxH/h) in 1/1024ths, integer arithmetic
        val s = math.min(maxW * 1024L / f.width, maxH * 1024L / f.height)
        f.copy(
          width = math.max(1, (f.width * s / 1024L).toInt),
          height = math.max(1, (f.height * s / 1024L).toInt))
      }
    }
  }

  /** One sampled frame of a video payload. `frame_hash` stands in for
    * decoded frame bytes (deterministic stub).
    */
  final case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Frame sampling: every `everyN`-th frame of each video row expands
    * into its own record — the row-explosion shape a real video pipeline
    * uses before per-frame feature extraction (downstream work then
    * repartitions over frames, not videos, so one long video can't
    * straggle a task).
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int): Dataset[FrameSample] = {
    import features.sparkSession.implicits._
    require(everyN > 0)
    features.flatMap { f =>
      if (f.kind == "video")
        (0 until f.n_frames by everyN).map(i =>
          FrameSample(f.media_id, i, f.media_id * 1000003L + i))
      else Nil
    }
  }

  /** One fixed-size analysis window of an audio payload; `energy` is
    * the window's byte-value sum (integer-exact stub for RMS energy).
    */
  final case class AudioWindow(
      media_id: Long, win_idx: Int, n_win_bytes: Int, energy: Long)

  /** Audio windowing: each audio payload explodes into consecutive
    * `windowBytes`-byte analysis frames with a per-frame energy — the
    * VAD / silence-trim shape an audio pipeline runs before feature
    * extraction (as with [[sampleFrames]], downstream work repartitions
    * over frames so one long recording can't straggle a task). The
    * energy is an integer byte sum — a deterministic stand-in for RMS
    * over decoded PCM; the windowing, explosion, and schema are the
    * real thing.
    */
  def audioWindows(
      media: Dataset[MediaRecord], windowBytes: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    require(windowBytes > 0, s"windowBytes must be > 0, got $windowBytes")
    media.flatMap { r =>
      if (r.kind != "audio") Iterator.empty
      else r.payload.grouped(windowBytes).zipWithIndex.map { case (w, i) =>
        var s = 0L
        var j = 0
        while (j < w.length) { s += w(j) & 0xff; j += 1 }
        AudioWindow(r.media_id, i, w.length, s)
      }
    }
  }

  /** Rebalance a media DataFrame so each task decodes a comparable byte
    * volume: rows are globally ranked by payload size (scalable rank —
    * range partition + offsets, no single-task window) and dealt
    * round-robin over `ceil(totalBytes / targetBytesPerTask)` buckets,
    * so every bucket receives an even mix of large and small payloads.
    * At 100 TB this is the difference between a 10-minute and a
    * 10-hour straggler stage.
    */
  def rebalanceBySize(media: DataFrame, targetBytesPerTask: Long): DataFrame = {
    require(targetBytesPerTask > 0)
    val sized = media.withColumn("_sz", length(col("payload")).cast("long"))
    val total = Option(sized.agg(sum(col("_sz"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (total == 0L) media
    else {
      val numBuckets =
        math.max(1L, (total + targetBytesPerTask - 1) / targetBytesPerTask)
          .min(Int.MaxValue.toLong).toInt
      GlobalOrder.withGlobalIndexCols(sized,
        Seq(col("_sz").desc, col("media_id").asc))
        .withColumn("_bucket", pmod(col("_global_rank"), lit(numBuckets.toLong)))
        .repartition(numBuckets, col("_bucket"))
        .drop("_sz", "_bucket", "_global_rank")
    }
  }

  /** Build a MediaRecord dataset from the documents table — the text
    * bytes stand in for a media payload (no binary fixtures ship with
    * the test data; schema and flow are identical for real blobs).
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Multimodal context-packing plan — the dataloader-side token
    * accounting for a corpus where every training example interleaves
    * a media attachment with its text (the VLM pretraining layout):
    * each example contributes its MEDIA tokens first, then its text
    * tokens, and the concatenated stream chunks into fixed
    * `budget`-token contexts (the n67 convention — consumers slice;
    * boundary-exact on both segment kinds). Media token budgets follow
    * the standard encoder arithmetic, all integer-exact:
    *
    *   - image: ⌈w/16⌉·⌈h/16⌉ ViT patch tokens,
    *   - audio: ⌈n_frames/4⌉ conv-downsampled frame tokens,
    *   - video: ⌈n_frames/5⌉·64 — every 5th frame sampled (the
    *     [[sampleFrames]] cadence) at 64 patch tokens per frame.
    *
    * Output per context: (chunk_id, n_examples, n_media_tokens,
    * n_text_tokens, n_tokens) with n_media + n_text = n_tokens =
    * budget everywhere but the final partial context — the media/text
    * split is the number a dataloader needs to pre-size its pixel
    * buffers per context.
    *
    * Scale shape: feature extraction is the per-partition batched stub
    * decode (scan-stage); token arithmetic is per-row; the layout is
    * ONE distributed [[GlobalOrder.withRunningTotal]] prefix sum, a
    * bounded chunk explode, and one hash aggregate — identical plan
    * skeleton to [[Packing.contextManifest]].
    */
  def packingPlan(
      spark: SparkSession, docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be > 0, got $budget")
    val feats = extractFeatures(fromDocuments(spark, docs)).toDF()
    val mediaTok = feats.select(
      col("media_id").as("doc_id"),
      when(col("kind") === "image",
        expr("((width + 15) div 16) * ((height + 15) div 16)"))
        .when(col("kind") === "audio", expr("(n_frames + 3) div 4"))
        .otherwise(expr("((n_frames + 4) div 5) * 64"))
        .cast("long").as("m"))
    val textTok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("t"))
    val ex = mediaTok.join(textTok, "doc_id")
      .withColumn("n", col("m") + col("t"))
    val lo = col("chunk_id") * budget
    val hi = (col("chunk_id") + 1) * budget
    def overlap(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      greatest(lit(0L), least(b, hi) - greatest(a, lo))
    GlobalOrder.withRunningTotal(ex, Seq(col("doc_id")), col("n"))
      .select(col("doc_id"), col("m"), col("t"),
        col("_start_offset").as("s"),
        (col("_start_offset") + col("n")).as("fin"))
      .select(col("doc_id"), col("m"), col("t"), col("s"), col("fin"),
        explode(expr(s"sequence(s div $budget, (fin - 1) div $budget)"))
          .as("chunk_id"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_examples"),
        sum(overlap(col("s"), col("s") + col("m"))).as("n_media_tokens"),
        sum(overlap(col("s") + col("m"), col("fin"))).as("n_text_tokens"),
        sum(overlap(col("s"), col("fin"))).as("n_tokens"))
  }
}
