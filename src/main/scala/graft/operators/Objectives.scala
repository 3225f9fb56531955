package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-objective transforms: the per-example accounting a trainer's
  * dataloader needs when the raw corpus is re-shaped for a specific
  * objective — supervised chat fine-tuning (loss-masked turns),
  * fill-in-the-middle (PSM reorder), and T5-style span corruption
  * (encoder/decoder length budgets). Reference capability analog: the
  * per-element reshape of `map`/`flatMap`
  * (`/root/reference/src/main/scala/SimpleStreamProcessor/Stream.scala:40-54`) —
  * here each document row expands to its objective-specific manifest
  * rows with pure scan-stage expression arithmetic.
  *
  * Everything is integer arithmetic over whitespace-token counts plus
  * md5-derived draws (the n73/n76 zero-RNG-state policy: deterministic,
  * engine-portable, reproducible at any parallelism), so every output
  * column sits under the exact-hash oracle with no FP policy at all.
  *
  * Scale shape: all three are embarrassingly parallel — no join, no
  * aggregation, no window; the only explode is bounded (≤ 6 turns per
  * document). At 100 TB these run at scan speed with zero shuffles
  * (the output ordering in the registered queries exists only for the
  * deterministic compare).
  */
object Objectives {

  /** First-8-hex-digits md5 draw — a uniform BIGINT in [0, 2^32). */
  private def mdraw(salt: String) =
    conv(substring(md5(concat_ws(":", col("doc_id"), lit(salt))), 1, 8),
      16, 10).cast("long")

  /** Chat-template loss-mask manifest: each document becomes a
    * deterministic multi-turn conversation (2/4/6 turns by
    * `doc_id % 3`, alternating user/assistant starting with user; the
    * whitespace tokens are split across turns in contiguous
    * integer-balanced slices `⌊(i+1)·n/T⌋ − ⌊i·n/T⌋`). The rendered
    * form charges 4 control tokens per turn (start-marker, role,
    * separator before the content, end-marker after it); the trainable
    * span of an assistant turn is its content plus the end-marker —
    * the standard SFT rule that the model must learn to emit the
    * end-of-turn token, while user turns and headers are loss-masked.
    *
    * Output: one row per TURN — (doc_id, turn_idx, role, n_content,
    * turn_off, train_start, train_end), offsets in the rendered token
    * stream; train_* are NULL on masked (user) turns. This is exactly
    * the span table a masked-cross-entropy dataloader consumes.
    */
  def chatLossMask(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"),
      (lit(2L) + (col("doc_id") % 3) * 2L).as("t"))
    .select(col("doc_id"), col("n"), col("t"),
      explode(sequence(lit(0L), col("t") - 1L)).as("i"))
    .select(
      col("doc_id"),
      col("i").cast("int").as("turn_idx"),
      when(col("i") % 2 === 0, lit("user")).otherwise(lit("assistant"))
        .as("role"),
      expr("(i + 1) * n DIV t - i * n DIV t").as("n_content"),
      expr("4 * i + i * n DIV t").as("turn_off"),
      when(col("i") % 2 === 1, expr("4 * i + i * n DIV t + 3"))
        .as("train_start"),
      when(col("i") % 2 === 1, expr("4 * i + 4 + (i + 1) * n DIV t"))
        .as("train_end"))

  /** Fill-in-the-middle reorder plan (PSM form): half the corpus (an
    * md5 coin per doc) is split at two md5-drawn token offsets into
    * prefix/middle/suffix and laid out as
    * `⟨PRE⟩ prefix ⟨SUF⟩ suffix ⟨MID⟩ middle` — the trainer predicts
    * the middle from both sides. Non-FIM docs pass through verbatim.
    *
    * Output per doc: the section token counts, the transformed length
    * (n + 3 sentinels when FIM'd), and `mid_off` — where the
    * middle-section labels start in the transformed stream (NULL when
    * not FIM'd). Draw rule: two independent draws in [0, n], low one
    * is the prefix end, high one the suffix start — so empty sections
    * are legal exactly as in the FIM paper's character-level split.
    */
  def fimPlan(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"),
      (mdraw("fim") % 2 === 0).as("fim"),
      mdraw("p1").as("h1"), mdraw("p2").as("h2"))
    .select(col("doc_id"), col("n"), col("fim"),
      least(col("h1") % (col("n") + 1), col("h2") % (col("n") + 1))
        .as("lo"),
      greatest(col("h1") % (col("n") + 1), col("h2") % (col("n") + 1))
        .as("hi"))
    .select(
      col("doc_id"),
      col("n").as("n_tok"),
      col("fim"),
      when(col("fim"), col("lo")).otherwise(col("n")).as("n_prefix"),
      when(col("fim"), col("hi") - col("lo")).otherwise(lit(0L))
        .as("n_middle"),
      when(col("fim"), col("n") - col("hi")).otherwise(lit(0L))
        .as("n_suffix"),
      when(col("fim"), col("n") + 3L).otherwise(col("n")).as("out_len"),
      when(col("fim"), lit(3L) + col("lo") + col("n") - col("hi"))
        .as("mid_off"))

  /** Per-example SFT admission gate over the [[chatLossMask]]
    * rendering, in closed form WITHOUT the per-turn explode: total
    * rendered length (text + 4 control tokens per turn), total
    * trainable tokens (assistant content + end markers, a bounded
    * higher-order fold over the ≤6 turn indices), and a keep verdict
    * `3·trainable ≥ total` — at least a third of the rendered example
    * must carry loss, the standard guard against conversations whose
    * token mass is all prompt. Pure scan-stage expression work with no
    * aggregation, so it runs unchanged on a STREAMING frame in append
    * mode (the s19/s21/s23/s24 stateless-gate family).
    */
  def sftGate(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"),
      (lit(2L) + (col("doc_id") % 3) * 2L).as("t"))
    .select(
      col("doc_id"),
      col("t").cast("int").as("n_turns"),
      (col("n") + col("t") * 4L).as("n_total"),
      expr("""aggregate(filter(sequence(0L, t - 1), i -> i % 2 = 1), 0L,
        (acc, i) -> acc + (i + 1) * n DIV t - i * n DIV t + 1)""")
        .as("n_trainable"))
    .withColumn("keep", lit(3L) * col("n_trainable") >= col("n_total"))

  /** T5-style span-corruption length accounting: for a corruption rate
    * of `noisePct`% and mean noise-span length `meanSpan`, the number
    * of corrupted tokens is `clamp(round(n·rate), 1, n−1)` and the
    * span count `max(1, round-ish(noise/meanSpan))` — all in exact
    * integer arithmetic (round = `(n·pct + 50) DIV 100`,
    * span rounding = `(noise + meanSpan/2) DIV meanSpan`, both
    * floor-div on non-negatives in every engine). Encoder input length
    * is the surviving tokens plus one sentinel per span; decoder
    * target length is the corrupted tokens plus a sentinel per span
    * plus EOS — the exact arithmetic T5 uses to pick packed batch
    * shapes. Docs with fewer than 2 tokens cannot be corrupted and
    * pass through (dec_len 0).
    */
  def spanCorruptionLengths(
      docs: DataFrame,
      noisePct: Int = 15,
      meanSpan: Int = 3): DataFrame = {
    require(noisePct > 0 && noisePct < 100,
      s"noisePct must be in (0,100), got $noisePct")
    require(meanSpan >= 1, s"meanSpan must be >= 1, got $meanSpan")
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("noise",
        when(col("n") < 2, lit(0L)).otherwise(
          least(greatest(lit(1L),
            expr(s"(n * $noisePct + 50) DIV 100")), col("n") - 1L)))
      .withColumn("spans",
        when(col("noise") === 0, lit(0L)).otherwise(
          greatest(lit(1L),
            expr(s"(noise + ${meanSpan / 2}) DIV $meanSpan"))))
      .select(
        col("doc_id"),
        col("n").as("n_tok"),
        col("noise").as("n_noise"),
        col("spans").as("n_spans"),
        (col("n") - col("noise") + col("spans")).as("enc_len"),
        when(col("noise") === 0, lit(0L))
          .otherwise(col("noise") + col("spans") + 1L).as("dec_len"))
  }
}
