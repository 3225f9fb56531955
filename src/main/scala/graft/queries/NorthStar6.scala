package graft.queries

import graft.Tables
import graft.operators.Objectives
import org.apache.spark.sql.functions._

/** Round-9 continuation: training-objective transforms — the
  * dataloader-side accounting for supervised chat fine-tuning,
  * fill-in-the-middle, and T5 span corruption. All-integer manifests
  * (md5 draws where randomness is needed — the n73/n76 zero-RNG
  * policy), so every column is under the exact-hash oracle.
  */
object NorthStar6 extends QueryGroup {

  /** DuckDB replica of [[Objectives]]' md5 draw: first 8 hex digits of
    * `md5(doc_id ':' salt)` as a BIGINT (the n76 hex-int pattern).
    */
  private def oDraw(salt: String): String =
    s"""CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'),
        1, 8)) AS BIGINT)"""

  /** Chat-template loss-mask manifest: per-turn trainable spans under
    * the 4-control-tokens-per-turn rendering; user turns masked.
    */
  private val chatMask = Q(
    "n77_chat_loss_mask",
    "chat-template loss-mask manifest: per-turn offsets + trainable spans (assistant content + end marker)",
    (s, dir) => Objectives.chatLossMask(Tables(s, dir).documents)
      .orderBy("doc_id", "turn_idx"),
    Some("""WITH b AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                2 + (doc_id % 3) * 2 AS t
              FROM documents),
            e AS (SELECT doc_id, n, t, unnest(range(t)) AS i FROM b)
            SELECT doc_id, CAST(i AS INT) AS turn_idx,
              CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
              (i + 1) * n // t - i * n // t AS n_content,
              4 * i + i * n // t AS turn_off,
              CASE WHEN i % 2 = 1 THEN 4 * i + i * n // t + 3 END
                AS train_start,
              CASE WHEN i % 2 = 1 THEN 4 * i + 4 + (i + 1) * n // t END
                AS train_end
            FROM e ORDER BY doc_id, turn_idx"""))

  /** Fill-in-the-middle PSM reorder plan: md5 coin + two md5 split
    * draws per doc, section lengths and the middle-label offset.
    */
  private val fim = Q(
    "n78_fim_transform",
    "fill-in-the-middle PSM plan: md5-drawn split points, section lengths, middle-label offset",
    (s, dir) => Objectives.fimPlan(Tables(s, dir).documents)
      .orderBy("doc_id"),
    Some(s"""WITH b AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                ${oDraw("fim")} % 2 = 0 AS fim,
                ${oDraw("p1")} AS h1,
                ${oDraw("p2")} AS h2
              FROM documents),
            s AS (
              SELECT doc_id, n, fim,
                LEAST(h1 % (n + 1), h2 % (n + 1)) AS lo,
                GREATEST(h1 % (n + 1), h2 % (n + 1)) AS hi
              FROM b)
            SELECT doc_id, n AS n_tok, fim,
              CASE WHEN fim THEN lo ELSE n END AS n_prefix,
              CASE WHEN fim THEN hi - lo ELSE 0 END AS n_middle,
              CASE WHEN fim THEN n - hi ELSE 0 END AS n_suffix,
              CASE WHEN fim THEN n + 3 ELSE n END AS out_len,
              CASE WHEN fim THEN 3 + lo + n - hi END AS mid_off
            FROM s ORDER BY doc_id"""))

  /** T5 span-corruption length budgets, exact integer form. */
  private val spanCorrupt = Q(
    "n79_span_corruption",
    "T5 span-corruption length accounting: noise/span counts, encoder+decoder lengths",
    (s, dir) => Objectives
      .spanCorruptionLengths(Tables(s, dir).documents)
      .orderBy("doc_id"),
    Some("""SELECT doc_id, n AS n_tok, noise AS n_noise, spans AS n_spans,
              n - noise + spans AS enc_len,
              CASE WHEN noise = 0 THEN 0
                   ELSE noise + spans + 1 END AS dec_len
            FROM (
              SELECT doc_id, n, noise,
                CASE WHEN noise = 0 THEN 0
                     ELSE GREATEST(1, (noise + 1) // 3) END AS spans
              FROM (
                SELECT doc_id, n,
                  CASE WHEN n < 2 THEN 0
                       ELSE LEAST(GREATEST(1, (n * 15 + 50) // 100),
                                  n - 1) END AS noise
                FROM (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                      FROM documents)))
            ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(chatMask, fim, spanCorrupt)
}
