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

  /** Shared pair-mining CTEs: per-source quality rank (the n56
    * composite score) pairing the i-th best with the i-th worst.
    * Ends with `pairs` defined — shared by the n80 oracle and the n81
    * training replay.
    */
  private[queries] val pairCtes: String =
    s"""q AS (
              SELECT doc_id, source, ${NorthStar3.scoreSql} AS score
              FROM documents),
            r AS (
              SELECT doc_id, source, score,
                row_number() OVER (PARTITION BY source
                  ORDER BY score DESC, doc_id) AS rk,
                COUNT(*) OVER (PARTITION BY source) AS m
              FROM q),
            pairs AS (
              SELECT c.source, CAST(c.rk AS INT) AS pair_id,
                c.doc_id AS chosen_id, j.doc_id AS rejected_id,
                c.score AS chosen_score, j.score AS rejected_score
              FROM r c JOIN r j
                ON j.source = c.source AND j.rk = c.m + 1 - c.rk
              WHERE c.rk <= c.m // 2)"""

  /** Position-matched preference pairs (best vs worst per source). */
  private val prefPairs = Q(
    "n80_preference_pairs",
    "synthetic preference pairs: i-th best vs i-th worst per source by quality score, with margins",
    (s, dir) => graft.operators.Preference
      .minePairs(Tables(s, dir).documents)
      .orderBy("source", "pair_id"),
    Some(s"""WITH $pairCtes
            SELECT source, pair_id, chosen_id, rejected_id,
              chosen_score, rejected_score,
              chosen_score - rejected_score AS margin
            FROM pairs ORDER BY source, pair_id"""))

  /** The n68 md5 feature-bucket decode as DuckDB SQL (first two hex
    * digits of `md5(tok)` → 0..63).
    */
  private def bucketSql(tok: String): String = {
    def hd(i: Int) =
      s"""(CASE WHEN ascii(substr(md5($tok), $i, 1)) >= 97
               THEN ascii(substr(md5($tok), $i, 1)) - 87
               ELSE ascii(substr(md5($tok), $i, 1)) - 48 END)"""
    s"((${hd(1)} % 4) * 16 + ${hd(2)})"
  }

  /** One unrolled Bradley–Terry GD round: pair errors under the fast
    * sigmoid (target 1 — chosen beats rejected), per-bucket gradients
    * through the exact decimal route, weight update, next margins.
    */
  private def btIter(i: Int, first: Boolean): String = {
    val wPrev = if (first) "0.0" else "w"
    val wFrom =
      if (first) s"g$i CROSS JOIN np"
      else s"w${i - 1} JOIN g$i USING (b) CROSS JOIN np"
    s"""e$i AS (
          SELECT source, pair_id,
            (0.5 + (0.5 * m) / (1.0 + abs(m))) - 1.0 AS err
          FROM m$i),
        g$i AS (
          SELECT b, ${Sql.oSum12("sgn * err / CAST(n AS DOUBLE)")} AS g
          FROM ptk JOIN e$i USING (source, pair_id) GROUP BY b),
        w$i AS (SELECT b, $wPrev - 1.0 * (g / np) AS w FROM $wFrom),
        m${i + 1} AS (
          SELECT source, pair_id,
            ${Sql.oSum12("sgn * w / CAST(n AS DOUBLE)")} AS m
          FROM ptk JOIN w$i USING (b) GROUP BY source, pair_id)"""
  }

  /** Bradley–Terry reward model trained on the n80 pairs: the full
    * 3-round trajectory (per-pair margins + win probabilities after
    * every update) replayed as unrolled CTEs — the n68 exactness
    * regime (md5 buckets, fast sigmoid, DECIMAL(38,12) sums).
    */
  /** The full Bradley–Terry training replay: pair mining, the
    * pair-token feature frame (`tb` carries every document's token
    * buckets — scoring reuses it), and 3 unrolled GD rounds — ends
    * with margins `m2..m4` and weights `w3` defined. Shared by the
    * n81 trajectory oracle, the n83 best-of-n oracle, and the s27
    * streaming-gate oracle.
    */
  private[queries] val btCtes: String =
    s"""WITH $pairCtes,
            pt AS (
              SELECT source, pair_id, chosen_id AS doc_id, 1 AS sgn
              FROM pairs
              UNION ALL
              SELECT source, pair_id, rejected_id AS doc_id, -1 AS sgn
              FROM pairs),
            tk AS (
              SELECT doc_id,
                len(string_split(trim(regexp_replace(lower(text),
                  '\\s+', ' ', 'g')), ' ')) AS n,
                unnest(string_split(trim(regexp_replace(lower(text),
                  '\\s+', ' ', 'g')), ' ')) AS t
              FROM documents),
            tb AS (SELECT doc_id, n, ${bucketSql("t")} AS b FROM tk),
            ptk AS (
              SELECT source, pair_id, sgn, b, n
              FROM pt JOIN tb USING (doc_id)),
            np AS (SELECT CAST(COUNT(*) AS DOUBLE) AS np FROM pairs),
            m1 AS (SELECT DISTINCT source, pair_id,
                     CAST(0.0 AS DOUBLE) AS m
                   FROM ptk),
            ${btIter(1, first = true)},
            ${btIter(2, first = false)},
            ${btIter(3, first = false)}"""

  /** Per-doc reward scores under the final weights `w3` — the
    * [[graft.operators.Preference.scoreWith]] replay (left join keeps
    * docs whose buckets carry no weight: their terms are exact
    * zeros in both engines).
    */
  private[queries] def btScoreAs(alias: String): String =
    s"""$alias AS (
              SELECT doc_id,
                ${Sql.oSum12("COALESCE(w, 0.0) / CAST(n AS DOUBLE)")}
                  AS score
              FROM tb LEFT JOIN w3 USING (b) GROUP BY doc_id)"""

  private[queries] val btScoreCte: String = btScoreAs("sc")

  private val btReward = Q(
    "n81_bt_reward_model",
    "Bradley–Terry reward model on preference pairs (hashed features, fast-sigmoid GD), trajectory hash-exact",
    (s, dir) => graft.operators.Preference
      .btTrajectory(Tables(s, dir).documents, iters = 3)
      .orderBy("iter", "source", "pair_id"),
    Some(s"""$btCtes
            SELECT iter, source, pair_id, chosen_id, rejected_id, margin,
              0.5 + (0.5 * margin) / (1.0 + abs(margin)) AS p_chosen
            FROM (
              SELECT 1 AS iter, m2.source, m2.pair_id, m AS margin FROM m2
              UNION ALL
              SELECT 2, m3.source, m3.pair_id, m FROM m3
              UNION ALL
              SELECT 3, m4.source, m4.pair_id, m FROM m4)
            JOIN pairs USING (source, pair_id)
            ORDER BY iter, source, pair_id"""))

  /** Cluster-capped diversity sampling: keep the 16 most prototypical
    * members of each k-means cluster (smallest squared centroid
    * distance) — caps every semantic mode's contribution, the
    * complement of n31's pairwise semantic dedup.
    */
  private val clusterCap = Q(
    "n82_cluster_cap_sample",
    "diversity-aware selection: keep the 16 most prototypical vectors per k-means cluster",
    (s, dir) => graft.operators.Clustering
      .clusterCapSample(Tables(s, dir).embeddings, k = 4, iters = 2,
        cap = 16)
      .orderBy("vec_id"),
    Some(s"""${NorthStar.kmeansCtes(4, 2)}
            SELECT vec_id, CAST(cid AS INT) AS cluster, dist AS dist2,
              CAST(row_number() OVER (PARTITION BY cid
                ORDER BY dist, vec_id) AS INT) AS ck_rank,
              row_number() OVER (PARTITION BY cid
                ORDER BY dist, vec_id) <= 16 AS kept
            FROM a2 ORDER BY vec_id"""))

  /** The [[graft.operators.Objectives.sftGate]] batch replay — shared
    * by the n-side spec checks and the s26 streaming gate (the
    * embedDecontamOracleSql pattern: the streaming run must converge
    * to this exact frame).
    */
  private[queries] val sftGateOracleSql: String =
    """WITH b AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                2 + (doc_id % 3) * 2 AS t
              FROM documents),
            g AS (
              SELECT doc_id, t, n,
                list_reduce(list_transform(
                  list_filter(range(t), i -> i % 2 = 1),
                  i -> (i + 1) * n // t - i * n // t + 1),
                  (a, b) -> a + b) AS tr
              FROM b)
            SELECT doc_id, CAST(t AS INT) AS n_turns,
              n + 4 * t AS n_total, tr AS n_trainable,
              3 * tr >= n + 4 * t AS keep
            FROM g ORDER BY doc_id"""

  /** Best-of-n distillation selection under the trained reward model:
    * synthetic prompt groups of 4 candidates, each group keeps its
    * reward argmax. The oracle replays training AND scoring.
    */
  private val bestOfN = Q(
    "n83_best_of_n",
    "best-of-n selection: trained-reward argmax per synthetic 4-candidate prompt group",
    (s, dir) => graft.operators.Preference
      .bestOfN(Tables(s, dir).documents, groupSize = 4, iters = 3)
      .orderBy("group_id", "doc_id"),
    Some(s"""$btCtes,
            $btScoreCte
            SELECT doc_id // 4 AS group_id, doc_id, score,
              row_number() OVER (PARTITION BY doc_id // 4
                ORDER BY score DESC, doc_id) = 1 AS is_best
            FROM sc ORDER BY group_id, doc_id"""))

  /** Per-document leave-one-out valuation (n72 at doc granularity). */
  private val docValue = Q(
    "n84_doc_influence",
    "per-document leave-one-out data valuation vs the lang='en' target slice, exact integer form",
    (s, dir) => graft.operators.Mixture
      .docAblation(Tables(s, dir).documents, col("lang") === "en")
      .orderBy("doc_id"),
    Some("""WITH tok AS (
              SELECT doc_id, lang = 'en' AS is_tgt,
                unnest(string_split(text, ' ')) AS t
              FROM documents),
            ct AS (
              SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
            gt AS (
              SELECT t, CAST(SUM(c) AS BIGINT) AS ct_all
              FROM ct GROUP BY t),
            tt AS (
              SELECT t, COUNT(*) AS tt FROM tok WHERE is_tgt GROUP BY t),
            nd AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_d
              FROM ct GROUP BY doc_id),
            na AS (SELECT CAST(SUM(ct_all) AS BIGINT) AS n_all FROM gt),
            nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tgt
                   FROM tok WHERE is_tgt),
            aa AS (SELECT CAST(SUM(tt * ct_all) AS BIGINT) AS a
                   FROM gt JOIN tt USING (t)),
            bb AS (SELECT doc_id, CAST(SUM(tt * c) AS BIGINT) AS b
                   FROM ct JOIN tt USING (t) GROUP BY doc_id)
            SELECT doc_id, n_d, loss_full, loss_without,
              loss_without - loss_full AS delta
            FROM (
              SELECT doc_id, n_d,
                1.0 - (CAST(a AS DOUBLE) / CAST(n_all AS DOUBLE))
                  / CAST(n_tgt AS DOUBLE) AS loss_full,
                1.0 - (CAST(a - COALESCE(b, 0) AS DOUBLE)
                    / CAST(n_all - n_d AS DOUBLE))
                  / CAST(n_tgt AS DOUBLE) AS loss_without
              FROM nd LEFT JOIN bb USING (doc_id)
              CROSS JOIN aa CROSS JOIN na CROSS JOIN nt)
            ORDER BY doc_id"""))

  /** Root-pacing curriculum schedule over the length ordering. */
  private val curriculum = Q(
    "n85_curriculum_schedule",
    "curriculum schedule: easiest-first rank + root-pacing first unlocked phase of 10",
    (s, dir) => graft.operators.Sampling
      .curriculumSchedule(Tables(s, dir).documents, phases = 10)
      .orderBy("doc_id"),
    Some("""WITH t AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM t),
            r AS (
              SELECT doc_id, n_tok,
                CAST(row_number() OVER (ORDER BY n_tok, doc_id)
                  AS BIGINT) AS rank
              FROM t)
            SELECT doc_id, n_tok, rank,
              CAST(list_filter(range(1, 11),
                p -> rank <= floor(nn * sqrt(p / 10.0)))[1] AS INT)
                AS first_phase
            FROM r, nc ORDER BY doc_id"""))

  /** The BM25 scoring chain as CTEs (5 query docs, k1=1.2, b=0.75) —
    * ends with `sc(q_id, doc_id, score)` defined. Shared by the n86
    * oracle and the n94 hybrid-rerank oracle.
    */
  private[queries] lazy val bm25Ctes: String = s"WITH $bm25Body"

  /** Query-by-document BM25 retrieval (rational ln-free idf core). */
  private val bm25 = Q(
    "n86_bm25_retrieval",
    "BM25 more-like-this: top-5 corpus docs per query doc via the inverted index",
    (s, dir) => graft.operators.Retrieval
      .bm25MoreLikeThis(Tables(s, dir).documents, nQueries = 5L, k = 5)
      .orderBy("q_id", "rank"),
    Some(s"""WITH $bm25Body
            SELECT q_id, CAST(rank AS INT) AS rank, doc_id, score
            FROM (SELECT q_id, doc_id, score,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY score DESC, doc_id) AS rank
                  FROM sc)
            WHERE rank <= 5 ORDER BY q_id, rank"""))

  private lazy val bm25Body: String = s"""tf AS (
              SELECT doc_id, t, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY doc_id, t),
            dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                   FROM tf GROUP BY doc_id),
            dfr AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
            st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avgdl
                   FROM dl),
            qt AS (SELECT DISTINCT doc_id AS q_id, t FROM tf
                   WHERE doc_id < 5),
            sc AS (
              SELECT q_id, tf.doc_id,
                ${Sql.oSum12("""((CAST(n_docs AS DOUBLE)
                    - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
                  * (CAST(tf AS DOUBLE) * 2.2)
                  / (CAST(tf AS DOUBLE)
                    + 1.2 * (0.25
                      + 0.75 * CAST(dl AS DOUBLE) / avgdl))""")} AS score
              FROM tf JOIN qt USING (t) JOIN dfr USING (t)
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN st
              WHERE tf.doc_id <> q_id
              GROUP BY q_id, tf.doc_id)"""

  /** Vocabulary-coverage curve at top-k checkpoints. */
  private val vocabCov = Q(
    "n87_vocab_coverage",
    "token-occurrence coverage of the top-16/64/256 frequency vocabulary",
    (s, dir) => graft.operators.TextAnalysis
      .vocabCoverage(Tables(s, dir).documents, Seq(16, 64, 256)),
    Some("""WITH tf AS (
              SELECT t, COUNT(*) AS freq
              FROM (SELECT unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY t),
            r AS (SELECT freq,
                    row_number() OVER (ORDER BY freq DESC, t) AS rank
                  FROM tf)
            SELECT
              CAST(SUM(CASE WHEN rank <= 16 THEN freq ELSE 0 END)
                AS BIGINT) AS cov_16,
              CAST(SUM(CASE WHEN rank <= 64 THEN freq ELSE 0 END)
                AS BIGINT) AS cov_64,
              CAST(SUM(CASE WHEN rank <= 256 THEN freq ELSE 0 END)
                AS BIGINT) AS cov_256,
              CAST(SUM(freq) AS BIGINT) AS total_tokens,
              COUNT(*) AS vocab_size,
              CAST(CAST(SUM(CASE WHEN rank <= 16 THEN freq ELSE 0 END)
                AS DOUBLE) / CAST(SUM(freq) AS DOUBLE) AS DOUBLE) AS frac_16,
              CAST(CAST(SUM(CASE WHEN rank <= 64 THEN freq ELSE 0 END)
                AS DOUBLE) / CAST(SUM(freq) AS DOUBLE) AS DOUBLE) AS frac_64,
              CAST(CAST(SUM(CASE WHEN rank <= 256 THEN freq ELSE 0 END)
                AS DOUBLE) / CAST(SUM(freq) AS DOUBLE) AS DOUBLE) AS frac_256
            FROM r"""))

  /** Rank-sum (Mann–Whitney) drift between the two event_id-parity
    * slices of the events feed, per event_type.
    */
  private val drift = Q(
    "n88_drift_detection",
    "Mann-Whitney rank-sum drift of event values between corpus slices, per event_type",
    (s, dir) => graft.operators.Drift
      .rankSumDrift(Tables(s, dir).events, "event_type", "value",
        col("event_id") % 2 === 0)
      .orderBy("event_type"),
    Some(s"""WITH bv AS (
              SELECT event_type, value AS v, COUNT(*) AS c,
                COUNT(*) FILTER (WHERE event_id % 2 = 0) AS c_a
              FROM events GROUP BY event_type, value),
            m AS (
              SELECT event_type, c, c_a,
                CAST(COALESCE(SUM(c) OVER (PARTITION BY event_type
                  ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS DOUBLE)
                  + (CAST(c AS DOUBLE) + 1.0) / 2.0 AS midrank
              FROM bv),
            a AS (
              SELECT event_type, CAST(SUM(c_a) AS BIGINT) AS n_a,
                CAST(SUM(c) - SUM(c_a) AS BIGINT) AS n_b,
                ${Sql.oSum("CAST(c_a AS DOUBLE) * midrank")} AS r_a
              FROM m GROUP BY event_type)
            SELECT event_type, n_a, n_b, u_a,
              CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) - u_a AS u_b,
              CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                   ELSE (u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                       / 2.0)
                     / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                       * CAST(n_a + n_b + 1 AS DOUBLE) / 12.0) END AS z
            FROM (SELECT event_type, n_a, n_b,
                    r_a - CAST(n_a AS DOUBLE) * CAST(n_a + 1 AS DOUBLE)
                      / 2.0 AS u_a
                  FROM a)
            ORDER BY event_type"""))

  /** Directed containment pairs — the asymmetric dedup member. */
  private val containment = Q(
    "n89_containment_dedup",
    "directed shingle-containment pairs (rare-shingle candidates, exact verify, threshold 0.9)",
    (s, dir) => graft.operators.Dedup
      .containmentPairs(Tables(s, dir).documents, n = 3, threshold = 0.9)
      .orderBy("id_a", "id_b"),
    Some("""WITH tok AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                     ELSE list_transform(range(len(ts) - 2),
                            i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])
                END) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ts
                    FROM documents)),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
            freq AS (SELECT s, COUNT(*) AS df FROM ex GROUP BY s),
            rare AS (SELECT doc_id, s FROM ex JOIN freq USING (s)
                     WHERE df <= 64),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM rare a JOIN rare b
                ON a.s = b.s AND a.doc_id <> b.doc_id),
            pin AS (
              SELECT id_a, id_b, COUNT(*) AS inter
              FROM cand
              JOIN ex ea ON ea.doc_id = id_a
              JOIN ex eb ON eb.doc_id = id_b AND eb.s = ea.s
              GROUP BY id_a, id_b),
            sz AS (SELECT doc_id, len(sh) AS n_sh FROM tok)
            SELECT id_a, id_b, CAST(inter AS INT) AS inter,
              CAST(n_sh AS INT) AS n_a,
              CAST(inter AS DOUBLE) / CAST(n_sh AS DOUBLE) AS containment
            FROM pin JOIN sz ON id_a = sz.doc_id
            WHERE CAST(inter AS DOUBLE) / CAST(n_sh AS DOUBLE) >= 0.9
            ORDER BY id_a, id_b"""))

  /** k-anonymity classes over the (event_type, props.k) quasi-id. */
  private val kAnon = Q(
    "n90_k_anonymity",
    "k-anonymity audit: quasi-identifier classes smaller than k=5 flagged for suppression",
    (s, dir) => graft.operators.Privacy
      .kAnonymityClasses(
        Tables(s, dir).events.withColumn("qi_k",
          get_json_object(col("props"), "$.k").cast("long")),
        Seq(col("event_type"), col("qi_k")), k = 5L)
      .orderBy("event_type", "qi_k"),
    Some("""SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS qi_k,
              COUNT(*) AS class_size,
              COUNT(*) >= 5 AS anonymous,
              CASE WHEN COUNT(*) < 5 THEN COUNT(*) ELSE 0 END
                AS suppressed_rows
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Varlen attention-segment (cu_seqlens) table over the 512-token
    * packing — the kernel-facing view of the n67 manifest.
    */
  private val attnSegs = Q(
    "n91_attention_segments",
    "varlen attention segment table: per-context document slices with in-context offsets",
    (s, dir) => graft.operators.Packing
      .attentionSegments(Tables(s, dir).documents, budget = 512L)
      .orderBy("chunk_id", "seg_idx"),
    Some("""WITH t AS (
              SELECT doc_id,
                len(string_split(text, ' ')) AS n_tok
              FROM documents),
            o AS (
              SELECT doc_id, n_tok,
                CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS s
              FROM t),
            sp AS (SELECT doc_id, s, s + n_tok AS e
                   FROM o WHERE n_tok > 0),
            ch AS (
              SELECT doc_id, s, e,
                unnest(range(s // 512, (e - 1) // 512 + 1)) AS chunk_id
              FROM sp)
            SELECT chunk_id,
              CAST(row_number() OVER (PARTITION BY chunk_id
                ORDER BY GREATEST(s, chunk_id * 512) - chunk_id * 512,
                  doc_id) - 1 AS INT) AS seg_idx,
              doc_id,
              GREATEST(s, chunk_id * 512) - chunk_id * 512 AS seg_start,
              LEAST(e, (chunk_id + 1) * 512)
                - GREATEST(s, chunk_id * 512) AS seg_len
            FROM ch ORDER BY chunk_id, seg_idx"""))

  /** Reliability table of the n68 trained classifier, by score-rank
    * decile (equal-population bins — fast-sigmoid scores concentrate
    * in a narrow band where equal-width bins collapse).
    */
  private val calibration = Q(
    "n92_calibration_bins",
    "rank-decile calibration of the trained quality classifier: population, mean score, positive rate",
    (s, dir) => graft.operators.QualityModel
      .calibrationBins(Tables(s, dir).documents,
        positiveSources = Seq("src0", "src1", "src2", "src3", "src4"),
        iters = 3, bins = 10)
      .orderBy("bin"),
    Some(s"""${NorthStar4.qcCtes},
            sc AS (
              SELECT doc_id, y,
                0.5 + (0.5 * m) / (1.0 + abs(m)) AS score
              FROM m4),
            na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM sc),
            rk AS (
              SELECT y, score,
                CAST(((row_number() OVER (ORDER BY score DESC, doc_id)
                  - 1) * 10) // n_all AS INT) AS bin
              FROM sc, na)
            SELECT bin, COUNT(*) AS n_docs,
              CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
              ${Sql.oSum12("score")} / COUNT(*) AS avg_score,
              CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS pos_rate
            FROM rk GROUP BY bin ORDER BY bin"""))

  /** Epochs-to-budget forecast under the n70 trained mixture. */
  private val budgetForecast = Q(
    "n93_token_budget_forecast",
    "token-budget forecast: per-domain requested tokens and epoch count under the trained mixture",
    (s, dir) => graft.operators.Mixture
      .tokenBudgetForecast(Tables(s, dir).documents, targetTokens = 100000L)
      .orderBy("source"),
    Some(s"""${NorthStar5.doremiCtes}
            SELECT source, n AS avail_tokens,
              (s_s * 100000) // 1000000 AS req_tokens,
              (1000 * ((s_s * 100000) // 1000000)) // n AS epochs_pm
            FROM (SELECT source, n,
                    CAST(FLOOR(a * 1000000.0) AS BIGINT) AS s_s
                  FROM a3 JOIN nd USING (source))
            ORDER BY source"""))

  /** Two-stage retrieve-then-rerank: BM25 top-20 candidates reranked
    * by the trained Bradley–Terry reward, top-5 kept. The oracle
    * composes the full BT training chain with the BM25 chain (the
    * reward CTE renamed to dodge the `sc` collision).
    */
  private val hybrid = Q(
    "n94_hybrid_rerank",
    "retrieve-then-rerank: BM25 top-20 candidates reranked by the trained reward model",
    (s, dir) => graft.operators.Retrieval
      .hybridRerank(Tables(s, dir).documents, nQueries = 5L,
        candidateK = 20, k = 5)
      .orderBy("q_id", "rerank"),
    Some(s"""$btCtes,
            ${btScoreAs("rw")},
            ${bm25Body},
            cand AS (
              SELECT q_id, doc_id, score AS bm25_score,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY score DESC, doc_id) AS bm25_rank
              FROM sc)
            SELECT q_id, CAST(rr AS INT) AS rerank, doc_id,
              CAST(bm25_rank AS INT) AS bm25_rank, bm25_score, reward
            FROM (
              SELECT q_id, c.doc_id, bm25_rank, bm25_score,
                rw.score AS reward,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY rw.score DESC, bm25_rank) AS rr
              FROM cand c JOIN rw ON rw.doc_id = c.doc_id
              WHERE bm25_rank <= 20)
            WHERE rr <= 5
            ORDER BY q_id, rerank"""))

  /** Dedup method-agreement audit (one shared shingle table feeds
    * both replays).
    */
  private val agreement = Q(
    "n95_dedup_agreement",
    "dedup method agreement: undirected Jaccard-0.8 vs containment-0.9 pair sets",
    (s, dir) => graft.operators.Dedup
      .methodAgreement(Tables(s, dir).documents, n = 3, jt = 0.8,
        ct = 0.9),
    Some("""WITH tok AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                     ELSE list_transform(range(len(ts) - 2),
                            i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])
                END) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ts
                    FROM documents)),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
            sz AS (SELECT doc_id, len(sh) AS n_sh FROM tok),
            ji AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            jp AS (
              SELECT id_a, id_b FROM ji
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE CAST(inter AS DOUBLE)
                / (sa.n_sh + sb.n_sh - inter) >= 0.8),
            freq AS (SELECT s, COUNT(*) AS df FROM ex GROUP BY s),
            rare AS (SELECT doc_id, s FROM ex JOIN freq USING (s)
                     WHERE df <= 64),
            ccand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM rare a JOIN rare b
                ON a.s = b.s AND a.doc_id <> b.doc_id),
            cpin AS (
              SELECT id_a, id_b, COUNT(*) AS inter
              FROM ccand
              JOIN ex ea ON ea.doc_id = id_a
              JOIN ex eb ON eb.doc_id = id_b AND eb.s = ea.s
              GROUP BY id_a, id_b),
            cdir AS (
              SELECT id_a, id_b FROM cpin JOIN sz ON id_a = sz.doc_id
              WHERE CAST(inter AS DOUBLE) / CAST(n_sh AS DOUBLE) >= 0.9),
            cp AS (
              SELECT DISTINCT LEAST(id_a, id_b) AS id_a,
                GREATEST(id_a, id_b) AS id_b
              FROM cdir),
            f AS (
              SELECT COALESCE(jp.id_a IS NOT NULL, FALSE) AS j,
                COALESCE(cp.id_a IS NOT NULL, FALSE) AS c
              FROM jp FULL OUTER JOIN cp USING (id_a, id_b))
            SELECT
              CAST(SUM(CASE WHEN j THEN 1 ELSE 0 END) AS BIGINT)
                AS n_jaccard,
              CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT)
                AS n_containment,
              CAST(SUM(CASE WHEN j AND c THEN 1 ELSE 0 END) AS BIGINT)
                AS n_both,
              CAST(SUM(CASE WHEN j AND NOT c THEN 1 ELSE 0 END) AS BIGINT)
                AS n_only_jaccard,
              CAST(SUM(CASE WHEN NOT j AND c THEN 1 ELSE 0 END) AS BIGINT)
                AS n_only_containment
            FROM f"""))

  /** Rank-based winsorization bounds per event_type. */
  private val winsorize = Q(
    "n96_winsorize_bounds",
    "rank-exact P1/P99 winsorization bounds per event_type with clip counts",
    (s, dir) => graft.operators.Drift
      .winsorizeBounds(Tables(s, dir).events, "event_type", "value")
      .orderBy("event_type"),
    Some("""WITH r AS (
              SELECT event_type, value AS v,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            b AS (
              SELECT event_type, n,
                MIN(CASE WHEN rn = GREATEST(1, (n * 1 + 99) // 100)
                    THEN v END) AS lo_bound,
                MIN(CASE WHEN rn = (n * 99 + 99) // 100
                    THEN v END) AS hi_bound
              FROM r GROUP BY event_type, n)
            SELECT e.event_type, n, lo_bound, hi_bound,
              CAST(SUM(CASE WHEN value < lo_bound THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
              CAST(SUM(CASE WHEN value > hi_bound THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above
            FROM events e JOIN b USING (event_type)
            GROUP BY e.event_type, n, lo_bound, hi_bound
            ORDER BY event_type"""))

  /** Token-balanced serpentine output sharding plan (16 shards). */
  private val shards = Q(
    "n97_balanced_shards",
    "token-balanced writer sharding: serpentine round-robin over the length-descending global order",
    (s, dir) => graft.operators.Packing
      .balancedShards(Tables(s, dir).documents, nShards = 16)
      .orderBy("doc_id"),
    Some("""WITH t AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            r AS (
              SELECT doc_id, n_tok,
                CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id)
                  AS BIGINT) AS rank
              FROM t)
            SELECT doc_id, n_tok, rank,
              CAST(CASE WHEN ((rank - 1) // 16) % 2 = 0
                   THEN (rank - 1) % 16
                   ELSE 15 - (rank - 1) % 16 END AS INT) AS shard
            FROM r ORDER BY doc_id"""))

  /** The two gate predicates as SQL over a frame exposing (text, ts,
    * sum_len) — shared by the n98 kappa oracle and the n100
    * healthcheck oracle.
    */
  private[queries] val gaSql: String = """COALESCE((len(ts) >= 5
                 AND (length(text) - length(regexp_replace(text,
                     '[^a-zA-Z0-9 ]', '', 'g')))
                   / CAST(length(text) AS DOUBLE) < 0.2
                 AND (length(text) - length(regexp_replace(text,
                     '[0-9]', '', 'g')))
                   / CAST(length(text) AS DOUBLE) < 0.3), FALSE)"""

  private[queries] val gbSql: String = """COALESCE(((len(ts) >= 10 AND len(ts) <= 100000)
                 AND (CAST(sum_len AS DOUBLE) / CAST(len(ts) AS INT)
                        >= 3.0
                      AND CAST(sum_len AS DOUBLE) / CAST(len(ts) AS INT)
                        <= 10.0)
                 AND (len(list_filter(ts,
                       x -> regexp_matches(x, '[a-zA-Z]'))) * 5
                      >= len(ts) * 4)
                 AND ((CASE WHEN list_contains(ts, 'the') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(ts, 'a') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(ts, 'and') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(ts, 'of') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(ts, 'to') THEN 1 ELSE 0 END)
                      >= 2)), FALSE)"""

  /** Cohen's kappa between the two rule-based quality gates. */
  private val gateKappa = Q(
    "n98_gate_kappa",
    "Cohen's kappa agreement between the heuristic quality gate and the Gopher rules",
    (s, dir) => graft.operators.TextAnalysis
      .gateAgreement(Tables(s, dir).documents),
    Some(s"""WITH t AS (
              SELECT doc_id, text, string_split(text, ' ') AS ts,
                length(replace(text, ' ', '')) AS sum_len
              FROM documents),
            p AS (
              SELECT doc_id,
                $gaSql AS ga,
                $gbSql AS gb
              FROM t),
            c AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11,
                CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
                CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
                CAST(SUM(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00
              FROM p)
            SELECT n, n11, n10, n01, n00, po, pe,
              CASE WHEN pe = 1.0 THEN NULL
                   ELSE (po - pe) / (1.0 - pe) END AS kappa
            FROM (
              SELECT *,
                CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
                (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
                + (1.0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (1.0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
                  AS pe
              FROM c)"""))

  /** Language-ID confusion matrix vs the labeled language. */
  private val langConf = {
    // the score/argmax SQL is the n09 oracle's generator, shared
    // (NorthStar.langScoreColsSql/langCaseSql) — one heuristic, one
    // replay definition
    val scoreCols = NorthStar.langScoreColsSql
    val caseExpr = NorthStar.langCaseSql
    Q(
      "n99_langid_confusion",
      "language-ID confusion matrix: predictions vs labels with per-label rates",
      (s, dir) => graft.operators.TextAnalysis
        .langConfusion(Tables(s, dir).documents)
        .orderBy("labeled_lang", "pred_lang"),
      Some(s"""WITH sc AS (
                SELECT lang AS labeled_lang, $scoreCols
                FROM documents),
              pr AS (
                SELECT labeled_lang,
                  CASE $caseExpr ELSE 'und' END AS pred_lang
                FROM sc),
              cm AS (
                SELECT labeled_lang, pred_lang,
                  CAST(COUNT(*) AS BIGINT) AS n
                FROM pr GROUP BY 1, 2),
              tot AS (
                SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS n_labeled
                FROM cm GROUP BY 1)
              SELECT labeled_lang, pred_lang, n, n_labeled,
                CAST(n AS DOUBLE) / CAST(n_labeled AS DOUBLE) AS rate
              FROM cm JOIN tot USING (labeled_lang)
              ORDER BY labeled_lang, pred_lang"""))
  }

  /** The n23 PII patterns as one DuckDB hit predicate — generated
    * from [[graft.operators.TextAnalysis.PiiPatterns]] (the n23 oracle
    * policy), so a pattern change updates operator and oracle together.
    */
  private[queries] val piiHitSql: String =
    graft.operators.TextAnalysis.PiiPatterns
      .map { case (_, pat, _) =>
        s"len(regexp_extract_all(text, '$pat')) > 0"
      }
      .mkString("(", "\n                 OR ", ")")

  /** The one-row corpus release healthcheck. */
  private val healthcheck = Q(
    "n100_corpus_healthcheck",
    "release healthcheck: size, dup rate, gate keep rates, PII incidence, language coverage",
    (s, dir) => graft.operators.Curation
      .releaseHealthcheck(Tables(s, dir).documents),
    Some(s"""WITH b AS (
              SELECT doc_id, lang, text, string_split(text, ' ') AS ts,
                length(replace(text, ' ', '')) AS sum_len,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                substr(md5(trim(regexp_replace(lower(text),
                  '\\s+', ' ', 'g'))), 1, 16) AS fp,
                $piiHitSql AS pii_hit
              FROM documents),
            p AS (
              SELECT n_tok, fp, lang, pii_hit,
                $gaSql AS qok,
                $gbSql AS gok
              FROM b)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
              CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct,
              CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
              1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
              CAST(SUM(CASE WHEN qok THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS quality_keep_rate,
              CAST(SUM(CASE WHEN gok THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS gopher_keep_rate,
              CAST(SUM(CASE WHEN pii_hit THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS pii_doc_rate,
              CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                AS mean_tokens
            FROM p"""))

  val all: Seq[Q] = Seq(chatMask, fim, spanCorrupt, prefPairs, btReward,
    clusterCap, bestOfN, docValue, curriculum, bm25, vocabCov, drift,
    containment, kAnon, attnSegs, calibration, budgetForecast, hybrid,
    agreement, winsorize, shards, gateKappa, langConf, healthcheck)
}
