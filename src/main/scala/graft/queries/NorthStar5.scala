package graft.queries

import graft.Tables
import graft.operators.{Decontamination, Mixture, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Round-9 north-star operators: learned mixture weights — the
  * quality family's missing member class (heuristic n08/n62,
  * rank-calibration n64, generative-importance n59, discriminative-
  * trained n68 all exist; the mixture family n21/n61 was fixed/closed-
  * form until now). Same exactness regime as n68: no transcendentals,
  * every sum through DECIMAL(38,12), trajectory fully oracled.
  */
object NorthStar5 extends QueryGroup {

  /** The DoReMi reweighting replay as DuckDB CTEs, ending with
    * `a1..a{iters}` (post-round weights, (source, a)) and `ex1..` (per-
    * round loss/excess) defined — shared by the n70 trajectory oracle
    * and the s23 streaming-realization oracle (the dsirCtes pattern).
    * Mirrors [[graft.operators.Mixture.doremiTrain]] op for op:
    * lr = 1.0, smooth = 0.01, unigram models over whitespace tokens.
    */
  private def doremiRound(r: Int): String =
    s"""pm$r AS (
              SELECT t, ${Sql.oSum12("a * pr")} AS pm
              FROM p JOIN a${r - 1} USING (source) GROUP BY t),
            ls$r AS (
              SELECT source,
                1.0 - ${Sql.oSum12("CAST(c AS DOUBLE) * pm")}
                  / CAST(n AS DOUBLE) AS loss
              FROM p JOIN pm$r USING (t) GROUP BY source, n),
            ex$r AS (
              SELECT source, loss,
                GREATEST(0.0, loss - ref_loss) AS excess
              FROM ls$r JOIN ref USING (source)),
            u$r AS (
              SELECT source, a * (1.0 + 1.0 * excess) AS u
              FROM ex$r JOIN a${r - 1} USING (source)),
            z$r AS (SELECT ${Sql.oSum12("u")} AS z FROM u$r),
            a$r AS (
              SELECT source,
                (1.0 - 0.01) * (u / z) + 0.01 * (1.0 / d) AS a
              FROM u$r CROSS JOIN z$r CROSS JOIN dc)"""

  private[queries] val doremiCtes: String =
    s"""WITH tok AS (
              SELECT source, unnest(string_split(text, ' ')) AS t
              FROM documents),
            ct AS (
              SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t),
            nd AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS n
              FROM ct GROUP BY source),
            dc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM nd),
            p AS (
              SELECT ct.source, t, c, n,
                CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pr
              FROM ct JOIN nd USING (source)),
            ref AS (
              SELECT source,
                1.0 - ${Sql.oSum12("CAST(c AS DOUBLE) * pr")}
                  / CAST(n AS DOUBLE) AS ref_loss
              FROM p GROUP BY source, n),
            a0 AS (SELECT source, 1.0 / d AS a FROM nd CROSS JOIN dc),
            ${doremiRound(1)},
            ${doremiRound(2)},
            ${doremiRound(3)}"""

  /** DoReMi-style trained domain mixture weights: 3 multiplicative-
    * reweighting rounds over per-domain unigram excess loss, the full
    * (round, domain) trajectory — losses, clipped excesses, post-update
    * weights — hash-exact against the unrolled-CTE replay.
    */
  private val doremi = Q(
    "n70_doremi_mixture",
    "DoReMi-style trained domain mixture weights (excess-loss reweighting), trajectory hash-exact",
    (s, dir) => Mixture
      .doremiTrajectory(Tables(s, dir).documents)
      .orderBy("round", "source"),
    Some(s"""$doremiCtes
            SELECT round, source, loss, excess, weight FROM (
              SELECT 1 AS round, ex1.source, loss, excess, a AS weight
              FROM ex1 JOIN a1 USING (source)
              UNION ALL
              SELECT 2, ex2.source, loss, excess, a
              FROM ex2 JOIN a2 USING (source)
              UNION ALL
              SELECT 3, ex3.source, loss, excess, a
              FROM ex3 JOIN a3 USING (source))
            ORDER BY round, source"""))

  /** Embedding-space decontamination: the semantic member of the
    * decontamination family (n18 exact shingles, n41 Bloom-prefiltered
    * shingles) — a paraphrased eval item shares no n-grams with its
    * contaminated double, but the embeddings stay close. Candidates
    * from one sign-bucket table with single-bit multi-probing on the
    * eval side (the n53 pattern), exact-cosine verified; the oracle
    * replays buckets, probes, and cosines over the same embedded plane
    * constants.
    */
  /** The n71 oracle, shared verbatim with s24's streaming apply (the
    * mergeOracleSql pattern — the streaming run must converge to the
    * identical flagged set).
    */
  private[queries] lazy val embedDecontamOracleSql: String = {
    val numPlanes = 8
    val planeRows = Similarity.hyperplanes(numPlanes, 64, 42L).zipWithIndex
      .map { case (p, j) =>
        s"($j, [${p.map(v => java.lang.Double.toString(v)).mkString(", ")}])"
      }.mkString(",\n")
    val xorVals = (0L +: (0 until numPlanes).map(1L << _).map(_.toLong))
      .mkString(", ")
    s"""WITH planes(plane_id, pv) AS (VALUES $planeRows),
            buckets AS (
              SELECT vec_id, SUM(CASE WHEN dot >= 0
                THEN CAST(1 AS BIGINT) << plane_id ELSE 0 END) AS bucket
              FROM (SELECT e.vec_id, p.plane_id,
                      list_reduce(list_transform(list_zip(e.embedding, p.pv),
                          x -> CAST(x[1] AS DOUBLE) * x[2]),
                        (acc, x) -> acc + x) AS dot
                    FROM embeddings e CROSS JOIN planes p)
              GROUP BY vec_id),
            flagged AS (
              SELECT c.vec_id, q.vec_id AS eval_id,
                ${Sql.oCos("c.embedding", "q.embedding")} AS cos_sim
              FROM embeddings c
              JOIN buckets cb ON cb.vec_id = c.vec_id
              JOIN buckets qb ON xor(cb.bucket, qb.bucket) IN ($xorVals)
              JOIN embeddings q ON q.vec_id = qb.vec_id
              WHERE c.vec_id >= 100 AND q.vec_id < 100)
            SELECT vec_id, eval_id, cos_sim FROM flagged
            WHERE cos_sim >= 0.2 ORDER BY vec_id, eval_id"""
  }

  private val embedDecontam = Q(
    "n71_embedding_decontam",
    "embedding-space decontamination: corpus vectors near any eval vector (LSH multi-probe + exact verify)",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      Decontamination.flagContaminatedEmbedding(
        emb.filter(col("vec_id") >= 100),
        emb.filter(col("vec_id") < 100),
        threshold = 0.2)
        .orderBy("vec_id", "eval_id")
    },
    Some(embedDecontamOracleSql))

  /** Leave-one-domain-out valuation: closed-form domain ablation over
    * the linear surrogate loss — all-BIGINT sums, two final double
    * divisions, no FP policy needed at all.
    */
  private val ablation = Q(
    "n72_domain_ablation",
    "leave-one-domain-out data valuation vs the lang='en' target slice, exact integer form",
    (s, dir) => Mixture
      .domainAblation(Tables(s, dir).documents, col("lang") === "en")
      .orderBy("source"),
    Some("""WITH tok AS (
              SELECT source, lang = 'en' AS is_tgt,
                unnest(string_split(text, ' ')) AS t
              FROM documents),
            ct AS (
              SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t),
            gt AS (
              SELECT t, CAST(SUM(c) AS BIGINT) AS ct_all
              FROM ct GROUP BY t),
            tt AS (
              SELECT t, COUNT(*) AS tt FROM tok WHERE is_tgt GROUP BY t),
            nd AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS n_d
              FROM ct GROUP BY source),
            na AS (SELECT CAST(SUM(ct_all) AS BIGINT) AS n_all FROM gt),
            nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tgt
                   FROM tok WHERE is_tgt),
            aa AS (SELECT CAST(SUM(tt * ct_all) AS BIGINT) AS a
                   FROM gt JOIN tt USING (t)),
            bb AS (SELECT source, CAST(SUM(tt * c) AS BIGINT) AS b
                   FROM ct JOIN tt USING (t) GROUP BY source)
            SELECT source, n_d, loss_full, loss_without,
              loss_without - loss_full AS delta
            FROM (
              SELECT source, n_d,
                1.0 - (CAST(a AS DOUBLE) / CAST(n_all AS DOUBLE))
                  / CAST(n_tgt AS DOUBLE) AS loss_full,
                1.0 - (CAST(a - COALESCE(b, 0) AS DOUBLE)
                    / CAST(n_all - n_d AS DOUBLE))
                  / CAST(n_tgt AS DOUBLE) AS loss_without
              FROM nd LEFT JOIN bb USING (source)
              CROSS JOIN aa CROSS JOIN na CROSS JOIN nt)
            ORDER BY source"""))

  /** Epoch-decorrelated packing plan: the n67 boundary-exact manifest
    * composed with a deterministic per-epoch md5 hash shuffle — the
    * multi-epoch dataloader order. Oracle: per-epoch hash-ordered
    * prefix sums (DuckDB-side window; the operator rides the
    * distributed GlobalOrder prefix sum per epoch).
    */
  private val epochPlan = Q(
    "n73_epoch_packing_plan",
    "epoch-decorrelated 512-token packing plan (md5 hash shuffle per epoch, boundary-exact)",
    (s, dir) => graft.operators.Packing
      .epochPackingPlan(Tables(s, dir).documents, epochs = 3, budget = 512L)
      .orderBy("epoch", "chunk_id"),
    Some("""WITH t AS (
              SELECT doc_id,
                len(string_split(text, ' ')) AS n_tok
              FROM documents),
            ep AS (SELECT unnest(range(3)) AS epoch),
            h AS (
              SELECT epoch, doc_id, n_tok,
                md5(CAST(epoch AS VARCHAR) || ':' ||
                    CAST(doc_id AS VARCHAR)) AS ord
              FROM t CROSS JOIN ep),
            o AS (
              SELECT epoch, doc_id, n_tok,
                CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY epoch
                  ORDER BY ord, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS s
              FROM h),
            sp AS (SELECT epoch, doc_id, s, s + n_tok AS fin
                   FROM o WHERE n_tok > 0),
            ch AS (
              SELECT epoch, doc_id, s, fin,
                unnest(range(s // 512, (fin - 1) // 512 + 1)) AS chunk_id
              FROM sp)
            SELECT epoch, chunk_id, COUNT(*) AS n_docs,
              MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
              CAST(SUM(LEAST(fin, (chunk_id + 1) * 512)
                       - GREATEST(s, chunk_id * 512)) AS BIGINT) AS n_tokens
            FROM ch GROUP BY epoch, chunk_id
            ORDER BY epoch, chunk_id"""))

  /** Multimodal context packing: media tokens (ViT patches / audio
    * frames / sampled video patches) interleaved with text tokens,
    * chunked into 2048-token contexts with a boundary-exact media/text
    * split per context — the VLM dataloader accounting. The oracle
    * replays the stub decode's octet arithmetic (the n11 chain), the
    * integer token budgets, and the prefix-sum slicing.
    */
  private val mmPacking = Q(
    "n74_multimodal_packing",
    "multimodal 2048-token context plan: media+text interleave, boundary-exact split",
    (s, dir) => graft.operators.Multimodal
      .packingPlan(s, Tables(s, dir).documents, budget = 2048L)
      .orderBy("chunk_id"),
    Some("""WITH f AS (
              SELECT doc_id,
                len(string_split(text, ' ')) AS t,
                doc_id % 3 AS k,
                octet_length(encode(text)) AS nb,
                CAST(16 + CASE WHEN octet_length(encode(text)) = 0 THEN 0
                  ELSE list_reduce(list_transform(
                    range(least(16, octet_length(encode(text)))),
                    i -> CAST(('0x' || substr(hex(encode(text)),
                      CAST(2*i+1 AS INT), 2)) AS INT)),
                  (a, b) -> a + b) END % 640 AS INT) AS width,
                CAST(16 + octet_length(encode(text)) % 480 AS INT) AS height
              FROM documents),
            m AS (
              SELECT doc_id, CAST(t AS BIGINT) AS t,
                CAST(CASE k
                  WHEN 0 THEN ((width + 15) // 16) * ((height + 15) // 16)
                  WHEN 1 THEN ((1 + nb % 1000) + 3) // 4
                  ELSE (((1 + nb % 30) + 4) // 5) * 64 END AS BIGINT) AS m
              FROM f),
            o AS (
              SELECT doc_id, m, t, m + t AS n,
                CAST(COALESCE(SUM(m + t) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS s
              FROM m),
            sp AS (SELECT doc_id, m, t, s, s + n AS fin FROM o),
            ch AS (
              SELECT doc_id, m, t, s, fin,
                unnest(range(s // 2048, (fin - 1) // 2048 + 1)) AS chunk_id
              FROM sp)
            SELECT chunk_id, COUNT(*) AS n_examples,
              CAST(SUM(GREATEST(0, LEAST(s + m, (chunk_id + 1) * 2048)
                - GREATEST(s, chunk_id * 2048))) AS BIGINT) AS n_media_tokens,
              CAST(SUM(GREATEST(0, LEAST(fin, (chunk_id + 1) * 2048)
                - GREATEST(s + m, chunk_id * 2048))) AS BIGINT) AS n_text_tokens,
              CAST(SUM(GREATEST(0, LEAST(fin, (chunk_id + 1) * 2048)
                - GREATEST(s, chunk_id * 2048))) AS BIGINT) AS n_tokens
            FROM ch GROUP BY chunk_id ORDER BY chunk_id"""))

  /** Borda rank fusion over three quality signals — the ensemble
    * member of the quality family. All-integer ranks; the oracle
    * replays each signal's arithmetic (the n56 composite score, the
    * n59 DSIR BIGINT scoring chain, the n62 Gopher rules) and fuses by
    * row_number, so the compare covers every rank, the Borda sums, and
    * the kept set.
    */
  private val rankFusion = Q(
    "n75_quality_rank_fusion",
    "Borda rank fusion of heuristic / DSIR / Gopher quality signals, top-25% gate",
    (s, dir) => Sampling
      .rankFusionGate(Tables(s, dir).documents, col("lang") === "en", 0.25)
      .orderBy("doc_id"),
    Some(s"""${NorthStar4.dsirCtes},
            hq AS (
              SELECT doc_id, ${NorthStar3.scoreSql} AS q FROM documents),
            gm AS (
              SELECT doc_id,
                (CASE WHEN len(ts) >= 10 AND len(ts) <= 100000
                      THEN 1 ELSE 0 END)
                + (CASE WHEN CAST(sum_len AS DOUBLE) / CAST(len(ts) AS INT)
                          >= 3.0
                        AND CAST(sum_len AS DOUBLE) / CAST(len(ts) AS INT)
                          <= 10.0
                      THEN 1 ELSE 0 END)
                + (CASE WHEN len(list_filter(ts,
                          x -> regexp_matches(x, '[a-zA-Z]'))) * 5
                          >= len(ts) * 4
                      THEN 1 ELSE 0 END)
                + (CASE WHEN
                     (CASE WHEN list_contains(ts, 'the') THEN 1 ELSE 0 END +
                      CASE WHEN list_contains(ts, 'a') THEN 1 ELSE 0 END +
                      CASE WHEN list_contains(ts, 'and') THEN 1 ELSE 0 END +
                      CASE WHEN list_contains(ts, 'of') THEN 1 ELSE 0 END +
                      CASE WHEN list_contains(ts, 'to') THEN 1 ELSE 0 END)
                        >= 2
                      THEN 1 ELSE 0 END) AS n_rules
              FROM (SELECT doc_id, string_split(text, ' ') AS ts,
                      length(replace(text, ' ', '')) AS sum_len
                    FROM documents)),
            rr AS (
              SELECT hq.doc_id,
                row_number() OVER (ORDER BY q DESC, hq.doc_id) AS r_heur,
                row_number() OVER (ORDER BY score_ppm DESC, hq.doc_id)
                  AS r_imp,
                row_number() OVER (ORDER BY n_rules DESC, hq.doc_id)
                  AS r_rules
              FROM hq JOIN sc ON sc.doc_id = hq.doc_id
                      JOIN gm ON gm.doc_id = hq.doc_id),
            f AS (
              SELECT doc_id, r_heur, r_imp, r_rules,
                r_heur + r_imp + r_rules AS borda,
                row_number() OVER (ORDER BY r_heur + r_imp + r_rules,
                  doc_id) AS fused_rank
              FROM rr)
            SELECT doc_id, r_heur, r_imp, r_rules, borda, fused_rank,
              fused_rank <= CEIL(0.25 * CAST(n_docs AS DOUBLE)) AS kept
            FROM f, n ORDER BY doc_id"""))

  /** Contrastive triplet mining: sign-bucket positives (exact-cosine
    * verified) + md5-deterministic corpus negatives with
    * false-negative filtering. The oracle replays the plane buckets,
    * the pair join, the md5 hex-int rank draws, and both cosine sides.
    */
  private val contrastive = Q(
    "n76_contrastive_triplets",
    "contrastive (anchor, positive, negative) mining: bucketed positives, md5-deterministic negatives",
    (s, dir) => Similarity
      .contrastiveTriplets(Tables(s, dir).embeddings,
        anchorMax = 100L, posThreshold = 0.35, negsPerPair = 2)
      .orderBy("anchor_id", "pos_id", "j"),
    Some {
      val numPlanes = 8
      val planeRows = Similarity.hyperplanes(numPlanes, 64, 42L).zipWithIndex
        .map { case (p, j) =>
          s"($j, [${p.map(v => java.lang.Double.toString(v)).mkString(", ")}])"
        }.mkString(",\n")
      s"""WITH planes(plane_id, pv) AS (VALUES $planeRows),
            buckets AS (
              SELECT vec_id, SUM(CASE WHEN dot >= 0
                THEN CAST(1 AS BIGINT) << plane_id ELSE 0 END) AS bucket
              FROM (SELECT e.vec_id, p.plane_id,
                      list_reduce(list_transform(list_zip(e.embedding, p.pv),
                          x -> CAST(x[1] AS DOUBLE) * x[2]),
                        (acc, x) -> acc + x) AS dot
                    FROM embeddings e CROSS JOIN planes p)
              GROUP BY vec_id),
            pos AS (
              SELECT * FROM (
                SELECT a.vec_id AS anchor_id, ea.embedding AS a_emb,
                  c.vec_id AS pos_id,
                  ${Sql.oCos("ea.embedding", "ec.embedding")} AS pos_cos
                FROM buckets a
                JOIN embeddings ea ON ea.vec_id = a.vec_id
                JOIN buckets c ON c.bucket = a.bucket
                  AND c.vec_id <> a.vec_id
                JOIN embeddings ec ON ec.vec_id = c.vec_id
                WHERE a.vec_id < 100)
              WHERE pos_cos >= 0.35),
            nv AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
            rt AS (
              SELECT vec_id AS neg_id, embedding AS n_emb,
                row_number() OVER (ORDER BY vec_id) AS neg_rank
              FROM embeddings),
            cand AS (
              SELECT anchor_id, pos_id, pos_cos, a_emb, j,
                CAST(('0x' || substr(md5(
                    CAST(anchor_id AS VARCHAR) || ':' ||
                    CAST(pos_id AS VARCHAR) || ':' ||
                    CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
                  % n_vecs + 1 AS neg_rank
              FROM pos CROSS JOIN nv
              CROSS JOIN (SELECT unnest(range(2)) AS j))
            SELECT * FROM (
              SELECT anchor_id, pos_id, pos_cos, CAST(j AS INT) AS j,
                neg_id, ${Sql.oCos("a_emb", "n_emb")} AS neg_cos
              FROM cand JOIN rt USING (neg_rank)
              WHERE neg_id <> anchor_id AND neg_id <> pos_id)
            WHERE neg_cos < 0.35
            ORDER BY anchor_id, pos_id, j"""
    })

  val all: Seq[Q] = Seq(doremi, embedDecontam, ablation, epochPlan,
    mmPacking, rankFusion, contrastive)
}
