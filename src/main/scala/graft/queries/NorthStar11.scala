package graft.queries

import graft.Tables
import graft.operators.{Dedup, Geometry, Preference, QualityModel, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-15 family: gate/selection calibration and corpus-shape cards —
  * a split-conformal gate threshold with held-out coverage (the
  * finite-sample upgrade of n126's hand-picked operating points), the
  * Zipf rank-octave spectrum (exact frequency-shape diagnosis without
  * the log-log regression's `ln`), Two-NN intrinsic-dimension ratios
  * over the bounded embedding sample, the best-of-k reward uplift card
  * (what rejection sampling buys per prompt group), and cross-doc
  * n-gram novelty (duplication exposure below doc granularity).
  * Exactness policy as the n133+ families: selections + integer
  * arithmetic + DECIMAL(38,12)-routed sums; no transcendentals.
  */
object NorthStar11 extends QueryGroup {

  /** Split-conformal gate: threshold = k-th smallest calibration-
    * positive score, k = ⌊(n+1)α⌋ (α in per-mille so k is integer-
    * exact), coverage reported on the held-out odd-doc_id split.
    */
  private val conformal = Q(
    "n145_conformal_gate",
    "split-conformal quality-gate threshold (alpha=10%, even/odd doc_id split) + held-out recall/precision/pass-rate",
    (s, dir) => QualityModel
      .conformalGate(Tables(s, dir).documents,
        positiveSources = Seq("src0", "src1", "src2", "src3", "src4"),
        iters = 3, alphaPm = 100),
    Some(s"""${NorthStar4.qcCtes},
            sc AS (
              SELECT doc_id, y,
                0.5 + (0.5 * m) / (1.0 + abs(m)) AS score
              FROM m4),
            cal AS (
              SELECT score,
                row_number() OVER (ORDER BY score, doc_id) AS rn
              FROM sc WHERE doc_id % 2 = 0 AND y = 1.0),
            nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal_pos FROM cal),
            kk AS (
              SELECT n_cal_pos,
                GREATEST(((n_cal_pos + 1) * 100) // 1000, 1) AS k
              FROM nc),
            th AS (
              SELECT n_cal_pos, k, score AS threshold
              FROM kk JOIN cal ON cal.rn = kk.k),
            te AS (
              SELECT doc_id, y, score FROM sc WHERE doc_id % 2 = 1)
            SELECT n_cal_pos, k, threshold,
              CAST(COUNT(*) AS BIGINT) AS n_test,
              CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_test_pos,
              CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
              CAST(SUM(CASE WHEN score >= threshold AND y = 1.0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_pos,
              CASE WHEN SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE CAST(SUM(CASE WHEN score >= threshold AND y = 1.0
                  THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
                END AS recall_test,
              CASE WHEN SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
                  = 0
                THEN NULL
                ELSE CAST(SUM(CASE WHEN score >= threshold AND y = 1.0
                  THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
                    AS DOUBLE)
                END AS precision_test,
              CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pass_rate
            FROM te CROSS JOIN th
            GROUP BY 1, 2, 3"""))

  /** Zipf rank-octave spectrum: octave = ⌊log₂ rank⌋ via binary-string
    * length — exact on both engines, no transcendentals.
    */
  private val zipf = Q(
    "n146_zipf_octaves",
    "Zipf rank-octave spectrum: per rank-octave the term count and exact token-mass share",
    (s, dir) => TextAnalysis
      .zipfOctaves(Tables(s, dir).documents)
      .orderBy("octave"),
    Some("""WITH tc AS (
              SELECT t, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY t),
            r AS (
              SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rank
              FROM tc),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM tc)
            SELECT CAST(length(bin(rank)) - 1 AS INT) AS octave,
              CAST(MIN(rank) AS BIGINT) AS rank_lo,
              CAST(MAX(rank) AS BIGINT) AS rank_hi,
              CAST(COUNT(*) AS BIGINT) AS n_terms,
              CAST(SUM(c) AS BIGINT) AS octave_tokens,
              CAST(SUM(c) AS DOUBLE) / CAST(n_total AS DOUBLE)
                AS token_share
            FROM r CROSS JOIN tot
            GROUP BY 1, n_total
            ORDER BY octave"""))

  /** Two-NN ratios over the bounded sample (the n137 sampling
    * contract); the Pareto-MLE intrinsic dimension needs `ln`, so the
    * estimator lives in EmbeddingGeometrySpec and the CARD stays
    * exact-hash (selections + per-row IEEE).
    */
  private val twonn = Q(
    "n147_twonn_ratios",
    "Two-NN intrinsic-dimension evidence: per sample vector (vec_id < 64) the 1st/2nd NN distances and ratio mu",
    (s, dir) => Geometry
      .twoNnRatios(Tables(s, dir).embeddings, sampleMaxId = 64L)
      .orderBy("vec_id"),
    Some("""WITH s AS (
              SELECT vec_id, embedding FROM embeddings WHERE vec_id < 64),
            pr AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_reduce(list_transform(
                    list_zip(a.embedding, b.embedding),
                    x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
                  (acc, x) -> acc + x) AS sq
              FROM s a JOIN s b ON a.vec_id <> b.vec_id),
            rk AS (
              SELECT id_a, sq,
                row_number() OVER (PARTITION BY id_a
                  ORDER BY sq, id_b) AS rn
              FROM pr)
            SELECT id_a AS vec_id,
              MIN(CASE WHEN rn = 1 THEN sqrt(sq) END) AS d_nn1,
              MIN(CASE WHEN rn = 2 THEN sqrt(sq) END) AS d_nn2,
              CASE WHEN MIN(CASE WHEN rn = 1 THEN sqrt(sq) END) > 0.0
                THEN MIN(CASE WHEN rn = 2 THEN sqrt(sq) END)
                   / MIN(CASE WHEN rn = 1 THEN sqrt(sq) END) END AS mu
            FROM rk WHERE rn <= 2
            GROUP BY id_a
            ORDER BY vec_id"""))

  /** Best-of-k uplift per prompt group — rides the n81 reward
    * trajectory and the n140 grouping.
    */
  private val bestOfK = Q(
    "n148_best_of_k_uplift",
    "best-of-k reward uplift per 8-candidate prompt group (k in {1,2,4}): top-k mean vs group mean",
    (s, dir) => Preference
      .bestOfKUplift(Tables(s, dir).documents, groupSize = 8,
        ks = Seq(1, 2, 4), iters = 3)
      .orderBy("group_id", "k"),
    Some(s"""${NorthStar6.btCtes},
            ${NorthStar6.btScoreCte},
            bok AS (
              SELECT doc_id // 8 AS group_id, doc_id, score,
                row_number() OVER w AS rn,
                CAST(COUNT(*) OVER w2 AS BIGINT) AS n_group,
                ${Sql.oSum12Over("score", "w2")}
                  / COUNT(*) OVER w2 AS group_mean
              FROM sc
              WINDOW w AS (PARTITION BY doc_id // 8
                             ORDER BY score DESC, doc_id),
                     w2 AS (PARTITION BY doc_id // 8)),
            bokk(k) AS (VALUES (1), (2), (4)),
            boksel AS (
              SELECT group_id, k, n_group, group_mean,
                ${Sql.oSum12("CASE WHEN rn <= k THEN score END")}
                  AS top_sum,
                CAST(SUM(CASE WHEN rn <= k THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_top
              FROM bokk CROSS JOIN bok
              GROUP BY group_id, k, n_group, group_mean)
            SELECT group_id, CAST(k AS INT) AS k, n_group, n_top,
              group_mean,
              top_sum / n_top AS top_k_mean,
              top_sum / n_top - group_mean AS uplift
            FROM boksel ORDER BY group_id, k"""))

  /** Cross-doc trigram novelty — the oracle counts STRING shingles,
    * the operator 64-bit hashes (the n02/n03 collision-risk
    * precedent).
    */
  private val novelty = Q(
    "n149_ngram_novelty",
    "cross-doc trigram novelty per document: distinct shingles, corpus-unique shingles, novelty ratio",
    (s, dir) => Dedup
      .ngramNovelty(Tables(s, dir).documents, 3)
      .orderBy("doc_id"),
    Some("""WITH tok AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                     ELSE list_transform(range(len(ts) - 2),
                            i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])
                END) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ts
                    FROM documents)),
            ex AS (
              SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
                unnest(sh) AS s1
              FROM tok),
            dft AS (SELECT s1, COUNT(*) AS df FROM ex GROUP BY s1)
            SELECT doc_id, n_shingles,
              CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_novel,
              CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(n_shingles AS DOUBLE) AS novelty
            FROM ex JOIN dft USING (s1)
            GROUP BY doc_id, n_shingles
            ORDER BY doc_id"""))

  /** Ranking preservation under the n137 projection — recall@5 of
    * exact neighbors in the projected space, per sample vector.
    */
  private val jlRecall = {
    val kNn = 5
    val kProj = 16
    Q(
      "n150_jl_neighbor_recall",
      "JL 64->16 neighbor recall@5 per sample vector (vec_id < 64): do exact top-5 neighbors survive projection?",
      (s, dir) => Geometry
        .jlNeighborRecall(Tables(s, dir).embeddings, sampleMaxId = 64L,
          kNn = kNn, kProj = kProj, seed = 7L, dim = 64)
        .orderBy("vec_id"),
      Some(s"""WITH planes(plane_id, pv) AS (
              VALUES ${NorthStar10.hyperplaneRowsSql(kProj, 64, 7L)}),
            s AS (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < 64),
            pj AS (
              SELECT vec_id, list(dot ORDER BY plane_id) AS proj
              FROM (
                SELECT s.vec_id, p.plane_id,
                  list_reduce(list_transform(list_zip(s.embedding, p.pv),
                      x -> CAST(x[1] AS DOUBLE) * x[2]),
                    (acc, x) -> acc + x) * ${NorthStar10.jlScaleSql(kProj)}
                    AS dot
                FROM s CROSS JOIN planes p)
              GROUP BY vec_id),
            pr AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_reduce(list_transform(
                    list_zip(a.embedding, b.embedding),
                    x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
                  (acc, x) -> acc + x) AS d2_orig,
                list_reduce(list_transform(list_zip(pa.proj, pb.proj),
                    x -> (x[1] - x[2]) * (x[1] - x[2])),
                  (acc, x) -> acc + x) AS d2_proj
              FROM s a JOIN s b ON a.vec_id <> b.vec_id
              JOIN pj pa ON pa.vec_id = a.vec_id
              JOIN pj pb ON pb.vec_id = b.vec_id),
            rk AS (
              SELECT id_a, id_b,
                row_number() OVER (PARTITION BY id_a
                  ORDER BY d2_orig, id_b) AS r_orig,
                row_number() OVER (PARTITION BY id_a
                  ORDER BY d2_proj, id_b) AS r_proj
              FROM pr)
            SELECT id_a AS vec_id,
              CAST(SUM(CASE WHEN r_orig <= $kNn AND r_proj <= $kNn
                THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
              CAST(SUM(CASE WHEN r_orig <= $kNn AND r_proj <= $kNn
                THEN 1 ELSE 0 END) AS DOUBLE) / CAST($kNn AS DOUBLE)
                AS recall_at_$kNn
            FROM rk GROUP BY id_a ORDER BY vec_id"""))
  }

  /** The sampled-dashboard audit: every-7th systematic sample's mean
    * vs the true per-source mean of the n08 punctuation metric.
    */
  private val sampleAudit = Q(
    "n151_sampled_mean_estimate",
    "sampling-bias audit per source: every-7th systematic-sample mean of the punct metric vs the true mean",
    (s, dir) => graft.operators.Sampling
      .sampledMeanEstimate(Tables(s, dir).documents, k = 7)
      .orderBy("source"),
    Some(s"""WITH b AS (
              SELECT source, doc_id,
                (length(text) - length(regexp_replace(text,
                    '[^a-zA-Z0-9 ]', '', 'g')))
                  / CAST(length(text) AS DOUBLE) AS metric
              FROM documents),
            tr AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                ${Sql.oSum12("metric")} / COUNT(*) AS true_mean
              FROM b GROUP BY source),
            sm AS (
              SELECT source, metric FROM (
                SELECT source, metric,
                  row_number() OVER (PARTITION BY source
                    ORDER BY doc_id) AS rk
                FROM b)
              WHERE (rk - 1) % 7 = 0),
            es AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                ${Sql.oSum12("metric")} / COUNT(*) AS est_mean
              FROM sm GROUP BY source)
            SELECT source, n_docs, n_sampled, true_mean, est_mean,
              est_mean - true_mean AS err
            FROM tr JOIN es USING (source)
            ORDER BY source"""))

  /** Strict-order funnel over the events stream's view → click →
    * purchase journey — the batch report face of the s06/s10 streaming
    * funnel joins.
    */
  /** The n152 oracle, shared verbatim with the s45 streaming funnel
    * face (the s37/s39 shared-report-half rule).
    */
  private[queries] lazy val funnelOracleSql: String =
    """WITH u AS (
              SELECT user_id,
                list(ts) FILTER (WHERE event_type = 'view') AS l0,
                list(ts) FILTER (WHERE event_type = 'click') AS l1,
                list(ts) FILTER (WHERE event_type = 'purchase') AS l2
              FROM events GROUP BY user_id),
            s0 AS (SELECT user_id, l1, l2, list_min(l0) AS t0 FROM u),
            s1 AS (SELECT user_id, l2, t0,
                     list_min(list_filter(l1, x -> x > t0)) AS t1
                   FROM s0),
            s2 AS (SELECT user_id, t0, t1,
                     list_min(list_filter(l2, x -> x > t1)) AS t2
                   FROM s1),
            w AS (SELECT
                CAST(COALESCE(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS n1,
                CAST(COALESCE(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS n2,
                CAST(COALESCE(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS n3
              FROM s2)
            SELECT 1 AS step_idx, 'view' AS step, n1 AS n_users,
              CAST(NULL AS DOUBLE) AS conv_from_prev,
              CASE WHEN COALESCE(n1, 0) = 0 THEN NULL
                ELSE CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                END AS conv_from_first
            FROM w
            UNION ALL
            SELECT 2, 'click', n2,
              CASE WHEN COALESCE(n1, 0) = 0 THEN NULL
                ELSE CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END,
              CASE WHEN COALESCE(n1, 0) = 0 THEN NULL
                ELSE CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END FROM w
            UNION ALL
            SELECT 3, 'purchase', n3,
              CASE WHEN COALESCE(n2, 0) = 0 THEN NULL
                ELSE CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) END,
              CASE WHEN COALESCE(n1, 0) = 0 THEN NULL
                ELSE CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE) END FROM w
            ORDER BY step_idx"""

  /** Strict-order funnel over the events stream's view → click →
    * purchase journey — the batch report face of the s06/s10 streaming
    * funnel joins.
    */
  private val funnel = Q(
    "n152_event_funnel",
    "strict-order funnel view -> click -> purchase: users per step + step conversions (one events scan)",
    (s, dir) => graft.operators.Funnels
      .orderedFunnel(Tables(s, dir).events,
        Seq("view", "click", "purchase"))
      .orderBy("step_idx"),
    Some(funnelOracleSql))

  /** Cohort-retention matrix over first-seen-day cohorts. */
  private val cohorts = Q(
    "n153_cohort_retention",
    "cohort retention: users by first-seen day, active-user counts per (cohort_day, day_offset) cell",
    (s, dir) => graft.operators.Funnels
      .cohortRetention(Tables(s, dir).events)
      // dates hash as strings across engines (the q15 VARCHAR rule)
      .withColumn("cohort_day",
        date_format(col("cohort_day"), "yyyy-MM-dd"))
      .orderBy("cohort_day", "day_offset"),
    Some(cohortOracleSql))

  /** The n153 oracle, shared verbatim with the s47 streaming retention
    * face (the s37/s39 shared-report-half rule).
    */
  private[queries] lazy val cohortOracleSql: String =
    """WITH d AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
              FROM events),
            c AS (SELECT user_id, MIN(day) AS cohort_day
                  FROM d GROUP BY user_id),
            sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
                   FROM c GROUP BY cohort_day),
            m AS (
              SELECT cohort_day,
                CAST(date_diff('day', cohort_day, day) AS INT)
                  AS day_offset,
                CAST(COUNT(*) AS BIGINT) AS n_active
              FROM d JOIN c USING (user_id)
              GROUP BY 1, 2)
            SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
              day_offset, n_active, n_cohort,
              CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE)
                AS retention_rate
            FROM m JOIN sz USING (cohort_day)
            ORDER BY cohort_day, day_offset"""

  /** pass@k estimator over reward-thresholded candidates — the
    * standard eval-pipeline metric (Chen et al. 2021), exact: integer
    * counts into the k-term combinatorial product.
    */
  /** The n154 oracle, shared verbatim with the s44 streaming pass@k
    * monitor (the s41/s43 shared-report-half rule).
    */
  private[queries] lazy val passAtKOracleSql: String =
    s"""${NorthStar6.btCtes},
            ${NorthStar6.btScoreCte},
            nall AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM sc),
            rmed AS (
              SELECT score,
                row_number() OVER (ORDER BY score, doc_id) AS rn
              FROM sc),
            th AS (
              SELECT score AS thr FROM rmed, nall
              WHERE rn = (n_all + 1) // 2),
            g AS (
              SELECT doc_id // 8 AS group_id,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN score >= thr THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
              FROM sc CROSS JOIN th GROUP BY 1)
            SELECT group_id, n, c,
              CASE WHEN 1 <= n THEN CAST(1 AS DOUBLE) -
                list_reduce(list_transform(range(1),
                  i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
                  (a, x) -> a * x) END AS pass_at_1,
              CASE WHEN 2 <= n THEN CAST(1 AS DOUBLE) -
                list_reduce(list_transform(range(2),
                  i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
                  (a, x) -> a * x) END AS pass_at_2,
              CASE WHEN 4 <= n THEN CAST(1 AS DOUBLE) -
                list_reduce(list_transform(range(4),
                  i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
                  (a, x) -> a * x) END AS pass_at_4
            FROM g ORDER BY group_id"""

  /** pass@k estimator over reward-thresholded candidates — the
    * standard eval-pipeline metric (Chen et al. 2021), exact: integer
    * counts into the k-term combinatorial product.
    */
  private val passk = Q(
    "n154_pass_at_k",
    "unbiased pass@k per 8-candidate prompt group (k in {1,2,4}); correct = trained-reward score >= corpus median",
    (s, dir) => Preference
      .passAtK(Tables(s, dir).documents, groupSize = 8,
        ks = Seq(1, 2, 4), iters = 3)
      .orderBy("group_id"),
    Some(passAtKOracleSql))

  /** Confident-learning label-noise joint estimate over the weak
    * source labels (the n68 classifier auditing its own supervision).
    */
  private val labelNoise = Q(
    "n155_label_noise_cells",
    "confident-learning label-noise cells: (given label x confident prediction) joint counts over class-mean-confidence thresholds",
    (s, dir) => QualityModel
      .labelNoiseCells(Tables(s, dir).documents,
        positiveSources = Seq("src0", "src1", "src2", "src3", "src4"),
        iters = 3)
      .orderBy("label", "y_hat"),
    Some(s"""${NorthStar4.qcCtes},
            sc AS (
              SELECT doc_id, y,
                0.5 + (0.5 * m) / (1.0 + abs(m)) AS score
              FROM m4),
            th AS (SELECT
                ${Sql.oSum12("CASE WHEN y = 1.0 THEN score END")}
                  / SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS t1,
                ${Sql.oSum12("CASE WHEN y = 0.0 THEN 1.0 - score END")}
                  / SUM(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS t0
              FROM sc),
            lcnt AS (
              SELECT CAST(y AS INT) AS label,
                CAST(COUNT(*) AS BIGINT) AS n_label
              FROM sc GROUP BY 1),
            cells AS (
              SELECT CAST(y AS INT) AS label,
                CASE
                  WHEN score >= t1 AND (1.0 - score) >= t0 THEN
                    CASE WHEN score - t1 >= (1.0 - score) - t0
                      THEN 1 ELSE 0 END
                  WHEN score >= t1 THEN 1
                  WHEN (1.0 - score) >= t0 THEN 0
                END AS y_hat
              FROM sc CROSS JOIN th)
            SELECT label, y_hat, CAST(COUNT(*) AS BIGINT) AS n, n_label,
              CAST(COUNT(*) AS DOUBLE) / CAST(n_label AS DOUBLE)
                AS frac_of_label,
              (label = y_hat) AS is_clean
            FROM cells JOIN lcnt USING (label)
            WHERE y_hat IS NOT NULL
            GROUP BY label, y_hat, n_label
            ORDER BY label, y_hat"""))

  /** Int8 scalar-quantization fidelity card over the embedding corpus. */
  private val int8Quant = Q(
    "n156_int8_quant_card",
    "int8 scalar-quantization card per dimension: range, scale, worst and mean absolute reconstruction error",
    (s, dir) => graft.operators.Geometry
      .int8QuantizationCard(Tables(s, dir).embeddings)
      .orderBy("dim"),
    Some(s"""WITH x AS (
              SELECT vec_id,
                CAST(unnest(range(len(embedding))) AS INT) AS dim,
                CAST(unnest(embedding) AS DOUBLE) AS x
              FROM embeddings),
            r AS (
              SELECT dim, MIN(x) AS mn, MAX(x) AS mx,
                (MAX(x) - MIN(x)) / 255.0 AS scale
              FROM x GROUP BY dim),
            e AS (
              SELECT x.dim, x.x, r.mn, r.mx, r.scale,
                CASE WHEN r.scale = 0.0 THEN 0.0
                  ELSE round((x.x - r.mn) / r.scale) END AS q
              FROM x JOIN r USING (dim))
            SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, mn, mx, scale,
              MAX(abs(x - (mn + q * scale))) AS max_abs_err,
              ${Sql.oSum12("abs(x - (mn + q * scale))")} / COUNT(*)
                AS mean_abs_err
            FROM e GROUP BY dim, mn, mx, scale
            ORDER BY dim"""))

  val all: Seq[Q] = Seq(conformal, zipf, twonn, bestOfK, novelty,
    jlRecall, sampleAudit, funnel, cohorts, passk, labelNoise, int8Quant)
}
