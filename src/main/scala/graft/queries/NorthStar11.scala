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
              CAST(SUM(CASE WHEN score >= threshold AND y = 1.0
                THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
                AS recall_test,
              CAST(SUM(CASE WHEN score >= threshold AND y = 1.0
                THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
                  AS DOUBLE) AS precision_test,
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

  val all: Seq[Q] = Seq(conformal, zipf, twonn, bestOfK, novelty)
}
