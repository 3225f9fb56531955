package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 continuation: index-quality evaluation — the acceptance
  * gates a production retrieval stack runs before swapping an
  * approximate index in for brute force. The ANN builders themselves
  * (n06 LSH, n12 IVF) are oracle-green; what no query measured until
  * now is how GOOD their rankings are, which is the number that
  * decides nProbe/numTables at 100 TB.
  */
object NorthStar7 extends QueryGroup {

  private val K = 10

  /** Recall@10 + reciprocal rank of the LSH and IVF indexes against
    * brute-force ground truth, per query vector and method — MRR/mean
    * recall are one trivial avg() away, but the per-query rows are the
    * actionable artifact (they name the vectors an index config fails
    * on). Evaluation joins touch only the Q·k top-k lists; ground
    * truth is the one corpus pass the metric fundamentally needs,
    * taken on a small query sample exactly like n05.
    */
  private val annRecallEval = {
    val planes = Similarity.hyperplanes(8, 64, 42L)
    val planeRows = planes.zipWithIndex.map { case (p, j) =>
      s"($j, [${p.map(v => java.lang.Double.toString(v)).mkString(", ")}])"
    }.mkString(",\n")
    Q(
      "n101_ann_recall_eval",
      "ANN index acceptance: per-query recall@10 + reciprocal rank of LSH and IVF vs brute force",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
          .select(col("vec_id").as("id"), col("embedding"))
        val q = emb.filter(col("id") < 10)
        val exact = Similarity.bruteTopK(q, emb, K)
        def eval(method: String, approx: DataFrame) =
          Similarity.annRecall(exact, approx)
            .withColumn("method", lit(method))
        eval("lsh", Similarity.lshTopK(q, emb, K))
          .unionByName(eval("ivf", Similarity.ivfTopK(q, emb, K)))
          .select("method", "q_id", "n_hit", "recall", "rr")
          .orderBy("method", "q_id")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                          FROM embeddings WHERE vec_id < 10),
            ex_ranked AS (
              SELECT q_id, n_id,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY cos_sim DESC, n_id ASC) AS rank
              FROM (SELECT q_id, e.vec_id AS n_id,
                      ${Sql.oCos("q_emb", "e.embedding")} AS cos_sim
                    FROM embeddings e CROSS JOIN q
                    WHERE e.vec_id <> q_id)),
            exact AS (SELECT q_id, n_id, rank FROM ex_ranked
                      WHERE rank <= $K),
            planes(plane_id, pv) AS (VALUES $planeRows),
            buckets AS (
              SELECT vec_id, SUM(CASE WHEN dot >= 0
                THEN CAST(1 AS BIGINT) << plane_id ELSE 0 END) AS bucket
              FROM (SELECT e.vec_id, p.plane_id,
                      list_reduce(list_transform(list_zip(e.embedding, p.pv),
                          x -> CAST(x[1] AS DOUBLE) * x[2]),
                        (acc, x) -> acc + x) AS dot
                    FROM embeddings e CROSS JOIN planes p)
              GROUP BY vec_id),
            lsh_q AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb,
                        b.bucket
                      FROM embeddings e JOIN buckets b USING (vec_id)
                      WHERE e.vec_id < 10),
            lsh_ranked AS (
              SELECT q_id, n_id,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY cos_sim DESC, n_id ASC) AS rank
              FROM (SELECT lq.q_id, e.vec_id AS n_id,
                      ${Sql.oCos("lq.q_emb", "e.embedding")} AS cos_sim
                    FROM lsh_q lq
                    JOIN buckets cb ON lq.bucket = cb.bucket
                    JOIN embeddings e ON e.vec_id = cb.vec_id
                    WHERE e.vec_id <> lq.q_id)),
            cents AS (SELECT vec_id AS cent_id, embedding AS c_emb
                      FROM embeddings WHERE vec_id < 16),
            assign AS (
              SELECT n_id, cent_id FROM (
                SELECT n_id, cent_id,
                  row_number() OVER (PARTITION BY n_id
                    ORDER BY s DESC, cent_id ASC) AS rn
                FROM (SELECT e.vec_id AS n_id, c.cent_id,
                        ${Sql.oCos("e.embedding", "c.c_emb")} AS s
                      FROM embeddings e CROSS JOIN cents c))
              WHERE rn = 1),
            probes AS (
              SELECT q_id, cent_id FROM (
                SELECT q_id, cent_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY s DESC, cent_id ASC) AS rn
                FROM (SELECT e.vec_id AS q_id, c.cent_id,
                        ${Sql.oCos("e.embedding", "c.c_emb")} AS s
                      FROM embeddings e CROSS JOIN cents c
                      WHERE e.vec_id < 10))
              WHERE rn <= 2),
            ivf_ranked AS (
              SELECT q_id, n_id,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY cos_sim DESC, n_id ASC) AS rank
              FROM (SELECT q_id, n_id,
                      ${Sql.oCos("qe.embedding", "ne.embedding")} AS cos_sim
                    FROM (SELECT DISTINCT q_id, n_id
                          FROM probes JOIN assign USING (cent_id)
                          WHERE n_id <> q_id)
                    JOIN embeddings qe ON qe.vec_id = q_id
                    JOIN embeddings ne ON ne.vec_id = n_id)),
            approx AS (
              SELECT 'lsh' AS method, q_id, n_id, rank FROM lsh_ranked
              WHERE rank <= $K
              UNION ALL
              SELECT 'ivf' AS method, q_id, n_id, rank FROM ivf_ranked
              WHERE rank <= $K),
            scaffold AS (
              SELECT m.method, q.q_id
              FROM (SELECT 'lsh' AS method UNION ALL SELECT 'ivf') m
              CROSS JOIN (SELECT DISTINCT q_id FROM exact) q),
            nx AS (SELECT q_id, COUNT(*) AS n_exact FROM exact
                   GROUP BY q_id),
            hit AS (SELECT a.method, a.q_id, COUNT(*) AS n_hit
                    FROM approx a JOIN exact x
                      ON a.q_id = x.q_id AND a.n_id = x.n_id
                    GROUP BY a.method, a.q_id),
            true_nn AS (SELECT q_id, n_id FROM exact WHERE rank = 1),
            rrs AS (
              SELECT s.method, s.q_id,
                COALESCE(CAST(1 AS DOUBLE) / a.rank,
                         CAST(0 AS DOUBLE)) AS rr
              FROM scaffold s
              JOIN true_nn t ON t.q_id = s.q_id
              LEFT JOIN approx a ON a.method = s.method
                AND a.q_id = s.q_id AND a.n_id = t.n_id)
            SELECT s.method, s.q_id,
              COALESCE(h.n_hit, 0) AS n_hit,
              CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
                / CAST(n.n_exact AS DOUBLE) AS recall,
              r.rr
            FROM scaffold s
            JOIN nx n ON n.q_id = s.q_id
            LEFT JOIN hit h ON h.method = s.method AND h.q_id = s.q_id
            JOIN rrs r ON r.method = s.method AND r.q_id = s.q_id
            ORDER BY s.method, s.q_id"""))
  }

  /** Margin-based bitext mining over a parity split of the embedding
    * table (even vec_ids = side X, odd = side Y — disjoint ids, so
    * bruteTopK's self-pair guard never bites): the best Y match per
    * X query under the hub-demoting margin score. k = 4 neighborhood.
    */
  private val bitextMargin = Q(
    "n102_bitext_margin",
    "margin-based bitext mining: hub-penalized best cross-side match per query (Artetxe-Schwenk margin)",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
        .select(col("vec_id").as("id"), col("embedding"))
      val xSide = emb.filter(col("id") % 2 === 0)
      val ySide = emb.filter(col("id") % 2 === 1)
      Similarity.bitextMarginPairs(
        xSide.filter(col("id") < 20), xSide, ySide, 4)
        .orderBy("x_id")
    },
    Some(s"""WITH a AS (SELECT vec_id AS x_id, embedding AS x_emb
                        FROM embeddings WHERE vec_id % 2 = 0),
            b AS (SELECT vec_id AS y_id, embedding AS y_emb
                  FROM embeddings WHERE vec_id % 2 = 1),
            aq AS (SELECT * FROM a WHERE x_id < 20),
            xc AS (
              SELECT x_id, y_id, cos_sim,
                row_number() OVER (PARTITION BY x_id
                  ORDER BY cos_sim DESC, y_id ASC) AS rnk
              FROM (SELECT x_id, y_id,
                      ${Sql.oCos("x_emb", "y_emb")} AS cos_sim
                    FROM aq CROSS JOIN b)),
            xtop AS (SELECT x_id, y_id, cos_sim FROM xc WHERE rnk <= 4),
            xpen AS (SELECT x_id, ${Sql.oSum12("cos_sim")} AS sx
                     FROM xtop GROUP BY x_id),
            cand AS (SELECT DISTINCT y_id FROM xtop),
            yc AS (
              SELECT y_id, x_id, cos_sim,
                row_number() OVER (PARTITION BY y_id
                  ORDER BY cos_sim DESC, x_id ASC) AS rnk
              FROM (SELECT cb.y_id, a.x_id,
                      ${Sql.oCos("cb.y_emb", "a.x_emb")} AS cos_sim
                    FROM (SELECT b.y_id, b.y_emb
                          FROM b JOIN cand USING (y_id)) cb
                    CROSS JOIN a)),
            ypen AS (SELECT y_id, ${Sql.oSum12("cos_sim")} AS sy
                     FROM yc WHERE rnk <= 4 GROUP BY y_id),
            scored AS (
              SELECT t.x_id, t.y_id, t.cos_sim,
                t.cos_sim / (xp.sx / CAST(8 AS DOUBLE)
                           + yp.sy / CAST(8 AS DOUBLE)) AS margin
              FROM xtop t
              JOIN xpen xp ON xp.x_id = t.x_id
              JOIN ypen yp ON yp.y_id = t.y_id)
            SELECT x_id, y_id, cos_sim, margin FROM (
              SELECT x_id, y_id, cos_sim, margin,
                row_number() OVER (PARTITION BY x_id
                  ORDER BY margin DESC, y_id ASC) AS mr
              FROM scored)
            WHERE mr = 1 ORDER BY x_id"""))

  /** Eval-suite construction: Hamilton (largest-remainder)
    * apportionment of a 200-doc eval budget over (lang, source)
    * strata, realized as the md5-ordered sample manifest. All-integer
    * arithmetic — exact-hash oracle.
    */
  private val evalAllocation = Q(
    "n103_eval_allocation",
    "largest-remainder proportional eval-suite allocation over (lang, source) strata + md5-ordered manifest",
    (s, dir) => graft.operators.Sampling
      .evalSuiteAllocation(Tables(s, dir).documents, 200)
      .orderBy("lang", "source", "rk"),
    Some("""WITH s AS (SELECT lang, source, COUNT(*) AS n_docs
                       FROM documents GROUP BY 1, 2),
            t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM s),
            q AS (SELECT lang, source, n_docs,
                    (200 * n_docs) // n_total AS floor_alloc,
                    (200 * n_docs) % n_total AS rem
                  FROM s CROSS JOIN t),
            l AS (SELECT CAST(200 - SUM(floor_alloc) AS BIGINT) AS leftover FROM q),
            r AS (SELECT *, row_number() OVER
                    (ORDER BY rem DESC, lang ASC, source ASC) AS gr
                  FROM q),
            a AS (SELECT lang, source, n_docs,
                    floor_alloc + CASE WHEN gr <= leftover
                      THEN 1 ELSE 0 END AS alloc
                  FROM r CROSS JOIN l),
            m AS (SELECT d.lang, d.source, d.doc_id,
                    row_number() OVER (PARTITION BY d.lang, d.source
                      ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':eval')
                        ASC, d.doc_id ASC) AS rk
                  FROM documents d)
            SELECT a.lang, a.source, a.n_docs, a.alloc, m.doc_id,
              CAST(m.rk AS INT) AS rk
            FROM a JOIN m ON m.lang = a.lang AND m.source = a.source
            WHERE m.rk <= a.alloc
            ORDER BY a.lang, a.source, rk"""))

  /** Token-budget water-filling across sources: budget 15,000 — below
    * every SF's total supply (27k/27k/270k), so the rationing path is
    * always exercised; the degenerate budget ≥ supply path is pinned
    * by MixtureSpec instead.
    */
  private val waterfill = Q(
    "n104_token_waterfill",
    "integer water-filling of a 15k token budget across sources: common cap + largest-remainder bonus",
    (s, dir) => graft.operators.Mixture
      .tokenWaterfill(Tables(s, dir).documents, 15000L)
      .orderBy("source"),
    Some("""WITH sup AS (
              SELECT source, COUNT(*) AS supply
              FROM (SELECT source, unnest(string_split(text, ' '))
                    FROM documents)
              GROUP BY source),
            ord AS (SELECT source, supply,
                      row_number() OVER (ORDER BY supply, source) AS rk,
                      CAST(COALESCE(SUM(supply) OVER (ORDER BY supply, source
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS p_excl
                    FROM sup),
            d AS (SELECT COUNT(*) AS n_sources,
                    CAST(SUM(supply) AS BIGINT) AS total_supply FROM sup),
            seg AS (SELECT c_cand AS level, p_excl AS p_below, m AS m_at
                    FROM (SELECT o.rk, o.supply, o.p_excl,
                            d.n_sources - o.rk + 1 AS m,
                            (15000 - o.p_excl) // (d.n_sources - o.rk + 1)
                              AS c_cand
                          FROM ord o CROSS JOIN d
                          WHERE d.total_supply > 15000)
                    WHERE c_cand >= 0 AND c_cand < supply
                    ORDER BY rk LIMIT 1)
            SELECT source, supply,
              CASE WHEN total_supply <= 15000 THEN NULL
                   ELSE level END AS level,
              alloc, supply - alloc AS unspent_supply
            FROM (SELECT o.source, o.supply, d.total_supply, s.level,
                    CASE WHEN d.total_supply <= 15000 THEN o.supply
                         ELSE LEAST(o.supply, s.level) END
                    + CASE WHEN o.supply > s.level
                        AND o.rk - (d.n_sources - s.m_at) <=
                          (15000 - s.p_below - s.m_at * s.level)
                        THEN 1 ELSE 0 END AS alloc
                  FROM ord o CROSS JOIN d LEFT JOIN seg s ON TRUE)
            ORDER BY source"""))

  /** The Gopher-gate predicate over a frame exposing (text, ts,
    * sum_len) — the n98/n100 gate-B SQL, reused verbatim so there is
    * ONE replay definition of the gate.
    */
  private val gateBSql: String =
    """COALESCE(((len(ts) >= 10 AND len(ts) <= 100000)
       AND (CAST(sum_len AS DOUBLE) / CAST(len(ts) AS INT) >= 3.0
            AND CAST(sum_len AS DOUBLE) / CAST(len(ts) AS INT) <= 10.0)
       AND (len(list_filter(ts, x -> regexp_matches(x, '[a-zA-Z]'))) * 5
            >= len(ts) * 4)
       AND ((CASE WHEN list_contains(ts, 'the') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(ts, 'a') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(ts, 'and') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(ts, 'of') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(ts, 'to') THEN 1 ELSE 0 END)
            >= 2)), FALSE)"""

  /** Per-source keep-rate with Wilson 95% intervals — the
    * sampling-error-aware source health report.
    */
  private val gateHealth = Q(
    "n105_gate_health_wilson",
    "per-source Gopher-gate keep rate with Wilson 95% CI, flagged where the interval excludes the pooled rate",
    (s, dir) => graft.operators.TextAnalysis
      .sourceGateHealth(Tables(s, dir).documents)
      .orderBy("source"),
    Some(s"""WITH t AS (
              SELECT source, text, string_split(text, ' ') AS ts,
                length(replace(text, ' ', '')) AS sum_len
              FROM documents),
            per AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN $gateBSql THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_keep
              FROM t GROUP BY source),
            pool AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_tot,
                       CAST(SUM(n_keep) AS BIGINT) AS k_tot FROM per),
            base AS (
              SELECT source, n_docs, n_keep, n_tot, k_tot,
                CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p,
                CAST(n_docs AS DOUBLE) AS nd
              FROM per CROSS JOIN pool),
            wil AS (
              SELECT *,
                (p + 3.8416 / (2.0 * nd)) / (1.0 + 3.8416 / nd)
                  AS center,
                1.96 * sqrt(p * (1.0 - p) / nd
                    + 3.8416 / (4.0 * nd * nd))
                  / (1.0 + 3.8416 / nd) AS half
              FROM base)
            SELECT source, n_docs, n_keep, p AS keep_rate,
              CAST(k_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) AS pool_rate,
              center - half AS wilson_lo,
              center + half AS wilson_hi,
              (center + half
                 < CAST(k_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
              OR (center - half
                 > CAST(k_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                AS flagged
            FROM wil ORDER BY source"""))

  /** Chao1 vocabulary estimation per source. */
  private val vocabRichness = Q(
    "n106_vocab_chao1",
    "per-source observed vocab, Chao1 species estimate, Good-Turing coverage",
    (s, dir) => graft.operators.TextAnalysis
      .vocabRichness(Tables(s, dir).documents)
      .orderBy("source"),
    Some("""WITH tc AS (
              SELECT source, t, COUNT(*) AS c
              FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY source, t),
            agg AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                CAST(COUNT(*) AS BIGINT) AS vocab_obs,
                CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS f1,
                CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS f2
              FROM tc GROUP BY source)
            SELECT source, n_tokens, vocab_obs, f1, f2,
              CAST(vocab_obs AS DOUBLE)
                + CAST(f1 * (f1 - 1) AS DOUBLE)
                  / (2.0 * CAST(f2 + 1 AS DOUBLE)) AS chao1,
              1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                AS coverage
            FROM agg ORDER BY source"""))

  /** Reference 55.0 (above every type's mean rate, so the statistic
    * hovers near zero), threshold 500.0 — at sf0.001 two types never
    * alarm (the NULL first-alarm path), at sf0.1 thousands of rows
    * cross.
    *
    * The n107 oracle, shared with s31's streaming replay (one replay
    * definition of the statistic — the s26/sftGateOracleSql pattern).
    */
  private[queries] val cusumOracleSql: String =
    """WITH e AS (
              SELECT event_type, ts, event_id,
                CAST(floor(value * 1000000.0) AS BIGINT) AS x
              FROM events),
            p1 AS (
              SELECT event_type, ts, event_id,
                CAST(SUM(x - 55000000) OVER (PARTITION BY event_type
                  ORDER BY ts, event_id) AS BIGINT) AS p
              FROM e),
            p2 AS (
              SELECT event_type, ts, p,
                LEAST(0, CAST(MIN(p) OVER (PARTITION BY event_type
                  ORDER BY ts, event_id) AS BIGINT)) AS m
              FROM p1)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CASE WHEN p - m > 500000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarms,
              MIN(CASE WHEN p - m > 500000000 THEN ts END)
                AS first_alarm_ts,
              CAST(MAX(p - m) AS BIGINT) AS max_cusum_micro
            FROM p2 GROUP BY event_type ORDER BY event_type"""

  /** CUSUM change detection over the event stream, per event type. */
  private val cusum = Q(
    "n107_cusum_drift",
    "one-sided CUSUM drift alarms per event type (Page statistic via prefix-sum/prefix-min closed form)",
    (s, dir) => graft.operators.Drift
      .cusumDrift(Tables(s, dir).events, "event_type", "ts", "value",
        reference = 55.0, threshold = 500.0)
      .orderBy("event_type"),
    Some(cusumOracleSql))

  /** Term burstiness: variance-to-mean dispersion + Church-Gale
    * adaptation per term with df >= 25. All aggregates are exact
    * integer sums (zeros-included moments cost nothing because a zero
    * contributes zero to every sum); the three output doubles are
    * fixed-shape divisions replicated verbatim below.
    */
  private val burstiness = Q(
    "n108_term_burstiness",
    "per-term dispersion (variance/mean of per-doc counts, zeros included) and Church-Gale adaptation P(c>=2|c>=1), df>=25",
    (s, dir) => graft.operators.TextAnalysis
      .termBurstiness(Tables(s, dir).documents)
      .orderBy("t"),
    Some("""WITH pd AS (
              SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY t, doc_id),
            pt AS (
              SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
                CAST(SUM(c) AS BIGINT) AS cf,
                CAST(SUM(c * c) AS BIGINT) AS sq,
                CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS df2
              FROM pd GROUP BY t HAVING COUNT(*) >= 25),
            d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM documents)
            SELECT t, df, cf,
              CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_rate,
              (CAST(sq AS DOUBLE) / CAST(n_docs AS DOUBLE)
                 - (CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE))
                   * (CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE)))
                / (CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE))
                AS dispersion,
              CAST(df2 AS DOUBLE) / CAST(df AS DOUBLE) AS adaptation
            FROM pt CROSS JOIN d
            ORDER BY t"""))

  /** Fleiss' kappa across the three per-row gates (heuristic quality,
    * Gopher rules, PII-freedom) per source — the gate-panel coherence
    * report. gaSql/gbSql/piiHitSql are NorthStar6's single replay
    * definitions, reused so a gate change updates n98/n100/n109
    * together. All category counts are exact integers; the kappa
    * arithmetic is a fixed-shape expression tree over them.
    */
  /** The n109 oracle, shared with s32's streaming convergence replay
    * (one replay definition of the panel statistic — the
    * cusumOracleSql pattern).
    */
  private[queries] val fleissOracleSql: String =
    s"""WITH t AS (
              SELECT source, text, string_split(text, ' ') AS ts,
                length(replace(text, ' ', '')) AS sum_len
              FROM documents),
            p AS (
              SELECT source,
                CAST(CAST(${NorthStar6.gaSql} AS INT)
                   + CAST(${NorthStar6.gbSql} AS INT)
                   + CAST(COALESCE(NOT ${NorthStar6.piiHitSql}, FALSE)
                       AS INT) AS BIGINT) AS k
              FROM t),
            a AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(k) AS BIGINT) AS keep_votes,
                CAST(SUM(k * (k - 1) + (3 - k) * (2 - k)) AS BIGINT)
                  AS agree_pairs6
              FROM p GROUP BY source),
            m AS (
              SELECT source, n_docs, keep_votes, agree_pairs6,
                CAST(agree_pairs6 AS DOUBLE)
                  / (6.0 * CAST(n_docs AS DOUBLE)) AS pbar,
                CAST(keep_votes AS DOUBLE)
                  / (3.0 * CAST(n_docs AS DOUBLE)) AS p_keep
              FROM a),
            e AS (
              SELECT *, p_keep * p_keep
                + (1.0 - p_keep) * (1.0 - p_keep) AS pe
              FROM m)
            SELECT source, n_docs, keep_votes, agree_pairs6, pbar,
              p_keep, pe,
              CASE WHEN pe = 1.0 THEN NULL
                   ELSE (pbar - pe) / (1.0 - pe) END AS kappa
            FROM e ORDER BY source"""

  private val fleiss = Q(
    "n109_gate_fleiss",
    "Fleiss' kappa across the quality/Gopher/PII-free gate panel per source (m=3 binary raters)",
    (s, dir) => graft.operators.TextAnalysis
      .gateFleiss(Tables(s, dir).documents)
      .orderBy("source"),
    Some(fleissOracleSql))

  /** Pairwise source redundancy: term-vector cosine + vocab Jaccard.
    * Log-free by design (the TF-IDF rational-score precedent): every
    * aggregate is an exact integer sum, sqrt is correctly rounded in
    * both engines, so no DECIMAL routing is needed anywhere.
    */
  private val affinity = Q(
    "n110_source_affinity",
    "pairwise source term-vector cosine + vocabulary Jaccard — which sources are textually redundant",
    (s, dir) => graft.operators.TextAnalysis
      .sourceAffinity(Tables(s, dir).documents)
      .orderBy("src_a", "src_b"),
    Some("""WITH tc AS (
              SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY source, t),
            norms AS (
              SELECT source, CAST(SUM(c * c) AS BIGINT) AS sq,
                CAST(COUNT(*) AS BIGINT) AS v
              FROM tc GROUP BY source),
            pairs AS (
              SELECT a.source AS src_a, b.source AS src_b,
                CAST(SUM(a.c * b.c) AS BIGINT) AS dot,
                CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM tc a JOIN tc b
                ON a.t = b.t AND a.source < b.source
              GROUP BY 1, 2)
            SELECT src_a, src_b, n_shared, dot,
              na.v AS v_a, nb.v AS v_b,
              CAST(dot AS DOUBLE)
                / (sqrt(CAST(na.sq AS DOUBLE))
                   * sqrt(CAST(nb.sq AS DOUBLE))) AS cosine,
              CAST(n_shared AS DOUBLE)
                / CAST(na.v + nb.v - n_shared AS DOUBLE) AS jaccard
            FROM pairs
            JOIN norms na ON na.source = src_a
            JOIN norms nb ON nb.source = src_b
            ORDER BY src_a, src_b"""))

  /** The n111 oracle, shared with s33's streaming convergence replay
    * (the cusumOracleSql / fleissOracleSql pattern — one replay
    * definition of the statistic). Even/odd event split, the
    * n88/s29 convention.
    */
  private[queries] val ksOracleSql: String =
    """WITH b AS (
              SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS bin,
                CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
                CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
            c AS (
              SELECT event_type, bin,
                CAST(SUM(ca) OVER (PARTITION BY event_type
                  ORDER BY bin) AS BIGINT) AS cum_a,
                CAST(SUM(cb) OVER (PARTITION BY event_type
                  ORDER BY bin) AS BIGINT) AS cum_b,
                CAST(SUM(ca) OVER (PARTITION BY event_type)
                  AS BIGINT) AS n_a,
                CAST(SUM(cb) OVER (PARTITION BY event_type)
                  AS BIGINT) AS n_b
              FROM b),
            g AS (
              SELECT event_type, n_a, n_b,
                CASE WHEN n_a > 0 AND n_b > 0 THEN
                  abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                END AS gap
              FROM c),
            k AS (
              SELECT event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
                CAST(COUNT(*) AS BIGINT) AS n_bins,
                MAX(gap) AS ks_stat
              FROM g GROUP BY event_type)
            SELECT event_type, n_a, n_b, n_bins, ks_stat,
              CASE WHEN n_a > 0 AND n_b > 0 THEN
                1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
                  / CAST(n_a * n_b AS DOUBLE)) END AS crit_05,
              CASE WHEN n_a > 0 AND n_b > 0 THEN
                ks_stat > 1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
                  / CAST(n_a * n_b AS DOUBLE)) END AS drifted
            FROM k ORDER BY event_type"""

  /** Binned two-sample KS drift between the even/odd event slices. */
  private val ks = Q(
    "n111_ks_drift",
    "binned two-sample Kolmogorov-Smirnov drift per event type (max ECDF gap + alpha=0.05 critical value)",
    (s, dir) => graft.operators.Drift
      .ksDrift(Tables(s, dir).events, "event_type", "value",
        col("event_id") % 2 === 0)
      .orderBy("event_type"),
    Some(ksOracleSql))

  /** Cross-source duplicate leakage — the instance-level companion of
    * n110 (distribution-level affinity): a source pair with many
    * near-dup pairs is a mirror, and dropping one feed is the move.
    */
  private val leakage = Q(
    "n112_dup_source_leakage",
    "near-dup pair counts per source pair (3-gram Jaccard >= 0.8) — the mirror/feed-overlap detector",
    (s, dir) => graft.operators.Dedup
      .crossSourceLeakage(Tables(s, dir).documents, 3, 0.8)
      .orderBy("src_a", "src_b"),
    Some("""WITH tok AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                     ELSE list_transform(range(len(ts) - 2),
                            i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])
                END) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ts
                    FROM documents)),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
            pi AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(sh) AS n_sh FROM tok),
            jp AS (
              SELECT id_a, id_b,
                CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS j
              FROM pi
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter)
                >= 0.8),
            lab AS (
              SELECT LEAST(da.source, db.source) AS src_a,
                GREATEST(da.source, db.source) AS src_b, j
              FROM jp
              JOIN documents da ON da.doc_id = id_a
              JOIN documents db ON db.doc_id = id_b)
            SELECT src_a, src_b, src_a <> src_b AS cross_source,
              CAST(COUNT(*) AS BIGINT) AS n_pairs,
              MAX(j) AS max_jaccard
            FROM lab GROUP BY 1, 2, 3
            ORDER BY src_a, src_b"""))

  /** Per-source signature terms by rational add-one odds. */
  private val signature = Q(
    "n113_source_signature_terms",
    "top-10 per-source signature terms by add-one odds ratio (tf+1)/(tf_rest+1), tf >= 5",
    (s, dir) => graft.operators.TextAnalysis
      .sourceSignatureTerms(Tables(s, dir).documents)
      .orderBy("source", "rank"),
    Some("""WITH tc AS (
              SELECT source, t, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY source, t),
            tot AS (SELECT t, CAST(SUM(tf) AS BIGINT) AS tf_all
                    FROM tc GROUP BY t),
            sc AS (
              SELECT source, tc.t, tf, tf_all - tf AS tf_rest,
                CAST(tf + 1 AS DOUBLE)
                  / CAST(tf_all - tf + 1 AS DOUBLE) AS odds
              FROM tc JOIN tot ON tot.t = tc.t
              WHERE tf >= 5),
            r AS (
              SELECT source, t, tf, tf_rest, odds,
                row_number() OVER (PARTITION BY source
                  ORDER BY odds DESC, t) AS rk
              FROM sc)
            SELECT source, CAST(rk AS INT) AS rank, t, tf, tf_rest, odds
            FROM r WHERE rk <= 10
            ORDER BY source, rank"""))

  /** Per-source token-length order statistics — the sequence-packing
    * sizing card.
    */
  private val lengths = Q(
    "n114_length_percentiles",
    "per-source token-length order statistics (exact p50/p90/p99 at rank ceil(p*n/100), max, exact mean)",
    (s, dir) => graft.operators.TextAnalysis
      .lengthPercentiles(Tables(s, dir).documents)
      .orderBy("source"),
    Some("""WITH b AS (
              SELECT source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents
              WHERE len(string_split(text, ' ')) IS NOT NULL),
            r AS (
              SELECT source, n_tok,
                row_number() OVER (PARTITION BY source
                  ORDER BY n_tok) AS rn,
                COUNT(*) OVER (PARTITION BY source) AS n
              FROM b)
            SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
              CAST(MIN(CASE WHEN rn = GREATEST(1, (n * 50 + 99) // 100)
                THEN n_tok END) AS BIGINT) AS p50_tok,
              CAST(MIN(CASE WHEN rn = GREATEST(1, (n * 90 + 99) // 100)
                THEN n_tok END) AS BIGINT) AS p90_tok,
              CAST(MIN(CASE WHEN rn = GREATEST(1, (n * 99 + 99) // 100)
                THEN n_tok END) AS BIGINT) AS p99_tok,
              CAST(MAX(n_tok) AS BIGINT) AS max_tok,
              CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                AS mean_tok
            FROM r GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(annRecallEval, bitextMargin, evalAllocation,
    waterfill, gateHealth, vocabRichness, cusum, burstiness, fleiss,
    affinity, ks, leakage, signature, lengths)
}
