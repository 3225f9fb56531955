package graft.queries

import graft.Tables
import graft.operators.{LanguageModel, TextAnalysis}
import org.apache.spark.sql.functions.col

/** Round-4 LLM-data-pipeline additions (continues NorthStar's n-series):
  * byte-diversity quality gating and corpus-bigram LM fluency scoring.
  * Both follow the house FP policy (Q.scala): no libm in oracled output,
  * integer-exact folds, decimal-summed means.
  */
object NorthStar2 extends QueryGroup {
  import Sql._

  /** The oracle rebuilds the per-byte counts relationally (hex-pair
    * extraction over `encode(text)`, the n11 octet machinery) and
    * aggregates Σc² / max c / distinct count — all integers until the
    * final single divisions, so parity is exact with no ordered-FP fold.
    */
  private val byteDiversity = Q(
    "n39_byte_diversity",
    "byte-histogram diversity stats: Simpson index, effective alphabet",
    (s, dir) => TextAnalysis.byteDiversity(Tables(s, dir).documents)
      .orderBy("doc_id"),
    Some("""WITH b AS (
              SELECT doc_id, hex(encode(text)) AS h,
                octet_length(encode(text)) AS n
              FROM documents),
            e AS (
              SELECT doc_id, n,
                substr(h, CAST(2 * unnest(range(n)) + 1 AS INT), 2) AS hb
              FROM b),
            c AS (
              SELECT doc_id, ANY_VALUE(n) AS n, hb, COUNT(*) AS c
              FROM e GROUP BY doc_id, hb),
            st AS (
              SELECT doc_id, ANY_VALUE(n) AS n, COUNT(*) AS dk,
                CAST(SUM(c * c) AS BIGINT) AS sum_c2, MAX(c) AS max_c
              FROM c GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
              CAST(COALESCE(st.dk, 0) AS INT) AS distinct_bytes,
              CASE WHEN octet_length(encode(d.text)) = 0 THEN NULL
                   ELSE CAST(st.max_c AS DOUBLE) / st.n END AS top_byte_frac,
              CASE WHEN octet_length(encode(d.text)) = 0 THEN NULL
                   ELSE CAST(st.sum_c2 AS DOUBLE) / (st.n * st.n)
              END AS simpson,
              CASE WHEN octet_length(encode(d.text)) = 0 THEN NULL
                   ELSE CAST(st.n * st.n AS DOUBLE) / st.sum_c2
              END AS effective_bytes
            FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
            ORDER BY d.doc_id"""))

  /** The oracle retrains the identical bigram model relationally; the
    * HUGEINT sum of bigram counts is cast back to BIGINT (DuckDB
    * SUM(BIGINT) widens), and the mean goes through the shared
    * decimal-sum machinery.
    */
  private val bigramFluency = Q(
    "n40_bigram_fluency",
    "corpus bigram-LM mean likelihood (ppm) as a fluency gate",
    (s, dir) => LanguageModel.bigramFluency(Tables(s, dir).documents)
      .orderBy("doc_id"),
    Some(s"""WITH t AS (
               SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             bg AS (
               SELECT doc_id, ts[i + 1] AS w1, ts[i + 2] AS w2
               FROM (SELECT doc_id, ts, unnest(range(len(ts) - 1)) AS i
                     FROM t WHERE len(ts) >= 2)),
             c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
             c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
                    FROM c12 GROUP BY 1),
             v AS (SELECT COUNT(DISTINCT w) AS v
                   FROM (SELECT unnest(ts) AS w FROM t)),
             sc AS (
               SELECT doc_id,
                 CAST((c12.c12 + 1) * 1000000 AS DOUBLE) / (c1.c1 + v.v)
                   AS p_ppm
               FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
               CROSS JOIN v),
             pd AS (
               SELECT doc_id, COUNT(*) AS n_bigrams,
                 ${oAvg("p_ppm")} AS mean_bigram_ppm
               FROM sc GROUP BY doc_id)
             SELECT d.doc_id,
               COALESCE(pd.n_bigrams, 0) AS n_bigrams,
               pd.mean_bigram_ppm,
               pd.mean_bigram_ppm >= 1000 AS fluency_ok
             FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
             ORDER BY d.doc_id"""))

  /** Bloom filters have no false negatives, so the sketch-prefiltered
    * operator is row-for-row identical to exact containment — which is
    * why this sketch query gets a full hash-checked oracle where pure
    * sketches (n04 SimHash, q30 HLL) are rows-only. 4-gram shingles and
    * a doc_id%5 benchmark keep it disjoint from n18's fixture.
    */
  private val bloomDecontamination = Q(
    "n41_bloom_decontamination",
    "Bloom-sketch prefiltered benchmark decontamination (== exact result)",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      graft.operators.Decontamination
        .flagContaminatedBloom(docs, docs.filter(col("doc_id") % 5 === 0), 4, 0.25)
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(ts) < 4 THEN [array_to_string(ts, ' ')]
                     ELSE list_transform(range(len(ts) - 3),
                            i -> ts[i+1] || ' ' || ts[i+2] || ' ' ||
                                 ts[i+3] || ' ' || ts[i+4]) END) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
            corpus AS (SELECT doc_id, unnest(sh) AS s FROM tok),
            bench AS (SELECT doc_id AS bench_id, unnest(sh) AS s FROM tok
                      WHERE doc_id % 5 = 0),
            overlap AS (
              SELECT c.doc_id, b.bench_id, COUNT(*) AS inter
              FROM corpus c JOIN bench b ON c.s = b.s AND c.doc_id <> b.bench_id
              GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(sh) AS n_sh FROM tok)
            SELECT doc_id, bench_id, containment FROM (
              SELECT o.doc_id, o.bench_id,
                CAST(inter AS DOUBLE) / n_sh AS containment,
                row_number() OVER (PARTITION BY o.doc_id
                  ORDER BY CAST(inter AS DOUBLE) / n_sh DESC, bench_id) AS rk
              FROM overlap o JOIN sz ON o.doc_id = sz.doc_id
              WHERE CAST(inter AS DOUBLE) / n_sh >= 0.25)
            WHERE rk = 1 ORDER BY doc_id"""))

  private val datasetCard = Q(
    "n42_dataset_card",
    "per-source dataset card: volume, tokens, dup rate, language mix",
    (s, dir) => graft.operators.TextAnalysis
      .datasetCard(Tables(s, dir).documents)
      .orderBy("source"),
    Some("""WITH d AS (
              SELECT source, lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))),
                  1, 16) AS fp
              FROM documents)
            SELECT source, COUNT(*) AS n_docs,
              CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
              COUNT(*) - COUNT(DISTINCT fp) AS n_exact_dups,
              CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
              CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS mean_doc_tokens,
              CAST(COUNT(*) FILTER (WHERE lang = 'en') AS DOUBLE) / COUNT(*)
                AS en_frac
            FROM d GROUP BY source ORDER BY source"""))

  /** One PageRank iteration in DuckDB, mirroring the operator's FP
    * recipe: contribution = double division, neighbor sum through
    * DECIMAL(38,12) (VARCHAR-route back to double, see Sql.oSum),
    * damping update as (1.0 - 0.85)/n + 0.85*s with every literal cast
    * to DOUBLE so both engines run the identical IEEE ops.
    */
  private def prIter(prev: String, out: String): String =
    s"""$out AS (
          SELECT d.id, d.deg,
            (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n.n
              + CAST(0.85 AS DOUBLE) * s.s AS pr
          FROM deg d CROSS JOIN n
          JOIN (SELECT e.dst AS id,
                  CAST(CAST(SUM(CAST(p.pr / p.deg AS DECIMAL(38,12)))
                    AS VARCHAR) AS DOUBLE) AS s
                FROM e JOIN $prev p ON e.src = p.id GROUP BY e.dst) s
            ON d.id = s.id)"""

  /** PageRank over the 0.8-Jaccard near-dup graph (same pair set as
    * n22): which documents sit at the center of duplicate clusters.
    * The oracle unrolls the 3 iterations as CTEs (kmeans precedent).
    */
  private val pagerank = Q(
    "n43_pagerank",
    "deterministic PageRank over the near-dup pair graph, 3 iterations",
    (s, dir) => graft.operators.Clustering
      .pageRank(
        graft.operators.Dedup
          .jaccardPairs(Tables(s, dir).documents, 3, 0.8)
          .select("id_a", "id_b"),
        iters = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id"),
    Some(s"""WITH tok AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                     ELSE list_transform(range(len(ts) - 2),
                            i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]) END) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
            pair_inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(sh) AS n_sh FROM tok),
            p AS (
              SELECT id_a, id_b FROM pair_inter
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.8),
            e AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
            deg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY 1),
            n AS (SELECT COUNT(*) AS n FROM deg),
            pr0 AS (SELECT id, deg, CAST(1.0 AS DOUBLE) / n.n AS pr
                    FROM deg CROSS JOIN n),
            ${prIter("pr0", "pr1")},
            ${prIter("pr1", "pr2")},
            ${prIter("pr2", "pr3")}
            SELECT id AS doc_id, deg, pr AS pagerank
            FROM pr3 ORDER BY doc_id"""))

  /** The oracle replays the removal with gram STRINGS where the operator
    * uses 64-bit gram hashes (the n02/n18 collision-free precedent), and
    * rebuilds the kept tokens with an ORDER BY position list aggregate.
    */
  private val spanRemoval = Q(
    "n44_dup_span_removal",
    "drop tokens covered by cross-doc duplicated 5-grams, rebuild text",
    (s, dir) => graft.operators.Dedup
      .removeDupSpans(Tables(s, dir).documents, 5, 2)
      .orderBy("doc_id"),
    Some("""WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            pos AS (
              SELECT doc_id, i AS pos,
                array_to_string(ts[(i+1):(i+5)], ' ') AS g
              FROM (SELECT doc_id, ts, unnest(range(len(ts) - 4)) AS i
                    FROM t WHERE len(ts) >= 5)),
            dup AS (
              SELECT g FROM (
                SELECT g, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY g)
              WHERE df >= 2),
            cov AS (
              SELECT DISTINCT doc_id, pos + u AS cp
              FROM (SELECT doc_id, pos FROM pos JOIN dup USING (g)),
                unnest(range(5)) AS t(u)),
            tokpos AS (
              SELECT doc_id, i, ts[i+1] AS tok
              FROM (SELECT doc_id, ts, unnest(range(len(ts))) AS i FROM t)),
            kept AS (
              SELECT tp.doc_id, tp.i, tp.tok
              FROM tokpos tp LEFT JOIN cov
                ON tp.doc_id = cov.doc_id AND tp.i = cov.cp
              WHERE cov.cp IS NULL),
            rebuilt AS (
              SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
                array_to_string(list(tok ORDER BY i), ' ') AS cleaned_text
              FROM kept GROUP BY doc_id)
            SELECT t.doc_id,
              CAST(len(t.ts) AS INT) AS n_tokens,
              COALESCE(r.n_kept, 0) AS n_kept,
              COALESCE(r.cleaned_text, '') AS cleaned_text
            FROM t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
            ORDER BY t.doc_id"""))

  /** The oracle replays with shingle STRINGS where the operator uses the
    * scan-side 64-bit hashes (n02/n18 collision-free precedent). The
    * short-doc fallback (docs with < n tokens contribute their whole
    * text as one shingle) mirrors TextFunctions.wordShingles.
    */
  private val sourceOverlap = Q(
    "n45_source_overlap",
    "source-pair shared-shingle matrix (mix-design contamination input)",
    (s, dir) => TextAnalysis.sourceOverlap(Tables(s, dir).documents, 5)
      .orderBy("source_a", "source_b"),
    Some("""WITH t AS (
              SELECT source, string_split(text, ' ') AS ts FROM documents),
            sh AS (
              SELECT DISTINCT source, g FROM (
                SELECT source, unnest(
                  CASE WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')]
                       ELSE list_transform(range(len(ts) - 4),
                              i -> array_to_string(ts[(i+1):(i+5)], ' ')) END)
                  AS g
                FROM t)),
            tot AS (SELECT source, COUNT(*) AS tot FROM sh GROUP BY 1),
            pairs AS (
              SELECT a.source AS source_a, b.source AS source_b,
                COUNT(*) AS shared_shingles
              FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
              GROUP BY 1, 2)
            SELECT source_a, source_b, shared_shingles,
              ta.tot AS tot_a, tb.tot AS tot_b,
              CAST(shared_shingles AS DOUBLE) / LEAST(ta.tot, tb.tot)
                AS containment
            FROM pairs
            JOIN tot ta ON source_a = ta.source
            JOIN tot tb ON source_b = tb.source
            ORDER BY source_a, source_b"""))

  /** DuckDB replay of [[graft.operators.Similarity.pqTopK]]: one
    * unrolled k-means chain per subspace (NorthStar.kmeansCteList over
    * `list_slice` subvectors — identical init/tie/mean arithmetic to
    * the n30 oracle), then ADC = per-subspace query→centroid distances
    * joined through the corpus codes and added in subspace order
    * (matching the engine's left-to-right lookup sum).
    */
  private val pqAnn = {
    val (m, subDim, k, iters, topK) = (4, 16, 4, 2, 5)
    val chains = (0 until m).map { s =>
      NorthStar.kmeansCteList(k, iters,
        s"""list_transform(list_slice(embedding, ${s * subDim + 1},
              ${(s + 1) * subDim}), x -> CAST(x AS DOUBLE))""",
        s"_s$s")
    }.mkString(",\n")
    val last = s"c${iters - 1}" // codebook the final assignment round used
    val qds = (0 until m).map { s =>
      s"""qd$s AS (
            SELECT e.vec_id AS q_id, c.cid,
              list_reduce(list_transform(range(len(e.emb)),
                i -> (e.emb[i+1] - c.cent[i+1]) *
                     (e.emb[i+1] - c.cent[i+1])),
                (a, b) -> a + b) AS d
            FROM e_s$s e CROSS JOIN ${last}_s$s c
            WHERE e.vec_id < 10)"""
    }.mkString(",\n")
    Q(
      "n46_pq_ann",
      "product-quantization ANN: 4x16-dim sub-codebooks, ADC top-5",
      (s, dir) => {
        val emb = Tables(s, dir).embeddings
          .select(col("vec_id").as("id"), col("embedding"))
        graft.operators.Similarity
          .pqTopK(emb.filter(col("id") < 10), emb, topK)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $chains,
            $qds,
            scored AS (
              SELECT d0.q_id, n0.vec_id AS n_id,
                (((d0.d + d1.d) + d2.d) + d3.d) AS adc_dist
              FROM a${iters}_s0 n0
              JOIN a${iters}_s1 n1 ON n1.vec_id = n0.vec_id
              JOIN a${iters}_s2 n2 ON n2.vec_id = n0.vec_id
              JOIN a${iters}_s3 n3 ON n3.vec_id = n0.vec_id
              JOIN qd0 d0 ON d0.cid = n0.cid
              JOIN qd1 d1 ON d1.q_id = d0.q_id AND d1.cid = n1.cid
              JOIN qd2 d2 ON d2.q_id = d0.q_id AND d2.cid = n2.cid
              JOIN qd3 d3 ON d3.q_id = d0.q_id AND d3.cid = n3.cid
              WHERE n0.vec_id <> d0.q_id),
            ranked AS (
              SELECT q_id, n_id, adc_dist,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY adc_dist, n_id) AS rank
              FROM scored)
            SELECT q_id, n_id, adc_dist, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= $topK ORDER BY q_id, rank"""))
  }

  val all: Seq[Q] = Seq(byteDiversity, bigramFluency, bloomDecontamination,
    datasetCard, pagerank, spanRemoval, sourceOverlap, pqAnn)
}
