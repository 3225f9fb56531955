package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 continuation: the trained-artifact LIFECYCLE (model state
  * passing through a versioned on-disk store between the train job and
  * the apply job — the production half the in-process batch-train →
  * streaming-apply gates never exercised), plus the distribution-QA
  * statistics that round out the drift family (Hellinger mass overlap,
  * MAD robust bounds, per-source shape distance) and the dedup-index
  * acceptance eval (MinHash estimate vs exact Jaccard).
  */
object NorthStar8 extends QueryGroup {

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Versioned model artifact roundtrip — train → write v1 and v2 to a
    * partitioned parquet store → load the LATEST back with a FRESH
    * disk read (no lineage to the training frames) → apply. v1 is
    * trained on HALF the data, v2 on all of it, so selecting the wrong
    * version produces different bounds and a hash mismatch — the
    * version-selection logic is itself under the oracle. The result is
    * localCheckpoint-materialized before the temp store is deleted
    * (the returned plan must not dangle on a removed directory).
    */
  private val artifactLifecycle = Q(
    "n115_artifact_lifecycle",
    "versioned model artifact roundtrip: train v1/v2 winsorize bounds, write to disk, load LATEST, clip-report",
    (s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_n115_").toFile
      try {
        val art = new java.io.File(base, "bounds").getAbsolutePath
        val ev = Tables(s, dir).events
        def bounds(df: DataFrame) = graft.operators.Drift
          .winsorizeBounds(df, "event_type", "value")
          .select("event_type", "lo_bound", "hi_bound")
        graft.operators.ModelArtifacts.writeVersion(
          bounds(ev.filter(col("event_id") % 2 === 0)), art, 1)
        graft.operators.ModelArtifacts.writeVersion(bounds(ev), art, 2)
        val model = graft.operators.ModelArtifacts.loadLatest(s, art)
        ev.select(col("event_type"), col("value").as("v"))
          .join(broadcast(model), Seq("event_type"), "left")
          .groupBy(col("event_type"), col("version"),
            col("lo_bound"), col("hi_bound"))
          .agg(count(lit(1)).as("n_seen"),
            sum(when(col("v") < col("lo_bound"), 1L).otherwise(0L))
              .as("n_below"),
            sum(when(col("v") > col("hi_bound"), 1L).otherwise(0L))
              .as("n_above"))
          .orderBy("event_type")
          .localCheckpoint()
      } finally rmTree(base)
    },
    Some("""WITH r AS (
              SELECT event_type, value AS v,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            b AS (
              SELECT event_type,
                MIN(CASE WHEN rn = GREATEST(1, (n * 1 + 99) // 100)
                    THEN v END) AS lo_bound,
                MIN(CASE WHEN rn = (n * 99 + 99) // 100
                    THEN v END) AS hi_bound
              FROM r GROUP BY event_type, n)
            SELECT e.event_type, CAST(2 AS INT) AS version,
              lo_bound, hi_bound,
              CAST(COUNT(*) AS BIGINT) AS n_seen,
              CAST(SUM(CASE WHEN value < lo_bound THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
              CAST(SUM(CASE WHEN value > hi_bound THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above
            FROM events e JOIN b USING (event_type)
            GROUP BY e.event_type, lo_bound, hi_bound
            ORDER BY event_type"""))

  /** The n116 oracle, shared with s35's streaming convergence replay
    * (the ksOracleSql pattern — one replay definition of the
    * statistic). Even/odd event split, the n88/s29 convention.
    */
  private[queries] val hellingerOracleSql: String =
    s"""WITH b AS (
              SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS bin,
                CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
                CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
            a AS (
              SELECT event_type,
                CAST(SUM(ca) AS BIGINT) AS n_a,
                CAST(SUM(cb) AS BIGINT) AS n_b,
                CAST(COUNT(*) AS BIGINT) AS n_bins,
                ${Sql.oSum12("sqrt(CAST(ca * cb AS DOUBLE))")} AS bc_sum
              FROM b GROUP BY event_type)
            SELECT event_type, n_a, n_b, n_bins,
              CASE WHEN n_a > 0 AND n_b > 0 THEN
                bc_sum / sqrt(CAST(n_a * n_b AS DOUBLE)) END AS bc,
              CASE WHEN n_a > 0 AND n_b > 0 THEN
                1.0 - bc_sum / sqrt(CAST(n_a * n_b AS DOUBLE))
              END AS hellinger_sq
            FROM a ORDER BY event_type"""

  /** Binned squared Hellinger distance between the even/odd event
    * slices — the mass-overlap companion of n111's KS (worst single
    * gap) over the SAME ksBinCounts half.
    */
  private val hellinger = Q(
    "n116_hellinger_drift",
    "binned squared Hellinger drift per event type (1 - Bhattacharyya coefficient, decimal-routed)",
    (s, dir) => graft.operators.Drift
      .hellingerDrift(Tables(s, dir).events, "event_type", "value",
        col("event_id") % 2 === 0)
      .orderBy("event_type"),
    Some(hellingerOracleSql))

  /** Median ± 3·MAD robust outlier bounds per event type — the
    * heavy-tail-immune companion of n96's P1/P99 winsorize gate.
    */
  private val mad = Q(
    "n117_mad_bounds",
    "median +- 3*MAD robust outlier bounds per event type (rank-exact, tie-stable) with clip counts",
    (s, dir) => graft.operators.Drift
      .madBounds(Tables(s, dir).events, "event_type", "value")
      .orderBy("event_type"),
    Some("""WITH r AS (
              SELECT event_type, value AS v,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL),
            m AS (
              SELECT event_type, n,
                MIN(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
              FROM r GROUP BY event_type, n),
            rd AS (
              SELECT e.event_type, m.n, m.med, abs(e.value - m.med) AS d,
                row_number() OVER (PARTITION BY e.event_type
                  ORDER BY abs(e.value - m.med)) AS rn
              FROM events e JOIN m USING (event_type)
              WHERE e.value IS NOT NULL),
            md AS (
              SELECT event_type, n, med,
                MIN(CASE WHEN rn = (n + 1) // 2 THEN d END) AS mad
              FROM rd GROUP BY event_type, n, med),
            b AS (
              SELECT event_type, n, med, mad,
                med - 3.0 * mad AS lo_bound,
                med + 3.0 * mad AS hi_bound
              FROM md)
            SELECT e.event_type, n, med, mad, lo_bound, hi_bound,
              CAST(SUM(CASE WHEN value < lo_bound THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
              CAST(SUM(CASE WHEN value > hi_bound THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above
            FROM events e JOIN b USING (event_type)
            WHERE e.value IS NOT NULL
            GROUP BY e.event_type, n, med, mad, lo_bound, hi_bound
            ORDER BY event_type"""))

  /** Per-source token-length-distribution TVD against the corpus —
    * the shape-distance card.
    */
  private val lengthTvd = Q(
    "n118_source_length_tvd",
    "per-source total variation distance of the token-length-bin distribution vs the corpus (cross-multiplied exact integers)",
    (s, dir) => graft.operators.TextAnalysis
      .sourceLengthTvd(Tables(s, dir).documents)
      .orderBy("source"),
    Some("""WITH t AS (
              SELECT source,
                CAST(len(string_split(text, ' ')) AS BIGINT) // 10 AS bin
              FROM documents
              WHERE len(string_split(text, ' ')) IS NOT NULL),
            sb AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c_s
                   FROM t GROUP BY 1, 2),
            cb AS (SELECT bin, CAST(SUM(c_s) AS BIGINT) AS c_a
                   FROM sb GROUP BY bin),
            st AS (SELECT source, CAST(SUM(c_s) AS BIGINT) AS n_s
                   FROM sb GROUP BY source),
            ct AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a FROM cb),
            grid AS (
              SELECT st.source, cb.bin, st.n_s, cb.c_a, ct.n_a,
                COALESCE(sb.c_s, 0) AS c_s
              FROM st CROSS JOIN cb CROSS JOIN ct
              LEFT JOIN sb ON sb.source = st.source AND sb.bin = cb.bin)
            SELECT source, n_s AS n_docs,
              CAST(COUNT(*) AS BIGINT) AS n_bins,
              CAST(CAST(SUM(abs(
                    CAST(c_s AS DECIMAL(18,0)) * CAST(n_a AS DECIMAL(18,0))
                  - CAST(c_a AS DECIMAL(18,0)) * CAST(n_s AS DECIMAL(18,0))))
                  AS VARCHAR)
                AS DOUBLE)
                / (2.0 * CAST(n_s AS DOUBLE) * CAST(n_a AS DOUBLE)) AS tvd
            FROM grid GROUP BY source, n_s, n_a ORDER BY source"""))

  /** MinHash estimate vs exact Jaccard over the portable LSH
    * candidates — the dedup-index acceptance eval.
    */
  private val minhashEval = Q(
    "n119_minhash_error_eval",
    "MinHash index acceptance: per-candidate-pair Jaccard estimate (16 hashes) vs exact, with absolute error",
    (s, dir) => graft.operators.Dedup
      .minhashEstimateEval(Tables(s, dir).documents)
      .orderBy("id_a", "id_b"),
    Some("""WITH d AS (
              SELECT doc_id,
                string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                  ' ') AS ts
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                array_to_string(ts[(i+1):(i+3)], ' ') AS s
              FROM (SELECT doc_id, ts, unnest(range(len(ts) - 2)) AS i
                    FROM d WHERE len(ts) >= 3)),
            mh AS (
              SELECT doc_id, i,
                MIN(substr(md5(CAST(i AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM (SELECT doc_id, s, unnest(range(16)) AS i FROM sh)
              GROUP BY doc_id, i),
            bands AS (
              SELECT doc_id, i // 2 AS band_id,
                string_agg(mh, '-' ORDER BY i) AS band_key
              FROM mh GROUP BY doc_id, i // 2),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
            est AS (
              SELECT id_a, id_b,
                CAST(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_match
              FROM cand
              JOIN mh ma ON ma.doc_id = id_a
              JOIN mh mb ON mb.doc_id = id_b AND mb.i = ma.i
              GROUP BY id_a, id_b),
            ss AS (SELECT doc_id, list(s) AS ls FROM sh GROUP BY doc_id),
            ex AS (
              SELECT id_a, id_b,
                CAST(len(list_filter(sa.ls, x -> list_contains(sb.ls, x)))
                  AS BIGINT) AS n_inter,
                CAST(len(sa.ls) + len(sb.ls)
                  - len(list_filter(sa.ls, x -> list_contains(sb.ls, x)))
                  AS BIGINT) AS n_union
              FROM cand
              JOIN ss sa ON sa.doc_id = id_a
              JOIN ss sb ON sb.doc_id = id_b)
            SELECT e.id_a, e.id_b, n_match,
              CAST(n_match AS DOUBLE) / 16 AS est_jaccard,
              n_inter, n_union,
              CAST(n_inter AS DOUBLE) / n_union AS exact_jaccard,
              abs(CAST(n_match AS DOUBLE) / 16
                - CAST(n_inter AS DOUBLE) / n_union) AS abs_err
            FROM est e JOIN ex USING (id_a, id_b)
            ORDER BY id_a, id_b"""))

  val all: Seq[Q] = Seq(artifactLifecycle, hellinger, mad, lengthTvd,
    minhashEval)
}
