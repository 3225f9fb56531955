package graft.queries

import graft.Tables
import graft.operators.{Clustering, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-6 north-star operators: distribution-level data selection —
  * importance-based (DSIR), reweighting instead of removal (soft dedup),
  * temperature-flattened source mixing — plus the Gopher word-shape
  * gate. All integer-exact scoring (the no-`ln`/no-`pow` cross-engine
  * policy, see n42): ratios live in parts-per-million BIGINTs, never in
  * libm transcendentals.
  */
object NorthStar4 extends QueryGroup {

  /** The DSIR scoring chain as DuckDB CTEs (gram explode → smoothed ppm
    * importance ratios → BIGINT dot-product scores), ending with
    * `sc(doc_id, score_ppm)` and `n(n_docs)` — shared by the n59
    * selection oracle and the s19 streaming-gate oracle, which differ
    * only in the final selection rule.
    */
  private[queries] val dsirCtes: String =
    """WITH t AS (
              SELECT doc_id, lang = 'en' AS is_tgt,
                string_split(text, ' ') AS ts
              FROM documents),
            g AS (
              SELECT doc_id, is_tgt, unnest(list_concat(ts,
                CASE WHEN len(ts) < 2 THEN []
                     ELSE list_transform(range(len(ts) - 1),
                            i -> ts[i+1] || ' ' || ts[i+2]) END)) AS g
              FROM t),
            dg AS (
              SELECT doc_id, g, COUNT(*) AS c, bool_or(is_tgt) AS is_tgt
              FROM g GROUP BY doc_id, g),
            gs AS (
              SELECT g, CAST(SUM(c) AS BIGINT) AS raw_g,
                CAST(SUM(CASE WHEN is_tgt THEN c ELSE 0 END) AS BIGINT) AS tgt_g
              FROM dg GROUP BY g),
            tot AS (
              SELECT CAST(SUM(raw_g) AS BIGINT) AS n_raw,
                CAST(SUM(tgt_g) AS BIGINT) AS n_tgt,
                COUNT(*) AS v
              FROM gs),
            imp AS (
              SELECT g, (1000000 * (tgt_g + 1) * (n_raw + v))
                // ((raw_g + 1) * (n_tgt + v)) AS imp_ppm
              FROM gs, tot),
            sc AS (
              SELECT doc_id, CAST(SUM(c * imp_ppm) AS BIGINT) AS score_ppm
              FROM dg JOIN imp USING (g) GROUP BY doc_id),
            n AS (SELECT COUNT(*) AS n_docs FROM documents)"""

  /** DSIR importance selection with lang='en' as the target domain
    * sample. The oracle restates the whole chain — gram explode,
    * smoothed ppm importance ratios, BIGINT dot-product score, dense
    * rank — in exact integer arithmetic, so the hash compare covers the
    * scores themselves, not just the kept set.
    */
  private val dsir = Q(
    "n59_dsir_importance",
    "DSIR-style importance selection toward the lang='en' target slice",
    (s, dir) => Sampling
      .dsirSelect(Tables(s, dir).documents, col("lang") === "en", 0.25)
      .orderBy("doc_id"),
    Some(s"""$dsirCtes,
            r AS (
              SELECT doc_id, score_ppm,
                row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rank
              FROM sc)
            SELECT doc_id, score_ppm, rank,
              rank <= CEIL(0.25 * CAST(n_docs AS DOUBLE)) AS kept
            FROM r, n ORDER BY doc_id"""))

  /** Soft dedup: same CC closure as n22/n34 (the shared recursive CTE),
    * weights as exact integer division.
    */
  private val softWeight = Q(
    "n60_dedup_soft_weight",
    "keep every near-dup, downweighted to 1/cluster-size ppm",
    (s, dir) => Clustering
      .dupClustersSoftWeight(Tables(s, dir).documents, 3, 0.8)
      .orderBy("doc_id"),
    Some(s"""${NorthStar.ccCtes},
            asn AS (
              SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
            sized AS (
              SELECT doc_id, component,
                COUNT(*) OVER (PARTITION BY component) AS n_members
              FROM asn)
            SELECT doc_id, component, n_members,
              1000000 // n_members AS weight_ppm
            FROM sized ORDER BY doc_id"""))

  /** α=0.5 temperature mixture targeting 200 expected output documents:
    * at sf0.001 every source upsamples (~4×), at sf0.1 every source
    * thins (~4%) — both regimes of the per-mille machinery exercised by
    * the same constant across the driver's three SFs.
    */
  private val temperature = Q(
    "n61_temperature_mixture",
    "sqrt-temperature source mixture, systematic per-mille realization",
    (s, dir) => Sampling
      .temperatureMixture(Tables(s, dir).documents, 200L)
      .orderBy("doc_id", "copy_idx"),
    Some("""WITH c AS (
              SELECT source, COUNT(*) AS c_s FROM documents GROUP BY source),
            s AS (
              SELECT source, c_s,
                CAST(FLOOR(SQRT(CAST(c_s AS DOUBLE)) * 1000000.0) AS BIGINT) AS s_s
              FROM c),
            d AS (SELECT CAST(SUM(s_s) AS BIGINT) AS s_tot FROM s),
            r AS (
              SELECT source, (1000 * 200 * s_s) // (s_tot * c_s) AS per_mille
              FROM s, d),
            e AS (
              SELECT doc_id, dd.source, per_mille,
                per_mille // 1000 +
                  CASE WHEN doc_id % 1000 < per_mille % 1000
                       THEN 1 ELSE 0 END AS n
              FROM documents dd JOIN r ON dd.source = r.source)
            SELECT doc_id, source, per_mille, CAST(u AS BIGINT) AS copy_idx
            FROM (SELECT doc_id, source, per_mille, unnest(range(n)) AS u
                  FROM e WHERE n > 0)
            ORDER BY doc_id, copy_idx"""))

  /** Gopher word-shape rules; the alpha gate is the integer form
    * `5·n_alpha ≥ 4·n_words` in both engines.
    */
  private val gopher = Q(
    "n62_gopher_rules",
    "Gopher word-level quality rules (word count / mean length / alpha / stopwords)",
    (s, dir) => TextAnalysis
      .gopherQualityRules(Tables(s, dir).documents)
      .orderBy("doc_id"),
    Some("""WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS ts,
                length(replace(text, ' ', '')) AS sum_len
              FROM documents),
            m AS (
              SELECT doc_id,
                CAST(len(ts) AS INT) AS n_words,
                CAST(sum_len AS DOUBLE) / CAST(len(ts) AS INT) AS mean_word_len,
                CAST(len(list_filter(ts,
                  x -> regexp_matches(x, '[a-zA-Z]'))) AS INT) AS n_alpha,
                (CASE WHEN list_contains(ts, 'the') THEN 1 ELSE 0 END +
                 CASE WHEN list_contains(ts, 'a') THEN 1 ELSE 0 END +
                 CASE WHEN list_contains(ts, 'and') THEN 1 ELSE 0 END +
                 CASE WHEN list_contains(ts, 'of') THEN 1 ELSE 0 END +
                 CASE WHEN list_contains(ts, 'to') THEN 1 ELSE 0 END) AS n_stop_hits
              FROM t)
            SELECT doc_id, n_words, mean_word_len, n_alpha, n_stop_hits,
              n_words >= 10 AND n_words <= 100000 AS word_count_ok,
              mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS mean_len_ok,
              n_alpha * 5 >= n_words * 4 AS alpha_ok,
              n_stop_hits >= 2 AS stop_ok,
              (n_words >= 10 AND n_words <= 100000)
                AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                AND (n_alpha * 5 >= n_words * 4)
                AND (n_stop_hits >= 2) AS gopher_ok
            FROM m ORDER BY doc_id"""))

  /** The engine-portable SimHash (md5-bit signatures) — n04's pipeline
    * with the one non-replayable piece (xxhash64) swapped for a hash
    * every engine computes identically, which upgrades SimHash from the
    * registry's rows-only check to a full hash-matched oracle. Spark
    * and DuckDB both run: normalize → tokens → md5 hex digits (ascii
    * arithmetic) → 64 ±1 bit votes → 4×16-bit chunk blocking → exact
    * hamming verify.
    */
  private val simhashPortable = Q(
    "n63_dedup_simhash_portable",
    "SimHash near-dup pairs with an engine-portable md5-bit signature",
    (s, dir) => graft.operators.Dedup
      .simHashPairsPortable(Tables(s, dir).documents)
      .orderBy("id_a", "id_b"),
    Some("""WITH t AS (
              SELECT doc_id,
                string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                  ' ') AS ts
              FROM documents),
            h AS (
              SELECT doc_id,
                list_transform(ts, tk ->
                  list_transform(range(1, 17), i ->
                    CASE WHEN ascii(substr(md5(tk), CAST(i AS INT), 1)) >= 97
                         THEN ascii(substr(md5(tk), CAST(i AS INT), 1)) - 87
                         ELSE ascii(substr(md5(tk), CAST(i AS INT), 1)) - 48
                    END)) AS dg
              FROM t),
            sig AS (
              SELECT doc_id,
                list_transform(range(64), b -> CASE WHEN
                  list_sum(list_transform(dg, d -> CASE WHEN
                    (d[(b // 4) + 1]
                     // (CASE b % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                    WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
                    THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) AS sig
              FROM h),
            ck AS (
              SELECT doc_id, sig, c AS chunk_id,
                array_to_string(sig[(c*16+1):(c*16+16)], '') AS chunk
              FROM (SELECT doc_id, sig, unnest(range(4)) AS c FROM sig)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                a.sig AS sa, b.sig AS sb
              FROM ck a JOIN ck b ON a.chunk_id = b.chunk_id
                AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
            scored AS (
              SELECT id_a, id_b,
                CAST(list_sum(list_transform(list_zip(sa, sb),
                  x -> abs(x[1] - x[2]))) AS INT) AS dist
              FROM cand)
            SELECT id_a, id_b, dist FROM scored
            WHERE dist <= 3 ORDER BY id_a, id_b"""))

  /** Spearman with deterministic row_number ranks — exact integers up
    * to the single final division, so the per-source ρ hash-matches.
    */
  private val spearman = Q(
    "n64_quality_length_spearman",
    "per-source Spearman rank correlation: quality score vs doc length",
    (s, dir) => TextAnalysis
      .qualityLengthSpearman(Tables(s, dir).documents)
      .orderBy("source"),
    Some(s"""WITH q AS (
              SELECT doc_id, source, n_chars, ${NorthStar3.scoreSql} AS score
              FROM documents),
            r AS (
              SELECT source,
                row_number() OVER (PARTITION BY source
                  ORDER BY score DESC, doc_id) AS rs,
                row_number() OVER (PARTITION BY source
                  ORDER BY n_chars DESC, doc_id) AS rl
              FROM q)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM((rs - rl) * (rs - rl)) AS BIGINT) AS sum_d2,
              CASE WHEN COUNT(*) < 2 THEN NULL
                   ELSE 1.0 - CAST(6 * SUM((rs - rl) * (rs - rl)) AS DOUBLE)
                     / CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE)
              END AS rho
            FROM r GROUP BY source ORDER BY source"""))

  /** One BPE training round as DuckDB CTEs: pair counts over the
    * current vocab symbols, argmax with lexicographic tie-break, and
    * the two-pass merge rewrite (the operator's documented application
    * rule).
    */
  private[queries] def bpeRound(r: Int): String = {
    val prev = s"v${r - 1}"
    s"""p$r AS (
              SELECT ss[i+1] AS lhs, ss[i+2] AS rhs,
                CAST(SUM(c) AS BIGINT) AS pc
              FROM (SELECT c, ss, unnest(range(len(ss) - 1)) AS i
                    FROM (SELECT c,
                            list_filter(string_split(sym, '|'),
                              x -> x != '') AS ss
                          FROM $prev)
                    WHERE len(ss) >= 2)
              GROUP BY 1, 2),
            m$r AS (
              SELECT lhs, rhs, pc FROM p$r
              ORDER BY pc DESC, lhs, rhs LIMIT 1),
            v$r AS (
              SELECT c, replace(replace(sym,
                  '|' || lhs || '|' || rhs || '|', '|' || lhs || rhs || '|'),
                  '|' || lhs || '|' || rhs || '|', '|' || lhs || rhs || '|') AS sym
              FROM $prev, m$r)"""
  }

  /** BPE merge training, k = 3 rounds, fully unrolled in the oracle —
    * the same iterative-trainer replay pattern as the n30/n54 k-means
    * CTEs. Counts are integers and the argmax tie-break is total, so
    * every learned merge hash-matches.
    */
  private val bpeMerges = Q(
    "n65_bpe_train_merges",
    "top-3 BPE merges learned from the corpus word vocabulary",
    (s, dir) => graft.operators.Tokenizer
      .bpeTrainMerges(Tables(s, dir).documents, 3)
      .orderBy("round"),
    Some(s"""WITH v0 AS (
              SELECT COUNT(*) AS c,
                '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS sym
              FROM (SELECT unnest(string_split(text, ' ')) AS w
                    FROM documents)
              WHERE w NOT LIKE '%|%'
              GROUP BY w),
            ${bpeRound(1)},
            ${bpeRound(2)},
            ${bpeRound(3)}
            SELECT * FROM (
              SELECT 1 AS round, lhs, rhs, lhs || rhs AS merged,
                pc AS pair_count FROM m1
              UNION ALL SELECT 2, lhs, rhs, lhs || rhs, pc FROM m2
              UNION ALL SELECT 3, lhs, rhs, lhs || rhs, pc FROM m3)
            ORDER BY round"""))

  /** One application round: rewrite the DISTINCT-word symbol table with
    * round r's learned merge (same two-pass replace rule).
    */
  private[queries] def bpeApplyRound(r: Int): String =
    s"""w$r AS (
              SELECT w, replace(replace(sym,
                  '|' || lhs || '|' || rhs || '|', '|' || lhs || rhs || '|'),
                  '|' || lhs || '|' || rhs || '|', '|' || lhs || rhs || '|') AS sym
              FROM w${r - 1}, m$r)"""

  /** Train (the n65 chain) then apply: per-source symbols-per-word
    * under the learned segmentation — the distribution-shift fan-out
    * check. Exact integers plus one final division.
    */
  private val bpeStats = Q(
    "n66_bpe_segmentation_stats",
    "per-source symbols-per-word under the trained BPE segmentation",
    (s, dir) => graft.operators.Tokenizer
      .bpeSegmentationStats(Tables(s, dir).documents, 3)
      .orderBy("source"),
    Some(s"""WITH v0 AS (
              SELECT COUNT(*) AS c,
                '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS sym
              FROM (SELECT unnest(string_split(text, ' ')) AS w
                    FROM documents)
              WHERE w NOT LIKE '%|%'
              GROUP BY w),
            ${bpeRound(1)},
            ${bpeRound(2)},
            ${bpeRound(3)},
            w0 AS (
              SELECT DISTINCT w,
                '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS sym
              FROM (SELECT unnest(string_split(text, ' ')) AS w
                    FROM documents)
              WHERE w NOT LIKE '%|%'),
            ${bpeApplyRound(1)},
            ${bpeApplyRound(2)},
            ${bpeApplyRound(3)},
            ws AS (
              SELECT w, CAST(len(list_filter(string_split(sym, '|'),
                x -> x != '')) AS INT) AS n_sym
              FROM w3)
            SELECT source, COUNT(*) AS n_words,
              CAST(SUM(n_sym) AS BIGINT) AS n_symbols,
              CAST(SUM(n_sym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                AS symbols_per_word
            FROM (SELECT source, unnest(string_split(text, ' ')) AS w
                  FROM documents) cw
            JOIN ws USING (w)
            GROUP BY source ORDER BY source"""))

  /** Boundary-exact context manifest over n16's packing layout — the
    * chunk-side join-and-slice accounting a dataloader consumes (docs
    * spanning a boundary count in both neighbours; every context totals
    * exactly 512 tokens except the final partial one). All-integer
    * per-chunk stats; the oracle's partition-less window is DuckDB-side
    * only (the operator rides the GlobalOrder distributed prefix sum).
    */
  private val packing = Q(
    "n67_context_manifest",
    "boundary-exact 512-token context manifest (docs + exact token slices per context)",
    (s, dir) => graft.operators.Packing
      .contextManifest(Tables(s, dir).documents, 512L)
      .orderBy("chunk_id"),
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
            e AS (SELECT doc_id, s, s + n_tok AS e FROM o WHERE n_tok > 0),
            ch AS (
              SELECT doc_id, s, e,
                unnest(range(s // 512, (e - 1) // 512 + 1)) AS chunk_id
              FROM e)
            SELECT chunk_id, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc,
              MAX(doc_id) AS last_doc,
              CAST(SUM(LEAST(e, (chunk_id + 1) * 512)
                       - GREATEST(s, chunk_id * 512)) AS BIGINT) AS n_tokens
            FROM ch GROUP BY chunk_id ORDER BY chunk_id"""))

  /** One unrolled gradient-descent iteration of the n68 oracle: errors
    * under the current margins, per-bucket + bias gradients through the
    * double-VARCHAR-routed exact decimal sum ([[Sql.oSum12]] — the
    * input-side VARCHAR route is what keeps DuckDB's double→decimal
    * rounding identical to Spark's shortest-string cast), then the
    * updated weight/bias tables and the next margin CTE. `first` skips
    * the previous-weights join (the zero model needs no w0 table).
    */
  private def qcIter(i: Int, first: Boolean): String = {
    val wPrev = if (first) "0.0" else "w"
    val wFrom =
      if (first) s"g$i CROSS JOIN nd"
      else s"w${i - 1} JOIN g$i USING (b) CROSS JOIN nd"
    val bPrev = if (first) "0.0" else "(SELECT bias FROM b" + (i - 1) + ")"
    s"""e$i AS (
          SELECT doc_id, (0.5 + (0.5 * m) / (1.0 + abs(m))) - y AS err
          FROM m$i),
        g$i AS (
          SELECT b, ${Sql.oSum12("err / CAST(n AS DOUBLE)")} AS g
          FROM xy JOIN e$i USING (doc_id) GROUP BY b),
        gb$i AS (
          SELECT ${Sql.oSum12("err")} AS gb
          FROM e$i),
        w$i AS (SELECT b, $wPrev - 1.0 * (g / nd) AS w FROM $wFrom),
        b$i AS (SELECT $bPrev - 1.0 * (gb / nd) AS bias
                FROM gb$i CROSS JOIN nd),
        m${i + 1} AS (
          SELECT xy.doc_id, y,
            ${Sql.oSum12("w / CAST(n AS DOUBLE)")} + bias AS m
          FROM xy JOIN w$i USING (b) CROSS JOIN b$i
          GROUP BY xy.doc_id, y, bias)"""
  }

  /** The full n68 training replay as CTEs, ending with `m4(doc_id, y,
    * m)` — the margins under the 3-step model. Token-level throughout
    * (one row per token in `xy`), mirroring the operator's
    * streaming-legal single-aggregation scoring. Shared by the n68
    * batch oracle and the s21 streaming-gate oracle (the dsirCtes
    * pattern).
    */
  private[queries] val qcCtes: String =
    s"""WITH tk AS (
              SELECT doc_id,
                len(string_split(trim(regexp_replace(lower(text),
                  '\\s+', ' ', 'g')), ' ')) AS n,
                unnest(string_split(trim(regexp_replace(lower(text),
                  '\\s+', ' ', 'g')), ' ')) AS t
              FROM documents),
            lab AS (
              SELECT doc_id,
                CASE WHEN source IN ('src0','src1','src2','src3','src4')
                     THEN 1.0 ELSE 0.0 END AS y
              FROM documents),
            nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
            xy AS (
              SELECT tk.doc_id, n,
                ((CASE WHEN ascii(substr(md5(t), 1, 1)) >= 97
                       THEN ascii(substr(md5(t), 1, 1)) - 87
                       ELSE ascii(substr(md5(t), 1, 1)) - 48 END) % 4) * 16
                + (CASE WHEN ascii(substr(md5(t), 2, 1)) >= 97
                        THEN ascii(substr(md5(t), 2, 1)) - 87
                        ELSE ascii(substr(md5(t), 2, 1)) - 48 END) AS b,
                y
              FROM tk JOIN lab USING (doc_id)),
            m1 AS (SELECT DISTINCT doc_id, y, CAST(0.0 AS DOUBLE) AS m
                   FROM xy),
            ${qcIter(1, first = true)},
            ${qcIter(2, first = false)},
            ${qcIter(3, first = false)}"""

  /** Trained quality classifier: the full 3-step gradient-descent
    * trajectory replayed in DuckDB — portable md5 feature buckets,
    * fast-sigmoid (no exp), exact decimal aggregation — so the learned
    * scores themselves hash-match, not just a row count.
    */
  private val qualityClassifier = Q(
    "n68_quality_classifier",
    "trained quality classifier (hashed features + fast-sigmoid logistic GD), scores hash-exact",
    (s, dir) => graft.operators.QualityModel
      .trainedQualityScores(Tables(s, dir).documents,
        positiveSources = Seq("src0", "src1", "src2", "src3", "src4"),
        iters = 3)
      .orderBy("doc_id"),
    Some(s"""$qcCtes
            SELECT doc_id, CAST(y AS INT) AS label,
              0.5 + (0.5 * m) / (1.0 + abs(m)) AS score,
              CASE WHEN (0.5 + (0.5 * m) / (1.0 + abs(m))) >= 0.5
                   THEN 1 ELSE 0 END AS pred
            FROM m4 ORDER BY doc_id"""))

  /** CDC merge — the write side of n51's diff audit. The changeset
    * derives deterministically from the fixture (doc_id % 7 == 0 →
    * delete; else % 5 == 0 → upsert with " v2" appended; % 13 == 0 →
    * a brand-new id inserted at +1,000,000), so the oracle restates it
    * and the merged snapshot is checked ROW-LEVEL: id, provenance, and
    * the final text's fingerprint all hash-exact.
    */
  private val snapshotMerge = Q(
    "n69_snapshot_merge",
    "apply a CDC changeset (upsert/delete/insert) to a corpus snapshot, row-level provenance",
    (s, dir) => {
      import graft.functions.TextFunctions.fingerprint
      val docs = Tables(s, dir).documents
      val base = docs.select(col("doc_id"), col("text"))
      val changes = mergeChangeset(docs)
      graft.operators.Snapshot
        .applyChangeset(base, changes, idCol = "doc_id")
        .select(col("doc_id"), col("provenance"),
          fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },
    Some(mergeOracleSql))

  /** The merged-snapshot oracle shared by n69 (one-shot batch merge)
    * and s22 (three incremental streaming merges): the change ids are
    * disjoint across the stream's doc_id%3 arrival slices, so the
    * incremental application MUST converge to this same one-shot
    * relational result — that equality is s22's correctness statement.
    */
  // lazy: snapshotMerge's Q val captures this during object init,
  // before a plain later-declared val would have been assigned
  private[queries] lazy val mergeOracleSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
            ch AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op,
                CASE WHEN doc_id % 7 = 0 THEN NULL
                     ELSE text || ' v2' END AS text
              FROM documents WHERE doc_id % 7 = 0 OR doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 1000000, 'upsert', text || ' new'
              FROM documents WHERE doc_id % 13 = 0),
            j AS (
              SELECT b.doc_id AS bid, b.text AS btext,
                c.doc_id AS cid, c.op, c.text AS ctext
              FROM base b FULL JOIN ch c ON b.doc_id = c.doc_id)
            SELECT COALESCE(bid, cid) AS doc_id,
              CASE WHEN op IS NULL THEN 'kept'
                   WHEN bid IS NOT NULL THEN 'updated'
                   ELSE 'inserted' END AS provenance,
              substr(md5(trim(regexp_replace(lower(
                CASE WHEN op IS NOT NULL THEN ctext ELSE btext END),
                '\s+', ' ', 'g'))), 1, 16) AS fp
            FROM j
            WHERE op IS NULL OR op <> 'delete'
            ORDER BY doc_id"""

  /** The n69 changeset as a DataFrame — shared with s22, whose stream
    * replays exactly these rows in three doc_id%3 slices.
    */
  private[queries] def mergeChangeset(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") % 7 === 0 || col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("delete"))
          .otherwise(lit("upsert")).as("op"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(col("text"), lit(" v2"))).as("text"))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          lit("upsert").as("op"),
          concat(col("text"), lit(" new")).as("text")))

  val all: Seq[Q] = Seq(dsir, softWeight, temperature, gopher,
    simhashPortable, spearman, bpeMerges, bpeStats, packing,
    qualityClassifier, snapshotMerge)
}
