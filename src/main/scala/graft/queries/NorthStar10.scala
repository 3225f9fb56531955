package graft.queries

import graft.Tables
import graft.operators.Geometry
import org.apache.spark.sql.functions._

/** Round-14 family: embedding-space geometry and data-pruning cards —
  * per-class prototypes, prototypicality pruning (Sorscher et al.
  * 2022), a centroid-silhouette cluster-quality card, the full
  * covariance second-moment card (anisotropy / effective-rank health,
  * Ethayarajh 2019), int8-quantization fidelity, and a seeded
  * Johnson–Lindenstrauss distortion card. Every cross-row sum routes
  * through DECIMAL(38,12) ([[Sql.oSum12]]) and every per-row fold is
  * strict left-to-right double accumulation, so all five cards sit
  * under the exact-hash oracle.
  */
object NorthStar10 extends QueryGroup {

  /** Shared prototype CTEs: tall explode → decimal-exact per-(label,
    * dim) mean → `proto` list ordered by dim — the DuckDB replay of
    * [[graft.operators.Geometry.labelPrototypes]]. Shared by the n133 /
    * n135 oracles and s40's streaming-convergence oracle, so the three
    * replays can never drift apart.
    */
  private[queries] lazy val protoCtes: String =
    s"""WITH t AS (
              SELECT label, vec_id,
                CAST(unnest(range(len(embedding))) AS INT) AS dim,
                CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings),
            m AS (
              SELECT label, dim, ${Sql.oSum12("v")} / COUNT(*) AS c
              FROM t GROUP BY label, dim),
            p AS (
              SELECT label, list(c ORDER BY dim) AS proto
              FROM m GROUP BY label)"""

  /** The n133 oracle body (also s40's after its gate predicate): score
    * every vector against its own label's prototype.
    */
  private[queries] lazy val protoSimSql: String =
    s"""$protoCtes,
            sc AS (
              SELECT e.vec_id, e.label,
                ${Sql.oCos("e.embedding", "p.proto")} AS proto_sim
              FROM embeddings e JOIN p USING (label))"""

  /** Prototypicality pruning plan: keep the hardest 70% per label. The
    * per-label rank is ONE range-partitioned global index (no
    * single-task window); the oracle replays it as the classic
    * per-label row_number.
    */
  private val pruning = Q(
    "n133_prototype_pruning",
    "prototypicality pruning plan: cosine to own-label prototype, hardness rank (ascending sim), keep hardest 70% per label",
    (s, dir) => Geometry
      .prototypePruning(Tables(s, dir).embeddings, keepFraction = 0.7)
      .orderBy("label", "hardness_rank"),
    Some(s"""$protoSimSql
            SELECT vec_id, label, proto_sim,
              CAST(rk AS BIGINT) AS hardness_rank,
              CAST(n_label AS BIGINT) AS n_label,
              rk <= CAST(CEIL(n_label * 0.7) AS BIGINT) AS keep
            FROM (
              SELECT vec_id, label, proto_sim,
                row_number() OVER (PARTITION BY label
                  ORDER BY proto_sim, vec_id) AS rk,
                COUNT(*) OVER (PARTITION BY label) AS n_label
              FROM sc)
            ORDER BY label, hardness_rank"""))

  /** Covariance second-moment card in tall upper-triangle form —
    * D(D+1)/2 cells whatever the corpus size. The oracle replays the
    * per-row products and the scale-12 exact sums; the effective-rank /
    * PSD health checks ride EmbeddingGeometrySpec (eigenvalues are not
    * SQL-expressible), alongside the single-pass Aggregator parity pin
    * (the no-explode 100 TB path).
    */
  private val covariance = Q(
    "n134_embedding_covariance",
    "embedding covariance card: upper-triangle (dim_i, dim_j) population covariance from decimal-exact moment sums",
    (s, dir) => Geometry
      .covarianceMoments(Tables(s, dir).embeddings)
      .orderBy("dim_i", "dim_j"),
    Some(s"""WITH t AS (
              SELECT vec_id,
                CAST(unnest(range(len(embedding))) AS INT) AS dim,
                CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings),
            m AS (
              SELECT dim, ${Sql.oSum12("v")} / COUNT(*) AS mean
              FROM t GROUP BY dim),
            pr AS (
              SELECT a.dim AS dim_i, b.dim AS dim_j, a.v * b.v AS p
              FROM t a JOIN t b
                ON a.vec_id = b.vec_id AND a.dim <= b.dim),
            s AS (
              SELECT dim_i, dim_j, CAST(COUNT(*) AS BIGINT) AS n,
                ${Sql.oSum12("p")} AS sxy
              FROM pr GROUP BY dim_i, dim_j)
            SELECT s.dim_i, s.dim_j, s.n,
              mi.mean AS mean_i, mj.mean AS mean_j,
              sxy / n - mi.mean * mj.mean AS cov
            FROM s
            JOIN m mi ON s.dim_i = mi.dim
            JOIN m mj ON s.dim_j = mj.dim
            ORDER BY dim_i, dim_j"""))

  /** Centroid-silhouette cluster-quality card: per-label cohesion vs
    * separation against the nearest OTHER prototype, the silhouette
    * mean, and the misassignment count. The oracle replays the L-way
    * distance scoring relationally (cross join to the L-row prototype
    * table + min), matching the Spark side's broadcast-codebook fold.
    */
  private val silhouette = Q(
    "n135_centroid_silhouette",
    "centroid silhouette card: per-label cohesion, nearest-other separation, mean silhouette, misassignment count",
    (s, dir) => Geometry
      .centroidSilhouette(Tables(s, dir).embeddings)
      .orderBy("label"),
    Some(s"""$protoCtes,
            d AS (
              SELECT e.vec_id, e.label, p.label AS p_label,
                1.0 - ${Sql.oCos("e.embedding", "p.proto")} AS d
              FROM embeddings e CROSS JOIN p),
            own AS (
              SELECT vec_id, label, d AS d_own
              FROM d WHERE label = p_label),
            oth AS (
              SELECT vec_id, MIN(d) AS d_other
              FROM d WHERE label <> p_label GROUP BY vec_id),
            sc AS (
              SELECT o.vec_id, o.label, o.d_own, t.d_other,
                (t.d_other - o.d_own)
                  / GREATEST(o.d_own, t.d_other) AS sil
              FROM own o JOIN oth t USING (vec_id))
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
              ${Sql.oSum12("d_own")} / COUNT(*) AS mean_cohesion,
              ${Sql.oSum12("d_other")} / COUNT(*) AS mean_separation,
              ${Sql.oSum12("sil")} / COUNT(*) AS mean_silhouette,
              CAST(SUM(CASE WHEN d_other < d_own THEN 1 ELSE 0 END)
                AS BIGINT) AS n_misassigned
            FROM sc GROUP BY label ORDER BY label"""))

  /** Int8-quantization fidelity: what the n28 min/max scheme costs in
    * cosine, per label, with the worst vector pinned by argmin.
    */
  private val quantFidelity = Q(
    "n136_quantization_fidelity",
    "int8 quantization fidelity per label: mean/worst cosine(original, dequantized), count under 0.995",
    (s, dir) => Geometry
      .quantizationFidelity(Tables(s, dir).embeddings, minOk = 0.995)
      .orderBy("label"),
    Some(s"""WITH q AS (
              SELECT vec_id, label, embedding,
                CAST(list_min(embedding) AS DOUBLE) AS mn,
                CAST(list_max(embedding) AS DOUBLE) AS mx
              FROM embeddings),
            dq AS (
              SELECT vec_id, label,
                ${Sql.oCos("embedding", "deq")} AS fidelity
              FROM (
                SELECT vec_id, label, embedding,
                  CASE WHEN mx > mn THEN
                    list_transform(embedding, v ->
                      mn + floor((CAST(v AS DOUBLE) - mn) / (mx - mn)
                          * 255 + 0.5) / 255 * (mx - mn))
                  ELSE list_transform(embedding, v -> mn + 0.0)
                  END AS deq
                FROM q)),
            r AS (
              SELECT vec_id, label, fidelity,
                row_number() OVER (PARTITION BY label
                  ORDER BY fidelity, vec_id) AS rk
              FROM dq)
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
              ${Sql.oSum12("fidelity")} / COUNT(*) AS mean_fidelity,
              MIN(CASE WHEN rk = 1 THEN fidelity END) AS worst_fidelity,
              MIN(CASE WHEN rk = 1 THEN vec_id END) AS worst_vec,
              CAST(SUM(CASE WHEN fidelity < 0.995 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below
            FROM r GROUP BY label ORDER BY label"""))

  /** Seeded JL projection distortion card (64 → 16, scale 1/√16): the
    * planes are generated once at build time and embedded literally in
    * the SQL (the n06 pattern). Unlike n06 (where plane dots only pick
    * bucket signs), here the projected values ride the hash — and a
    * bare `0.123…` literal parses as DECIMAL in DuckDB, silently
    * re-rounding the plane constants. Each value therefore routes
    * through a quoted-string → DOUBLE cast (single correctly-rounded
    * parse — the [[Sql.oSum12]] VARCHAR lesson applied to literals).
    */
  /** VALUES rows for a seeded hyperplane matrix, each value routed
    * through the quoted-string → DOUBLE cast (a bare double literal
    * parses as DECIMAL in DuckDB and silently re-rounds). Shared by
    * the n137 distortion and n150 neighbor-recall oracles so the two
    * replays can never use different planes.
    */
  private[queries] def hyperplaneRowsSql(
      k: Int, dim: Int, seed: Long): String =
    graft.operators.Similarity.hyperplanes(k, dim, seed)
      .zipWithIndex.map { case (p, j) =>
        s"($j, [${p.map(v =>
          s"CAST('${java.lang.Double.toString(v)}' AS DOUBLE)")
          .mkString(", ")}])"
      }.mkString(",\n")

  /** The 1/√k projection scale as a quoted-string DOUBLE cast —
    * interpolated from k (r14 advice item), shared with n150.
    */
  private[queries] def jlScaleSql(k: Int): String =
    s"CAST('${java.lang.Double.toString(1.0 / math.sqrt(k))}' AS DOUBLE)"

  private val jl = {
    val k = 16
    val jlScale = jlScaleSql(k)
    val planeRows = hyperplaneRowsSql(k, 64, 7L)
    Q(
      "n137_jl_distortion",
      "Johnson-Lindenstrauss 64->16 projection distortion over the bounded pair sample (vec_id < 32)",
      (s, dir) => Geometry
        .jlDistortionPairs(Tables(s, dir).embeddings,
          sampleMaxId = 32L, k = k, seed = 7L, dim = 64)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH planes(plane_id, pv) AS (VALUES $planeRows),
            s AS (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < 32),
            pj AS (
              SELECT vec_id, list(dot ORDER BY plane_id) AS proj
              FROM (
                SELECT s.vec_id, p.plane_id,
                  list_reduce(list_transform(list_zip(s.embedding, p.pv),
                      x -> CAST(x[1] AS DOUBLE) * x[2]),
                    (acc, x) -> acc + x) * $jlScale AS dot
                FROM s CROSS JOIN planes p)
              GROUP BY vec_id),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_reduce(list_transform(
                    list_zip(a.embedding, b.embedding),
                    x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
                  (acc, x) -> acc + x) AS d2_orig,
                list_reduce(list_transform(list_zip(pa.proj, pb.proj),
                    x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
                  (acc, x) -> acc + x) AS d2_proj
              FROM s a
              JOIN s b ON a.vec_id < b.vec_id
              JOIN pj pa ON pa.vec_id = a.vec_id
              JOIN pj pb ON pb.vec_id = b.vec_id)
            SELECT id_a, id_b,
              sqrt(d2_orig) AS dist_orig,
              sqrt(d2_proj) AS dist_proj,
              CASE WHEN d2_orig > 0 THEN d2_proj / d2_orig END AS ratio
            FROM pairs ORDER BY id_a, id_b"""))
  }

  /** The n139 oracle, shared with s41's streaming convergence replay
    * (the packingOracleSql pattern — one replay definition).
    */
  private[queries] lazy val fertilityOracleSql: String =
    """WITH b AS (
              SELECT source, lang,
                CAST(length(text) AS BIGINT) AS chars,
                CAST(strlen(text) AS BIGINT) AS bytes,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
                CAST(len(regexp_extract_all(text,
                  '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe
              FROM documents),
            g AS (
              SELECT source, lang,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(chars) AS BIGINT) AS n_chars,
                CAST(SUM(bytes) AS BIGINT) AS n_bytes,
                CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
                CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens
              FROM b GROUP BY source, lang)
            SELECT source, lang, n_docs, n_chars, n_bytes, n_ws_tokens,
              n_bpe_tokens,
              CAST(n_bpe_tokens AS DOUBLE) * 100.0
                / CAST(n_chars AS DOUBLE) AS bpe_per_100_chars,
              CAST(n_bpe_tokens AS DOUBLE)
                / CAST(n_ws_tokens AS DOUBLE) AS fertility_vs_words,
              CAST(n_bytes AS DOUBLE)
                / CAST(n_bpe_tokens AS DOUBLE) AS bytes_per_token
            FROM g ORDER BY source, lang"""

  /** Rendezvous-vs-mod shard stability: the resize-cost card for a
    * growing dataloader fleet. Mod re-homes ~8/9 of the corpus on an
    * 8→9 resize; rendezvous (highest-random-weight) re-homes ~1/9 —
    * the argmax is a per-row fold over W md5 draws, so the whole card
    * is one scan + a one-row aggregate.
    */
  private val shardStab = Q(
    "n138_shard_stability",
    "shard-resize stability: fraction of docs moved 8->9 workers under rendezvous hashing vs doc_id MOD",
    (s, dir) => graft.operators.Packing
      .shardStability(Tables(s, dir).documents, fromShards = 8,
        toShards = 9),
    Some("""WITH d AS (SELECT doc_id FROM documents),
            sh AS (
              SELECT doc_id, s,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                  || ':shard:' || CAST(s AS VARCHAR)), 1, 8))
                  AS BIGINT) AS draw
              FROM d CROSS JOIN
                (SELECT CAST(unnest(range(9)) AS INT) AS s)),
            a8 AS (
              SELECT doc_id, s AS rdv_from FROM (
                SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                  ORDER BY draw DESC, s DESC) AS rn
                FROM sh WHERE s < 8) WHERE rn = 1),
            a9 AS (
              SELECT doc_id, s AS rdv_to FROM (
                SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                  ORDER BY draw DESC, s DESC) AS rn
                FROM sh) WHERE rn = 1),
            j AS (
              SELECT d.doc_id, rdv_from, rdv_to,
                CAST(d.doc_id % 8 AS INT) AS mod_from,
                CAST(d.doc_id % 9 AS INT) AS mod_to
              FROM d JOIN a8 USING (doc_id) JOIN a9 USING (doc_id))
            SELECT CAST(8 AS INT) AS from_shards,
              CAST(9 AS INT) AS to_shards,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN rdv_from <> rdv_to THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_rdv,
              CAST(SUM(CASE WHEN mod_from <> mod_to THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_mod,
              CAST(SUM(CASE WHEN rdv_from <> rdv_to THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS frac_rdv,
              CAST(SUM(CASE WHEN mod_from <> mod_to THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS frac_mod
            FROM j"""))

  /** Tokenizer fertility per (source, lang) — the token-budget
    * accounting beside n07's per-doc counts: exact BIGINT sums, ratios
    * divided after.
    */
  private val fertility = Q(
    "n139_tokenizer_fertility",
    "tokenizer fertility card per (source, lang): BPE-ish tokens per 100 chars, vs-word fertility, bytes per token",
    (s, dir) => graft.operators.TextAnalysis
      .tokenizerFertility(Tables(s, dir).documents)
      .orderBy("source", "lang"),
    Some(fertilityOracleSql))

  /** Group-relative advantage normalization (GRPO baseline): the
    * trained n81 reward scores, centered and scaled per synthetic
    * 8-candidate prompt group — the per-prompt baseline that replaces
    * a learned value model. μ and the second moment are DECIMAL(38,12)
    * window sums (order-free), σ and the division fixed-shape IEEE —
    * the whole card under the exact-hash oracle, training replay
    * included ([[NorthStar6.btCtes]] verbatim).
    */
  private val grpo = Q(
    "n140_group_advantage",
    "GRPO-style group-relative advantage: trained-reward scores centered/scaled per 8-candidate prompt group",
    (s, dir) => graft.operators.Preference
      .groupAdvantages(Tables(s, dir).documents, groupSize = 8, iters = 3)
      .orderBy("group_id", "doc_id"),
    Some(s"""${NorthStar6.btCtes},
            ${NorthStar6.btScoreCte},
            g AS (
              SELECT doc_id // 8 AS group_id, doc_id, score,
                CAST(COUNT(*) OVER w AS BIGINT) AS n_group,
                ${Sql.oSum12Over("score", "w")}
                  / COUNT(*) OVER w AS mu,
                ${Sql.oSum12Over("score * score", "w")}
                  / COUNT(*) OVER w AS m2
              FROM sc
              WINDOW w AS (PARTITION BY doc_id // 8))
            SELECT group_id, doc_id, score, n_group,
              mu AS group_mean,
              sqrt(GREATEST(m2 - mu * mu, 0.0)) AS group_std,
              CASE WHEN sqrt(GREATEST(m2 - mu * mu, 0.0)) > 0.0
                THEN (score - mu) / sqrt(GREATEST(m2 - mu * mu, 0.0))
                ELSE 0.0 END AS advantage
            FROM g ORDER BY group_id, doc_id"""))

  /** Silhouette-vs-k tuning curve — the fifth tuning curve (n120 index
    * recall, n125 dedup threshold, n126 gate threshold, n129 context
    * length, here the cluster count). Each k's oracle chain is the
    * n30 unrolled-Lloyd replay ([[NorthStar.kmeansCteList]] with a
    * per-k suffix) extended with the all-centroid distance pass and
    * the silhouette algebra — three independent chains UNION ALLed.
    */
  private val silKSweep = {
    val ks = Seq(2, 4, 8)
    val iters = 2
    def chain(k: Int): String = {
      val s = s"_$k"
      s"""${NorthStar.kmeansCteList(k, iters, sfx = s)},
            d$s AS (
              SELECT e.vec_id, c.cid,
                list_reduce(list_transform(range(len(e.emb)),
                  i -> (e.emb[i+1] - c.cent[i+1]) *
                       (e.emb[i+1] - c.cent[i+1])),
                  (a, b) -> a + b) AS dist
              FROM e$s e CROSS JOIN c${iters - 1}$s c),
            o$s AS (
              SELECT d.vec_id, MIN(d.dist) AS od
              FROM d$s d JOIN a$iters$s a2
                ON d.vec_id = a2.vec_id AND d.cid <> a2.cid
              GROUP BY d.vec_id),
            sv$s AS (
              SELECT a2.cid AS cluster, sqrt(a2.dist) AS ca, sqrt(o.od) AS cb
              FROM a$iters$s a2 JOIN o$s o USING (vec_id)),
            r$s AS (
              SELECT CAST($k AS INT) AS k, CAST(cluster AS INT) AS cluster,
                CAST(COUNT(*) AS BIGINT) AS n,
                ${Sql.oSum12("ca")} / COUNT(*) AS mean_cohesion,
                ${Sql.oSum12("cb")} / COUNT(*) AS mean_separation,
                ${Sql.oSum12("""CASE WHEN GREATEST(ca, cb) > 0
                    THEN (cb - ca) / GREATEST(ca, cb)
                    ELSE 0.0 END""")} / COUNT(*) AS mean_silhouette
              FROM sv$s GROUP BY cluster)"""
    }
    Q(
      "n141_silhouette_k_sweep",
      "choose-k tuning curve: euclidean centroid silhouette per (k, cluster) for k in {2,4,8} under deterministic Lloyd",
      (s, dir) => graft.operators.Clustering
        .silhouetteKSweep(Tables(s, dir).embeddings, ks, iters)
        .orderBy("k", "cluster"),
      Some(s"""WITH ${ks.map(chain).mkString(",\n")}
            ${ks.map(k => s"SELECT * FROM r_$k").mkString(
          "\nUNION ALL\n")}
            ORDER BY k, cluster"""))
  }

  /** ZCA whitening applied — n134's diagnosis turned into treatment.
    * Rows-only BY DESIGN (the fourth member, beside n04/q30/n128):
    * the whitening matrix needs the eigensolve, which has no
    * cross-engine-exact SQL form; WhiteningSpec carries the
    * replacement guarantee (whitened covariance == identity, W is the
    * symmetric inverse square root), pinned by RegistryInvariantsSpec.
    */
  private val whiten = Q(
    "n142_zca_whitening",
    "ZCA-whitened embeddings in tall form (driver-side eigensolve, scan-stage apply); rows-only by design",
    (s, dir) => Geometry
      .zcaWhiten(Tables(s, dir).embeddings)
      .orderBy("vec_id", "dim"),
    None)

  /** One-row anisotropy card — n134's oracle-able summary face: mean
    * squared norm, mean-vector energy, their ratio, the covariance
    * trace. The n143/n134/n142 triple is diagnosis-summary / full
    * structure / treatment.
    */
  /** The n143 oracle, shared verbatim with the s43 streaming
    * anisotropy monitor (the s41/n139 shared-report-half rule: one
    * SQL, two faces).
    */
  private[queries] lazy val anisotropyOracleSql: String =
    s"""WITH t AS (
              SELECT vec_id,
                CAST(unnest(range(len(embedding))) AS INT) AS dim,
                CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings),
            tot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                ${Sql.oSum12("""list_reduce(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  (acc, x) -> acc + x)""")} / COUNT(*) AS avg_sq_norm,
                CAST(MAX(len(embedding)) AS INT) AS d
              FROM embeddings),
            m AS (
              SELECT dim, ${Sql.oSum12("v")} / COUNT(*) AS m
              FROM t GROUP BY dim),
            mn AS (SELECT ${Sql.oSum12("m * m")} AS mean_norm2 FROM m)
            SELECT n, d, avg_sq_norm, mean_norm2,
              avg_sq_norm - mean_norm2 AS trace_cov,
              mean_norm2 / avg_sq_norm AS anisotropy
            FROM tot CROSS JOIN mn"""

  private val anisotropy = Q(
    "n143_embedding_anisotropy",
    "embedding anisotropy card: E||x||^2, ||mu||^2, their ratio, covariance trace (one row)",
    (s, dir) => Geometry
      .anisotropyCard(Tables(s, dir).embeddings),
    Some(anisotropyOracleSql))

  /** Dup-cluster size histogram — the dedup report card over n22's
    * components: whether the duplicate mass sits in pairs or
    * mega-clusters, and what keep-one dedup removes.
    */
  private val dupHistogram = Q(
    "n144_dup_size_histogram",
    "dup-cluster size histogram: clusters, docs, and keep-one removable count per cluster size",
    (s, dir) => graft.operators.Clustering
      .dupClusterSizeHistogram(Tables(s, dir).documents, 3, 0.8)
      .orderBy("size"),
    Some(s"""${NorthStar.ccCtes},
            allc AS (
              SELECT d.doc_id,
                COALESCE(c.component, d.doc_id) AS component
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
            cs AS (
              SELECT component, CAST(COUNT(*) AS BIGINT) AS size
              FROM allc GROUP BY component)
            SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
              CAST(size * COUNT(*) AS BIGINT) AS n_docs,
              CAST((size - 1) * COUNT(*) AS BIGINT) AS n_removable
            FROM cs GROUP BY size ORDER BY size"""))

  val all: Seq[Q] = Seq(pruning, covariance, silhouette, quantFidelity, jl,
    shardStab, fertility, grpo, silKSweep, whiten, anisotropy,
    dupHistogram)
}
