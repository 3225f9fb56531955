package graft.operators

import graft.functions.VectorFunctions.{cosine, dotProduct, l2Norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-space geometry cards: the "is this representation healthy
  * and which examples earn their keep" layer of a training-data
  * pipeline — per-class prototypes (mean embeddings), prototypicality
  * pruning (Sorscher et al. 2022, "Beyond neural scaling laws": drop
  * the easiest/most-prototypical examples first when data-constrained),
  * a centroid silhouette quality card, full second-moment/covariance
  * structure (anisotropy and effective rank of the embedding space,
  * Ethayarajh 2019), int8-quantization fidelity, and a seeded
  * Johnson–Lindenstrauss projection distortion card (the
  * dimensionality-reduction sanity check before shipping a reduced
  * index).
  *
  * Exactness policy: every cross-row sum routes through
  * DECIMAL(38,12) (the [[graft.queries.Sql.oSum12]] Spark side —
  * order-free, engine-exact); all per-row vector math is strict
  * left-to-right double accumulation (bit-identical to the DuckDB
  * oracles' `list_reduce`); divisions happen AFTER the exact sums.
  */
object Geometry {

  /** Order-insensitive exact sum of full-precision doubles (scale 12). */
  private def sum12(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  /** Per-label mean-embedding prototypes, as (label, proto array<double>).
    *
    * Tall explode → per-(label, dim) decimal-exact mean → re-assemble
    * sorted by dim. The aggregate is a plain hash-agg with map-side
    * partials over labels × dims cells (the n24 centroid shape); the
    * result is L rows — a model artifact, broadcastable by construction.
    */
  def labelPrototypes(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum12(col("v").cast("double")) / count(lit(1))).as("c"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("sc"))
      .select(col("label"),
        transform(col("sc"), x => x.getField("c")).as("proto"))

  /** Prototypicality pruning plan (keep the HARDEST `keepFraction`):
    * per vector, cosine to its own label's prototype, hardness rank
    * within the label (ascending similarity — least prototypical
    * first, ties by vec_id), and the keep verdict at
    * `ceil(n_label * keepFraction)`.
    *
    * Scale shape: the prototype join is a broadcast of L rows; the
    * per-label rank runs as ONE range-partitioned global index over
    * (label, sim, vec_id) ([[GlobalOrder.withGlobalIndexCols]] — a
    * normal distributed sort, never a per-label single-task window)
    * minus a broadcast per-label first-rank offset. At 100 TB the only
    * shuffle is the range exchange the rank fundamentally needs.
    */
  def prototypePruning(embeddings: DataFrame,
      keepFraction: Double): DataFrame = {
    val protos = labelPrototypes(embeddings)
    val sims = embeddings
      .join(broadcast(protos), "label")
      .select(col("vec_id"), col("label"),
        cosine(col("embedding"), col("proto")).as("proto_sim"))
    val idx = GlobalOrder.withGlobalIndexCols(sims,
      Seq(col("label"), col("proto_sim"), col("vec_id")))
    val firsts = idx.groupBy("label")
      .agg(min(col("_global_rank")).as("_first"),
        count(lit(1)).as("n_label"))
    idx.join(broadcast(firsts), "label")
      .select(col("vec_id"), col("label"), col("proto_sim"),
        (col("_global_rank") - col("_first") + 1L).as("hardness_rank"),
        col("n_label"),
        ((col("_global_rank") - col("_first") + 1L) <=
          ceil(col("n_label") * lit(keepFraction)).cast("long")).as("keep"))
  }

  /** Centroid silhouette card, per label: cohesion (mean cosine
    * distance to the own-label prototype), separation (mean distance
    * to the NEAREST other prototype), the silhouette mean
    * `s = (b − a) / max(a, b)`, and the misassignment count (vectors
    * whose nearest prototype is another label's — the confusion the
    * label column can't see).
    *
    * Scale shape: prototypes are an L-row broadcast codebook folded
    * per row (the ivfAssign pattern — no join against the corpus, no
    * explode); the summary is one hash-agg over L cells. Distances to
    * the L prototypes fold left-to-right in label order, min/argmin
    * are order-free selections, and the three means are decimal-exact.
    */
  def centroidSilhouette(embeddings: DataFrame): DataFrame = {
    val codebook = labelPrototypes(embeddings)
      .agg(sort_array(collect_list(struct(col("label"), col("proto"))))
        .as("codebook"))
    val start = struct(
      lit(null).cast("double").as("a"),
      lit(null).cast("double").as("b"))
    val scored = embeddings
      .crossJoin(broadcast(codebook))
      .withColumn("st", aggregate(
        col("codebook"), start,
        (acc, c) => {
          val d = lit(1.0) - cosine(col("embedding"), c.getField("proto"))
          val isOwn = c.getField("label") === col("label")
          val newA = when(isOwn, d).otherwise(acc.getField("a"))
          val better = acc.getField("b").isNull || d < acc.getField("b")
          val newB = when(isOwn, acc.getField("b"))
            .otherwise(when(better, d).otherwise(acc.getField("b")))
          struct(newA.as("a"), newB.as("b"))
        }))
      .select(col("vec_id"), col("label"),
        col("st.a").as("d_own"), col("st.b").as("d_other"))
      .withColumn("sil",
        (col("d_other") - col("d_own")) /
          greatest(col("d_own"), col("d_other")))
      .withColumn("misassigned", col("d_other") < col("d_own"))
      // Single-label contract: with one label in the corpus there is no
      // "other" prototype, d_other stays null, and silhouette is
      // undefined — drop those rows, matching the n135 oracle's inner
      // join of own-vs-other distances (which drops such vectors
      // entirely). Unreachable on multi-label corpora; pinned by
      // EmbeddingGeometrySpec's degenerate-corpus case.
      .filter(col("d_other").isNotNull)
    scored.groupBy("label")
      .agg(count(lit(1)).as("n"),
        (sum12(col("d_own")) / count(lit(1))).as("mean_cohesion"),
        (sum12(col("d_other")) / count(lit(1))).as("mean_separation"),
        (sum12(col("sil")) / count(lit(1))).as("mean_silhouette"),
        sum(when(col("misassigned"), 1L).otherwise(0L)).as("n_misassigned"))
  }

  /** Upper-triangle covariance moments of the embedding space, tall
    * (dim_i ≤ dim_j): n, decimal-exact means, and the population
    * covariance `E[xy] − E[x]E[y]` — the input to anisotropy /
    * effective-rank health checks ([[effectiveRank]]) and ZCA
    * whitening. D(D+1)/2 + D cells regardless of corpus size.
    *
    * This oracle-exact form explodes each row to its D(D+1)/2 products
    * feeding a hash-agg with map-side partials (the n24 tall-explode
    * justification — cells, not corpus, after the combine). The
    * explode inflates scan rows ×2080 at D=64, which a 100 TB pass
    * should not pay: [[covarianceMomentsAgg]] is the same card as ONE
    * single-pass typed Aggregator (an Array[Double] buffer of
    * D(D+3)/2+1 slots), spec-pinned against this form
    * (EmbeddingGeometrySpec) — kept as the scale path while this form
    * carries the cross-engine hash oracle.
    */
  def covarianceMoments(embeddings: DataFrame): DataFrame = {
    val e = col("embedding")
    val pairs = flatten(transform(sequence(lit(0), size(e) - 1), i =>
      transform(sequence(i, size(e) - 1), j =>
        struct(i.cast("int").as("dim_i"), j.cast("int").as("dim_j"),
          (element_at(e, i + 1).cast("double") *
            element_at(e, j + 1).cast("double")).as("p")))))
    // Re-width BEFORE the ×D(D+1)/2 explode (the parMap stage-re-width
    // rationale): the partial aggregate behind the explode does D²/2
    // decimal additions per input row, and a narrow upstream (one
    // small file locally; a coalesced scan at scale) would serialize
    // it. The shuffled payload is the PRE-explode rows — tiny.
    val wide = embeddings.repartition(
      embeddings.sparkSession.sparkContext.defaultParallelism)
    val sums = wide
      .select(explode(pairs).as("pr"))
      .select(col("pr.dim_i").as("dim_i"), col("pr.dim_j").as("dim_j"),
        col("pr.p").as("p"))
      .groupBy("dim_i", "dim_j")
      .agg(count(lit(1)).as("n"), sum12(col("p")).as("sxy"))
    val means = embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg((sum12(col("v").cast("double")) / count(lit(1))).as("m"))
    sums
      .join(broadcast(means.select(col("dim").as("dim_i"),
        col("m").as("mean_i"))), Seq("dim_i"))
      .join(broadcast(means.select(col("dim").as("dim_j"),
        col("m").as("mean_j"))), Seq("dim_j"))
      .select(col("dim_i"), col("dim_j"), col("n"),
        col("mean_i"), col("mean_j"),
        (col("sxy") / col("n") -
          col("mean_i") * col("mean_j")).as("cov"))
  }

  /** One output cell of the covariance card. */
  final case class CovCell(dim_i: Int, dim_j: Int, n: Long,
      mean_i: Double, mean_j: Double, cov: Double)

  /** Single-pass covariance buffer: count, per-dim sums, upper-triangle
    * product sums. Arrays are fixed at D(D+3)/2 doubles — a model-sized
    * aggregation buffer that merges map-side.
    */
  final case class CovBuf(var n: Long, sx: Array[Double],
      sxy: Array[Double])

  /** The 100 TB path for [[covarianceMoments]]: one typed Aggregator
    * pass — no explode, no ×D² row inflation; each input row updates a
    * D(D+3)/2-slot double buffer in place and buffers merge
    * associatively map-side. Double accumulation is partition-order
    * dependent (hence not the oracle form); EmbeddingGeometrySpec pins
    * it within 1e-9 of the decimal-exact card.
    */
  def covarianceMomentsAgg(embeddings: DataFrame, dim: Int): DataFrame = {
    val nPairs = dim * (dim + 1) / 2
    val agg = new Aggregator[Seq[Float], CovBuf, Seq[CovCell]] {
      def zero: CovBuf =
        CovBuf(0L, Array.ofDim[Double](dim), Array.ofDim[Double](nPairs))
      def reduce(b: CovBuf, v: Seq[Float]): CovBuf = {
        val x = v.toArray
        var i = 0
        var idx = 0
        while (i < dim) {
          val xi = x(i).toDouble
          b.sx(i) += xi
          var j = i
          while (j < dim) {
            b.sxy(idx) += xi * x(j).toDouble
            idx += 1
            j += 1
          }
          i += 1
        }
        b.n += 1
        b
      }
      def merge(a: CovBuf, c: CovBuf): CovBuf = {
        var i = 0
        while (i < dim) { a.sx(i) += c.sx(i); i += 1 }
        i = 0
        while (i < nPairs) { a.sxy(i) += c.sxy(i); i += 1 }
        a.n += c.n
        a
      }
      def finish(b: CovBuf): Seq[CovCell] = {
        val out = Seq.newBuilder[CovCell]
        var i = 0
        var idx = 0
        while (i < dim) {
          var j = i
          while (j < dim) {
            val mi = b.sx(i) / b.n
            val mj = b.sx(j) / b.n
            out += CovCell(i, j, b.n, mi, mj, b.sxy(idx) / b.n - mi * mj)
            idx += 1
            j += 1
          }
          i += 1
        }
        out.result()
      }
      def bufferEncoder = org.apache.spark.sql.Encoders.product[CovBuf]
      def outputEncoder = org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[CovCell]]()
    }
    val covUdaf = udaf(agg)
    embeddings
      .agg(covUdaf(col("embedding")).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.dim_i").as("dim_i"), col("c.dim_j").as("dim_j"),
        col("c.n").as("n"), col("c.mean_i").as("mean_i"),
        col("c.mean_j").as("mean_j"), col("c.cov").as("cov"))
  }

  /** Effective rank (Roy & Vetterli 2007: exp of the eigenvalue
    * entropy) of a covariance card in [[covarianceMoments]]' tall form.
    * Collects the D(D+3)/2-row card (model-sized by contract) and runs
    * a driver-side cyclic Jacobi eigensolver on the D×D matrix — the
    * bounded coordination step, never a corpus collect.
    */
  def effectiveRank(covTall: DataFrame): Double = {
    val rows = DriverModel.collectBounded(
      covTall.select("dim_i", "dim_j", "cov"), "Geometry.effectiveRank")
    val d = rows.iterator.map(_.getInt(1)).max + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = c
      m(j)(i) = c
    }
    val eigs = jacobiEigenvalues(m)
    val pos = eigs.filter(_ > 1e-12)
    val tot = pos.sum
    if (tot <= 0.0) 0.0
    else {
      val h = pos.map { l =>
        val p = l / tot
        -p * math.log(p)
      }.sum
      math.exp(h)
    }
  }

  /** Cyclic Jacobi on a symmetric matrix (in place on a copy), for the
    * D×D driver-side eigenproblems — D is the embedding width, bounded.
    */
  private[graft] def jacobiEigenvalues(
      sym: Array[Array[Double]]): Array[Double] = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) rotate(a, p, q)
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    Array.tabulate(d)(i => a(i)(i))
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def rotate(a: Array[Array[Double]], p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = {
      val s = math.signum(theta) match { case 0.0 => 1.0; case x => x }
      s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var k = 0
    while (k < d) {
      val akp = a(k)(p)
      val akq = a(k)(q)
      a(k)(p) = c * akp - s * akq
      a(k)(q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < d) {
      val apk = a(p)(k)
      val aqk = a(q)(k)
      a(p)(k) = c * apk - s * aqk
      a(q)(k) = s * apk + c * aqk
      k += 1
    }
  }

  /** One-row anisotropy summary — the oracle-able face of the n134
    * card (Ethayarajh 2019's diagnosis without the eigensolve): the
    * corpus mean-vector energy `‖μ‖²` against the mean squared norm
    * `E‖x‖²`, their ratio (≈ the expected cosine between two random
    * embeddings after normalization — 0 for an isotropic cloud, →1
    * as the space collapses onto its mean), and the total centered
    * variance (trace of the covariance, by `E‖x‖² − ‖μ‖²`). Two
    * decimal-exact reductions — a per-row ‖x‖² fold summed at scale
    * 12, and the D-cell mean frame squared and summed at scale 12 —
    * then fixed-shape IEEE; one corpus pass + one D-row pass.
    */
  def anisotropyCard(embeddings: DataFrame): DataFrame = {
    val sqNorm = aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val totals = embeddings
      .agg(count(lit(1)).as("n"),
        (sum12(sqNorm) / count(lit(1))).as("avg_sq_norm"),
        max(size(col("embedding"))).as("d"))
    val meanNorm = embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg((sum12(col("v").cast("double")) / count(lit(1))).as("m"))
      .agg(sum12(col("m") * col("m")).as("mean_norm2"))
    totals.crossJoin(broadcast(meanNorm))
      .select(col("n"), col("d"), col("avg_sq_norm"), col("mean_norm2"),
        (col("avg_sq_norm") - col("mean_norm2")).as("trace_cov"),
        (col("mean_norm2") / col("avg_sq_norm")).as("anisotropy"))
  }

  /** Streaming-legal moment half of [[anisotropyCard]] (the s39/s41
    * counting-half split): ONE aggregation keyed by dim, where dim −1
    * carries the per-row squared-norm fold (cast to DECIMAL(38,12) per
    * row — exactly the route the batch card and the n143 oracle take)
    * and dims 0..D−1 carry the coordinate sums as a MONOTONE
    * positive/negative split (two decimal sums of non-negative terms),
    * so an update-mode memory sink collapses to final state with MAX
    * per dim whatever the trigger slicing. `s_pos − s_neg` equals the
    * signed decimal sum exactly: Spark's double→decimal cast rounds
    * half away from zero, so dec(−v) == −dec(v) term by term.
    * State is D+1 rows — model-sized, never corpus.
    */
  def anisotropyMoments(embeddings: DataFrame): DataFrame = {
    val dec = DecimalType(38, 12)
    val sqNorm = aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val coords = transform(sequence(lit(0), size(col("embedding")) - 1),
      i => struct(i.cast("int").as("dim"),
        element_at(col("embedding"), i + 1).cast("double").as("v")))
    val channels = concat(
      array(struct(lit(-1).cast("int").as("dim"), sqNorm.as("v"))), coords)
    embeddings
      .select(explode(channels).as("c"))
      .select(col("c.dim").as("dim"), col("c.v").as("v"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") >= 0, col("v")).otherwise(lit(0.0)).cast(dec))
          .as("s_pos"),
        sum(when(col("v") < 0, -col("v")).otherwise(lit(0.0)).cast(dec))
          .as("s_neg"))
  }

  /** Report half over [[anisotropyMoments]] final state — emits the
    * SAME six columns as [[anisotropyCard]], so the streaming monitor
    * (s43) rides n143's oracle verbatim.
    */
  def anisotropyFromMoments(moments: DataFrame): DataFrame = {
    // subtracting two DECIMAL(38,12) sums would overflow precision 38
    // and Spark's allowPrecisionLoss coercion silently re-rounds the
    // result to scale 11 — a 5e-12 drift off the oracle. Down-cast to
    // (26,12) first (exact: same scale, 14 integer digits ≈ sums to
    // 1e14 — plenty above any per-dim coordinate mass this engine
    // feeds) so the difference fits (27,12) with no loss.
    // The down-cast is guarded: under non-ANSI semantics an out-of-range
    // decimal cast returns NULL silently, and the card would emit
    // null/corrupt columns instead of failing. raise_error makes the
    // (contractually unreachable) overflow loud.
    val d26 = DecimalType(26, 12)
    def checked(c: Column, name: String): Column =
      when(c.isNotNull && c.cast(d26).isNull,
        raise_error(concat(
          lit(s"anisotropyFromMoments: $name overflows DECIMAL(26,12): "),
          c.cast("string"))))
        .otherwise(c.cast(d26))
    def signed(pos: Column, neg: Column): Column =
      (checked(pos, "s_pos") - checked(neg, "s_neg")).cast("double")
    val tot = moments.filter(col("dim") === -1)
      .select(col("n"),
        (signed(col("s_pos"), col("s_neg")) / col("n")).as("avg_sq_norm"))
    val dims = moments.filter(col("dim") >= 0)
      .select(col("dim"),
        (signed(col("s_pos"), col("s_neg")) / col("n")).as("m"))
    val mean2 = dims.agg(sum12(col("m") * col("m")).as("mean_norm2"),
      (max(col("dim")) + 1).as("d"))
    tot.crossJoin(broadcast(mean2))
      .select(col("n"), col("d"), col("avg_sq_norm"), col("mean_norm2"),
        (col("avg_sq_norm") - col("mean_norm2")).as("trace_cov"),
        (col("mean_norm2") / col("avg_sq_norm")).as("anisotropy"))
  }

  /** Two-NN intrinsic-dimension ratio card (Facco et al. 2017,
    * "Estimating the intrinsic dimension of datasets by a minimal
    * neighborhood information"): for each vector in a FIXED bounded
    * query sample (vec_id < sampleMaxId — the n137 sampling contract),
    * the euclidean distances to its 1st and 2nd nearest OTHER sample
    * vectors and the ratio μ = d₂/d₁. Under the TwoNN model μ is
    * Pareto(ID)-distributed, so the MLE is `ID = n / Σ ln μ` — but ln
    * is not cross-engine bit-exact (the no-transcendentals policy,
    * n42/n61/Mixture), so the CARD emits the exact per-vector ratios
    * (selection + per-row IEEE only) and EmbeddingGeometrySpec carries
    * the estimator on a closed-form fixture. Duplicate vectors
    * (d₁ = 0) take a null μ, mirroring the estimator's exclusion rule.
    *
    * Scale shape: sample² distances over a LITERAL-bounded sample
    * (BNLJ whitelisted with the n137 justification), then one
    * rank-2 selection per sample row — never corpus². The production
    * path at 100 TB samples ~1k vectors; ID estimates converge at
    * O(100) samples (the paper's point).
    */
  def twoNnRatios(embeddings: DataFrame, sampleMaxId: Long): DataFrame = {
    val sample = embeddings
      .filter(col("vec_id") < sampleMaxId)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
    val a = sample.select(col("vec_id").as("id_a"), col("emb").as("emb_a"))
    val b = sample.select(col("vec_id").as("id_b"), col("emb").as("emb_b"))
    val sq = aggregate(zip_with(col("emb_a"), col("emb_b"),
        (u, v) => (u - v) * (u - v)),
      lit(0.0), (acc, t) => acc + t)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("sq"), col("id_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), sq.as("sq"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("id_a").as("vec_id"))
      .agg(min(when(col("rn") === 1, sqrt(col("sq")))).as("d_nn1"),
        min(when(col("rn") === 2, sqrt(col("sq")))).as("d_nn2"))
      .withColumn("mu",
        when(col("d_nn1") > 0.0, col("d_nn2") / col("d_nn1")))
  }

  /** ZCA whitening: the applied half of the covariance card. The
    * whitening matrix `W = V·diag(1/√(λ+eps))·Vᵀ` comes from a
    * driver-side Jacobi eigendecomposition of the D×D covariance
    * (model-sized, like [[effectiveRank]]); application is one
    * scan-stage per-row transform against the broadcast literal
    * matrix — zero shuffle beyond the moment pass that built the
    * covariance. Output tall (vec_id, dim, v_white): mean-centered,
    * decorrelated, unit-variance coordinates — the standard
    * preprocessing before PQ codebooks or euclidean ANN when the
    * embedding space is anisotropic (n134's card is the diagnosis;
    * this is the treatment).
    *
    * NO cross-engine-exact SQL form exists (the eigensolve), so the
    * n142 query takes the rows-only check; WhiteningSpec carries the
    * replacement guarantee — the whitened covariance IS the identity
    * (off-diagonals < 1e-9, diagonals 1 ± 1e-6 for well-conditioned
    * eigenvalues) and the transform is the symmetric PSD inverse
    * square root (W·Σ·Wᵀ = I).
    *
    * Because no hash oracle constrains the moment pass, it rides the
    * no-explode [[covarianceMomentsAgg]] (the 100 TB path) rather than
    * the ×D(D+1)/2 decimal explode that [[covarianceMoments]] keeps
    * for n134's cross-engine oracle — the r14 verdict flagged the
    * treatment pass paying the oracle form's constant for nothing.
    * The dim probe is one first-row read, driver-sized.
    */
  def zcaWhiten(embeddings: DataFrame, eps: Double = 1e-6): DataFrame = {
    val d0 = embeddings.select(size(col("embedding")).as("d"))
      .head().getInt(0)
    val covTall = covarianceMomentsAgg(embeddings, d0)
    val rows = DriverModel.collectBounded(
      covTall.select("dim_i", "dim_j", "mean_i", "cov"),
      "Geometry.zcaWhiten")
    val d = rows.iterator.map(_.getInt(1)).max + 1
    val cov = Array.ofDim[Double](d, d)
    val mean = Array.ofDim[Double](d)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      cov(i)(j) = c
      cov(j)(i) = c
      if (i == j) mean(i) = r.getDouble(2)
    }
    val (eigs, vecs) = jacobiEigenvectors(cov)
    // W = V diag(1/sqrt(max(lambda,0)+eps)) V^T
    val w = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < d) {
        s += vecs(i)(k) * vecs(j)(k) /
          math.sqrt(math.max(eigs(k), 0.0) + eps)
        k += 1
      }
      s
    }
    val wCol = array(w.map(row => array(row.map(lit): _*)): _*)
    val meanCol = array(mean.map(lit): _*)
    val centered = zip_with(
      transform(col("embedding"), x => x.cast("double")), meanCol,
      (x, m) => x - m)
    embeddings
      .select(col("vec_id"), centered.as("c"), wCol.as("w"))
      .select(col("vec_id"),
        posexplode(transform(col("w"), wrow =>
          aggregate(zip_with(wrow, col("c"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)))
          .as(Seq("dim", "v_white")))
  }

  /** Cyclic Jacobi with eigenvector accumulation — (eigenvalues,
    * column-eigenvectors V with `sym = V·diag(λ)·Vᵀ`).
    */
  private[graft] def jacobiEigenvectors(
      sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (offDiag(a) > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) rotateWithVecs(a, v, p, q)
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def rotateWithVecs(a: Array[Array[Double]],
      v: Array[Array[Double]], p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = {
      val s = math.signum(theta) match { case 0.0 => 1.0; case x => x }
      s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var k = 0
    while (k < d) {
      val akp = a(k)(p); val akq = a(k)(q)
      a(k)(p) = c * akp - s * akq
      a(k)(q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < d) {
      val apk = a(p)(k); val aqk = a(q)(k)
      a(p)(k) = c * apk - s * aqk
      a(q)(k) = s * apk + c * aqk
      k += 1
    }
    k = 0
    while (k < d) {
      val vkp = v(k)(p); val vkq = v(k)(q)
      v(k)(p) = c * vkp - s * vkq
      v(k)(q) = s * vkp + c * vkq
      k += 1
    }
  }

  /** Int8-quantization fidelity card, per label: how much cosine the
    * per-vector min/max int8 scheme ([[Similarity.quantizeInt8Tall]]'s
    * exact arithmetic, re-derived per row without the tall explode)
    * costs — n, decimal-exact mean cosine(original, dequantized), the
    * worst vector (min fidelity, argmin by vec_id on ties), and the
    * count under `minOk`. Pure per-row scan arithmetic + one hash-agg:
    * the quantize → dequantize → compare round trip never shuffles the
    * corpus.
    */
  def quantizationFidelity(embeddings: DataFrame,
      minOk: Double): DataFrame = {
    val e = col("embedding")
    val mn = array_min(e).cast("double")
    val mx = array_max(e).cast("double")
    val deq = when(mx > mn,
      transform(e, v =>
        mn + floor((v.cast("double") - mn) / (mx - mn) * 255 + 0.5) /
          255 * (mx - mn)))
      .otherwise(transform(e, v => mn + lit(0.0)))
    val scored = embeddings
      .select(col("vec_id"), col("label"),
        cosine(e, deq).as("fidelity"))
    scored.groupBy("label")
      .agg(count(lit(1)).as("n"),
        (sum12(col("fidelity")) / count(lit(1))).as("mean_fidelity"),
        min(struct(col("fidelity"), col("vec_id"))).as("w"),
        sum(when(col("fidelity") < minOk, 1L).otherwise(0L))
          .as("n_below"))
      .select(col("label"), col("n"), col("mean_fidelity"),
        col("w.fidelity").as("worst_fidelity"),
        col("w.vec_id").as("worst_vec"), col("n_below"))
  }

  /** Johnson–Lindenstrauss projection distortion card: project D→k with
    * seeded Gaussian planes scaled 1/√k, then for every pair in the
    * bounded query sample report original vs projected Euclidean
    * distance and the squared-distance ratio (JL says ratio ≈ 1 ± ε).
    *
    * Scale shape: the projection is per-row scan arithmetic against a
    * broadcast literal plane matrix (the n06 hyperplane pattern); the
    * pair frame is sample² over a FIXED query sample — never corpus².
    * Every output column is per-row IEEE arithmetic (strict
    * left-to-right folds), so the card is exact-hash oracle-able with
    * the planes embedded literally in the SQL.
    */
  /** JL neighbor-recall card — the RANKING-preservation face of
    * [[jlDistortionPairs]]'s distance story: per sample vector, how
    * many of its exact top-`kNn` neighbors (squared euclidean,
    * ascending, ties by id) survive as top-`kNn` neighbors in the
    * `kProj`-dim projected space. Distance distortion bounds (n137)
    * don't directly price what an ANN index consumes — neighbor ORDER
    * — and a projection can hold pairwise distances within ±20% while
    * scrambling the top-5 of tight clusters; recall@k is the number a
    * reduced-dimension index ships or doesn't.
    *
    * Exactness: both distance columns are the strict per-row folds the
    * n137/n147 oracles replay; both ranks are deterministic
    * (distance, id_b); the overlap count is exact; recall is one
    * division. Scale shape: sample² over the bounded query sample
    * (BNLJ whitelisted), TWO window sorts over one (id_a) partition
    * exchange, a sample-sized agg.
    */
  def jlNeighborRecall(embeddings: DataFrame, sampleMaxId: Long,
      kNn: Int, kProj: Int, seed: Long, dim: Int): DataFrame = {
    require(kNn >= 1, s"kNn must be >= 1, got $kNn")
    val planes = Similarity.hyperplanes(kProj, dim, seed)
    val scale = 1.0 / math.sqrt(kProj.toDouble)
    val planesCol = array(planes.map(p =>
      array(p.map(v => lit(v)): _*)): _*)
    val sample = embeddings
      .filter(col("vec_id") < sampleMaxId)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"),
        transform(planesCol, p =>
          dotProduct(col("embedding"), p) * lit(scale)).as("proj"))
    val a = sample.select(col("vec_id").as("id_a"),
      col("emb").as("emb_a"), col("proj").as("proj_a"))
    val b = sample.select(col("vec_id").as("id_b"),
      col("emb").as("emb_b"), col("proj").as("proj_b"))
    def sqDist(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => (u - v) * (u - v)),
        lit(0.0), (acc, t) => acc + t)
    val wO = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("d2_orig"), col("id_b"))
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("d2_proj"), col("id_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        sqDist(col("emb_a"), col("emb_b")).as("d2_orig"),
        sqDist(col("proj_a"), col("proj_b")).as("d2_proj"))
      .withColumn("r_orig", row_number().over(wO))
      .withColumn("r_proj", row_number().over(wP))
      .groupBy(col("id_a").as("vec_id"))
      .agg(sum(when(col("r_orig") <= kNn && col("r_proj") <= kNn, 1L)
        .otherwise(0L)).as("n_overlap"))
      .select(col("vec_id"), col("n_overlap"),
        (col("n_overlap").cast("double") / kNn.toDouble)
          .as(s"recall_at_$kNn"))
  }

  def jlDistortionPairs(embeddings: DataFrame, sampleMaxId: Long,
      k: Int, seed: Long, dim: Int): DataFrame = {
    val planes = Similarity.hyperplanes(k, dim, seed)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val planesCol = array(planes.map(p =>
      array(p.map(v => lit(v)): _*)): _*)
    val sample = embeddings
      .filter(col("vec_id") < sampleMaxId)
      .select(col("vec_id"), col("embedding"),
        transform(planesCol, p =>
          dotProduct(col("embedding"), p) * lit(scale)).as("proj"))
    val a = sample.select(col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("proj").as("proj_a"))
    val b = sample.select(col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("proj").as("proj_b"))
    def sqDist(x: Column, y: Column): Column =
      aggregate(zip_with(x, y,
          (u, v) => (u.cast("double") - v.cast("double")) *
            (u.cast("double") - v.cast("double"))),
        lit(0.0), (acc, t) => acc + t)
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        sqDist(col("emb_a"), col("emb_b")).as("d2_orig"),
        sqDist(col("proj_a"), col("proj_b")).as("d2_proj"))
      .withColumn("ratio",
        when(col("d2_orig") > 0.0, col("d2_proj") / col("d2_orig")))
      .select(col("id_a"), col("id_b"),
        sqrt(col("d2_orig")).as("dist_orig"),
        sqrt(col("d2_proj")).as("dist_proj"),
        col("ratio"))
  }

  /** Int8 scalar-quantization card — the standard 4×-compression move
    * for embedding storage/serving (per-dimension affine quantization:
    * q = round((x − min_d) / scale_d), scale_d = (max_d − min_d)/255),
    * priced EXACTLY: per dimension the range, the scale, and the worst
    * and mean absolute reconstruction error |x − (min_d + q·scale_d)|.
    * The card answers "is int8 safe for this corpus" before any index
    * rebuild commits to it — dimensions whose error spikes (heavy
    * tails, outlier mass) are the ones PQ/IVF recall quietly loses.
    *
    * Exactness: quantization is fixed-order IEEE double arithmetic
    * (widened exactly from the float column) with round-half-up on a
    * non-negative argument — identical on both engines (DuckDB rounds
    * half away from zero, equal for non-negative); a constant
    * dimension (scale 0) quantizes to 0 with zero error on both sides
    * via the same CASE. Mean errors are decimal-routed exact sums.
    *
    * Scale shape: ONE posexplode pass persisted (it feeds the range
    * aggregation AND the error pass — the diamond rule), a D-row
    * broadcast range table, one (dim)-keyed hash agg. Nothing is
    * corpus²; at 100 TB the explode is scan-stage row inflation that
    * map-side partials collapse back to D rows per partition. Callers
    * run GraftSession.dropAllBlocks between queries.
    */
  def int8QuantizationCard(embeddings: DataFrame): DataFrame = {
    val x = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranges = x.groupBy("dim")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
    val card = x.join(broadcast(ranges), "dim")
      .withColumn("q",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(round((col("x") - col("mn")) / col("scale"))))
      .withColumn("err",
        abs(col("x") - (col("mn") + col("q") * col("scale"))))
      .groupBy("dim", "mn", "mx", "scale")
      .agg(count(lit(1)).as("n"), max(col("err")).as("max_abs_err"),
        (sum12(col("err")) / count(lit(1))).as("mean_abs_err"))
      .select(col("dim"), col("n"), col("mn"), col("mx"), col("scale"),
        col("max_abs_err"), col("mean_abs_err"))
    graft.DiamondCaches.register(x, card)
  }
}
