package graft

import graft.operators.Geometry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form and structural pins for the round-14 geometry family:
  * prototypes, pruning ranks, silhouette signs, covariance (explode
  * form vs the single-pass Aggregator scale path), effective rank
  * (eigenvalues are not SQL-expressible — this spec is the guarantee
  * the n134 oracle can't give), quantization fidelity bounds, and the
  * JL distortion band.
  */
class EmbeddingGeometrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def embDF(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  // two tight clusters on orthogonal axes + one anti-aligned outlier
  private lazy val clustered = embDF(Seq(
    (0L, Seq(1.0f, 0.1f, 0.0f, 0.0f), 0),
    (1L, Seq(1.0f, -0.1f, 0.0f, 0.0f), 0),
    (2L, Seq(0.9f, 0.0f, 0.0f, 0.0f), 0),
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.1f), 1),
    (4L, Seq(0.0f, 0.0f, 1.0f, -0.1f), 1),
    (5L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 0)))

  test("labelPrototypes: per-label decimal-exact mean, dim order") {
    val p = Geometry.labelPrototypes(clustered).orderBy("label").collect()
    assert(p.length == 2)
    val proto0 = p(0).getSeq[Double](1)
    // label 0: vecs 0,1,2,5 → mean of dim 0 = (1 + 1 + 0.9f - 1)/4
    assert(math.abs(proto0.head - (1.0 + 1.0 + 0.9f.toDouble - 1.0) / 4)
      < 1e-12)
    assert(proto0.length == 4)
    val proto1 = p(1).getSeq[Double](1)
    assert(proto1(2) == 1.0 && proto1(0) == 0.0)
  }

  test("prototypePruning: hardest-first ranks, keep = ceil(n*f), outlier ranked 1") {
    val r = Geometry.prototypePruning(clustered, 0.5)
      .orderBy("label", "hardness_rank").collect()
    val l0 = r.filter(_.getInt(1) == 0)
    assert(l0.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L, 4L))
    // the anti-aligned vec 5 is the LEAST prototypical → rank 1, kept
    assert(l0.head.getLong(0) == 5L && l0.head.getBoolean(5))
    // keep = ceil(4 * 0.5) = 2 → ranks 1,2 kept, 3,4 dropped
    assert(l0.map(_.getBoolean(5)).toSeq == Seq(true, true, false, false))
    // sims ascend with rank
    val sims = l0.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted)
  }

  test("centroidSilhouette: tight well-separated clusters score high, outlier drags label 0") {
    val s = Geometry.centroidSilhouette(clustered).orderBy("label").collect()
    val (row0, row1) = (s(0), s(1))
    assert(row0.getLong(1) == 4 && row1.getLong(1) == 2)
    // label 1 is tight and orthogonal to label 0's prototype: cohesion
    // near 0, separation near 1, silhouette near 1
    assert(row1.getDouble(3) > 0.9, "separation")
    assert(row1.getDouble(2) < 0.01, "cohesion")
    assert(row1.getDouble(4) > 0.9, "silhouette")
    // vec 5 points away from its own prototype and is closer to no one
    // orthogonal prototype — it is the misassignment candidate only if
    // some OTHER prototype is nearer; here d_own ≈ 2 > d_other ≈ 1
    assert(row0.getLong(5) >= 1, "anti-aligned outlier must misassign")
    assert(row1.getLong(5) == 0)
  }

  test("centroidSilhouette: single-label corpus yields zero rows (the oracle's inner-join contract)") {
    // with one label there is no "other" prototype: d_other stays null
    // and silhouette is undefined. The n135 oracle's inner join of
    // own-vs-other distances drops such vectors entirely; the Spark
    // side must match rather than emit a label row of nulls
    // (r14 advice item — Geometry.scala null-d_other filter)
    val single = embDF(Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0)))
    assert(Geometry.centroidSilhouette(single).count() == 0)
  }

  test("twoNnRatios: hand-computed 1D manifold distances, duplicate -> null mu, finite MLE") {
    // points on a line at 0, 1, 3, 7 → d1/d2 by hand; plus a duplicate
    // of the origin (vec 4) making d1 = 0 for both copies
    val pts = embDF(Seq(
      (0L, Seq(0.0f, 0f, 0f, 0f), 0),
      (1L, Seq(1.0f, 0f, 0f, 0f), 0),
      (2L, Seq(3.0f, 0f, 0f, 0f), 0),
      (3L, Seq(7.0f, 0f, 0f, 0f), 0),
      (4L, Seq(0.0f, 0f, 0f, 0f), 0)))
    val r = Geometry.twoNnRatios(pts, sampleMaxId = 5L)
      .orderBy("vec_id").collect()
    assert(r.length == 5)
    // vec 0 and its duplicate vec 4: d1 = 0 → mu undefined
    assert(r(0).getDouble(1) == 0.0 && r(0).isNullAt(3))
    assert(r(4).getDouble(1) == 0.0 && r(4).isNullAt(3))
    // vec 1: nearest 0 (or its copy) at 1, then 3 at 2 → mu = 2
    assert(r(1).getDouble(1) == 1.0 && r(1).getDouble(2) == 1.0,
      "vec 1 first two NNs are the duplicate pair at distance 1")
    assert(r(1).getDouble(3) == 1.0)
    // vec 2: nearest 1 at 2, then 0 at 3 → mu = 1.5
    assert(r(2).getDouble(1) == 2.0 && r(2).getDouble(2) == 3.0 &&
      r(2).getDouble(3) == 1.5)
    // vec 3: nearest 2 at 4, then 1 at 6 → mu = 1.5
    assert(r(3).getDouble(1) == 4.0 && r(3).getDouble(2) == 6.0 &&
      r(3).getDouble(3) == 1.5)
    // the Pareto-MLE estimator the card defers to spec level
    // (no-transcendentals oracle policy): ID = n / sum(ln mu)
    val mus = r.filter(!_.isNullAt(3)).map(_.getDouble(3))
    val id = mus.length / mus.map(math.log).sum
    assert(id > 0.0 && id.isFinite, s"MLE intrinsic dimension $id")
  }

  test("anisotropy: streaming moment halves reassemble the batch card bit-exactly") {
    // the s43 replacement guarantee: moments (pos/neg decimal split,
    // dim -1 norm channel) -> report == anisotropyCard on every column
    val card = Geometry.anisotropyCard(clustered).collect().head
    val viaMoments = Geometry
      .anisotropyFromMoments(Geometry.anisotropyMoments(clustered))
      .collect().head
    assert(viaMoments.getLong(0) == card.getLong(0))
    assert(viaMoments.getInt(1) == card.getInt(1))
    (2 to 5).foreach(i =>
      assert(viaMoments.getDouble(i) == card.getDouble(i),
        s"column $i drifts: ${viaMoments.getDouble(i)} vs ${card.getDouble(i)}"))
  }

  test("covariance: explode form == single-pass Aggregator within 1e-9") {
    val exact = Geometry.covarianceMoments(clustered)
      .orderBy("dim_i", "dim_j").collect()
    val fast = Geometry.covarianceMomentsAgg(clustered, 4)
      .orderBy("dim_i", "dim_j").collect()
    assert(exact.length == 10 && fast.length == 10)
    exact.zip(fast).foreach { case (e, f) =>
      assert(e.getInt(0) == f.getInt(0) && e.getInt(1) == f.getInt(1))
      assert(e.getLong(2) == f.getLong(2))
      assert(math.abs(e.getDouble(5) - f.getDouble(5)) < 1e-9,
        s"cov drift at (${e.getInt(0)},${e.getInt(1)})")
    }
  }

  test("covariance diagonal is variance (non-negative), matrix is PSD, effective rank sane") {
    val cov = Geometry.covarianceMoments(clustered)
    val rows = cov.collect()
    rows.filter(r => r.getInt(0) == r.getInt(1)).foreach(r =>
      assert(r.getDouble(5) >= -1e-12, s"negative variance at ${r.getInt(0)}"))
    // PSD: every eigenvalue >= -eps
    val d = 4
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      m(r.getInt(0))(r.getInt(1)) = r.getDouble(5)
      m(r.getInt(1))(r.getInt(0)) = r.getDouble(5)
    }
    val eigs = Geometry.jacobiEigenvalues(m)
    assert(eigs.forall(_ >= -1e-9), s"not PSD: ${eigs.mkString(",")}")
    // trace preserved by the eigensolver
    val trace = rows.filter(r => r.getInt(0) == r.getInt(1))
      .map(_.getDouble(5)).sum
    assert(math.abs(eigs.sum - trace) < 1e-9)
    val er = Geometry.effectiveRank(cov)
    assert(er >= 1.0 && er <= d + 1e-9, s"effective rank out of range: $er")
  }

  test("effectiveRank: identity covariance has effective rank D, rank-1 has 1") {
    import spark.implicits._
    val d = 3
    val ident = (0 until d).flatMap(i => (i until d).map(j =>
      (i, j, 100L, 0.0, 0.0, if (i == j) 2.5 else 0.0)))
      .toDF("dim_i", "dim_j", "n", "mean_i", "mean_j", "cov")
    assert(math.abs(Geometry.effectiveRank(ident) - d) < 1e-9)
    val rank1 = (0 until d).flatMap(i => (i until d).map(j =>
      (i, j, 100L, 0.0, 0.0, 1.0))) // all-ones matrix: eigenvalues {3,0,0}
      .toDF("dim_i", "dim_j", "n", "mean_i", "mean_j", "cov")
    assert(math.abs(Geometry.effectiveRank(rank1) - 1.0) < 1e-9)
  }

  test("quantizationFidelity: int8 round-trip keeps cosine near 1, constant vector defined") {
    val df = embDF(Seq(
      (0L, Seq(0.5f, -0.25f, 0.75f, 0.1f), 0),
      (1L, Seq(2.0f, 2.0f, 2.0f, 2.0f), 1))) // constant → mx == mn branch
    val r = Geometry.quantizationFidelity(df, minOk = 0.995)
      .orderBy("label").collect()
    assert(r(0).getDouble(2) > 0.999, "255-level quantization loses <0.1% cosine")
    assert(r(0).getLong(5) == 0)
    // constant vector dequantizes to the constant → cosine exactly 1
    assert(r(1).getDouble(2) == 1.0)
  }

  test("jlDistortion: ratios cluster near 1 on the real fixture shape") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val df = (0L until 24L).map(i =>
        (i, Seq.fill(64)(rng.nextGaussian().toFloat).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val r = Geometry.jlDistortionPairs(df, sampleMaxId = 24L,
      k = 16, seed = 7L, dim = 64).collect()
    assert(r.length == 24 * 23 / 2)
    val ratios = r.map(_.getDouble(4))
    // JL at k=16: sub-gaussian concentration — all ratios in a wide
    // band, most in a tight one
    assert(ratios.forall(x => x > 0.1 && x < 4.0))
    val near = ratios.count(x => x > 0.5 && x < 2.0)
    assert(near >= ratios.length * 0.8,
      s"only $near/${ratios.length} ratios within [0.5, 2]")
  }
}
