package graft

import graft.operators.Geometry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The n142 replacement guarantee (ZCA whitening is rows-only — no
  * SQL eigensolve): the whitened data's covariance IS the identity on
  * well-conditioned input, the eigendecomposition reconstructs the
  * matrix it factored, and degenerate (rank-deficient) input stays
  * finite through the eps guard.
  */
class WhiteningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def correlated(n: Int, d: Int, seed: Long) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val base = rng.nextGaussian()
      val e = Array.tabulate(d)(j =>
        (base * (1.0 + 0.3 * j) + rng.nextGaussian() * 0.5).toFloat)
      (i.toLong, e.toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("jacobiEigenvectors: V diag(l) V^T reconstructs the input") {
    val rng = new scala.util.Random(11)
    val d = 6
    val m0 = Array.fill(d, d)(rng.nextGaussian())
    val sym = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => m0(i)(k) * m0(j)(k)).sum) // PSD by construction
    val (eigs, v) = Geometry.jacobiEigenvectors(sym)
    (0 until d).foreach { i =>
      (0 until d).foreach { j =>
        val rec = (0 until d).map(k => v(i)(k) * eigs(k) * v(j)(k)).sum
        assert(math.abs(rec - sym(i)(j)) < 1e-9, s"($i,$j)")
      }
    }
    assert(eigs.forall(_ >= -1e-9), "PSD input must give PSD spectrum")
  }

  test("zcaWhiten: whitened covariance is the identity") {
    val df = correlated(300, 6, seed = 7)
    val white = Geometry.zcaWhiten(df, eps = 1e-9)
    // re-assemble and measure covariance of the whitened coordinates
    val rows = white.collect()
    val n = rows.map(_.getLong(0)).distinct.length
    val d = rows.map(_.getInt(1)).max + 1
    val byVec = rows.groupBy(_.getLong(0)).map { case (_, rs) =>
      val a = Array.ofDim[Double](d)
      rs.foreach(r => a(r.getInt(1)) = r.getDouble(2))
      a
    }.toSeq
    val mean = Array.tabulate(d)(j => byVec.map(_(j)).sum / n)
    (0 until d).foreach { i =>
      (0 until d).foreach { j =>
        val c = byVec.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
        if (i == j)
          assert(math.abs(c - 1.0) < 1e-3, s"diag($i) = $c")
        else
          assert(math.abs(c) < 1e-6, s"off-diag($i,$j) = $c")
      }
      // whitening also centers: the transform is applied to x - mu
      assert(math.abs(mean(i)) < 1e-6, s"mean($i)")
    }
  }

  test("zcaWhiten: rank-deficient input stays finite (eps guard)") {
    import spark.implicits._
    // dimension 2 is constant -> zero variance -> eigenvalue 0
    val rng = new scala.util.Random(3)
    val df = (0 until 50).map(i =>
        (i.toLong, Seq(rng.nextGaussian().toFloat,
          rng.nextGaussian().toFloat, 2.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val rows = Geometry.zcaWhiten(df).collect()
    assert(rows.length == 150)
    rows.foreach(r => assert(!r.getDouble(2).isNaN &&
      !r.getDouble(2).isInfinite, s"non-finite at $r"))
    // the constant dimension whitens to (exactly centered) ~0
    rows.filter(_.getInt(1) == 2).foreach(r =>
      assert(math.abs(r.getDouble(2)) < 1e-3))
  }
}
