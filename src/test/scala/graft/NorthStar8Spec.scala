package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed model pins for the round-12 operators — the closed
  * forms on inputs small enough to verify on paper, so a semantic
  * drift fails here with a readable diff instead of as a driver hash
  * mismatch.
  */
class NorthStar8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ModelArtifacts: loadLatest returns exactly the highest version") {
    val base = java.nio.file.Files.createTempDirectory("graft_ma_").toFile
    try {
      val dir = new java.io.File(base, "m").getAbsolutePath
      graft.operators.ModelArtifacts.writeVersion(
        Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), dir, 1)
      graft.operators.ModelArtifacts.writeVersion(
        Seq(("a", 10L), ("b", 20L), ("c", 30L)).toDF("k", "v"), dir, 2)
      val got = graft.operators.ModelArtifacts.loadLatest(spark, dir)
        .select("k", "v", "version").as[(String, Long, Int)]
        .collect().sortBy(_._1).toSeq
      // v1's rows must be invisible: wrong-version selection is the
      // failure mode the n115/s34 oracles exist to catch
      assert(got == Seq(("a", 10L, 2), ("b", 20L, 2), ("c", 30L, 2)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base)
    }
  }

  test("hellingerDrift: identical slices read exactly 0, disjoint exactly 1") {
    // identical per-bin counts: BC = Σ√(c·c)/√(n·n) = n/n = 1 with no
    // rounding anywhere (√(c²) is exact), so H² is exactly 0.0
    val same = Seq(("k", 0L, 1.0), ("k", 1L, 1.5), ("k", 2L, 7.2),
      ("k", 3L, 7.9)).toDF("key", "event_id", "value")
    val r1 = graft.operators.Drift
      .hellingerDrift(same, "key", "value", col("event_id") % 2 === 0)
      .select("hellinger_sq").as[Double].head()
    assert(r1 == 0.0, s"identical slices must read exactly 0, got $r1")
    // disjoint supports: every bin has ca=0 or cb=0 → BC = 0, H² = 1
    val disjoint = Seq(("k", 0L, 1.0), ("k", 2L, 1.5), ("k", 1L, 50.0),
      ("k", 3L, 60.0)).toDF("key", "event_id", "value")
    val r2 = graft.operators.Drift
      .hellingerDrift(disjoint, "key", "value", col("event_id") % 2 === 0)
      .select("hellinger_sq").as[Double].head()
    assert(r2 == 1.0, s"disjoint slices must read exactly 1, got $r2")
  }

  test("madBounds: [1,2,3,4,100] pins med=3, mad=1, bounds [0,6], one outlier") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("k", _))
      .toDF("key", "value")
    val r = graft.operators.Drift.madBounds(df, "key", "value")
      .as[(String, Long, Double, Double, Double, Double, Long, Long)]
      .head()
    // n=5 → lower median rank (5+1) DIV 2 = 3 → med 3; deviations
    // {2,1,0,1,97} sorted {0,1,1,2,97} → mad 1; bounds 3 ± 3·1 = [0,6];
    // only 100 escapes
    assert(r == (("k", 5L, 3.0, 1.0, 0.0, 6.0, 0L, 1L)), s"got $r")
  }

  test("sourceLengthTvd: disjoint length bins pin TVD = 0.5 per source") {
    // s1 docs land in bin 0 (5 tokens), s2 in bin 2 (25 tokens):
    // per source Σ|c_s·n_a − c_a·n_s| = |2·4−2·2| + |0·4−2·2| = 8,
    // tvd = 8 / (2·2·4) = 0.5 — exactly, integer arithmetic throughout
    val five = "a b c d e"
    val twentyFive = Seq.fill(25)("x").mkString(" ")
    val docs = Seq(
      (1L, five, "s1"), (2L, five, "s1"),
      (3L, twentyFive, "s2"), (4L, twentyFive, "s2"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.sourceLengthTvd(docs)
      .orderBy("source")
      .select("source", "n_docs", "n_bins", "tvd")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(("s1", 2L, 2L, 0.5), ("s2", 2L, 2L, 0.5)), s"got $r")
  }

  test("ivfProbeSweep slices are bit-identical to per-call ivfTopK") {
    // the sweep's whole claim: sharing the assignment/scoring across
    // settings changes the COST, never the result — each setting's
    // slice must equal the per-call ranking row for row
    val S = graft.operators.Similarity
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding"))
    val q = emb.filter(col("id") < 5)
    val sweep = S.ivfProbeSweep(q, emb, 5, Seq(1, 2, 4)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    Seq(1, 2, 4).foreach { p =>
      val percall = S.ivfTopK(q, emb, 5, nProbe = p)
        .select("q_id", "n_id", "cos_sim", "rank").collect()
        .map(r => (p, r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      val slice = sweep.filter(_._1 == p)
      assert(slice == percall,
        s"nProbe=$p sweep/per-call drift: only-sweep=${slice -- percall}, " +
          s"only-percall=${percall -- slice}")
    }
  }

  test("ModelArtifacts.loadVersion reads exactly the pinned version") {
    val base = java.nio.file.Files.createTempDirectory("graft_mv_").toFile
    try {
      val dir = new java.io.File(base, "m").getAbsolutePath
      graft.operators.ModelArtifacts.writeVersion(
        Seq(("a", 1L)).toDF("k", "v"), dir, 1)
      graft.operators.ModelArtifacts.writeVersion(
        Seq(("a", 10L)).toDF("k", "v"), dir, 2)
      val v1 = graft.operators.ModelArtifacts.loadVersion(spark, dir, 1)
        .select("k", "v").as[(String, Long)].collect().toSeq
      assert(v1 == Seq(("a", 1L)),
        "loadVersion(1) must see v1's values even after v2 lands")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base)
    }
  }

  test("source dup card: planted copies pin the counts") {
    // s1: 3 docs, 2 distinct (one pair of copies); s2: 2 distinct docs
    val docs = Seq(
      (1L, "x y z", "s1"), (2L, "x y z", "s1"), (3L, "p q", "s1"),
      (4L, "m n", "s2"), (5L, "r s", "s2")).toDF("doc_id", "text", "source")
    val fps = docs
      .select(col("source"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .groupBy("source", "fp")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("copies"))
    val card = fps.groupBy("source")
      .agg(org.apache.spark.sql.functions.sum(col("copies")).as("n_docs"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_distinct"),
        org.apache.spark.sql.functions.max(col("copies")).as("max_copies"))
      .orderBy("source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(card == Seq(("s1", 3L, 2L, 2L), ("s2", 2L, 2L, 1L)), s"got $card")
  }

  test("minhashEstimateEval: identical texts pin est = exact = 1, err = 0") {
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = graft.operators.Dedup.minhashEstimateEval(docs)
      .select("id_a", "id_b", "n_match", "est_jaccard",
        "exact_jaccard", "abs_err")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    // identical shingle sets → identical signatures (all 16 components
    // match) and exact Jaccard 1.0 → zero estimation error
    assert(r == Seq((1L, 2L, 16L, 1.0, 1.0, 0.0)), s"got $r")
  }
}
