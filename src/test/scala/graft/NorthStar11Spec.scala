package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form fixtures for the round-15 calibration / corpus-shape
  * cards (the TwoNN geometry pieces live in EmbeddingGeometrySpec).
  */
class NorthStar11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("zipfOctaves: hand-computed octave masses on a fixed count spectrum") {
    import spark.implicits._
    // term counts: a=8, b=4, c=2, d=1, e=1 → ranks a:1 b:2 c:3 d:4 e:5
    // octaves: {1}→0, {2,3}→1, {4,5}→2; total tokens = 16
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e")).mkString(" ")
    val docs = Seq((0L, text, "s")).toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.zipfOctaves(docs)
      .orderBy("octave").collect()
    assert(r.length == 3)
    assert(r(0).getInt(0) == 0 && r(0).getLong(1) == 1L &&
      r(0).getLong(2) == 1L && r(0).getLong(3) == 1L &&
      r(0).getLong(4) == 8L && r(0).getDouble(5) == 0.5)
    assert(r(1).getInt(0) == 1 && r(1).getLong(1) == 2L &&
      r(1).getLong(2) == 3L && r(1).getLong(3) == 2L &&
      r(1).getLong(4) == 6L && r(1).getDouble(5) == 6.0 / 16.0)
    assert(r(2).getInt(0) == 2 && r(2).getLong(1) == 4L &&
      r(2).getLong(2) == 5L && r(2).getLong(3) == 2L &&
      r(2).getLong(4) == 2L && r(2).getDouble(5) == 2.0 / 16.0)
  }

  test("conformalGate: threshold is the k-th smallest calibration-positive score, k = floor((n+1)*alpha)") {
    import spark.implicits._
    // two sources, positives = srcA; enough docs for stable training
    val docs = (0L until 40L).map { i =>
      val src = if (i % 2 == 0 || i < 10) "srcA" else "srcB"
      (i, s"tok${i % 7} common words here ${"pad " * (i % 3).toInt}", src)
    }.toDF("doc_id", "text", "source")
    val card = graft.operators.QualityModel
      .conformalGate(docs, positiveSources = Seq("srcA"),
        iters = 2, alphaPm = 200)
      .collect()
    assert(card.length == 1)
    val row = card.head
    // plain replay over the SAME trained scores
    val scored = graft.operators.QualityModel
      .trainedQualityScores(docs, Seq("srcA"), iters = 2)
      .select("doc_id", "label", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val calPos = scored.filter(t => t._1 % 2 == 0 && t._2 == 1)
      .sortBy(t => (t._3, t._1))
    val nCal = calPos.length.toLong
    val k = math.max((nCal + 1) * 200 / 1000, 1L)
    assert(row.getLong(0) == nCal, "n_cal_pos")
    assert(row.getLong(1) == k, "k")
    assert(row.getDouble(2) == calPos((k - 1).toInt)._3, "threshold")
    val thr = row.getDouble(2)
    val test = scored.filter(_._1 % 2 == 1)
    val kept = test.filter(_._3 >= thr)
    val testPos = test.count(_._2 == 1).toLong
    val keptPos = kept.count(_._2 == 1).toLong
    assert(row.getLong(3) == test.length.toLong, "n_test")
    assert(row.getLong(4) == testPos, "n_test_pos")
    assert(row.getLong(5) == kept.length.toLong, "n_kept")
    assert(row.getLong(6) == keptPos, "n_kept_pos")
    assert(row.getDouble(7) == keptPos.toDouble / testPos, "recall_test")
  }

  test("bestOfKUplift: k=1 is the group max, k >= group size has exactly zero uplift, means decrease in k") {
    import spark.implicits._
    val docs = (0L until 24L).map(i =>
        (i, s"w$i x y z common tokens ${"pad " * (i % 5).toInt}", "s"))
      .toDF("doc_id", "text", "source")
    val rows = graft.operators.Preference
      .bestOfKUplift(docs, groupSize = 4, ks = Seq(1, 2, 4), iters = 1)
      .collect()
    assert(rows.length == 6 * 3)
    val scores = graft.operators.Preference
      .groupAdvantages(docs, groupSize = 4, iters = 1)
      .select("group_id", "score").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    rows.groupBy(_.getLong(0)).foreach { case (g, rs) =>
      val byK = rs.map(r => r.getInt(1) -> r).toMap
      assert(byK.keySet == Set(1, 2, 4))
      // k = 1: the group max (12-dp decimal route: 1e-9 tolerance)
      assert(math.abs(byK(1).getDouble(5) - scores(g).max) < 1e-9)
      assert(byK(1).getLong(3) == 1L)
      // k = group size: top set == whole group → uplift EXACTLY 0
      assert(byK(4).getLong(3) == 4L)
      assert(byK(4).getDouble(6) == 0.0, s"group $g k=4 uplift")
      // monotone: more selection pressure → higher mean
      assert(byK(1).getDouble(5) >= byK(2).getDouble(5))
      assert(byK(2).getDouble(5) >= byK(4).getDouble(5))
      // k = 1 uplift is max - mean >= 0
      assert(byK(1).getDouble(6) >= 0.0)
    }
  }

  test("ngramNovelty: shared vs unique trigrams, short-doc whole-text shingle") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d", "s"),   // {a b c, b c d}
      (1L, "a b c x", "s"),   // {a b c, b c x} — shares "a b c" with doc 0
      (2L, "z z z z", "s"),   // {z z z} after distinct
      (3L, "p q", "s"))       // < 3 tokens → one whole-text shingle
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Dedup.ngramNovelty(docs, 3)
      .orderBy("doc_id").collect()
    assert(r.length == 4)
    def row(i: Int) = (r(i).getLong(1), r(i).getLong(2), r(i).getDouble(3))
    assert(row(0) == ((2L, 1L, 0.5)), "doc0: b c d unique, a b c shared")
    assert(row(1) == ((2L, 1L, 0.5)), "doc1: b c x unique, a b c shared")
    assert(row(2) == ((1L, 1L, 1.0)), "doc2: all-repeat text, one shingle")
    assert(row(3) == ((1L, 1L, 1.0)), "doc3: whole-text shingle")
  }
}
