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

  test("jlNeighborRecall: collinear sample is order-preserved under any linear projection -> recall 1") {
    import spark.implicits._
    // x_i = t_i * u: projected distances are |t_i - t_j| * ||Pu|| — the
    // SAME neighbor order as the original |t_i - t_j| * ||u||, so
    // recall@k must be exactly 1 for every vector (distinct gaps, no
    // ties; ||Pu|| > 0 for the seeded planes)
    val ts = Seq(0f, 1f, 3f, 7f, 15f, 31f, 50f, 80f)
    val emb = ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq.tabulate(8)(d => if (d < 2) t else 0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = graft.operators.Geometry
      .jlNeighborRecall(emb, sampleMaxId = 8L, kNn = 3, kProj = 4,
        seed = 7L, dim = 8)
      .collect()
    assert(r.length == 8)
    r.foreach(row => assert(row.getLong(1) == 3L &&
      row.getDouble(2) == 1.0, s"vec ${row.getLong(0)} lost neighbors"))
  }

  test("sampledMeanEstimate: every-7th sample picks ranks 1 and 8, exact counts and means") {
    import spark.implicits._
    // metric = punct chars / chars; "!" is punct, letters are not
    def text(nPunct: Int): String = "ab" + ("!" * nPunct)
    val docs = (0L until 8L).map(i => (i, text(i.toInt), "s"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Sampling.sampledMeanEstimate(docs, k = 7)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 8L && row.getLong(2) == 2L)
    def m(i: Int): Double = i.toDouble / (2 + i)
    val truth = (0 until 8).map(m).sum / 8
    val est = (m(0) + m(7)) / 2 // ranks 1 and 8 under (rk-1) % 7 == 0
    assert(math.abs(row.getDouble(3) - truth) < 1e-9, "true_mean")
    assert(math.abs(row.getDouble(4) - est) < 1e-9, "est_mean")
    assert(math.abs(row.getDouble(5) - (est - truth)) < 1e-9, "err")
  }

  test("orderedFunnel: strict ordering, re-ordered journeys and same-ts ties do not convert") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      // click BEFORE the first view: no ordered click, so the later
      // purchase cannot count either
      (2L, "click", t(1)), (2L, "view", t(2)), (2L, "purchase", t(3)),
      (3L, "view", t(1)), (3L, "click", t(2)),
      (4L, "purchase", t(1)),
      // same-ts view+click: strictly-after excludes the tie
      (5L, "view", t(5)), (5L, "click", t(5)))
      .toDF("user_id", "event_type", "ts")
    val r = graft.operators.Funnels
      .orderedFunnel(events, Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(4L, 2L, 1L),
      "n_users per step: views {1,2,3,5}, ordered clicks {1,3}, full {1}")
    assert(r(0).isNullAt(3) && r(0).getDouble(4) == 1.0)
    assert(r(1).getDouble(3) == 0.5 && r(1).getDouble(4) == 0.5)
    assert(r(2).getDouble(3) == 0.5 && r(2).getDouble(4) == 0.25)
  }

  test("cohortRetention: hand-computed cohort cells") {
    import spark.implicits._
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d $h%02d:00:00")
    val events = Seq(
      (1L, ts(0, 1)), (1L, ts(0, 9)), (1L, ts(1, 2)), (1L, ts(3, 2)),
      (2L, ts(0, 5)),
      (3L, ts(1, 1)), (3L, ts(2, 1)))
      .toDF("user_id", "ts")
    val r = graft.operators.Funnels.cohortRetention(events)
      .orderBy("cohort_day", "day_offset").collect()
      .map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2),
        x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-01", 3, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0),
      ("2024-01-02", 1, 1L, 1L, 1.0)))
  }

  test("passAtKFromScores: Chen estimator closed forms, k > n undefined, median threshold rank") {
    import spark.implicits._
    // group 0: n=4, c=3 (scores 2,3,4 clear thr=2); group 1: n=2, c=0
    val scores = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0), (3L, 4.0),
      (4L, 0.5), (5L, 0.6)).toDF("doc_id", "score")
    val thr = Seq(2.0).toDF("thr")
    val r = graft.operators.Preference
      .passAtKFromScores(scores, thr, groupSize = 4, ks = Seq(1, 2, 4))
      .orderBy("group_id").collect()
    assert(r.length == 2)
    val g0 = r(0)
    assert(g0.getLong(1) == 4L && g0.getLong(2) == 3L,
      "scores 2,3,4 >= thr 2.0")
    // n=4, c=3: pass@1 = 1 - 1/4; pass@2 = 1 - (1/4)(0/3) = 1 exactly
    assert(g0.getDouble(3) == 1.0 - 1.0 / 4.0)
    assert(g0.getDouble(4) == 1.0)
    assert(g0.getDouble(5) == 1.0, "n - c < k: a product term is 0")
    val g1 = r(1)
    assert(g1.getLong(1) == 2L && g1.getLong(2) == 0L)
    // c=0: pass@1 = 1 - 2/2 = 0; pass@2 = 1 - (2/2)(1/1) = 0
    assert(g1.getDouble(3) == 0.0 && g1.getDouble(4) == 0.0)
    assert(g1.isNullAt(5), "k=4 > n=2 is undefined")
    // lower median: rank (6+1) DIV 2 = 3 by (score, doc_id) -> 1.0
    val m = graft.operators.Preference.medianThreshold(scores).collect()
    assert(m.length == 1 && m.head.getDouble(0) == 1.0)
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

  test("labelNoiseCells: separable corpus is diagonal-only, counts and fractions exact") {
    import spark.implicits._
    // two disjoint vocabularies: after 3 GD rounds every label-1 doc
    // shares one score s+ and every label-0 doc one score s-, with
    // s+ > s-; thresholds equal the class scores, so each doc clears
    // exactly its own class -> two clean diagonal cells of 8
    val docs = (0L until 8L).map(i => (i, "alpha beta gamma", "src0")) ++
      (8L until 16L).map(i => (i, "delta epsilon zeta", "src9"))
    val df = docs.toDF("doc_id", "text", "source")
    val r = graft.operators.QualityModel
      .labelNoiseCells(df, positiveSources = Seq("src0"), iters = 3)
      .orderBy("label", "y_hat").collect()
    assert(r.length == 2, s"expected two diagonal cells, got ${r.toSeq}")
    val c0 = r(0); val c1 = r(1)
    assert(c0.getInt(0) == 0 && c0.getInt(1) == 0 && c0.getLong(2) == 8L &&
      c0.getLong(3) == 8L && c0.getDouble(4) == 1.0 && c0.getBoolean(5))
    assert(c1.getInt(0) == 1 && c1.getInt(1) == 1 && c1.getLong(2) == 8L &&
      c1.getLong(3) == 8L && c1.getDouble(4) == 1.0 && c1.getBoolean(5))
  }

  test("int8QuantizationCard: constant dim has zero scale and error; grid values reconstruct exactly") {
    import spark.implicits._
    // dim 0 constant -> scale 0, both errors 0; dim 1 spans 0..255 on
    // the integer grid -> scale exactly 1.0, q = x, zero error;
    // dim 2 has one off-grid value 100.25 (representable in float) ->
    // q = 100, |err| = 0.25 exactly
    val emb = Seq(
      (0L, Seq(5.0f, 0.0f, 0.0f)),
      (1L, Seq(5.0f, 100.0f, 100.25f)),
      (2L, Seq(5.0f, 255.0f, 255.0f)))
      .toDF("vec_id", "embedding")
    val r = graft.operators.Geometry.int8QuantizationCard(emb)
      .orderBy("dim").collect()
    assert(r.length == 3)
    val d0 = r(0)
    assert(d0.getDouble(4) == 0.0 && d0.getDouble(5) == 0.0 &&
      d0.getDouble(6) == 0.0, "constant dim: scale 0, zero error")
    val d1 = r(1)
    assert(d1.getDouble(4) == 1.0, "0..255 grid: scale exactly 1")
    assert(d1.getDouble(5) == 0.0 && d1.getDouble(6) == 0.0,
      "grid values reconstruct exactly")
    val d2 = r(2)
    assert(d2.getDouble(5) == 0.25,
      s"off-grid 100.25 quantizes to 100 with error 0.25, got ${d2.getDouble(5)}")
  }
}
