package graft

import graft.operators.{Clustering, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 distribution-level selection operators: DSIR importance,
  * soft-dedup reweighting, temperature mixture, Gopher word-shape
  * rules. Each test pins the exact integer arithmetic with a planted
  * fixture or a plain-Scala model replay (the repo's seeded-model
  * pattern) — no tolerance assertions anywhere, because the operators
  * are exact by construction.
  */
class DataSelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dsirSelect ranks target-like docs above off-target docs") {
    // target slice speaks "alpha beta"; off-target speaks "gamma delta".
    // Docs 10/11 mirror the target distribution, 12/13 the off-target
    // one — DSIR must rank {10,11} strictly above {12,13}, whatever the
    // smoothing constants do to absolute scores.
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta alpha"),
      (2L, "en", "beta alpha beta alpha beta"),
      (3L, "de", "gamma delta gamma delta gamma"),
      (4L, "de", "delta gamma delta gamma delta"),
      (10L, "de", "alpha beta alpha beta gamma"),
      (11L, "de", "beta alpha beta alpha delta"),
      (12L, "de", "gamma delta gamma delta alpha"),
      (13L, "de", "delta gamma delta gamma beta")
    ).toDF("doc_id", "lang", "text")
    val out = Sampling.dsirSelect(docs, col("lang") === "en", 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val score = out.view.mapValues(_._1).toMap
    assert(score(10L) > score(12L) && score(10L) > score(13L))
    assert(score(11L) > score(12L) && score(11L) > score(13L))
    // target docs themselves score highest; kept = top half = ranks 1-4
    val kept = Sampling.dsirSelect(docs, col("lang") === "en", 0.5)
      .filter(col("kept")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 10L, 11L),
      s"expected the target-like half kept, got $kept")
  }

  test("dsirSelect score matches a plain-Scala replay of the ppm arithmetic") {
    val rows = Seq(
      (1L, true, "x y x z"), (2L, false, "y z w w"), (3L, false, "x w y"))
    val docs = rows.map { case (id, t, txt) =>
      (id, if (t) "en" else "de", txt)
    }.toDF("doc_id", "lang", "text")
    // model: unigrams + bigrams with multiplicity
    def grams(s: String): Seq[String] = {
      val ts = s.split(" ").toSeq
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val perDoc = rows.map { case (id, t, txt) =>
      (id, t, grams(txt).groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val raw = perDoc.flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val tgt = perDoc.filter(_._2).flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val nRaw = raw.values.sum; val nTgt = tgt.values.sum; val v = raw.size.toLong
    val imp = raw.map { case (g, r) =>
      g -> (1000000L * (tgt.getOrElse(g, 0L) + 1L) * (nRaw + v)) /
        ((r + 1L) * (nTgt + v))
    }
    val expected = perDoc.map { case (id, _, cs) =>
      id -> cs.map { case (g, c) => c * imp(g) }.sum
    }.toMap
    val got = Sampling.dsirSelect(docs, col("lang") === "en", 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"scores diverge: got $got expected $expected")
  }

  test("dsirTrainGate/dsirScore agree with dsirSelect (the s19 contract)") {
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta alpha"),
      (2L, "en", "beta alpha beta alpha beta"),
      (3L, "de", "gamma delta gamma delta gamma"),
      (10L, "de", "alpha beta alpha beta gamma"),
      (12L, "de", "gamma delta gamma delta alpha")
    ).toDF("doc_id", "lang", "text")
    val sel = Sampling.dsirSelect(docs, col("lang") === "en", 0.5).collect()
    val (imp, thr) = Sampling.dsirTrainGate(docs, col("lang") === "en", 0.5)
    assert(thr == sel.filter(_.getBoolean(3)).map(_.getLong(1)).min,
      "gate threshold must be the min kept score under the rank rule")
    val applied = Sampling.dsirScoreModel(docs, imp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(applied == sel.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "occurrence-level apply must reproduce the batch scores exactly")
  }

  test("dupClustersSoftWeight: ppm weights are exact integer division") {
    // docs 1-3 are one near-dup cluster (shared shingles), 9 a singleton
    val dup = "spark shuffle partition broadcast join skew salt"
    val docs = Seq(
      (1L, s"$dup alpha"), (2L, s"$dup beta"), (3L, s"$dup gamma"),
      (9L, "totally different text about nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Clustering.dupClustersSoftWeight(docs, 3, 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 333333L)))
    assert(out(2L) == ((3L, 333333L)))
    assert(out(3L) == ((3L, 333333L)))
    assert(out(9L) == ((1L, 1000000L)))
  }

  test("temperatureMixture realizes the sqrt-flattened per-mille rates") {
    // c = [16, 4] -> s = [4e6, 2e6], S = 6e6; T = 12:
    //   rate_big  = 1000*12*4e6 / (6e6*16) = 500 per-mille
    //   rate_small = 1000*12*2e6 / (6e6*4) = 1000 per-mille
    // sqrt flattening: the 4x-bigger source gets only 2x the mass.
    val docs = (0 until 16).map(i => (i * 100L, "big", "t")) ++
      (0 until 4).map(i => (10000L + i, "small", "t"))
    val df = docs.toDF("doc_id", "source", "text")
    val out = Sampling.temperatureMixture(df, 12L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perMille = out.map(t => t._2 -> t._3).toMap
    assert(perMille == Map("big" -> 500L, "small" -> 1000L))
    // systematic realization: big keeps ids with id % 1000 < 500
    // (0,100,...,400 and 1000,1100,...,1400), small keeps all, 1 copy
    val bigKept = out.filter(_._2 == "big").map(_._1).sorted.toSeq
    assert(bigKept == Seq(0L, 100L, 200L, 300L, 400L,
      1000L, 1100L, 1200L, 1300L, 1400L))
    assert(out.filter(_._2 == "small").map(_._1).sorted.toSeq ==
      Seq(10000L, 10001L, 10002L, 10003L))
    assert(out.forall(_._4 == 0L), "no rate here exceeds 1000 per-mille")
  }

  test("temperatureMixture upsamples sources whose rate exceeds 1000 per-mille") {
    // c = [9, 1] -> s = [3e6, 1e6], S = 4e6; T = 8:
    //   rate_small = 1000*8*1e6 / (4e6*1) = 2000 per-mille -> 2 copies
    val docs = (0 until 9).map(i => (i.toLong, "big", "t")) :+
      (500L, "small", "t")
    val out = Sampling.temperatureMixture(docs.toDF("doc_id", "source", "text"), 8L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val small = out.filter(_._2 == "small")
    assert(small.map(_._3).sorted.toSeq == Seq(0L, 1L),
      s"2000 per-mille must yield exactly 2 copies, got $small")
  }

  test("qualityLengthSpearman: perfect, inverted, and degenerate sources") {
    // sAgree: higher score <-> longer text (both rank orders identical,
    // rho = 1). sInvert: score order is the REVERSE of length order for
    // 3 docs: sum_d2 = (1-3)^2 + 0 + (3-1)^2 = 8, rho = 1 - 48/24 = -1.
    // sOne: n = 1 -> NULL.
    val docs = Seq(
      (1L, "sAgree", "the a and of to xx"),      // 5/6 stopwords, longest
      (2L, "sAgree", "the a and zz"),            // mid score, mid length
      (3L, "sAgree", "zz yy"),                   // 0 stopwords, shortest
      (11L, "sInvert", "the a and of to"),       // best score, SHORTEST
      (12L, "sInvert", "the a zz yy ww qq"),     // mid score, mid length
      (13L, "sInvert", "zz yy xx ww vv uu tt ss"), // worst score, longest
      (21L, "sOne", "anything at all")
    ).map { case (id, src, txt) => (id, src, txt, txt.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
    val out = graft.operators.TextAnalysis.qualityLengthSpearman(docs)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("sAgree") == Some(1.0), s"agree: ${out("sAgree")}")
    assert(out("sInvert") == Some(-1.0), s"invert: ${out("sInvert")}")
    assert(out("sOne").isEmpty, "singleton source must be NULL")
  }

  test("simHashPairsPortable: exact dups at distance 0, disjoint text unpaired") {
    // 1 and 2 normalize identically (case + whitespace noise) -> same
    // md5-bit signature, hamming 0; 9 shares no token, so its expected
    // hamming from either is ~32 — far outside any <=3 radius
    val docs = Seq(
      (1L, "Spark Shuffle  Partition broadcast JOIN skew salt"),
      (2L, "spark shuffle partition broadcast join skew salt"),
      (9L, "entirely unrelated words about nothing shared at all here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.simHashPairsPortable(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 0)),
      s"expected exactly the normalized-identical pair at dist 0, got ${out.toSeq}")
    // and the native xxhash64 pipeline agrees on the exact-dup judgment
    val native = graft.operators.Dedup.simHashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native.contains((1L, 2L)), "native simhash must also pair the dups")
  }

  test("bpeTrainMerges learns the hand-computed merge sequence") {
    // vocab: aaab x2, ab x1, cd x1.
    // round 1 pairs: (a,a) 4 [two per 'aaab' x count 2], (a,b) 3, (c,d) 1
    //   -> merge (a,a); 'aaab' becomes (aa, a, b) under two-pass greedy
    // round 2: (aa,a) 2, (a,b) 2+1=3, (c,d) 1 -> merge (a,b)
    // round 3: 'aaab' is (aa, ab): (aa,ab) 2 beats (c,d) 1
    val docs = Seq((1L, "aaab ab"), (2L, "aaab cd"))
      .toDF("doc_id", "text")
    val out = graft.operators.Tokenizer.bpeTrainMerges(docs, 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)), s"got ${out.toSeq}")
  }

  test("bpeSegmentationStats: learned merges compress the training words") {
    // merges from the same fixture arithmetic as the trainer test:
    // (a,a), (a,b), (aa,ab). 'aaab' -> 1 symbol, 'ab' -> 1, 'cd' -> 2.
    val docs = Seq((1L, "s1", "aaab ab"), (2L, "s2", "aaab cd"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.Tokenizer.bpeSegmentationStats(docs, 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("s1") == ((2L, 2L, 1.0)), s"s1: ${out("s1")}")
    assert(out("s2") == ((2L, 3L, 1.5)), s"s2: ${out("s2")}")
  }

  test("bpeTrainMerges treats quote characters as data, not SQL syntax") {
    // apostrophes are ubiquitous in real English; the rewrite must be
    // Column-API literal work (the old expr-string interpolation failed
    // to parse the moment a learned symbol contained a quote).
    // vocab: don't x2, l'a x3. Round 1 pairs: (',a) 3 ties (l,') 3 ->
    // lexicographic smallest lhs "'" wins; round 2: (l,'a) 3.
    val docs = Seq((1L, "don't don't l'a"), (2L, "l'a l'a"))
      .toDF("doc_id", "text")
    val out = graft.operators.Tokenizer.bpeTrainMerges(docs, 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq == Seq((1, "'", "a", 3L), (2, "l", "'a", 3L)),
      s"got ${out.toSeq}")
  }

  test("bpeTrainMerges stops early when adjacent pairs exhaust") {
    // one two-char word: round 1 merges it fully; rounds 2-3 find no
    // adjacent pair and must return the merges learned so far, not
    // throw on an empty argmax
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val out = graft.operators.Tokenizer.bpeTrainMerges(docs, 3).collect()
    assert(out.length == 1 && out(0).getString(3) == "ab", s"got ${out.toSeq}")
  }

  test("bpeTrainMerges excludes words containing the '|' delimiter") {
    // 'x|y' would corrupt symbol boundaries undetected — it is outside
    // the vocabulary by contract; only 'cd' trains
    val docs = Seq((1L, "x|y cd"), (2L, "cd")).toDF("doc_id", "text")
    val out = graft.operators.Tokenizer.bpeTrainMerges(docs, 3)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq((1, "cd", 2L)), s"got ${out.toSeq}")
  }

  test("dsirScore gives unseen-vocabulary docs an explicit 0, not no row") {
    val train = Seq((1L, "en", "alpha beta"), (2L, "de", "gamma delta"))
      .toDF("doc_id", "lang", "text")
    val imp = Sampling.dsirImportance(train, col("lang") === "en")
    val incoming = Seq(
      (10L, "zzz yyy"), // every gram unseen at train time
      (11L, "alpha beta"), // fully in-vocabulary
      (12L, "") // empty text: still one ("") gram row, still scored
    ).toDF("doc_id", "text")
    val out = Sampling.dsirScore(incoming, imp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(10L, 11L, 12L),
      s"every incoming doc must be scored, got ${out.keySet}")
    assert(out(10L) == 0L && out(12L) == 0L, s"unseen-vocab docs score 0: $out")
    assert(out(11L) > 0L, s"in-vocab doc scores positive: $out")
  }

  test("gopherQualityRules flags each rule at its exact boundary") {
    val docs = Seq(
      // 10 words x 3 chars: word_count_ok (==10), mean exactly 3.0 (in),
      // all alpha, "the"+"and" absent -> needs stopwords: use none
      (1L, "abc def ghi jkl mno pqr stu vwx yza bcd"),
      // 9 words: below the word-count floor
      (2L, "abc def ghi jkl mno pqr stu vwx yza"),
      // mean word length 2.0 < 3: fails mean_len
      (3L, "ab cd ef gh ij kl mn op qr st"),
      // 2 of 10 words non-alpha (8/10 = exactly 80%: passes 5n>=4w);
      // contains the+and+of -> stop_ok
      (4L, "the and of word here 123 456 more word text"),
      // 3 of 10 non-alpha (70% < 80%): fails alpha
      (5L, "the and of word here 123 456 789 word text")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityRules(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))
      .toMap
    assert(out(1L) == ((true, true, true, false)), s"doc1: ${out(1L)}")
    assert(out(2L)._1 == false, "9 words fails the floor")
    assert(out(3L)._2 == false, "mean 2.0 fails [3,10]")
    assert(out(4L) == ((true, true, true, true)), s"doc4: ${out(4L)}")
    assert(out(5L)._3 == false, "70% alpha fails the 80% gate")
  }

  test("trainedQualityScores separates planted vocabularies in 3 GD steps") {
    // positive sources speak a disjoint vocabulary from negatives, so
    // three full-batch steps must already rank every curated doc above
    // every crawl doc and classify all eight correctly
    val docs = Seq(
      (1L, "curated", "alpha beta gamma alpha beta"),
      (2L, "curated", "beta gamma alpha beta gamma"),
      (3L, "curated", "gamma alpha beta gamma alpha"),
      (4L, "curated", "alpha gamma beta alpha gamma"),
      (5L, "crawl", "zork quux blarg zork quux"),
      (6L, "crawl", "quux blarg zork quux blarg"),
      (7L, "crawl", "blarg zork quux blarg zork"),
      (8L, "crawl", "zork blarg quux zork blarg")
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.QualityModel
      .trainedQualityScores(docs, positiveSources = Seq("curated"), iters = 3)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getInt(3))).toMap
    assert(out.size == 8, "one scored row per document")
    val pos = (1L to 4L).map(out(_)._2)
    val neg = (5L to 8L).map(out(_)._2)
    assert(pos.min > neg.max,
      s"curated scores $pos must all exceed crawl scores $neg")
    (1L to 8L).foreach { d =>
      val (label, score, pred) = out(d)
      assert(score > 0.0 && score < 1.0, s"doc $d score $score out of (0,1)")
      assert(pred == label, s"doc $d misclassified: pred $pred label $label")
    }
  }

  test("trainedQualityScores is invariant to input partitioning") {
    // the DECIMAL(38,12) aggregation route makes the whole training
    // trajectory order-free: any repartitioning yields bit-identical
    // scores (this is the property the cross-engine oracle relies on)
    val docs = (1L to 40L).map { i =>
      val src = if (i % 3 == 0) "good" else s"src${i % 5}"
      (i, src, s"tok${i % 7} tok${i % 11} tok${i % 13} tok${i % 7}")
    }.toDF("doc_id", "source", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      graft.operators.QualityModel
        .trainedQualityScores(df, positiveSources = Seq("good"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = scores(docs.coalesce(1))
    val b = scores(docs.repartition(7, col("doc_id")))
    assert(a == b, "scores must be bit-identical across partitionings")
  }
  test("evalSuiteAllocation: Hamilton apportionment spends k exactly with <1-slot error") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Sampling.evalSuiteAllocation(docs, 200).collect()
    assert(rows.length == 200, s"manifest has ${rows.length} rows, want 200")
    val perStratum = rows.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k2, rs) => (k2, rs.head.getLong(2), rs.head.getLong(3),
        rs.length) }.toList
    val total = perStratum.map(_._2).sum.toDouble
    perStratum.foreach { case ((lang, source), nDocs, alloc, filled) =>
      assert(filled.toLong == alloc, s"$lang/$source filled $filled of $alloc")
      assert(alloc <= nDocs, "allocation cannot exceed the stratum")
      val quota = 200.0 * nDocs / total
      assert(math.abs(alloc - quota) < 1.0,
        s"$lang/$source alloc $alloc vs quota $quota breaks the <1-slot bound")
    }
    // determinism: manifest is a pure function of the corpus
    val again = Sampling.evalSuiteAllocation(docs, 200).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("crossSourceLeakage: planted mirror pair lands cross-source, twin within") {
    import spark.implicits._
    val mirror = "alpha beta gamma delta epsilon zeta eta theta"
    val twin = "one two three four five six seven eight"
    val docs = Seq(
      (1L, "srcA", mirror), (2L, "srcB", mirror), // exact mirror across feeds
      (3L, "srcC", twin), (4L, "srcC", twin), // within-source duplicate
      (5L, "srcD", "lone unshared text with no duplicate partner here"))
      .toDF("doc_id", "source", "text")
    val got = graft.operators.Dedup
      .crossSourceLeakage(docs, 3, 0.8)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(("srcA", "srcB"), ("srcC", "srcC")))
    assert(got(("srcA", "srcB")) == ((true, 1L, 1.0)))
    assert(got(("srcC", "srcC")) == ((false, 1L, 1.0)))
  }
}
