package graft

import graft.operators.{LanguageModel, TextAnalysis}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-4 corpus statistics: byte-histogram diversity
  * and bigram-LM fluency, pinned on hand-computed fixtures.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ByteHistogram counts every UTF-8 byte, including multi-byte chars") {
    val h = graft.expressions.ByteHistogram(Literal("é a"))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // "é a" = C3 A9 20 61
    assert(h.numElements() == 256)
    assert(h.getLong(0xC3) == 1 && h.getLong(0xA9) == 1 &&
      h.getLong(0x20) == 1 && h.getLong(0x61) == 1)
    assert((0 until 256).map(h.getLong).sum == 4)
  }

  test("byteDiversity: exact stats on known strings, null-safe on empty") {
    import spark.implicits._
    val docs = Seq((1L, "aab"), (2L, "éé"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.byteDiversity(docs).orderBy("doc_id").collect()
    // "aab": bytes {a:2, b:1}; Σc²=5; simpson=5/9; effective=9/5
    assert(out(0).getLong(1) == 3 && out(0).getInt(2) == 2)
    assert(out(0).getDouble(3) == 2.0 / 3)
    assert(out(0).getDouble(4) == 5.0 / 9)
    assert(out(0).getDouble(5) == 9.0 / 5)
    // "éé" = C3 A9 C3 A9: 4 bytes, 2 distinct, Σc²=8 → simpson 0.5
    assert(out(1).getLong(1) == 4 && out(1).getInt(2) == 2)
    assert(out(1).getDouble(4) == 0.5 && out(1).getDouble(5) == 2.0)
    // empty text: zero counts, null ratios (no division by zero)
    assert(out(2).getLong(1) == 0 && out(2).getInt(2) == 0)
    assert(out(2).isNullAt(3) && out(2).isNullAt(4) && out(2).isNullAt(5))
  }

  test("bloom-prefiltered decontamination == exact decontamination") {
    // no false negatives: the sketch path must reproduce the exact
    // operator row-for-row, including the tie-broken best bench_id
    val docs = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 0)
    val exact = graft.operators.Decontamination
      .flagContaminated(docs, bench, 3, 0.2).orderBy("doc_id").collect()
    val bloom = graft.operators.Decontamination
      .flagContaminatedBloom(docs, bench, 3, 0.2).orderBy("doc_id").collect()
    assert(exact.nonEmpty, "fixture should produce contaminated docs")
    assert(bloom.toSeq == exact.toSeq)
  }

  test("datasetCard: exact counts on a hand-built corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a  B C", "en", "s1"), // normalizes to "a b c" → exact dup of 1
      (3L, "x y", "de", "s1"),
      (4L, "p q r s", "en", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.TextAnalysis.datasetCard(docs)
      .orderBy("source").collect()
    // s1: 3 docs, 2 unique (1≡2 after whitespace/case normalization),
    // tokens 3 + 4 + 2 = 9 ("a  B C" splits into 4 with the empty segment)
    assert(out(0).getString(0) == "s1")
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 2 &&
      out(0).getLong(3) == 1)
    assert(out(0).getLong(4) == 9 && out(0).getLong(5) == 2)
    assert(out(0).getDouble(6) == 3.0 && out(0).getDouble(7) == 2.0 / 3)
    assert(out(1).getString(0) == "s2" && out(1).getLong(1) == 1 &&
      out(1).getLong(3) == 0)
  }

  test("removeDupSpans: planted cross-doc 3-gram span is cut from both docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c x y z"), // "x y z" duplicated across docs 1 and 2
      (2L, "p q x y z r"),
      (3L, "u v w")        // untouched
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.removeDupSpans(docs, 3, 2)
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 6 && out(0).getInt(2) == 3 &&
      out(0).getString(3) == "a b c")
    assert(out(1).getInt(1) == 6 && out(1).getInt(2) == 3 &&
      out(1).getString(3) == "p q r")
    assert(out(2).getInt(1) == 3 && out(2).getInt(2) == 3 &&
      out(2).getString(3) == "u v w")
  }

  test("removeDupSpans matches a brute-force model on a seeded corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (1L to 30L).map(i =>
      (i, Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")))
    val n = 2
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toVector }
    val grams = toks.flatMap { case (id, ts) =>
      ts.sliding(n).zipWithIndex.collect {
        case (g, p) if g.size == n => (id, p, g.mkString(" "))
      }
    }
    val dup = grams.groupBy(_._3).collect {
      case (g, xs) if xs.map(_._1).distinct.size >= 2 => g
    }.toSet
    val covered = grams.filter(x => dup(x._3)).groupBy(_._1)
      .map { case (id, xs) => id -> xs.flatMap(x => x._2 until x._2 + n).toSet }
    val expected = toks.map { case (id, ts) =>
      val keep = ts.indices.filterNot(covered.getOrElse(id, Set.empty))
      (id, ts.size, keep.size, keep.map(ts).mkString(" "))
    }
    val got = graft.operators.Dedup
      .removeDupSpans(corpus.toDF("doc_id", "text"), n, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == expected.toSeq)
  }

  test("pageRank: path graph — center outranks symmetric leaves, mass ~1") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = graft.operators.Clustering.pageRank(edges, iters = 5)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 1L)) // degrees
    val Seq(p1, p2, p3) = out.map(_._3).toSeq
    assert(p1 == p3, "symmetric leaves must tie exactly")
    assert(p2 > p1, "the center of the path must outrank the leaves")
    assert(math.abs(p1 + p2 + p3 - 1.0) < 1e-9, "probability mass conserved")
  }

  test("bigramFluency: add-one smoothed likelihood on a hand-computed corpus") {
    import spark.implicits._
    // corpus: "a b a", "a b", "x" → V=3; c(a,b)=2, c(b,a)=1; c1(a)=2, c1(b)=1
    // p(a,b) = (2+1)/(2+3) = 0.6 → 600000 ppm
    // p(b,a) = (1+1)/(1+3) = 0.5 → 500000 ppm
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = LanguageModel.bigramFluency(docs).orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2)
    assert(out(0).getDouble(2) == 550000.0) // (600000 + 500000) / 2
    assert(out(0).getBoolean(3))
    assert(out(1).getLong(1) == 1)
    assert(out(1).getDouble(2) == 600000.0)
    // single-token doc: no bigrams, null score, null gate
    assert(out(2).getLong(1) == 0 && out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("embedding decontamination flags the planted semantic double only") {
    import spark.implicits._
    // dim-64 fixture: eval vector v; corpus holds 2·v (same direction →
    // same sign-bucket under every plane, cosine ≈ 1) and an orthogonal
    // w (cosine exactly 0 — below any threshold even when a probe
    // bucket happens to collide)
    val v = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else 0.0f)
    val v2 = v.map(_ * 2.0f)
    val w = Array.tabulate(64)(i => if (i % 2 == 1) 1.0f else 0.0f)
    val emb = Seq((1L, v.toSeq), (200L, v2.toSeq), (300L, w.toSeq))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Decontamination
      .flagContaminatedEmbedding(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 100),
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 100),
        threshold = 0.2)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((200L, 1L)))
    assert(out.head.getDouble(2) > 0.999999)
  }
  test("sourceGateHealth: Wilson interval matches the closed form; extremes get flagged") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // srcGood: 10 long English docs (gate passes); srcBad: 10 numeric
    // docs (gate fails); srcMid: 5/5 — with the pool at 50%, the
    // extreme sources' intervals exclude it and the mid source's spans it
    val good = "the cat and the dog ran to the big park and sat by a tall tree today"
    val bad = "1 2 3 4 5 6 7 8 9 10 11 12"
    val rows = (0 until 10).map(i => (i.toLong, "srcGood", good)) ++
      (10 until 20).map(i => (i.toLong, "srcBad", bad)) ++
      (20 until 30).map(i =>
        (i.toLong, "srcMid", if (i % 2 == 0) good else bad))
    val got = TextAnalysis.sourceGateHealth(
      rows.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6),
          r.getBoolean(7)))).toMap
    def wilson(x: Long, n: Long): (Double, Double) = {
      val p = x.toDouble / n.toDouble
      val nd = n.toDouble
      val zz = 3.8416
      val denom = 1.0 + zz / nd
      val center = (p + zz / (2.0 * nd)) / denom
      val half = 1.96 * math.sqrt(
        p * (1.0 - p) / nd + zz / (4.0 * nd * nd)) / denom
      (center - half, center + half)
    }
    got.foreach { case (src, (n, x, lo, hi, _)) =>
      val (wl, wh) = wilson(x, n)
      assert(lo == wl && hi == wh, s"$src interval drifted: $lo/$hi vs $wl/$wh")
    }
    assert(got("srcGood")._3 > 0.5 && got("srcGood")._5,
      "a 10/10 source must be flagged above a 50% pool")
    assert(got("srcBad")._4 < 0.5 && got("srcBad")._5,
      "a 0/10 source must be flagged below a 50% pool")
    assert(!got("srcMid")._5, "a 5/10 source must not be flagged at a 50% pool")
  }

  test("vocabRichness: Chao1 and coverage on a hand-computed fixture") {
    import spark.implicits._
    // srcA: tokens a a b c -> V=3, f1=2 (b,c), f2=1 (a), N=4
    // chao1 = 3 + 2*1/(2*2) = 3.5; coverage = 1 - 2/4 = 0.5
    val docs = Seq((1L, "srcA", "a a b c")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.vocabRichness(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 3L, 2L, 1L)))
    assert(r.getDouble(5) == 3.5 && r.getDouble(6) == 0.5)
  }

  test("termBurstiness: dispersion and adaptation on a hand-computed fixture") {
    import spark.implicits._
    // d1: a a a b | d2: b | d3: c c   (n_docs = 3, zeros included)
    val docs = Seq((1L, "a a a b"), (2L, "b"), (3L, "c c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.termBurstiness(docs, minDf = 1L)
      .orderBy("t").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // a: counts (3,0,0) -> mean 1, E[c^2] 3, disp (3-1)/1 = 2, adapt 1
    assert(got("a") == ((1L, 3L, 1.0, 2.0, 1.0)))
    // b: counts (1,1,0) -> mean 2/3, E[c^2] 2/3,
    //    disp = (2/3 - (2/3)^2)/(2/3); never twice in a doc -> adapt 0
    val mb = 2.0 / 3.0
    assert(got("b") == ((2L, 2L, mb, (mb - mb * mb) / mb, 0.0)))
    // c: counts (0,0,2) -> mean 2/3, E[c^2] 4/3, burstier than b
    assert(got("c") == ((1L, 2L, mb, (4.0 / 3.0 - mb * mb) / mb, 1.0)))
    assert(got("c")._4 > got("b")._4,
      "a clustered term must out-disperse an evenly spread one")
  }

  test("gateFleiss: kappa closed form on planted unanimous/degenerate/split sources") {
    import spark.implicits._
    // keep3: passes all three gates (10 words, mean len 3-10, 2+
    // stopwords, no digits/punct/PII). drop0: fails all three (digit
    // ratio, word count, longnum PII). mixed2: quality+PII pass,
    // Gopher fails (5 words < 10).
    val keep3 = "the quick brown fox and the lazy dog jump over"
    val drop0 = "123456789 987654321"
    val mixed2 = "alpha beta gamma delta epsilon"
    val docs = Seq(
      ("srcAgree", keep3), ("srcAgree", keep3),
      ("srcAgree", drop0), ("srcAgree", drop0),
      ("srcConst", keep3), ("srcConst", keep3),
      ("srcSplit", keep3), ("srcSplit", mixed2),
      ("srcSplit", drop0), ("srcSplit", drop0))
      .zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.gateFleiss(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(7)) None else Some(r.getDouble(7))))).toMap
    // srcAgree: k per row (3,3,0,0) -> unanimous raters, kappa = 1
    assert(got("srcAgree")._1 == 4L && got("srcAgree")._2 == 6L)
    assert(got("srcAgree")._4.contains(1.0))
    // srcConst: every gate keeps every row -> p_e = 1, kappa NULL
    assert(got("srcConst") == ((2L, 6L, 12L, None)))
    // srcSplit: k = (3,2,0,0); agree6 = 6+2+6+6 = 20
    assert(got("srcSplit")._2 == 5L && got("srcSplit")._3 == 20L)
    val pbar = 20.0 / (6.0 * 4.0)
    val p = 5.0 / (3.0 * 4.0)
    val pe = p * p + (1.0 - p) * (1.0 - p)
    assert(got("srcSplit")._4.contains((pbar - pe) / (1.0 - pe)))
  }

  test("sourceAffinity: cosine/Jaccard closed form; disjoint pairs drop") {
    import spark.implicits._
    // sA and sB identical term vectors; sC overlaps sA on one term;
    // sD shares nothing with anyone (must be absent from the output)
    val docs = Seq(
      (1L, "sA", "x x y"), (2L, "sB", "x x y"),
      (3L, "sC", "y z"), (4L, "sD", "w"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceAffinity(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got.keySet == Set(("sA", "sB"), ("sA", "sC"), ("sB", "sC")),
      "exactly the sharing pairs, sD excluded")
    // sA=sB={x:2,y:1}: dot=5, |A∩B|=2, |A∪B|=2 -> jaccard 1;
    // cosine = 5/(sqrt(5)*sqrt(5)) (the engines' exact FP tree)
    assert(got(("sA", "sB")) ==
      ((2L, 5L, 5.0 / (math.sqrt(5.0) * math.sqrt(5.0)), 1.0)))
    // sA·sC share y only: dot=1*1, jac=1/(2+2-1)
    assert(got(("sA", "sC")) ==
      ((1L, 1L, 1.0 / (math.sqrt(5.0) * math.sqrt(2.0)), 1.0 / 3.0)))
  }

  test("sourceSignatureTerms: add-one odds ranking with lexicographic ties") {
    import spark.implicits._
    // "own" appears 6x only in srcA -> odds (6+1)/(0+1) = 7;
    // "both" appears 5x in each source -> odds (5+1)/(5+1) = 1;
    // "rare" appears 4x in srcA -> filtered by minTf = 5
    val docs = Seq(
      (1L, "srcA", "own own own own own own rare rare rare rare both both both both both"),
      (2L, "srcB", "both both both both both"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceSignatureTerms(docs)
      .orderBy("source", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("srcA", 1, "own", 6L, 0L, 7.0),
      ("srcA", 2, "both", 5L, 5L, 1.0),
      ("srcB", 1, "both", 5L, 5L, 1.0)))
  }

  test("lengthPercentiles: exact order statistics at rank ceil(p*n/100)") {
    import spark.implicits._
    // srcA: 10 docs of 1..10 tokens -> ranks ceil(p*10/100) = 5/9/10
    val a = (1 to 10).map(i =>
      (i.toLong, "srcA", Seq.fill(i)("w").mkString(" ")))
    // srcB: one 3-token doc -> every rank clamps to 1
    val docs = (a :+ ((99L, "srcB", "x y z")))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.lengthPercentiles(docs)
      .orderBy("source").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    assert(got("srcA") == ((10L, 5L, 9L, 10L, 10L, 5.5)))
    assert(got("srcB") == ((1L, 3L, 3L, 3L, 3L, 3.0)))
  }
}
