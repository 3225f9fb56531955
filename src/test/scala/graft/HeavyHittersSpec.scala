package graft

import graft.operators.{HeavyHitters, MisraGriesAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/** Misra-Gries summary laws + the two-pass exact heavy-hitter operator. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Drive the Aggregator's reduce/merge directly (no Spark) the way a
    * partial+final aggregation would: split the stream into chunks,
    * reduce each, merge the partials.
    */
  private def summarize(k: Int, stream: Seq[String], chunks: Int): Set[String] = {
    val agg = new MisraGriesAgg(k)
    val parts = stream.grouped(math.max(1, stream.size / chunks)).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(parts.reduce(agg.merge)).toSet
  }

  test("MG coverage law: every item with freq > N/(k+1) survives any split") {
    val rnd = new Random(42)
    for (trial <- 1 to 25) {
      val vocabSize = 5 + rnd.nextInt(60)
      val n = 200 + rnd.nextInt(2000)
      // zipf-ish skew so some items genuinely cross the threshold
      val stream = Seq.fill(n)(s"t${(math.pow(rnd.nextDouble(), 3) * vocabSize).toInt}")
      val k = 2 + rnd.nextInt(12)
      val freq = stream.groupBy(identity).view.mapValues(_.size)
      val mustKeep = freq.filter(_._2 > n.toDouble / (k + 1)).keySet
      val kept = summarize(k, stream, chunks = 1 + rnd.nextInt(8))
      assert(mustKeep.subsetOf(kept),
        s"trial $trial: lost ${mustKeep -- kept} (n=$n k=$k)")
      assert(kept.size <= k, s"trial $trial: summary overflow ${kept.size} > $k")
    }
  }

  test("exactTopK equals the brute-force top-k on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = HeavyHitters.exactTopK(docs, summaryK = 64, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("n48 coverage premise: 10th exact count clears the sketch bound") {
    // exactTopK is only exact when the candidate set covers the true
    // top-k; that holds when freq(top-k'th) > N/(summaryK+1). Assert it
    // on the fixture so a data regen that breaks the premise fails here,
    // not in the driver's hash compare.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val tenth = HeavyHitters.exactTopK(docs, 64, 10)
      .orderBy(asc("freq")).head().getLong(1)
    assert(tenth > n.toDouble / 65,
      s"10th count $tenth must exceed N/(k+1) = ${n / 65.0}")
  }

  test("boilerplateRemoval: per-source grams removed, cross-source kept") {
    // "promo offer" rides 3 of 4 srcA docs (75% >= 20%): boilerplate in
    // srcA. The SAME bigram appears in only 1 of 4 srcB docs (25% >= 20%
    // — also boilerplate there; threshold is per-source). "rare gram"
    // appears once in srcA (25% >= 20% at these tiny sizes) — so use a
    // 5-doc source where 1/5 = 20% boundary holds and 3/5 vs 1/5 splits.
    val docs = Seq(
      (1L, "srcA", "promo offer alpha beta gamma"),
      (2L, "srcA", "promo offer delta epsilon zeta"),
      (3L, "srcA", "promo offer eta theta iota"),
      (4L, "srcA", "kappa lambda mu nu xi"),
      (5L, "srcA", "omicron pi rho sigma tau"),
      (6L, "srcB", "promo offer upsilon phi chi")
    ).toDF("doc_id", "source", "text")
    // srcA: "promo offer" df=3/5=60% >= 40% -> boilerplate; covered
    // tokens drop. srcB: df=1/1=100% -> ALSO boilerplate (per-source).
    val out = graft.operators.Dedup.boilerplateRemoval(docs, 2, 0.4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getString(5))).toMap
    assert(out(1L) == ((5, 3, "alpha beta gamma")))
    assert(out(2L) == ((5, 3, "delta epsilon zeta")))
    assert(out(3L) == ((5, 3, "eta theta iota")))
    // docs without the gram keep everything
    assert(out(4L) == ((5, 5, "kappa lambda mu nu xi")))
    assert(out(5L) == ((5, 5, "omicron pi rho sigma tau")))
    // srcB's single doc: every bigram has df 1/1 = 100% -> whole doc is
    // "boilerplate" (degenerate single-doc source; threshold is relative)
    assert(out(6L)._2 == 0)
  }

  test("qualityQuantileGate keeps exactly ceil(frac*n) per source, best first") {
    val docs = Seq(
      // srcA: 3 docs; stopword-rich text scores higher
      (1L, "srcA", "the a and of to the a and of to"),
      (2L, "srcA", "alpha beta gamma delta epsilon"),
      (3L, "srcA", "the quick brown fox jumps"),
      // srcB: 2 docs with digits dragging one down
      (4L, "srcB", "the best of the best"),
      (5L, "srcB", "12345 67890 11111 22222 33333")
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.Sampling.qualityQuantileGate(docs, 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    // srcA keeps ceil(0.5*3)=2: the two highest scores
    assert(out(1L)._1 == 1 && out(1L)._3, "all-stopword doc must rank 1")
    assert(Seq(out(1L), out(2L), out(3L)).count(_._3) == 2)
    assert(!out(2L)._3, "no-stopword doc must be the one dropped in srcA")
    // srcB keeps ceil(0.5*2)=1: the stopword doc, not the digit doc
    assert(out(4L) == ((1, 2L, true)))
    assert(out(5L) == ((2, 2L, false)))
  }

  test("dupClustersKeepBest keeps the high-quality member, not the min id") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, s"$base 12345"), // digit-laden copy (lower quality), LOWER id
      (11L, s"$base the"),   // stopword-rich copy (higher quality)
      (20L, "completely unrelated singleton text here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Clustering.dupClustersKeepBest(docs, 3, 0.8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3)))
      .toMap
    // 10 and 11 share 28 of 30 3-shingles (J ≈ 0.93): one cluster,
    // component = min id = 10 — but the SURVIVOR is 11, the cleaner copy
    assert(out(10L) == ((10L, false)), "min-id member must lose to quality")
    assert(out(11L) == ((10L, true)))
    assert(out(20L) == ((20L, true)), "singleton keeps itself")
  }

  test("pipelineV2 composes: boilerplate stripped, gate top-3, best dup kept") {
    // letter-only tokens: a digit inside a token (w1, z3…) would feed
    // digit_ratio and invert the intended score ordering
    val ab = "abcdefghijklmnopqrstuvwxyz"
    val base = (0 until 30).map(i => s"t${ab(i % 26)}${ab(i / 26)}")
      .mkString(" ")
    val zs = (0 until 10).map(i => s"z${ab(i)}").mkString(" ")
    val ms = (0 until 10).map(i => s"m${ab(i)}").mkString(" ")
    val docs = Seq(
      // "promo offer" rides 3/5 docs (60% >= 50%): boilerplate. After
      // cleanup, docs 1+2 are near-dups (J = 29/30) with doc 2 scoring
      // higher (2 stopwords vs 1); doc 3 is a stopword-rich singleton.
      (1L, "sA", s"promo offer $base the"),
      (2L, "sA", s"promo offer $base the a"),
      (3L, "sA", s"promo offer $zs of"),
      (4L, "sA", ms),                              // no stopwords: score 0
      (5L, "sA", "na nb 12345")                    // digits: score < 0
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.Curation
      .pipelineV2(docs, boilerN = 2, boilerFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // gate keeps ceil(0.5*5)=3 {3,2,1}; dedup keeps doc 2 over doc 1
    // (higher quality, component = min id = 1); doc 3 is a singleton
    assert(out == Map(2L -> 1L, 3L -> 3L),
      s"expected survivors {2 -> comp 1, 3 -> comp 3}, got $out")
  }

  test("editDistancePairs: identical pair scores 1.0, mutation scores < 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "totally different words that never overlap anything")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.editDistancePairs(docs, 3, 0.3, 0.5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getDouble(3)))).toMap
    assert(out((1L, 2L)) == ((0, 1.0)))
    assert(out((1L, 3L))._1 == 3) // "theta" -> "iota": 2 subs + 1 deletion
    assert(out((1L, 3L))._2 < 1.0 && out((1L, 3L))._2 > 0.8)
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }
}
