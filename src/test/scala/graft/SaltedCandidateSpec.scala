package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The r18 hot-shingle salt in the AllPairs candidate self-join
  * (`Dedup.jaccardPairsOn`): splitting a prefix shingle's build side
  * ⌈df/saltDf⌉ ways and replicating the probe side must change NOTHING
  * about the emitted pairs — only which task computes them. Pinned by
  * running the same corpus with the salt binding hard (threshold 2, so
  * every hot prefix key splits) and not at all (the shipped local
  * regime, where measured sf0.1 max df = 25 << 1024) and requiring
  * bit-identical results.
  */
class SaltedCandidateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** A dup-heavy corpus — the single-giant-key regime the salt exists
    * for: docs 0-9 are IDENTICAL (shingles {7,8,9}, so their prefixes
    * hold only hot keys with df ≥ 10 and the candidate join cross-
    * products inside those keys), docs 10-14 share only the hot
    * shingle 7 and stay below the threshold.
    */
  private def tok: DataFrame =
    ((0L until 10L).map(i => (i, Seq(7L, 8L, 9L))) ++
      (10L until 15L).map(i => (i, Seq(7L, 100L + i, 200L + i))))
      .toDF("doc_id", "sh")

  private def canon(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }.toSeq.sorted

  test("salted (binding) == disabled pairs, bit-exact") {
    val D = graft.operators.Dedup
    val salted = canon(D.jaccardPairsOn(tok, 0.5, saltThreshold = 2))
    val disabled = canon(D.jaccardPairsOn(tok, 0.5, saltThreshold = 0))
    assert(salted == disabled)
    // the corpus really produces the 45 identical-doc pairs
    assert(salted.size == 45)
  }

  test("salted machinery at a non-binding threshold is also exact") {
    val D = graft.operators.Dedup
    val noop = canon(D.jaccardPairsOn(tok, 0.5,
      saltThreshold = Int.MaxValue)) // factor ≡ 1 everywhere
    val disabled = canon(D.jaccardPairsOn(tok, 0.5, saltThreshold = 0))
    assert(noop == disabled)
  }

  test("salted join finds exactly the identical-doc pairs") {
    val D = graft.operators.Dedup
    val pairs = canon(D.jaccardPairsOn(tok, 0.5, saltThreshold = 2))
      .map(p => (p._1, p._2)).toSet
    assert(pairs == (for {
      a <- 0L until 10L; b <- (a + 1) until 10L
    } yield (a, b)).toSet)
  }
}
