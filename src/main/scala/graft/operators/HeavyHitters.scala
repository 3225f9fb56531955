package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Misra-Gries frequent-items summary as a typed Spark [[Aggregator]]
  * (the reference's UDAF surface is exactly this `(zero, reduce, merge)`
  * fold shape — `Node.scala:439-441` — generalized here to a mergeable
  * sketch).
  *
  * Guarantee (Misra & Gries 1982): after summarizing N items with k
  * counters, every item with true frequency > N/(k+1) is present in the
  * summary, and summaries MERGE without losing that bound (Agarwal et
  * al., PODS'12: add counts, then subtract the (k+1)-th largest and drop
  * non-positive). That makes the candidate set a provable superset of
  * the heavy hitters, computed with map-side partials — the long-tail
  * token space never shuffles, which is the point at 100 TB: a plain
  * `groupBy(token)` exchanges every distinct token; this exchanges at
  * most k counters per partition.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  require(k > 0, s"k must be > 0, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(
      b: mutable.Map[String, Long], t: String): mutable.Map[String, Long] = {
    if (b.contains(t)) b(t) += 1L
    else if (b.size < k) b(t) = 1L
    else {
      // classic decrement-all step: one shared "charge" against every
      // tracked item pays for the untracked arrival
      b.mapValuesInPlace((_, v) => v - 1L)
      b.filterInPlace((_, v) => v > 0L)
    }
    b
  }

  override def merge(
      a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (t, v) => a(t) = a.getOrElse(t, 0L) + v }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything; ≤ k survive
      val cut = a.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      a.mapValuesInPlace((_, v) => v - cut)
      a.filterInPlace((_, v) => v > 0L)
    }
    a
  }

  override def finish(b: mutable.Map[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  // buffers cross the partial/final boundary serialized; kryo handles the
  // mutable map without a bespoke schema (the buffer is internal state,
  // never user-visible)
  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    Encoders.kryo[Seq[String]]
}

/** Exact corpus-level heavy hitters in two passes: a Misra-Gries
  * candidate sweep (no token shuffle) followed by an exact recount of
  * the ≤ `summaryK` candidates only. The result is EXACT top-`topK` —
  * the sketch only bounds what must be recounted — provided
  * `summaryK` satisfies the coverage bound (every true top-`topK` token
  * has frequency > N/(summaryK+1)); HeavyHittersSpec asserts that bound
  * against the recount.
  */
object HeavyHitters {

  /** (token, freq) of the exact `topK` most frequent whitespace tokens,
    * ties broken by token ascending.
    */
  def exactTopK(docs: DataFrame, summaryK: Int, topK: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(tokens(col("text"))).as("token"))
    val candidates =
      toks.as[String].select(new MisraGriesAgg(summaryK).toColumn).head()
    // ≤ summaryK strings to the driver — the k-means-codebook pattern,
    // never the token table itself
    toks.filter(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token"))
      .limit(topK)
  }
}
