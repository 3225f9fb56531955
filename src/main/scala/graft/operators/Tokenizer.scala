package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-aware upgrade over [[TextAnalysis.TokenPattern]]'s BPE-ish
  * regex: learn the top-k merges from the corpus itself.
  *
  * BPE trains on the WORD VOCABULARY (word → count), not the token
  * stream: each round counts adjacent symbol pairs weighted by word
  * frequency, picks the most frequent pair (ties to the
  * lexicographically smallest — deterministic in any engine), and
  * merges it everywhere. Symbols are carried as a '|'-delimited string
  * (`|h|e|l|l|o|`) so a merge is a plain `replace` of `|a|b|` with
  * `|ab|` — applied TWICE per round, because non-overlapping
  * left-to-right replace misses every second occurrence of an adjacent
  * run (`a b a b`); the two-pass form is deterministic and identical
  * in any engine, which is what the oracle contract needs (a documented
  * divergence from single-scan greedy BPE for runs longer than ~4
  * repeats — unobservable on natural-language vocabularies).
  *
  * Delimiter soundness: a corpus word that itself contains '|' would
  * corrupt symbol boundaries undetected, so such words are EXCLUDED
  * from the vocabulary (and therefore from segmentation stats — the
  * oracle applies the same `NOT LIKE '%|%'` gate). The rewrite itself
  * is built with the Column API (`functions.replace` on literal
  * columns), never by interpolating learned symbols into SQL text — an
  * apostrophe or backslash in a learned symbol is data, not syntax.
  *
  * Scale shape: the vocabulary aggregation is one hash agg over the
  * exploded corpus (map-side partials; vocab is Zipf-small relative to
  * the corpus); each round is a scan-stage pair explode + hash agg over
  * the VOCAB only, with a single (l, r, count) row collected per round
  * — k rows of driver state total, the k-means-codebook pattern. The
  * corpus text is read once. The persisted vocab base is released
  * before returning (the merges are driver-materialized, so no
  * returned plan can re-read it — see the package-object persist
  * contract).
  */
object Tokenizer {

  /** Initial '|'-delimited symbol string for a word: `|h|e|l|l|o|`. */
  private def initialSym(w: org.apache.spark.sql.Column) =
    concat(lit("|"), regexp_replace(w, "(.)", "$1|"))

  /** Two-pass merge rewrite of round (l, r) — Column API on literal
    * patterns, so learned symbols are never parsed as SQL.
    */
  private def mergeRewrite(sym: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column = {
    val pat = lit(s"|$l|$r|")
    val rep = lit(s"|$l$r|")
    replace(replace(sym, pat, rep), pat, rep)
  }

  /** Returns the learned merges as (round, lhs, rhs, merged,
    * pair_count) — up to `k` rows; FEWER when the vocabulary runs out
    * of adjacent pairs first (a tiny corpus, or every word fully
    * merged), rather than failing on an empty argmax.
    */
  def bpeTrainMerges(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    // vocab persists: every round's pair count and merge rewrite reads
    // it, and round r's symbols chain on round r-1's (lineage of ≤ k
    // cheap string rewrites on top of the persisted agg)
    val base = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(!col("w").contains("|"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("c"), initialSym(col("w")).as("sym"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var vocab: DataFrame = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    (1 to k).foreach { r =>
      if (!exhausted) {
        val best = vocab
          .select(col("c"),
            filter(split(col("sym"), "\\|"), x => x =!= "").as("ss"))
          .filter(size(col("ss")) >= 2)
          .select(col("c"), explode(expr(
            """transform(sequence(0, size(ss) - 2),
                 i -> struct(element_at(ss, i + 1) AS l,
                             element_at(ss, i + 2) AS r))""")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("c")).as("pc"))
          .orderBy(desc("pc"), asc("l"), asc("r"))
          .take(1).headOption
        best match {
          case None => exhausted = true // no adjacent pairs left: stop early
          case Some(row) =>
            val (l, rt, pc) = (row.getString(0), row.getString(1), row.getLong(2))
            vocab = vocab.select(col("c"),
              mergeRewrite(col("sym"), l, rt).as("sym"))
            merges += ((r, l, rt, pc))
        }
      }
    }
    base.unpersist(blocking = false)
    merges.toSeq.toDF("round", "lhs", "rhs", "pair_count")
      .withColumn("merged", concat(col("lhs"), col("rhs")))
      .select("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply [[bpeTrainMerges]]' learned segmentation back to the corpus
    * and report per-source tokenization stats — the "how well does the
    * learned vocab compress each source?" fan-out check (a source that
    * tokenizes to many more symbols per word than the corpus average is
    * distributionally far from the training mix). Counting is a join of
    * the exploded corpus against the TRAINED vocab's final symbol
    * strings (vocab-sized, broadcastable — the corpus text itself never
    * carries symbol strings through a shuffle). Words containing the
    * '|' delimiter are outside the vocabulary (see object scaladoc), so
    * the inner join drops their occurrences on both engines.
    *
    * Output per source: (source, n_words, n_symbols, symbols_per_word),
    * exact integers plus one final division.
    */
  def bpeSegmentationStats(docs: DataFrame, k: Int): DataFrame = {
    // retrain; the trained vocab stays distributed (the k merge rows
    // are the only driver state) — re-derive final syms by replaying
    // the merge chain over the vocab
    val merges = bpeTrainMerges(docs, k)
      .select("lhs", "rhs").collect().map(r => (r.getString(0), r.getString(1)))
    segmentationStatsWith(docs, merges.toSeq)
  }

  /** The APPLY half with the merge chain as an input — the tokenizer-
    * artifact read path (n124 loads the merges from a versioned
    * [[ModelArtifacts]] store instead of retraining; [[bpeSegmentationStats]]
    * is train-then-apply through this same function, so the two paths
    * cannot drift). Merges apply in TRAINING ORDER — BPE rounds are
    * prefix-stable (round r depends only on rounds < r), which is what
    * makes a k-round artifact's first j rows exactly the j-round model.
    */
  def segmentationStatsWith(
      docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val vocabSym = merges.foldLeft(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(!col("w").contains("|")).distinct()
        .select(col("w"), initialSym(col("w")).as("sym"))) {
      case (v, (l, rt)) =>
        v.select(col("w"), mergeRewrite(col("sym"), l, rt).as("sym"))
    }.select(col("w"),
      size(filter(split(col("sym"), "\\|"), x => x =!= "")).as("n_sym"))
    docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(vocabSym), "w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym").cast("long")).as("n_symbols"))
      .withColumn("symbols_per_word",
        col("n_symbols").cast("double") / col("n_words").cast("double"))
  }
}
