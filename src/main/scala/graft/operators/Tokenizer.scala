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
  * Scale shape: the vocabulary aggregation is one hash agg over the
  * exploded corpus (map-side partials; vocab is Zipf-small relative to
  * the corpus); each round is a scan-stage pair explode + hash agg over
  * the VOCAB only, with a single (l, r, count) row collected per round
  * — k rows of driver state total, the k-means-codebook pattern. The
  * corpus text is read once.
  */
object Tokenizer {

  /** Returns the k merges as (round, left, right, pair_count). */
  def bpeTrainMerges(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    // vocab persists: every round's pair count and merge rewrite reads
    // it, and round r's symbols chain on round r-1's (lineage of ≤ k
    // cheap string rewrites on top of the persisted agg)
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("c"),
        concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|")).as("sym"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = (1 to k).map { r =>
      val best = vocab
        .select(col("c"),
          expr("filter(split(sym, '\\\\|'), x -> x != '')").as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("c"), explode(expr(
          """transform(sequence(0, size(ss) - 2),
               i -> struct(element_at(ss, i + 1) AS l,
                           element_at(ss, i + 2) AS r))""")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("pc"))
        .orderBy(desc("pc"), asc("l"), asc("r"))
        .limit(1).head()
      val (l, rt, pc) = (best.getString(0), best.getString(1), best.getLong(2))
      val pat = s"|$l|$rt|"
      val rep = s"|$l$rt|"
      vocab = vocab.select(col("c"),
        expr(s"replace(replace(sym, '$pat', '$rep'), '$pat', '$rep')").as("sym"))
      (r, l, rt, pc)
    }
    merges.toDF("round", "lhs", "rhs", "pair_count")
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
    * carries symbol strings through a shuffle).
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
    val vocabSym = merges.foldLeft(
      docs.select(explode(split(col("text"), " ")).as("w")).distinct()
        .select(col("w"),
          concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|")).as("sym"))) {
      case (v, (l, rt)) =>
        val pat = s"|$l|$rt|"
        val rep = s"|$l$rt|"
        v.select(col("w"),
          expr(s"replace(replace(sym, '$pat', '$rep'), '$pat', '$rep')").as("sym"))
    }.select(col("w"),
      expr("size(filter(split(sym, '\\\\|'), x -> x != ''))").as("n_sym"))
    docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(vocabSym), "w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym").cast("long")).as("n_symbols"))
      .withColumn("symbols_per_word",
        col("n_symbols").cast("double") / col("n_words").cast("double"))
  }
}
