package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the BM25 side of a RAG /
  * retrieval-augmented training-data pipeline, complementing the dense
  * tiers ([[Similarity]]: brute/LSH/IVF/PQ) the way production
  * retrieval stacks pair a lexical and a vector leg. Reference
  * capability analog: the keyed join-and-fold composition
  * (`/root/reference/src/main/scala/SimpleStreamProcessor/Stream.scala:56-68`,
  * `Node.scala:118-160`) — term-keyed candidate generation, per-pair
  * score fold.
  *
  * Scoring is Okapi BM25 with the RATIONAL idf core
  * `(N − df + 0.5)/(df + 0.5)` instead of its logarithm — libm `ln` is
  * not cross-engine bit-exact (the n20/n42/n59 no-transcendentals
  * policy); the rational form preserves the ranking signal (monotone
  * per term) and keeps every per-term value a chain of +,·,/ that both
  * engines evaluate identically, so scores sit under the exact-decimal
  * hash oracle.
  */
object Retrieval {

  /** Query-by-document BM25 ("more like this"): each document with
    * `doc_id < nQueries` becomes a query (its DISTINCT tokens are the
    * query terms), every other document is scored
    *
    *   Σ_t idf'(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * over the shared terms, and the top `k` per query are kept
    * (score desc, doc_id ties). Self-matches are excluded.
    *
    * Scale shape: the inverted index (doc, term, tf) and df table are
    * hash aggregations with map-side partials; the query-term table is
    * tiny and BROADCAST; candidate generation is the term-keyed
    * equi-join (docs sharing no term with a query are never touched —
    * the inverted-index property); one (q, doc)-keyed aggregation
    * folds the per-term scores; the final top-k is a window
    * partitioned BY QUERY. At 100 TB the index is the bucketed-by-term
    * materialized artifact and per-query cost is bounded by posting
    * lists, not corpus size.
    *
    * Output: (q_id, rank, doc_id, score).
    */
  def bm25MoreLikeThis(
      docs: DataFrame,
      nQueries: Long,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      materializeTf: Boolean = true): DataFrame = {
    require(nQueries >= 1, s"nQueries must be >= 1, got $nQueries")
    require(k >= 1, s"k must be >= 1, got $k")
    // tf feeds dl, df, the query-term extraction AND the posting join —
    // four consumers, and the executed plan re-explodes the corpus for
    // each without materialization (ScanAudit: documents×4, zero
    // exchange reuse); the n110 policy: one spillable materialization.
    // `materializeTf = false` exists ONLY so ScaleProbe can measure the
    // trade (cache-fill barrier vs four explode passes) instead of
    // arguing it — production callers always materialize.
    val tfBase = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val tf =
      if (materializeTf)
        tfBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tfBase
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val qterms = tf.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("t")).distinct()
    // per-(query, doc, term) partial — written operation for operation
    // like the oracle so the double chain is bit-identical
    val termScore: Column =
      ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))) *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / col("avgdl")))
    // df and dl plan as BroadcastHashJoins at bench SF and that is the
    // RIGHT local plan (r17 measured receipt): the broadcasts keep the
    // big tf frame un-shuffled through all three probes in one stage,
    // and hinting them SHUFFLE_HASH — the n44 dupGrams fix — doubled
    // n86 (1.74 → 3.28 cold) because tf then shuffles twice (by t,
    // then by doc_id) to spare two small single-threaded builds. The
    // n44 pattern applies only when the build aggregate is LARGE
    // relative to the probe (dup-gram sets); df/dl are vocab-/doc-
    // count-sized. At 100 TB both exceed the broadcast threshold and
    // the planner falls to shuffle joins on its own — no hint needed
    // for the scale story.
    val scored = tf
      .join(broadcast(qterms), "t")
      .filter(col("doc_id") =!= col("q_id"))
      .join(df, "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("q_id"), col("doc_id"))
      // DECIMAL(38,12) route, NOT dsum's (28,6): per-term BM25 values
      // are quotients, and the 12-dp VARCHAR-routed contract
      // (Sql.oSum12 oracle-side) is the one engineered for summing
      // arbitrary doubles across engines (the n68 err/n precedent)
      .agg(QualityModel.xsum(termScore).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("score"), asc("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "doc_id", "score")
  }

  /** Two-stage retrieve-then-rerank: cheap BM25 candidate generation
    * (top `candidateK` per query) followed by a LEARNED reranker —
    * the [[Preference]] Bradley–Terry reward model trained on the
    * corpus's own preference pairs — keeping the top `k` by reward.
    * This is the production retrieval shape: the lexical stage bounds
    * the candidate set by posting lists, the trained stage orders it
    * by quality, and neither ever scores the full corpus per query.
    *
    * Scale shape: [[bm25MoreLikeThis]]'s shapes, plus one doc-keyed
    * reward aggregation over the corpus (computed ONCE, joined to
    * candidates — not per query) and a query-partitioned rerank
    * window. Output: (q_id, rerank, doc_id, bm25_rank, bm25_score,
    * reward).
    */
  def hybridRerank(
      docs: DataFrame,
      nQueries: Long,
      candidateK: Int,
      k: Int): DataFrame = {
    require(k >= 1 && candidateK >= k,
      s"need candidateK >= k >= 1, got candidateK=$candidateK k=$k")
    val cands = bm25MoreLikeThis(docs, nQueries, candidateK)
    // score ONLY the surviving candidates: the reward aggregation is a
    // full tokenize+hash pass per doc it touches, and the join below
    // discards every non-candidate row anyway — the semi-join bounds
    // the reranker's cost by nQueries·candidateK, not the corpus
    val candDocs = docs.join(
      cands.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    val rewards = Preference
      .scoreWith(candDocs, Preference.btTrain(docs))
      .withColumnRenamed("score", "reward")
    val win = Window.partitionBy(col("q_id"))
      .orderBy(desc("reward"), asc("rank"))
    cands.join(rewards, "doc_id")
      .withColumn("rerank", row_number().over(win).cast("int"))
      .filter(col("rerank") <= k)
      .select(col("q_id"), col("rerank"), col("doc_id"),
        col("rank").as("bm25_rank"), col("score").as("bm25_score"),
        col("reward"))
  }
}
