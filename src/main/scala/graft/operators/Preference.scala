package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Preference-data construction and reward-model training — the
  * RLHF-side of the pipeline: mine (chosen, rejected) document pairs
  * from a per-source quality ranking, then fit a Bradley–Terry reward
  * model on the pairs with batch gradient descent INSIDE the engine.
  * Reference capability analog: the fold-iteration accumulator
  * (`/root/reference/src/main/scala/SimpleStreamProcessor/Stream.scala:56-68`)
  * — bounded driver state threaded through per-round passes over an
  * immutable frame, exactly the [[QualityModel]]/[[Mixture]] pattern.
  *
  * Exactness regime (shared with n68/n70): md5-hashed 64-bucket
  * features, fast-sigmoid squashing (no libm `exp`), every FP
  * aggregation through DECIMAL(38,12), driver updates written
  * operation-for-operation like the oracle's SQL — so the full
  * training trajectory hash-matches the DuckDB replay.
  */
object Preference {

  /** Mine position-matched preference pairs within each source: rank
    * documents by the composite quality score (stopword − punct −
    * digit ratios, the [[Sampling.qualityQuantileGate]] arithmetic;
    * ties broken by doc_id), then pair the i-th best with the i-th
    * worst — pair_id i couples rank i with rank m+1−i, for
    * i ≤ ⌊m/2⌋, so the best document rejects the worst and margins
    * shrink toward the middle (an odd source's median document sits
    * out). This is the standard synthetic-preference construction
    * when no human labels exist: score margin becomes the
    * preference-strength signal.
    *
    * Scale shape: one window partitioned BY SOURCE (rank + count over
    * the same partitioning — one shuffle), then a self-equi-join on
    * (source, rank) — co-partitioned by the window's own exchange. No
    * global order, no limit, nothing driver-side.
    */
  def minePairs(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"),
        (col("stopword_ratio") - col("punct_ratio") - col("digit_ratio"))
          .as("score"))
    val scored = docs.select(col("doc_id"), col("source")).join(q, "doc_id")
    val w = Window.partitionBy(col("source"))
      .orderBy(desc("score"), asc("doc_id"))
    val r = scored
      .withColumn("rk", row_number().over(w))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("source"))))
    val chosen = r.filter(col("rk") <= expr("m DIV 2"))
      .select(col("source"), col("rk").cast("int").as("pair_id"),
        col("doc_id").as("chosen_id"), col("score").as("chosen_score"),
        (col("m") + 1 - col("rk")).as("jrk"))
    val rejected = r.select(col("source"), col("rk").as("jrk"),
      col("doc_id").as("rejected_id"), col("score").as("rejected_score"))
    chosen.join(rejected, Seq("source", "jrk"))
      .select(col("source"), col("pair_id"), col("chosen_id"),
        col("rejected_id"), col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  /** Bradley–Terry reward-model training on [[minePairs]]' output: the
    * model scores a document s(d) = Σ_tokens w_b(t)/n_d (the n68
    * hashed-feature margin, bias-free — a BT bias cancels in every
    * pairwise difference), and each pair contributes its score
    * difference Δ = s(chosen) − s(rejected). One GD round: per-pair
    * error σ(Δ) − 1 under the fast sigmoid, per-bucket gradient
    * Σ_pairs sgn · err / n, update w ← w − lr·(g/P). Emitted
    * trajectory: after every round, each pair's Δ and win-probability
    * σ(Δ) — (iter, source, pair_id, chosen_id, rejected_id, margin,
    * p_chosen), hash-exact against the unrolled-CTE oracle.
    *
    * Scale shape: the pair-token frame is persisted once (scan +
    * pair equi-join); each round is two keyed partial aggregations
    * over it ((source, pair_id)-keyed margins, b-keyed gradients —
    * map-side combine bounds the bucket shuffle at ≤64 rows/task);
    * model state is 64 doubles per round (codebook pattern). Nothing
    * driver-side grows with the corpus.
    */
  def btTrajectory(
      docs: DataFrame,
      iters: Int = 3,
      lr: Double = 1.0): DataFrame = {
    import QualityModel.sig
    val (pairs, ptk, ws) = trainCore(docs, iters, lr)
    val rounds = ws.zipWithIndex.map { case (w, i) =>
      margins(ptk, w).select(lit(i + 1).as("iter"), col("source"),
        col("pair_id"), col("margin"), sig(col("margin")).as("p_chosen"))
    }
    // the returned per-round margin plans re-read ptk: the persisted
    // diamond stays alive for the returned plan; DiamondCaches releases
    // it once the caller drops the query
    val out = rounds.reduce(_.unionByName(_))
      .join(pairs, Seq("source", "pair_id"))
      .select("iter", "source", "pair_id", "chosen_id", "rejected_id",
        "margin", "p_chosen")
    graft.DiamondCaches.register(ptk, out)
  }

  /** Train and return only the final reward weights — the offline
    * artifact a streaming gate broadcasts ([[QualityModel.trainGate]]'s
    * split-train-from-apply production shape). The training diamond is
    * released before returning: the weights are driver-materialized,
    * no returned plan can re-read it.
    */
  def btTrain(
      docs: DataFrame,
      iters: Int = 3,
      lr: Double = 1.0): IndexedSeq[Double] = {
    val (_, ptk, ws) = trainCore(docs, iters, lr)
    ptk.unpersist(blocking = false)
    ws.last
  }

  /** Score any (doc_id, text) frame — batch OR streaming — with
    * trained reward weights: s(d) = Σ_tokens w_b(t)/n_d as ONE
    * stateless per-row expression (bit-identical to the exploded
    * `xsum(termCol)` formulation — [[graft.expressions
    * .TokenBucketMargin]]'s exactness contract), the training margin's
    * arithmetic token for token. A streaming caller pays no
    * aggregation state at all. Assumes unique doc_id rows (the corpus
    * contract). Output: (doc_id, score).
    */
  def scoreWith(docs: DataFrame, w: IndexedSeq[Double]): DataFrame = {
    import QualityModel.Dim
    require(w.size == Dim, s"weight vector must have $Dim entries")
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        QualityModel.marginCol(col("text"), w).as("score"))
  }

  /** Best-of-n distillation selection: documents group into synthetic
    * prompt groups (`doc_id DIV groupSize` — n candidate generations
    * per prompt), every candidate is scored by the trained reward
    * model, and each group keeps its argmax (ties to the lower
    * doc_id) — the standard rejection-sampling/distillation move:
    * train a reward model on preferences, then harvest only each
    * prompt's best generation. Output one row per candidate:
    * (group_id, doc_id, score, is_best).
    *
    * Scale shape: scoring is one doc-keyed aggregation; the argmax is
    * one window partitioned by group (groups are corpus/groupSize —
    * parallelism grows with the corpus, no global order).
    */
  def bestOfN(
      docs: DataFrame,
      groupSize: Int = 4,
      iters: Int = 3,
      lr: Double = 1.0): DataFrame = {
    require(groupSize >= 1, s"groupSize must be >= 1, got $groupSize")
    val w = btTrain(docs, iters, lr)
    val scored = scoreWith(docs, w)
      .withColumn("group_id", expr(s"doc_id DIV $groupSize"))
    val win = Window.partitionBy(col("group_id"))
      .orderBy(desc("score"), asc("doc_id"))
    scored
      .withColumn("is_best", row_number().over(win) === 1)
      .select("group_id", "doc_id", "score", "is_best")
  }

  /** Group-relative advantage normalization (the GRPO/rejection-
    * sampling baseline move): candidates group by prompt
    * (`doc_id DIV groupSize`), every candidate is scored by the
    * trained reward model, and each score is centered and scaled by
    * its OWN group's mean and population std —
    * `A = (s − μ_g) / σ_g` — the per-prompt baseline that replaces a
    * learned value model. Degenerate groups (σ = 0, including
    * singletons) take advantage 0.
    *
    * Exactness: μ and the second moment route through DECIMAL(38,12)
    * window sums over the group partition (order-free), σ =
    * `sqrt(max(m2 − μ², 0))` and the final division are fixed-shape
    * IEEE on exact inputs — every column hash-matches the oracle.
    *
    * Scale shape: scoring is one doc-keyed aggregation; the stats are
    * ONE window partitioned by group (corpus/groupSize groups — no
    * join-back diamond, no second scan, no global order).
    */
  def groupAdvantages(
      docs: DataFrame,
      groupSize: Int = 8,
      iters: Int = 3,
      lr: Double = 1.0): DataFrame = {
    require(groupSize >= 1, s"groupSize must be >= 1, got $groupSize")
    val w = btTrain(docs, iters, lr)
    val scored = scoreWith(docs, w)
      .withColumn("group_id", expr(s"doc_id DIV $groupSize"))
    val wg = Window.partitionBy(col("group_id"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val n = count(lit(1)).over(wg)
    val mu = sum(col("score").cast(dec)).over(wg).cast("double") / n
    val m2 = sum((col("score") * col("score")).cast(dec)).over(wg)
      .cast("double") / n
    scored
      .withColumn("n_group", n)
      .withColumn("group_mean", mu)
      .withColumn("group_std", sqrt(greatest(m2 - mu * mu, lit(0.0))))
      .withColumn("advantage",
        when(col("group_std") > 0.0,
          (col("score") - col("group_mean")) / col("group_std"))
          .otherwise(lit(0.0)))
      .select("group_id", "doc_id", "score", "n_group", "group_mean",
        "group_std", "advantage")
  }

  /** Best-of-k uplift card — what rejection sampling actually buys per
    * prompt group: candidates group by prompt (`doc_id DIV groupSize`,
    * the n140 grouping), each is scored by the trained reward model,
    * and for every k in `ks` the card reports the mean of the TOP-k
    * rewards (rank by score DESC, ties by doc_id — the [[bestOfN]]
    * rule) against the group mean, and the uplift between them. k = 1
    * is the classic best-of-n selection value; the k > 1 rows price
    * keep-several distillation. Deterministic top-k-by-rank (not the
    * order-statistic expectation, which needs binomial coefficients no
    * gate would ship).
    *
    * Exactness: group mean and top-k sums route through DECIMAL(38,12)
    * (order-free); rank selection is exact; final divisions are
    * fixed-shape IEEE on exact inputs.
    *
    * Scale shape: scoring is one doc-keyed aggregation; ONE window
    * pass partitioned by group (corpus/groupSize groups) yields rank,
    * size, and mean; the k-explode multiplies ROWS |ks|× but only into
    * a groups-sized hash aggregation — no join-back, no second corpus
    * scan.
    */
  def bestOfKUplift(
      docs: DataFrame,
      groupSize: Int = 8,
      ks: Seq[Int] = Seq(1, 2, 4),
      iters: Int = 3,
      lr: Double = 1.0): DataFrame = {
    require(groupSize >= 1, s"groupSize must be >= 1, got $groupSize")
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1, got $ks")
    val w = btTrain(docs, iters, lr)
    val scored = scoreWith(docs, w)
      .withColumn("group_id", expr(s"doc_id DIV $groupSize"))
    val wg = Window.partitionBy(col("group_id"))
    val win = wg.orderBy(desc("score"), asc("doc_id"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    scored
      .withColumn("rn", row_number().over(win))
      .withColumn("n_group", count(lit(1)).over(wg))
      .withColumn("group_mean",
        sum(col("score").cast(dec)).over(wg).cast("double") / col("n_group"))
      .withColumn("k", explode(array(ks.map(k => lit(k)): _*)))
      .groupBy("group_id", "k", "n_group", "group_mean")
      .agg(
        sum(when(col("rn") <= col("k"), col("score")).cast(dec))
          .cast("double").as("top_sum"),
        sum(when(col("rn") <= col("k"), 1L).otherwise(0L)).as("n_top"))
      .select(col("group_id"), col("k"), col("n_group"), col("n_top"),
        col("group_mean"),
        (col("top_sum") / col("n_top")).as("top_k_mean"),
        (col("top_sum") / col("n_top") - col("group_mean")).as("uplift"))
  }

  /** Corpus-median correctness threshold over (doc_id, score) rows:
    * the LOWER median — the score at rank ⌊(N+1)/2⌋ under
    * (score, doc_id) — an order-free selection, exact on both engines.
    * One output row. The rank rides [[GlobalOrder]]'s range-partitioned
    * sort; the corpus count is a broadcast one-row scalar.
    */
  def medianThreshold(scored: DataFrame): DataFrame = {
    val nAll = scored.agg(count(lit(1)).as("n_all"))
    graft.operators.GlobalOrder
      .withGlobalIndexCols(scored.select(col("doc_id"), col("score")),
        Seq(asc("score"), asc("doc_id")))
      .crossJoin(broadcast(nAll))
      .filter(col("_global_rank") === expr("(n_all + 1) DIV 2"))
      .select(col("score").as("thr"))
  }

  /** pass@k report half from per-candidate scores and a one-row
    * threshold: per prompt group (`doc_id DIV groupSize`), n
    * candidates, c "correct" (score ≥ threshold), and the unbiased
    * Chen et al. 2021 estimator
    * `pass@k = 1 − C(n−c, k)/C(n, k)` computed as the k-term product
    * `Π_{i<k} (n−c−i)/(n−i)` — exact integer counts into a fixed-shape
    * left-to-right IEEE product (one term hits exactly 0 whenever
    * n−c < k, so the 1.0 branch falls out of the algebra rather than a
    * special case); k > n yields null (the estimator is undefined).
    * Shared by the n154 batch card and the s44 streaming monitor so
    * the two faces cannot drift.
    */
  def passAtKFromScores(scores: DataFrame, thr: DataFrame,
      groupSize: Int, ks: Seq[Int]): DataFrame = {
    require(groupSize >= 1, s"groupSize must be >= 1, got $groupSize")
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1, got $ks")
    val counts = scores
      .withColumn("group_id", expr(s"doc_id DIV $groupSize"))
      .crossJoin(broadcast(thr))
      .groupBy("group_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("score") >= col("thr"), 1L).otherwise(0L)).as("c"))
    ks.foldLeft(counts) { (df, k) =>
      df.withColumn(s"pass_at_$k",
        when(lit(k.toLong) <= col("n"),
          lit(1.0) - aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
            (acc, i) => acc *
              ((col("n") - col("c") - i).cast("double") /
                (col("n") - i).cast("double")))))
    }
  }

  /** pass@k card over the trained reward: scores from [[btTrain]] +
    * [[scoreWith]], correctness = clearing the corpus-median score
    * ([[medianThreshold]]), estimator per [[passAtKFromScores]].
    *
    * Scale shape: scoring is one doc-keyed aggregation; the median is
    * one range-partitioned rank; group counts are one hash agg; the
    * pass@k columns are per-row arithmetic on the groups-sized frame.
    *
    * Cache lifetime: the scored frame stays persisted for the life of
    * the returned (lazy) plan — unpersisting here would re-open the
    * diamond before the caller ever executes it. It is registered with
    * [[graft.DiamondCaches]], which unpersists it automatically once
    * the returned plan becomes unreachable (the caller dropped the
    * query), so long-lived sessions no longer accumulate it (harnesses
    * additionally reap via `GraftSession.dropAllBlocks`).
    */
  def passAtK(
      docs: DataFrame,
      groupSize: Int = 8,
      ks: Seq[Int] = Seq(1, 2, 4),
      iters: Int = 3,
      lr: Double = 1.0): DataFrame = {
    val w = btTrain(docs, iters, lr)
    // the scored frame feeds the count scalar, the median rank, AND
    // the group counts — three executions of the tokenize+score pass
    // without materialization (the jaccardPairs diamond rule; one
    // doc-keyed row per doc, model-column-sized)
    val scored = scoreWith(docs, w).persist(StorageLevel.MEMORY_AND_DISK)
    graft.DiamondCaches.register(scored,
      passAtKFromScores(scored, medianThreshold(scored), groupSize, ks))
  }

  /** The shared training loop: mined pairs, the persisted pair-token
    * frame, and the weight vector after EVERY round (codebook-bounded
    * driver state). `ptk` is returned still persisted — callers that
    * return plans over it own the lifetime; callers that don't must
    * unpersist.
    */
  private def trainCore(
      docs: DataFrame,
      iters: Int,
      lr: Double): (DataFrame, DataFrame, IndexedSeq[IndexedSeq[Double]]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import QualityModel.Dim
    val pairs = minePairs(docs)
      .select("source", "pair_id", "chosen_id", "rejected_id")
    val tk = QualityModel.docCounts(docs)
    val pt = pairs
      .select(col("source"), col("pair_id"),
        col("chosen_id").as("doc_id"), lit(1).as("sgn"))
      .unionByName(pairs
        .select(col("source"), col("pair_id"),
          col("rejected_id").as("doc_id"), lit(-1).as("sgn")))
    // an unpairable corpus (every source a single doc) must fail loudly:
    // dividing the update by 0 pairs would silently poison all 64
    // weights with NaN and every downstream gate would drop everything.
    // Counted BEFORE the persist below — the failure path must not throw
    // with a freshly-cached frame nobody will ever unpersist.
    val nPairs = pairs.count().toDouble
    require(nPairs > 0,
      "no preference pairs could be mined (every source has < 2 docs)")
    // r16: the pair-SIDE counts frame (2 rows per pair, one 64-slot
    // bucket histogram each) replaces the per-TOKEN frame (~100 rows
    // per pair side) — the TokenBucketCounts collapse; every decimal
    // term the exploded rounds summed is reproduced count-for-count
    // (see SignedBucketTermSum's exactness contract)
    val ptk = pt.join(tk, "doc_id")
      .select("source", "pair_id", "sgn", "counts", "n")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var w: IndexedSeq[Double] = Vector.fill(Dim)(0.0)
    val ws = (1 to iters).map { _ =>
      val g = DriverModel.collectBounded(gradientRound(ptk, w),
        "Preference.btTrain gradient", maxRows = QualityModel.Dim)
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // driver-side update — 64 doubles, written to match the oracle's
      // expression shape operation for operation
      w = Vector.tabulate(Dim)(b => w(b) - lr * (g.getOrElse(b, 0.0) / nPairs))
      w
    }
    (pairs, ptk, ws)
  }

  /** The plan shape of ONE Bradley–Terry gradient round over a
    * pair-token frame — the exact two keyed aggregations + one keyed
    * join [[trainCore]] executes per iteration against the persisted
    * `ptk` (margins per (source, pair_id), then the b-keyed gradient),
    * exposed for plan audits the [[Mixture.roundLossPlan]] way: the
    * trainer's real rounds run against an already-persisted frame, so
    * the audit applies the round to a ptk-SHAPED stand-in built from
    * `docs` by scan-stage arithmetic (no mining windows in the
    * lineage — those run ONCE before the persist, not per round). A
    * window, limit, or lost equi-key sneaking into this frame would
    * serialize every GD round at scale; PlanQualitySpec pins its
    * absence.
    */
  private[graft] def btRoundPlan(docs: DataFrame): DataFrame = {
    val ptk = docs.select(
      col("source"),
      pmod(col("doc_id"), lit(16)).cast("int").as("pair_id"),
      when(col("doc_id") % 2 === 0, lit(1)).otherwise(lit(-1)).as("sgn"),
      expr("transform(sequence(0, 63), i -> CASE WHEN i = CAST(pmod(doc_id, 64) AS INT) THEN 1 ELSE 0 END)")
        .cast("array<int>").as("counts"),
      // n MUST equal the counts-array sum (1 for the one-hot above):
      // SignedBucketTermSum derives n internally from the counts while
      // gradientRound's per-bucket term reads this column, so a fixture
      // n decoupled from the counts would audit a margin lineage the
      // executed one diverges from under nonzero weights (r16 ADVICE)
      lit(1).as("n"))
    gradientRound(ptk, Vector.fill(QualityModel.Dim)(0.0))
  }

  /** ONE Bradley–Terry gradient round over a pair-token frame — the
    * frame [[trainCore]] collects per iteration AND the frame
    * [[btRoundPlan]] audits, so the audited lineage and the executed
    * lineage cannot drift apart.
    */
  private def gradientRound(
      ptk: DataFrame, w: IndexedSeq[Double]): DataFrame = {
    import QualityModel.sig
    import org.apache.spark.sql.types.DecimalType
    val err = margins(ptk, w)
      .select(col("source"), col("pair_id"),
        (sig(col("margin")) - lit(1.0)).as("err"))
    // per-bucket gradient: each side's per-token decimal term
    // dec12((sgn·err)/n) collapses to one multiply by the side's
    // bucket count — (26,12) × (10,0) → (37,12) exact, (38,12) sum
    // exact, value == the exploded xsum(sgn·err/n) bit for bit.
    // (10,0), not (6,0): a >= 10^6-token side would NULL a (6,0) cast
    // silently under non-ANSI semantics (r16 ADVICE); int counts
    // always fit 10 digits
    ptk.join(err, Seq("source", "pair_id"))
      .select(col("err"), col("sgn"), col("n"),
        posexplode(col("counts")).as(Seq("b", "c")))
      .filter(col("c") > 0)
      .groupBy("b")
      .agg(sum((col("sgn").cast("double") * col("err") /
          col("n").cast("double")).cast(DecimalType(26, 12)) *
          col("c").cast(DecimalType(10, 0)))
        .cast("double").as("g"))
  }

  /** Per-pair margins Σ sgn·w_b/n over the pair-side counts frame:
    * each side contributes its SIGNED decimal term sum
    * ([[graft.expressions.SignedBucketTermSum]] — still decimal), the
    * pair total is one exact decimal sum over the two sides, and the
    * double cast happens ONCE on the total, exactly like the exploded
    * per-token xsum.
    */
  private def margins(ptk: DataFrame, w: IndexedSeq[Double]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val side = ColumnBridge.column(graft.expressions.SignedBucketTermSum(
      ColumnBridge.expression(col("counts")),
      ColumnBridge.expression(col("sgn")), w))
    ptk.groupBy(col("source"), col("pair_id"))
      .agg(sum(side).cast("double").as("margin"))
  }
}
