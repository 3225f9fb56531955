package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** DoReMi-style trained domain mixture weights (Xie et al. 2023,
  * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining"): instead of the FIXED closed-form source weights of
  * [[Sampling.temperatureMixture]] (|D_s|^α) or a hand-written
  * per-mille map (n21), LEARN the mixture by iterative multiplicative
  * reweighting — each round, upweight the domains whose data the
  * current mixture models worst (the Group-DRO excess-loss signal),
  * renormalize, and smooth toward uniform.
  *
  * The paper's proxy model is a small LM; the in-engine analog is the
  * corpus's own unigram distribution family, which keeps every quantity
  * exactly replayable (the n42 bigram-LM precedent):
  *
  *   - per-domain unigram model  p_d(t) = c_{d,t} / n_d,
  *   - round-r mixture model     pm(t)  = Σ_d α_d · p_d(t),
  *   - domain loss under a model q: the LINEAR surrogate
  *     L_d(q) = 1 − (Σ_t c_{d,t} · q(t)) / n_d — expected (1 − q(token))
  *     over the domain's tokens. Cross-entropy needs `ln`, which is not
  *     cross-engine bit-exact (the no-transcendentals policy, n42/n61);
  *     the linear loss ranks models by the same mass-on-my-tokens
  *     signal using only +,·,/.
  *   - excess loss ε_d = max(0, L_d(pm) − L_d(p_d)) — how much worse the
  *     mixture fits domain d than d's own model (DoReMi's clipped
  *     reference-regret), and the multiplicative-weights update
  *     α′_d ∝ α_d · (1 + η·ε_d), smoothed (1−c)·α′ + c·(1/D). The
  *     rational (1 + η·ε) gain replaces the paper's exp(η·ε) for
  *     exactness — equal to first order, monotone in ε, and IEEE-exact.
  *
  * Every token/vocab-level sum routes through DECIMAL(38,12)
  * ([[graft.queries.Sql.oSum12]] contract); the per-round driver state
  * is D doubles (the codebook pattern, reference capability analog:
  * the fold-iteration `Stream.scala:56-68`), and the driver-side
  * normalizer replays the engines' decimal route bit for bit
  * ([[exactSum12]]), so the whole trajectory hash-matches the oracle's
  * unrolled CTEs.
  *
  * Scale shape: the corpus is tokenized ONCE into the persisted
  * per-domain count table (explode + hash agg with map-side partials —
  * the only corpus-sized pass); each round is a vocab-keyed aggregation
  * (mixture mass per token) plus a vocab-keyed join back and a D-row
  * aggregation, all bounded by |vocab|·|domains|, never corpus². The
  * weight table is D rows — broadcast-trivial; at 100 TB the count
  * table is the materialized artifact (bucket by token) and rounds cost
  * vocab-sized scans only.
  */
object Mixture {

  /** Per-round training record for one domain. */
  final case class DomainRound(
      round: Int, source: String, loss: Double, excess: Double,
      weight: Double)

  /** Exact order-free double sum (DECIMAL(38,12) route) — data side. */
  private def xsum12(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  /** DRIVER-side replay of the engines' decimal-12 sum: round each
    * operand at its shortest decimal string to 12 dp half-up (Spark's
    * double→decimal cast goes through `BigDecimal.valueOf` = shortest
    * string; the oracle VARCHAR-routes DuckDB onto the same string),
    * add exactly, parse the plain string back to double (both engines'
    * decimal→double is the correctly-rounded string parse). Decimal
    * addition is associative, so iteration order is irrelevant.
    */
  private[graft] def exactSum12(xs: Iterable[Double]): Double = {
    val z = xs.foldLeft(java.math.BigDecimal.ZERO) { (acc, x) =>
      acc.add(java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP))
    }
    java.lang.Double.parseDouble(z.toPlainString)
  }

  /** The persisted (source, t, c, n, p) table: per-domain token counts
    * with the domain total and unigram probability. The one corpus-
    * sized pass; everything per-round reads this.
    */
  private def domainTokenProbs(docs: DataFrame): DataFrame = {
    val ct = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    val nd = ct.groupBy("source").agg(sum(col("c")).as("n"))
    ct.join(nd, "source")
      .select(col("source"), col("t"), col("c"), col("n"),
        (col("c").cast("double") / col("n").cast("double")).as("p"))
  }

  /** Domain losses under a model frame `q(t, pm)`:
    * 1 − (Σ_t c·pm) / n per source (missing vocab contributes 0 mass
    * via the inner join — a token the model has no mass on adds its
    * full (1 − 0) loss, which is the point).
    */
  private def lossUnder(p: DataFrame, q: DataFrame): Map[String, Double] =
    DriverModel.collectBounded(
      p.join(q, "t")
        .groupBy(col("source"), col("n"))
        .agg(xsum12(col("c").cast("double") * col("pm")).as("s"))
        .select(col("source"),
          (lit(1.0) - col("s") / col("n").cast("double")).as("loss")),
      "Mixture.lossUnder", maxRows = 1000000)
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** The per-round loss plan over raw docs with unit weights — the
    * exact frame shape every training round executes ([[doremiTrain]]'s
    * pm + loss chain), buildable by PlanQualitySpec without running the
    * loop (the [[QualityModel.gateThresholdPlan]] pattern): the audit
    * must see no window, no limit, no cartesian — just the two
    * vocab-keyed aggregations and the vocab-keyed join.
    */
  private[graft] def roundLossPlan(docs: DataFrame): DataFrame = {
    val p = domainTokenProbs(docs)
    val pm = p.withColumn("ap", lit(1.0) * col("p"))
      .groupBy("t").agg(xsum12(col("ap")).as("pm"))
    p.join(pm, "t")
      .groupBy(col("source"), col("n"))
      .agg(xsum12(col("c").cast("double") * col("pm")).as("s"))
      .select(col("source"),
        (lit(1.0) - col("s") / col("n").cast("double")).as("loss"))
  }

  /** Train `iters` reweighting rounds; returns the full trajectory and
    * the final weights. Driver state: D doubles per round.
    */
  def doremiTrain(
      docs: DataFrame,
      iters: Int = 3,
      lr: Double = 1.0,
      smooth: Double = 0.01): (Seq[DomainRound], Map[String, Double]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(smooth >= 0.0 && smooth < 1.0,
      s"smooth must be in [0,1), got $smooth")
    val p = domainTokenProbs(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sources = DriverModel.collectBounded(
        p.select("source").distinct(), "Mixture.doremiTrain sources",
        maxRows = 1000000)
        .map(_.getString(0)).sorted.toIndexedSeq
      val dD = sources.size.toDouble
      // reference loss: each domain under its OWN unigram model — the
      // best any mixture could fit that domain, fixed across rounds
      val ref = DriverModel.collectBounded(
        p.groupBy(col("source"), col("n"))
          .agg(xsum12(col("c").cast("double") * col("p")).as("s"))
          .select(col("source"),
            (lit(1.0) - col("s") / col("n").cast("double")).as("ref_loss")),
        "Mixture.doremiTrain ref_loss", maxRows = 1000000)
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      var weights: Map[String, Double] =
        sources.map(_ -> 1.0 / dD).toMap
      val trajectory = Vector.newBuilder[DomainRound]
      (1 to iters).foreach { r =>
        val wCol = element_at(typedLit(weights), col("source"))
        val pm = p.withColumn("ap", wCol * col("p"))
          .groupBy("t").agg(xsum12(col("ap")).as("pm"))
        val loss = lossUnder(p, pm)
        // per-element driver arithmetic, mirrored by the oracle's CTEs
        val excess = sources.map(s =>
          s -> math.max(0.0, loss(s) - ref(s))).toMap
        val u = sources.map(s =>
          s -> weights(s) * (1.0 + lr * excess(s))).toMap
        val z = exactSum12(sources.map(u))
        weights = sources.map(s =>
          s -> ((1.0 - smooth) * (u(s) / z) + smooth * (1.0 / dD))).toMap
        sources.foreach(s => trajectory +=
          DomainRound(r, s, loss(s), excess(s), weights(s)))
      }
      (trajectory.result(), weights)
    } finally { p.unpersist(blocking = false); () }
  }

  /** The n70 query surface: one row per (round, domain) with the loss,
    * clipped excess, and post-update weight — the full training
    * trajectory, hash-comparable.
    */
  def doremiTrajectory(
      docs: DataFrame,
      iters: Int = 3,
      lr: Double = 1.0,
      smooth: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    doremiTrain(docs, iters, lr, smooth)._1
      .toDF("round", "source", "loss", "excess", "weight")
  }

  /** Realize trained weights as integer per-mille sampling rates
    * against the actual source sizes (the n61 realization machinery:
    * s_s = ⌊α_d·10⁶⌋ micro-units, rate = (1000·T·s_s) div (10⁶·c_s)),
    * targeting `targetTotal` expected output documents. Static D-row
    * frame — broadcastable into a batch or STREAMING apply.
    */
  def realizedRates(
      docs: DataFrame,
      weights: Map[String, Double],
      targetTotal: Long): DataFrame = {
    require(targetTotal > 0, s"targetTotal must be > 0, got $targetTotal")
    docs.groupBy("source").agg(count(lit(1)).as("c_s"))
      .withColumn("s_s",
        floor(element_at(typedLit(weights), col("source")) * lit(1000000.0))
          .cast("long"))
      .withColumn("num", lit(1000L) * lit(targetTotal) * col("s_s"))
      .withColumn("den", lit(1000000L) * col("c_s"))
      .select(col("source"), expr("num div den").as("per_mille"))
  }

  /** Token-budget forecast under trained mixture weights: for a target
    * training budget of `targetTokens`, how many tokens does each
    * domain owe (⌊α_d·10⁶⌋·T div 10⁶ — the s23 micro-unit floor) and
    * how many EPOCHS of its available data is that
    * (per-mille: 1000·requested div available)? Domains past ~4000‰
    * are the over-epoching alarm the data-constrained-scaling
    * literature warns about — a mixture can be optimal in proportion
    * and still unservable against actual source sizes. All-BIGINT
    * after the one weight floor; the trajectory-identical weights come
    * from [[doremiTrain]], so the oracle replays train + forecast end
    * to end. Output: (source, avail_tokens, req_tokens, epochs_pm).
    */
  def tokenBudgetForecast(docs: DataFrame, targetTokens: Long): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be > 0, got $targetTokens")
    val (_, weights) = doremiTrain(docs)
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source").agg(count(lit(1)).as("avail_tokens"))
      .withColumn("s_s",
        floor(element_at(typedLit(weights), col("source")) * lit(1000000.0))
          .cast("long"))
      // split multiply: s_s·T div 10⁶ == s_s·(T div 10⁶) + s_s·(T mod
      // 10⁶) div 10⁶ exactly (non-negative operands), and neither term
      // can overflow BIGINT for any s_s ≤ 10⁶ and T ≤ Long.Max — the
      // naive product wraps silently past T ≈ 9.2e12, i.e. exactly the
      // multi-trillion-token budgets this forecast exists for
      .withColumn("req_tokens",
        expr(s"s_s * (${targetTokens}L div 1000000) + " +
          s"(s_s * (${targetTokens}L % 1000000)) div 1000000"))
      // same split identity for the epoch ratio: 1000·r div a ==
      // 1000·(r div a) + (1000·(r mod a)) div a — `1000 * req_tokens`
      // alone wraps past r ≈ 9.2e15, inside the domain the req_tokens
      // fix above guarantees
      .withColumn("epochs_pm",
        expr("1000 * (req_tokens div avail_tokens) + " +
          "(1000 * (req_tokens % avail_tokens)) div avail_tokens"))
      .select("source", "avail_tokens", "req_tokens", "epochs_pm")
  }

  /** Leave-one-domain-out data valuation: how much does REMOVING each
    * domain hurt the pooled model's fit of a target slice? The
    * influence-function idea at domain granularity, made closed-form by
    * the same linear surrogate loss [[doremiTrain]] uses: with integer
    * token counts C_t (global), c_{d,t} (domain) and target counts
    * tt_t,
    *
    *   L_tgt(pool)   = 1 − (Σ_t tt_t·C_t) / N / n_tgt
    *   L_tgt(pool−d) = 1 − (Σ_t tt_t·(C_t − c_{d,t})) / (N − n_d) / n_tgt
    *
    * Every sum is EXACT BIGINT arithmetic (no decimal routing needed —
    * the n59 integer-ppm precedent); only the final two divisions are
    * doubles, identically ordered in both engines, so the valuation
    * hash-matches with no FP policy at all. delta > 0 means the domain
    * is net-positive for the target (removing it raises the loss).
    *
    * Scale shape: per-domain and global count tables are hash aggs with
    * map-side partials over one tokenize pass; the A/B sums are
    * vocab-keyed joins bounded by |vocab| (target-vocab, even — the tt
    * join prunes to tokens the target uses); totals are one-row
    * broadcasts. Output is D rows. At 100 TB the BIGINT products move
    * up to DECIMAL(38,0) — same arithmetic, wider lanes.
    *
    * Output: (source, n_d, loss_full, loss_without, delta).
    */
  def domainAblation(docs: DataFrame, isTarget: Column): DataFrame =
    ablationBy(docs, "source", isTarget)

  /** Per-DOCUMENT leave-one-out valuation — [[domainAblation]] at
    * document granularity: how much does removing this single document
    * from the pool move the surrogate loss on the target slice? Same
    * closed form, same all-BIGINT exactness; the per-key tables are
    * corpus-sized instead of D-sized, but every join stays a
    * vocab/doc-keyed equi-join with map-side partials (the target
    * slice is fixed while each pool doc is hypothetically removed —
    * the n72 convention). The output delta is the per-doc influence
    * estimate a data-pruning pass ranks on.
    */
  def docAblation(docs: DataFrame, isTarget: Column): DataFrame =
    ablationBy(docs, "doc_id", isTarget)

  private def ablationBy(
      docs: DataFrame, key: String, isTarget: Column): DataFrame = {
    val tok = docs.select(col(key), isTarget.as("is_tgt"),
      explode(split(col("text"), " ")).as("t"))
    // genuinely ONE corpus pass: the per-(key, token) aggregation
    // carries the target-occurrence count alongside the total, so the
    // target vocabulary and totals all derive from the persisted
    // vocab-sized frame instead of re-tokenizing the corpus
    val ct = tok.groupBy(key, "t")
      .agg(count(lit(1)).as("c"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("c_tgt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gt = ct.groupBy("t").agg(sum(col("c")).as("ct_all"))
    val tt = ct.groupBy("t").agg(sum(col("c_tgt")).as("tt"))
      .filter(col("tt") > 0)
    val nd = ct.groupBy(key).agg(sum(col("c")).as("n_d"))
    val na = gt.agg(sum(col("ct_all")).as("n_all"))
    val nt = ct.agg(sum(col("c_tgt")).as("n_tgt"))
    val aa = gt.join(tt, "t").agg(sum(col("tt") * col("ct_all")).as("a"))
    val bb = ct.join(tt, "t").groupBy(key)
      .agg(sum(col("tt") * col("c")).as("b"))
    val lossFull = lit(1.0) -
      (col("a").cast("double") / col("n_all").cast("double")) /
        col("n_tgt").cast("double")
    val lossWo = lit(1.0) -
      ((col("a") - coalesce(col("b"), lit(0L))).cast("double") /
        (col("n_all") - col("n_d")).cast("double")) /
        col("n_tgt").cast("double")
    val out = nd.join(bb, Seq(key), "left")
      .crossJoin(broadcast(aa)).crossJoin(broadcast(na))
      .crossJoin(broadcast(nt))
      .select(col(key), col("n_d"), lossFull.as("loss_full"),
        lossWo.as("loss_without"), (lossWo - lossFull).as("delta"))
    graft.DiamondCaches.register(ct, out)
  }

  /** Apply a per-mille rate table to a (possibly STREAMING) document
    * frame with the systematic `id % 1000` remainder spread
    * ([[Sampling.mixtureUpsample]]'s zero-RNG realization): stateless
    * scan work + a broadcast stream-static join, so it runs unchanged
    * in append mode. Output: (doc_id, source, per_mille, copy_idx).
    */
  def applyRates(docs: DataFrame, rates: DataFrame): DataFrame = {
    val copies = expr("per_mille div 1000") +
      when(pmod(col("doc_id"), lit(1000)) < col("per_mille") % 1000, 1L)
        .otherwise(0L)
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .withColumn("_n", copies)
      .filter(col("_n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_n") - 1)))
      .select("doc_id", "source", "per_mille", "copy_idx")
  }

  /** Integer water-filling of a token budget across sources: find the
    * common cap C such that Σ_d min(supply_d, C) spends the budget,
    * then allocate `min(supply_d, C)` (+1 on the lowest-rank uncapped
    * sources for the sub-C remainder) — the allocation that maximizes
    * the minimum take, i.e. the fairest way to hit a total token
    * budget when some domains are scarce. Complements
    * [[Sampling.capSourceTokens]] (fixed per-source cap) and
    * [[tokenBudgetForecast]] (weights given): here the CAP is the
    * unknown and the budget is the constraint.
    *
    * Closed form, no iteration: sort sources by supply ascending with
    * prefix sums P_i and m_i = D − i sources after i; the level lies
    * in the unique segment where `C_i = (B − P_i) DIV m_i` falls in
    * [supply_i, supply_{i+1}); a budget ≥ total supply degenerates to
    * alloc = supply (level = NULL, nothing to ration). All-integer
    * arithmetic throughout — exact-hash oracle, no FP anywhere.
    *
    * Scale shape: one token aggregate (D rows), the supply order via
    * [[GlobalOrder]] (range-partitioned rank + running total — D-row
    * tiny here, still scale-shaped), and the chosen one-row level
    * broadcast back over the D-row frame. The corpus is touched once.
    */
  def tokenWaterfill(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be > 0, got $budget")
    val supply = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source").agg(count(lit(1)).as("supply"))
    // ascending supply order: rank i (1-based), inclusive prefix P_i
    val ordered = GlobalOrder.withRunningTotal(
      GlobalOrder.withGlobalIndexCols(supply,
        Seq(col("supply").asc, col("source").asc)),
      Seq(col("supply").asc, col("source").asc), col("supply"))
      .withColumn("p_incl", col("_start_offset") + col("supply"))
    val d = ordered.agg(
      max(col("_global_rank")).as("n_sources"),
      max(col("p_incl")).as("total_supply"))
    // candidate level per segment boundary i: C_i = (B − P_{i−1}) DIV
    // m_i with m_i = D − i + 1 sources at-or-after i. Segments BEFORE
    // the true one always produce C_i ≥ supply_i (spend at supply_i is
    // already ≤ B there) and are filtered out; segments AFTER it can
    // alias the level value but never at a smaller rank — so the true
    // segment is exactly the minimum-rank row passing
    // `0 ≤ C_i < supply_i`. A budget ≥ total supply leaves the frame
    // empty (degenerate: nothing to ration).
    val seg = ordered.crossJoin(broadcast(d))
      .filter(col("total_supply") > budget)
      .withColumn("m", col("n_sources") - col("_global_rank") + 1)
      .withColumn("c_cand",
        expr(s"(${budget}L - _start_offset) DIV m"))
      .filter(col("c_cand") >= 0 && col("c_cand") < col("supply"))
      .orderBy(col("_global_rank"))
      .limit(1)
      .select(lit(1).as("_k"), col("c_cand").as("level"),
        col("_start_offset").as("p_below"), col("m").as("m_at"))
    val leveled = ordered.crossJoin(broadcast(d))
      .withColumn("_k", lit(1))
      .join(broadcast(seg), Seq("_k"), "left")
      .withColumn("base",
        when(col("total_supply") <= budget, col("supply"))
          .otherwise(least(col("supply"), col("level"))))
      // remainder r = B − (P_below + m·C) < m: +1 token to the first r
      // uncapped sources in ascending order (each has supply ≥ C + 1,
      // so the bonus never overdraws a source)
      .withColumn("rem",
        when(col("total_supply") <= budget, lit(0L))
          .otherwise(lit(budget) - col("p_below") -
            col("m_at") * col("level")))
      .withColumn("alloc",
        col("base") + when(col("supply") > col("level") &&
          col("_global_rank") - (col("n_sources") - col("m_at")) <= col("rem"),
          1L).otherwise(0L))
    leveled.select(col("source"), col("supply"),
      when(col("total_supply") <= budget, lit(null).cast("long"))
        .otherwise(col("level")).as("level"),
      col("alloc"),
      (col("supply") - col("alloc")).as("unspent_supply"))
  }

  /** Repetition-exposure planning card (the data-constrained-scaling
    * accounting of Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models", in exact integer form): per source, the UNIQUE
    * token supply (tokens of one representative per exact-dup
    * fingerprint group — training twice on a crawl copy is an epoch,
    * not new data), the budget slice allocated proportionally to that
    * unique supply (`budget·u_s DIV Σu` — floor division; the ≤S-token
    * remainder stays unspent rather than invent fractional tokens),
    * and what that allocation MEANS: epochs = ⌈alloc/unique⌉ and the
    * repeated-token fraction of the allocation. This is the table
    * read before committing a token budget to a mix — a source whose
    * allocation implies 7 epochs is being memorized, not learned from,
    * and the budget should move or the source should grow.
    *
    * Exactness: fingerprint groups are the n01/n122 md5 machinery;
    * every count and the allocation/epoch rules are BIGINT arithmetic;
    * the two fractions are single divisions of exact integers — fully
    * under the hash oracle, no FP policy.
    *
    * Scale shape: one scan → (source, fp) hash aggregate → S-row
    * per-source frame (persisted — it feeds the one-row total AND the
    * final card; unpersisted, the corpus would rescan) → a one-row
    * total scalar crossJoined back (broadcast by construction,
    * PlanQualitySpec-whitelisted).
    */
  def repetitionExposure(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"need budgetTokens > 0, got $budgetTokens")
    import graft.functions.TextFunctions.fingerprint
    val base = docs.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        fingerprint(col("text")).as("fp"))
      .filter(col("n_tok").isNotNull)
    val perSource = base.groupBy("source", "fp")
      .agg(count(lit(1)).as("copies"), min(col("n_tok")).as("u_tok"),
        sum(col("n_tok")).as("t_tok"))
      .groupBy("source")
      .agg(sum(col("copies")).as("n_docs"),
        sum(col("t_tok")).as("total_tokens"),
        sum(col("u_tok")).as("unique_tokens"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = perSource.agg(sum(col("unique_tokens")).as("all_unique"))
    val out = perSource.crossJoin(broadcast(tot))
      .withColumn("dup_token_frac",
        (col("total_tokens") - col("unique_tokens")).cast("double") /
          col("total_tokens").cast("double"))
      .withColumn("alloc_tokens",
        expr(s"($budgetTokens * unique_tokens) DIV all_unique"))
      .withColumn("epochs",
        expr("(alloc_tokens + unique_tokens - 1) DIV unique_tokens"))
      .withColumn("repeat_frac",
        when(col("alloc_tokens") > col("unique_tokens"),
          (col("alloc_tokens") - col("unique_tokens")).cast("double") /
            col("alloc_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .select("source", "n_docs", "total_tokens", "unique_tokens",
        "dup_token_frac", "alloc_tokens", "epochs", "repeat_frac")
    graft.DiamondCaches.register(perSource, out)
  }
}
