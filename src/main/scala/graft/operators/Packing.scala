package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: documents are laid out in
  * a deterministic global order and chunked into fixed token-budget
  * packs ("concatenate then chunk" — the standard way training examples
  * are packed so no context-window tokens are wasted).
  *
  * Each document's `start_off` is the exclusive running total of token
  * counts over the order; its pack is the one its first token lands in
  * (`start_off DIV budget`). Documents may straddle a boundary — the
  * consumer slices them, exactly as a token-stream packer would.
  *
  * Scale shape: the running total is the distributed prefix sum
  * ([[GlobalOrder.withRunningTotal]]: range partition + per-partition
  * totals + broadcast offsets), NOT a partition-less
  * `SUM(...) OVER (ORDER BY ...)` window, which would push the whole
  * corpus through a single task.
  */
object Packing {

  /** docs: (doc_id, text, ...). Output: (doc_id, n_tokens, start_off,
    * pack_id) in doc_id order. `budget` is the pack size in tokens
    * (whitespace tokens here, matching TextAnalysis.tokenStats).
    */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be > 0, got $budget")
    val toks = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"))
    GlobalOrder.withRunningTotal(toks, Seq(col("doc_id")), col("n_tokens"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("_start_offset").as("start_off"),
        expr(s"_start_offset DIV $budget").as("pack_id"))
  }

  /** Packing-efficiency tuning sweep — the table read BEFORE a context
    * length ships: per (source, context length), the sequence counts
    * and padding waste of the two standard packing policies. `pad`
    * gives every document its own sequence(s) (⌈n/L⌉ each — docs
    * longer than L chunk, the last chunk padded to L: the SFT/eval
    * regime where examples must not bleed into each other); `concat`
    * is [[packSequences]]'s concatenate-then-chunk stream (waste only
    * in the final partial sequence: the pretraining regime). The gap
    * between the two efficiencies at a given L is exactly the compute
    * a trainer burns on pad tokens by NOT packing — the number that
    * decides both the context length and the policy for a 100 TB run.
    *
    * Exactness: pure integer arithmetic (⌈a/b⌉ as (a+b−1) DIV b) until
    * two final fixed-shape divisions of exact BIGINTs — fully under
    * the hash oracle, no FP policy. NULL-token docs are out (the
    * lengthPercentiles convention).
    *
    * Scale shape: one scan, a bounded explode (|contexts| rows per
    * doc), one hash aggregate with map-side partials — no join, no
    * window, scan-speed at any corpus size.
    */
  def packingEfficiencySweep(docs: DataFrame,
      contexts: Seq[Long]): DataFrame =
    packingReportFromCounts(packingStateCounts(docs, contexts))

  /** The context-length set the registered queries sweep — one
    * definition shared by the batch card (n129) and the streaming
    * monitor (s39), so the two stay oracle-comparable.
    */
  val defaultContexts: Seq[Long] = Seq(512L, 2048L, 8192L)

  /** The streaming-legal half of [[packingEfficiencySweep]]: the
    * (source, context_len)-keyed MONOTONE integer sums — doc count,
    * total tokens, pad-policy sequence count. Legal as ONE update-mode
    * streaming aggregation (stateless scan expressions into a keyed
    * agg, S·|contexts| state rows); every carried sum is an
    * order-insensitive integer, so the streamed state converges to
    * the batch closed form under any trigger slicing (the ksBinCounts
    * convergence argument).
    */
  def packingStateCounts(docs: DataFrame, contexts: Seq[Long]): DataFrame = {
    require(contexts.nonEmpty && contexts.forall(_ > 0),
      s"context lengths must be positive, got $contexts")
    docs.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok").isNotNull)
      .withColumn("context_len", explode(array(contexts.map(lit): _*)))
      .groupBy("source", "context_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(expr("(n_tok + context_len - 1) DIV context_len"))
          .as("pad_seqs"))
  }

  /** The report half over a (source, context_len, n_docs,
    * total_tokens, pad_seqs) count frame — stateless arithmetic, so
    * the batch query and the streaming monitor share one definition
    * of every derived column (the ksFromBinCounts pattern).
    */
  def packingReportFromCounts(counts: DataFrame): DataFrame = counts
    .withColumn("pad_waste",
      col("pad_seqs") * col("context_len") - col("total_tokens"))
    .withColumn("pad_efficiency", col("total_tokens").cast("double") /
      (col("pad_seqs") * col("context_len")).cast("double"))
    .withColumn("concat_seqs",
      expr("(total_tokens + context_len - 1) DIV context_len"))
    .withColumn("concat_waste",
      col("concat_seqs") * col("context_len") - col("total_tokens"))
    .withColumn("concat_efficiency", col("total_tokens").cast("double") /
      (col("concat_seqs") * col("context_len")).cast("double"))
    .select("source", "context_len", "n_docs", "total_tokens",
      "pad_seqs", "pad_waste", "pad_efficiency",
      "concat_seqs", "concat_waste", "concat_efficiency")

  /** Deterministic epoch-shuffle + token-balanced shard plan — the
    * dataloader manifest a REPRODUCIBLE training run reads: for each
    * epoch, every document gets a fresh md5-drawn position (the
    * n73/n76 zero-RNG-state policy — deterministic, engine-portable,
    * identical at any parallelism or restart), the exclusive token
    * prefix sum over that order, and a contiguous token-balanced
    * shard (worker) assignment `start_off DIV ⌈total/W⌉`. Two runs of
    * the same corpus produce byte-identical epoch orders — the
    * property that makes a loss-curve diff between two training runs
    * attributable to the MODEL change rather than data-order noise —
    * and any worker can materialize ITS shard with a filter instead
    * of coordinating through a shuffle service.
    *
    * Scale shape: the per-epoch orders ride ONE
    * [[GlobalOrder.withRunningTotal]] prefix sum with epoch as the
    * leading order key (range partition + per-partition totals +
    * broadcast offsets — never a partition-less window); the only
    * join is a one-row corpus-total scalar crossJoined back
    * (broadcast by construction; PlanQualitySpec-whitelisted). Output:
    * (epoch, doc_id, n_tokens, start_off, shard), start_off exclusive
    * within its epoch.
    */
  def epochShufflePlan(docs: DataFrame, epochs: Int, shards: Int): DataFrame = {
    require(epochs >= 1, s"need epochs >= 1, got $epochs")
    require(shards >= 1, s"need shards >= 1, got $shards")
    val base = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .filter(col("n_tokens").isNotNull)
    val drawn = base
      .withColumn("epoch", explode(array((0 until epochs).map(lit): _*)))
      .withColumn("draw",
        md5(concat_ws(":", col("doc_id"), lit("shuffle"), col("epoch"))))
    // one global prefix sum with epoch leading the order: offsets run
    // continuously across epochs and every epoch's base is
    // epoch × corpus total (the same docs repeat each epoch), so the
    // per-epoch offset is a stateless subtraction
    val off = GlobalOrder.withRunningTotal(drawn,
      Seq(col("epoch"), col("draw"), col("doc_id")), col("n_tokens"))
    val total = base.agg(sum(col("n_tokens")).as("epoch_total"))
    off.crossJoin(broadcast(total))
      .withColumn("start_off",
        col("_start_offset") - col("epoch") * col("epoch_total"))
      // shard size ⌈total/W⌉ ⇒ the last start_off (< total) lands in
      // shard ≤ W−1 with no clamp needed
      .withColumn("shard",
        expr(s"start_off DIV ((epoch_total + ${shards - 1}) DIV $shards)")
          .cast("int"))
      .select("epoch", "doc_id", "n_tokens", "start_off", "shard")
  }

  /** Boundary-exact context manifest — the chunk-side view of
    * [[packSequences]]: one row per `budget`-token context of the
    * concatenated stream with (n_docs, first_doc, last_doc, n_tokens),
    * where a document straddling a boundary counts in BOTH neighbouring
    * contexts and n_tokens is the exact slice each context receives
    * (== budget everywhere except the final partial context). This is
    * what a dataloader consumes: which documents feed context k and how
    * many of its tokens each one contributes — [[packStats]] by
    * contrast attributes a document's whole length to the pack it
    * STARTS in, so its totals drift around boundaries.
    *
    * Scale shape: on top of packSequences' distributed prefix sum, each
    * doc explodes to its spanned contexts (⌈n_tokens/budget⌉+1 bound)
    * and one map-side-partial hash aggregate builds the manifest; only
    * (doc_id, offset) pairs move, never text.
    */
  def contextManifest(docs: DataFrame, budget: Long): DataFrame =
    packSequences(docs, budget)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("start_off").as("s"),
        (col("start_off") + col("n_tokens")).as("e"))
      .select(col("doc_id"), col("s"), col("e"),
        explode(expr(s"sequence(s div $budget, (e - 1) div $budget)"))
          .as("chunk_id"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(least(col("e"), (col("chunk_id") + 1) * budget) -
            greatest(col("s"), col("chunk_id") * budget)).as("n_tokens"))

  /** Varlen attention-segment table — the flash-attention `cu_seqlens`
    * view of [[contextManifest]]: one row per (context, document
    * slice) with the slice's start offset INSIDE the context and its
    * length. Packed training must not attend across document
    * boundaries, so the kernel consumes exactly this table (segment
    * starts are the cumulative sequence lengths — segments tile each
    * context contiguously, `seg_start` of segment i+1 == `seg_start +
    * seg_len` of segment i; the spec pins the tiling). `seg_idx` is
    * the within-context order.
    *
    * Scale shape: the distributed prefix sum of [[packSequences]],
    * a bounded per-doc explode, and one window partitioned BY CONTEXT
    * (≤ budget docs per context by construction — never a global
    * sort). Only (doc_id, offset) pairs move.
    */
  def attentionSegments(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("chunk_id"))
      .orderBy(asc("seg_start"), asc("doc_id"))
    packSequences(docs, budget)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("start_off").as("s"),
        (col("start_off") + col("n_tokens")).as("e"))
      .select(col("doc_id"), col("s"), col("e"),
        explode(expr(s"sequence(s div $budget, (e - 1) div $budget)"))
          .as("chunk_id"))
      .select(col("chunk_id"), col("doc_id"),
        (greatest(col("s"), col("chunk_id") * budget) -
          col("chunk_id") * budget).as("seg_start"),
        (least(col("e"), (col("chunk_id") + 1) * budget) -
          greatest(col("s"), col("chunk_id") * budget)).as("seg_len"))
      .withColumn("seg_idx", (row_number().over(w) - 1).cast("int"))
      .select("chunk_id", "seg_idx", "doc_id", "seg_start", "seg_len")
  }

  /** Token-balanced output sharding plan: assign every document to one
    * of `nShards` writer shards so the PER-SHARD TOKEN totals come out
    * even — the write-side balance that decides whether a 100 TB
    * materialization produces uniform files or a straggler shard. The
    * assignment is the serpentine (boustrophedon) round-robin over the
    * tokens-descending global order — the classic LPT approximation in
    * closed form: rank r goes to shard `(r−1) % S` on even passes and
    * its mirror on odd passes, so each pass hands every shard one doc
    * and alternating direction cancels the within-pass size skew.
    *
    * Scale shape: one [[GlobalOrder]] distributed sort; the shard id
    * is scan-stage integer arithmetic on the rank. Output: (doc_id,
    * n_tok, rank, shard).
    */
  def balancedShards(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    GlobalOrder.withGlobalIndexCols(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")),
      Seq(desc("n_tok"), asc("doc_id")))
      .withColumnRenamed("_global_rank", "rank")
      .withColumn("shard",
        expr(s"""CASE WHEN ((rank - 1) DIV $nShards) % 2 = 0
                 THEN (rank - 1) % $nShards
                 ELSE ${nShards - 1} - (rank - 1) % $nShards END""")
          .cast("int"))
      .select("doc_id", "n_tok", "rank", "shard")
  }

  /** Materialize a [[balancedShards]] plan: write the corpus as one
    * directory partition per writer shard (`shard=<k>/` — the layout a
    * 100 TB materialization hands its training dataloader), carrying
    * the plan's `n_tok` so realized per-shard totals are auditable from
    * the files alone. Returns the realized per-shard (n_docs,
    * tok_total) read BACK from the written files — the check that the
    * plan actually landed, not just computed.
    *
    * Scale shape: one equi-join of corpus × plan on doc_id (both sides
    * shuffle on the key — the plan is corpus-sized, never broadcast),
    * then `repartition(shard)` so each shard's rows land in one write
    * task and the file count equals the shard count. A production run
    * at 100 TB splits each shard across writers with
    * `repartition(filesPerShard × nShards, col("shard"), salt)` —
    * the directory layout and the balance guarantee are unchanged.
    */
  def writeSharded(docs: DataFrame, plan: DataFrame, outDir: String): DataFrame = {
    docs.join(plan.select("doc_id", "n_tok", "shard"), "doc_id")
      .repartition(col("shard"))
      // deterministic within-file row order: file bytes depend only on
      // content, not shuffle-fetch order (reproducible materializations,
      // stable compression)
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
  }

  /** Epoch-decorrelated packing plan — [[contextManifest]] composed
    * with a deterministic per-epoch hash shuffle, which is what a
    * multi-epoch dataloader actually consumes: training on the SAME
    * document order every epoch correlates gradient noise across
    * epochs, so each epoch lays the corpus out in a fresh
    * pseudo-random order. The order key is `md5(epoch ':' doc_id)` —
    * engine-portable (the n63/n68 md5 precedent), zero RNG state,
    * reproducible at any parallelism, and hex strings compare
    * identically under binary collation in any engine. Every epoch is
    * a fresh effectively-random permutation, so consecutive-epoch
    * positions decorrelate by construction.
    *
    * Scale shape: one tokenize pass persisted across epochs; per epoch
    * ONE distributed range-partitioned prefix sum over the hash order
    * ([[GlobalOrder.withRunningTotal]] — the hash key is uniform, so
    * range partitions are perfectly balanced; never a partition-less
    * window), then the bounded chunk explode and one hash aggregate.
    * Epoch count is a small constant — the union is a handful of
    * identical scale-safe plans.
    *
    * Output: (epoch, chunk_id, n_docs, first_doc, last_doc, n_tokens)
    * — every context totals exactly `budget` tokens except each
    * epoch's final partial one.
    */
  def epochPackingPlan(
      docs: DataFrame, epochs: Int, budget: Long): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(budget > 0, s"token budget must be > 0, got $budget")
    val toks = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perEpoch = (0 until epochs).map { ep =>
      val ordered = toks.withColumn("ord",
        md5(concat(lit(s"$ep:"), col("doc_id").cast("string"))))
      GlobalOrder
        .withRunningTotal(ordered, Seq(col("ord"), col("doc_id")),
          col("n_tokens"))
        .filter(col("n_tokens") > 0)
        .select(lit(ep.toLong).as("epoch"), col("doc_id"),
          col("_start_offset").as("s"),
          (col("_start_offset") + col("n_tokens")).as("fin"))
    }
    val plan = perEpoch.reduce(_ unionByName _)
      .select(col("epoch"), col("doc_id"), col("s"), col("fin"),
        explode(expr(s"sequence(s div $budget, (fin - 1) div $budget)"))
          .as("chunk_id"))
      .groupBy("epoch", "chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(least(col("fin"), (col("chunk_id") + 1) * budget) -
            greatest(col("s"), col("chunk_id") * budget)).as("n_tokens"))
    graft.DiamondCaches.register(toks, plan)
  }

  /** Pack-level summary: how full each pack is — the packing-efficiency
    * readout (tokens per pack vs budget, docs per pack).
    */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_started"))
      .withColumn("budget", lit(budget))

  /** Length-bucketed micro-batch assignment — the inference-serving
    * complement of [[packSequences]]: group documents of similar token
    * length (`bucket = n_tokens DIV bucketWidth`) so each padded batch
    * wastes minimal compute, then number off fixed-size batches inside
    * every bucket in deterministic (n_tokens, doc_id) order.
    *
    * Scale shape: the only wide operation is a window partitioned BY
    * BUCKET — parallelism is the bucket count and there is no global
    * order; a skewed giant bucket is a skewed partition like any other
    * (AQE-splittable since the within-bucket order is arbitrary apart
    * from determinism).
    */
  def lengthBucketBatches(
      docs: DataFrame, bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(batchSize > 0, s"batchSize must be > 0, got $batchSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("n_tokens"), col("doc_id"))
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens DIV $bucketWidth").cast("int"))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"(rn - 1) DIV $batchSize").cast("int"))
      .drop("rn")
  }

  /** Sliding-window document chunking (the RAG/eval-context complement
    * of [[packSequences]]): split each document into `chunkTokens`-token
    * chunks whose starts step by `chunkTokens - overlap`, so consecutive
    * chunks share `overlap` tokens; the final chunk may be shorter. Pure
    * per-row explode — each row's chunk count depends only on its own
    * length, no shuffle, no state.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be > 0, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), col("ts"),
        posexplode(sequence(lit(0), size(col("ts")) - 1, lit(step)))
          .as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("start"),
        least(size(col("ts")) - col("start"), lit(chunkTokens))
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("ts"), col("start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Shard-stability card: what fraction of the corpus MOVES when the
    * worker count changes from `fromShards` to `toShards`, under
    * rendezvous (highest-random-weight) hashing vs naive `id MOD W`.
    * Rendezvous moves only ~1/toShards of docs (each doc re-homes only
    * if the NEW shard's draw beats all old ones); mod reshuffles
    * almost everything — the difference is what a growing training
    * fleet pays in cache/locality churn every resize. Draws are
    * md5-derived (the n131 epoch-draw idiom), so the card replays
    * exactly in DuckDB; the argmax is a per-row fold over W struct
    * draws (scan-stage, no join, no shuffle beyond the final S-row
    * aggregate), and every output ratio divides AFTER exact counts.
    */
  /** Rendezvous (highest-random-weight) shard assignment as a per-row
    * Column: argmax over `w` md5 struct draws, ties to the larger
    * shard id. Shared by [[shardStability]] and the s42 streaming
    * router — one definition of the draw and the tie rule.
    */
  def rendezvousShard(id: org.apache.spark.sql.Column,
      w: Int): org.apache.spark.sql.Column = {
    def draw(sh: Int) = conv(substring(
      md5(concat_ws(":", id, lit("shard"), lit(sh))), 1, 8),
      16, 10).cast("long")
    array_max(array((0 until w).map(sh =>
      struct(draw(sh).as("d"), lit(sh).as("s"))): _*)).getField("s")
  }

  def shardStability(docs: DataFrame, fromShards: Int,
      toShards: Int): DataFrame = {
    require(fromShards > 0 && toShards > fromShards,
      s"need 0 < fromShards < toShards, got $fromShards, $toShards")
    def rdv(w: Int) = rendezvousShard(col("doc_id"), w)
    docs
      .select(col("doc_id"),
        rdv(fromShards).as("rdv_from"), rdv(toShards).as("rdv_to"),
        (col("doc_id") % fromShards).cast("int").as("mod_from"),
        (col("doc_id") % toShards).cast("int").as("mod_to"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rdv_from") =!= col("rdv_to"), 1L).otherwise(0L))
          .as("moved_rdv"),
        sum(when(col("mod_from") =!= col("mod_to"), 1L).otherwise(0L))
          .as("moved_mod"))
      .select(lit(fromShards).as("from_shards"),
        lit(toShards).as("to_shards"),
        col("n_docs"), col("moved_rdv"), col("moved_mod"),
        (col("moved_rdv").cast("double") / col("n_docs"))
          .as("frac_rdv"),
        (col("moved_mod").cast("double") / col("n_docs"))
          .as("frac_mod"))
  }
}
