package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: pair-producing dedup (n02/n03) finds
  * EDGES, but survivor election needs the transitive closure — if A~B
  * and B~C, keeping "the lower id of each pair" would keep both A and C.
  * Connected components give one canonical representative per cluster.
  *
  * Algorithm: min-label propagation fused with pointer jumping
  * (label(v) ← label(label(v)) each round, Shiloach–Vishkin style), so
  * chains converge in O(log n) rounds rather than O(diameter); each
  * round is two hash joins + one aggregate, all keyed shuffles. The
  * alternating large-star/small-star formulation (Kiveris et al.,
  * SOCC'14) has the same round bound and per-round cost — this version
  * keeps the label table node-sized instead of rewriting the edge list.
  * Lineage is truncated every round (localCheckpoint; a multi-node
  * deployment would use reliable checkpointing) — without it the plan
  * doubles per iteration.
  */
object Clustering {

  /** Rounds the most recent [[connectedComponents]] call on this
    * thread took to converge. Pointer jumping converges in O(log n)
    * rounds of the dup graph's diameter — the ONE super-linear axis a
    * fixed-scale wall-time probe can't attribute (a slow 32× row could
    * be more data per round or more rounds); ScaleProbe records this
    * beside its 1×/8×/32× ratios so the two causes separate on the
    * printed evidence. Observability only — never an input to any
    * operator.
    */
  val lastCcRounds = new ThreadLocal[Integer]

  /** Component label (= min reachable node id) for every node that
    * appears in `edges`. Output: (id, component).
    */
  def connectedComponents(
      edges: DataFrame, src: String = "id_a", dst: String = "id_b"): DataFrame = {
    val bi = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed with min(id, min neighbor) — exactly what round one of the
    // loop would compute from identity labels, for one aggregate instead
    // of that round's two joins + count; saves a full iteration on every
    // graph
    var (labels, labelsGen) = Lineage.ckpt(bi.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("lb"))
      .select(col("u").as("id"), col("lb")))
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      // min label over the neighborhood…
      val nbrMin = bi.join(labels, bi("u") === labels("id"))
        .groupBy(bi("v").as("id")).agg(min(col("lb")).as("nlb"))
      val (prop, propGen) = Lineage.ckpt(labels.as("l")
        .join(nbrMin.as("n"), col("l.id") === col("n.id"), "left")
        .select(col("l.id").as("id"),
          least(col("l.lb"), coalesce(col("n.nlb"), col("l.lb"))).as("lb"),
          col("l.lb").as("old")))
      // …then jump: adopt the label of the current representative. Labels
      // are always node ids, so the self-join is total. The previous
      // label rides along so convergence detection is a filter on this
      // same table instead of a third join back to `labels`.
      val (jumped, jumpedGen) = Lineage.ckpt(
        prop.as("c").join(prop.as("p"), col("c.lb") === col("p.id"))
          .select(col("c.id").as("id"), col("p.lb").as("lb"), col("c.old")))
      changed = jumped.filter(col("lb") =!= col("old")).count()
      // `jumped` is materialized with no lineage to the generation it
      // replaces — drop the superseded blocks now, not at session end
      Lineage.release(labelsGen, propGen)
      labels = jumped.select(col("id"), col("lb"))
      labelsGen = jumpedGen
    }
    bi.unpersist()
    lastCcRounds.set(rounds)
    labels.select(col("id"), col("lb").as("component"))
  }

  /** Deterministic PageRank over an undirected edge list — the standard
    * importance measure for a near-dup / citation / link graph (here:
    * which documents sit at the center of a duplicate cluster). Each
    * iteration is one equi-join (labels × edges) + one keyed aggregate —
    * the same shuffle shape as [[connectedComponents]], O(iters) rounds,
    * lineage truncated per round.
    *
    * Determinism contract (see Q.scala FP policy): each contribution
    * pr/deg is a single double division; the neighbor sum goes through
    * DECIMAL(38,12) (order-free, exact); the damping update
    * (1-d)/n + d*s is fixed-order per-row double arithmetic. Any engine
    * replays it bit-for-bit, which is what makes an iterative-fixpoint
    * operator oracle-able as an unrolled CTE chain.
    *
    * Output: (id, degree, pagerank) for every node in `edges`.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      src: String = "id_a",
      dst: String = "id_b"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // `edges` carries UNIQUE undirected pairs (id_a < id_b — what every
    // upstream pair generator emits), so the two-direction union is
    // already duplicate-free: no dedup exchange. Duplicate input pairs
    // degrade gracefully to multigraph semantics (deg counts edge
    // multiplicity), the standard weighted-PR reading.
    //
    // The edge set is persisted ALREADY HASH-PARTITIONED on the join
    // key u, and deg/pr inherit hash(id) from their keyed aggregates —
    // so each iteration's two joins (contrib: bi⋈pr on u=id; update:
    // deg⋈contrib on id) are co-partitioned with ZERO exchange, and the
    // only per-iteration shuffle left is the contribution transfer
    // itself (groupBy dst), which is the algorithm's irreducible
    // communication. At 1000 executors that turns 3 full edge-set
    // shuffles per iteration into one keyed transfer of (node, contrib)
    // rows.
    val bi = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = bi.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    var pr = deg.select(col("id"), col("deg"),
      (lit(1.0) / n).as("pr"))
    var prGen: Option[org.apache.spark.rdd.RDD[_]] = None
    (1 to iters).foreach { i =>
      val contrib = bi
        .join(pr, bi("u") === pr("id"))
        .select(bi("v").as("id"), (col("pr") / col("deg")).as("c"))
        .groupBy("id")
        .agg(sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double").as("s"))
      pr = deg.join(contrib, "id")
        .select(col("id"), col("deg"),
          (lit(1.0 - damping) / n + lit(damping) * col("s")).as("pr"))
      // unlike the CC loop (self-join + convergence count per round)
      // the PR chain is linear, so lineage only needs truncating every
      // few rounds — each localCheckpoint is an eager materialization
      // worth skipping for short chains. Each new generation releases
      // the one it supersedes (Lineage policy).
      if (i % 4 == 0 && i < iters) {
        val (ck, gen) = Lineage.ckpt(pr)
        Lineage.release(prGen)
        pr = ck; prGen = gen
      }
    }
    // materialize the result so the edge/degree caches can be released
    // here instead of leaking for the session lifetime (CC policy)
    val out = pr.select(col("id"), col("deg"), col("pr").as("pagerank"))
      .localCheckpoint()
    Lineage.release(prGen)
    bi.unpersist()
    deg.unpersist()
    out
  }

  /** Deterministic Lloyd's k-means over an embedding column — the
    * codebook-training step IVF indexing and semantic dedup assume
    * (MLlib's KMeans is random-init and non-reproducible across engines;
    * this one is pinned down to the bit).
    *
    * Determinism contract: init = the embeddings of the `k` lowest
    * vec_ids; assignment = argmin of squared L2 computed as a strict
    * left fold (ties → lowest centroid id); new centroids = per-dim
    * exact decimal means (order-independent). Every arithmetic step is
    * single-rounded IEEE double in a fixed order, so any engine replays
    * it exactly.
    *
    * Scale shape: the k×dim codebook is driver-held model state (the
    * standard distributed-KMeans pattern — MLlib does the same): each
    * iteration broadcasts it as literals into a scan-stage assignment
    * expression (no shuffle), then one (cluster, dim)-keyed aggregate
    * with map-side partials computes the means; only k×dim rows are
    * ever collected. The double-cast corpus is persisted across
    * iterations. Empty clusters keep their previous centroid.
    *
    * Output: (vec_id, cluster, dist2) — final assignment and its
    * squared distance.
    */
  def kmeansLloyd(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // `e` stays persisted for the caller's terminal action on the
    // returned plan (same policy as the dedup diamonds); DiamondCaches
    // releases it once the caller drops the query.
    graft.DiamondCaches.register(e,
      assignToCents(e, lloydCents(e, k, iters))
        .select(col("vec_id"), col("cluster"), col("dist2")))
  }

  /** Nearest-centroid assignment of a (vec_id, emb: array<double>)
    * frame: squared-L2 strict left fold per centroid, argmin with ties
    * to the lowest centroid id — all scan-stage expression work over
    * the codebook literals, zero shuffle.
    */
  private[graft] def assignToCents(
      e: DataFrame, cents: IndexedSeq[Seq[Double]]): DataFrame = {
    val ds = cents.zipWithIndex.map { case (c, i) =>
      aggregate(
        zip_with(col("emb"), typedLit(c), (x, cv) => (x - cv) * (x - cv)),
        lit(0.0), (a, x) => a + x).as(s"d$i")
    }
    val withD = e.select(col("vec_id") +: col("emb") +: ds: _*)
    val best = least(cents.indices.map(i => col(s"d$i")): _*)
    val cluster = cents.indices.foldRight(lit(-1)) { (i, els) =>
      when(col(s"d$i") === best, lit(i)).otherwise(els)
    }
    withD.select(col("vec_id"), col("emb"),
      cluster.as("cluster"), best.as("dist2"))
  }

  /** The Lloyd training loop alone: returns the codebook after
    * `iters - 1` mean updates — the codebook the `iters`-th (final)
    * assignment round uses. `e` must be (vec_id, emb: array<double>)
    * and should be persisted by the caller (it is scanned once per
    * round). Shared by [[kmeansLloyd]] and the product-quantization
    * sub-codebook training in [[Similarity.pqTopK]].
    */
  private[graft] def lloydCents(
      e: DataFrame, k: Int, iters: Int): IndexedSeq[Seq[Double]] = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var cents: IndexedSeq[Seq[Double]] = e.orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Double](1)).toIndexedSeq
    // `iters` counts ASSIGNMENT rounds: assign → means → … → assign,
    // so the codebook updates iters-1 times and the final assignment
    // (the output) uses the last codebook.
    (1 until iters).foreach { _ =>
      val means = DriverModel.collectBounded(
        assignToCents(e, cents)
          .select(col("cluster"), posexplode(col("emb")).as(Seq("dim", "v")))
          .groupBy("cluster", "dim")
          .agg((sum(col("v").cast(
            org.apache.spark.sql.types.DecimalType(28, 6))).cast("double") /
            count(lit(1))).as("m")),
        "Clustering.lloydCents means", maxRows = 1000000)
        .groupBy(_.getAs[Int]("cluster"))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("m")).toSeq
        }
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** Dup-cluster size histogram — the dedup REPORT card: per cluster
    * size, how many clusters, how many documents they hold, and how
    * many a keep-one-per-cluster dedup would remove. Whether the
    * duplicate mass sits in millions of pairs or a few mega-clusters
    * decides which dedup machinery to spend on (pair joins vs CC
    * rounds) and what the corpus actually shrinks by. Two hash aggs
    * over the [[dupClusters]] output: corpus-keyed (component), then
    * size-keyed (bounded by the largest cluster) — no window, no
    * global order.
    */
  def dupClusterSizeHistogram(docs: DataFrame, n: Int,
      threshold: Double): DataFrame =
    dupClusters(docs, n, threshold)
      .groupBy("component").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"),
        ((col("size") - 1L) * col("n_clusters")).as("n_removable"))

  /** Silhouette-vs-k tuning curve (the fifth tuning curve, beside
    * n120/n125/n126/n129): for each candidate k, train the
    * deterministic Lloyd codebook, then score every vector's euclidean
    * silhouette against that codebook — cohesion a = distance to the
    * assigned centroid, separation b = distance to the nearest OTHER
    * centroid, s = (b − a)/max(a, b) (a distance tie with another
    * centroid gives s = 0) — summarized per (k, cluster). The curve's
    * shape across k is the "choose k" evidence a clustering-dependent
    * pipeline stage (SemDeDup n31, cluster-cap n82, IVF n120) should
    * record before trusting its k.
    *
    * Exactness: distances are the assign fold's strict left-to-right
    * squared-L2 (bit-identical to the oracle's unrolled-Lloyd replay,
    * the n30 guarantee), `sqrt` correctly rounded, means through
    * DECIMAL(38,12). Scale shape: per k, ONE pass over the corpus
    * computing all k distances in the scan stage (the codebook is
    * driver-held literals), one hash agg of k cells; the k sweep is a
    * union of independent passes.
    */
  def silhouetteKSweep(embeddings: DataFrame, ks: Seq[Int],
      iters: Int): DataFrame = {
    require(ks.nonEmpty, "need at least one k")
    val e = embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sum12 = (c: org.apache.spark.sql.Column) =>
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 12)))
        .cast("double")
    val perK = ks.map { k =>
      val cents = lloydCents(e, k, iters)
      val ds = cents.zipWithIndex.map { case (c, i) =>
        aggregate(
          zip_with(col("emb"), typedLit(c), (x, cv) => (x - cv) * (x - cv)),
          lit(0.0), (a, x) => a + x).as(s"d$i")
      }
      val withD = e.select(col("vec_id") +: col("emb") +: ds: _*)
      val best = least(cents.indices.map(i => col(s"d$i")): _*)
      val cluster = cents.indices.foldRight(lit(-1)) { (i, els) =>
        when(col(s"d$i") === best, lit(i)).otherwise(els)
      }
      // nearest OTHER centroid: the per-column min with the assigned
      // slot masked out (null never wins least())
      val othersMin = least(cents.indices.map(i =>
        when(col("cluster") === i, lit(null).cast("double"))
          .otherwise(col(s"d$i"))): _*)
      withD
        .withColumn("cluster", cluster)
        .withColumn("a", sqrt(best))
        .withColumn("b", sqrt(othersMin))
        .withColumn("sil",
          when(greatest(col("a"), col("b")) > 0.0,
            (col("b") - col("a")) / greatest(col("a"), col("b")))
            .otherwise(lit(0.0)))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          (sum12(col("a")) / count(lit(1))).as("mean_cohesion"),
          (sum12(col("b")) / count(lit(1))).as("mean_separation"),
          (sum12(col("sil")) / count(lit(1))).as("mean_silhouette"))
        .select(lit(k).as("k"), col("cluster"), col("n"),
          col("mean_cohesion"), col("mean_separation"),
          col("mean_silhouette"))
    }
    graft.DiamondCaches.register(e, perK.reduce(_ unionByName _))
  }

  /** Quality-aware near-dup cluster representative selection: the
    * production refinement of [[dupClusters]]' keep-the-minimum-id rule —
    * when a cluster of near-duplicates collapses to one survivor, keep
    * the HIGHEST-QUALITY member (composite score: stopword − punct −
    * digit ratios, the [[TextAnalysis.qualityScore]] arithmetic), ties
    * to the lowest doc_id. Dedup that throws away the cleanest copy of
    * a page and keeps the ad-riddled one is strictly worse training
    * data; this operator is why cluster identification and survivor
    * choice are separate concerns.
    *
    * Scale shape: clusters from the [[dupClusters]] CC machinery
    * (pointer jumping, O(log n) rounds); scoring is scan-stage
    * expression work; the representative pick is one window partitioned
    * by COMPONENT (clusters are near-dup-sized — tiny — and singletons
    * dominate, so AQE sees an almost-unique key). Output: (doc_id,
    * component, score, keep).
    */
  def dupClustersKeepBest(
      docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val comp = dupClusters(docs, n, threshold).select("doc_id", "component")
    val score = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"),
        (col("stopword_ratio") - col("punct_ratio") - col("digit_ratio"))
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(desc("score"), asc("doc_id"))
    comp.join(score, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "component", "score", "keep")
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication = k-means
    * cluster the embeddings, then compare pairs only WITHIN a cluster
    * and drop the higher vec_id of every pair with cosine ≥ `threshold`.
    *
    * Scale shape: this is the whole point of the algorithm — the
    * within-cluster equi-join on `cluster` replaces the corpus² cosine
    * matrix with Σ cluster² work, and k is chosen to make clusters
    * shuffle-partition-sized (AQE splits a skewed giant cluster like any
    * other skewed join key). The pair scoring reuses the native
    * [[graft.functions.VectorFunctions.cosine]] expression in the join
    * stage. Output: (vec_id, cluster, keep).
    */
  def semDedup(
      embeddings: DataFrame, k: Int, iters: Int, threshold: Double): DataFrame = {
    val assign = kmeansLloyd(embeddings, k, iters).select("vec_id", "cluster")
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .join(assign, "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dropped = e.as("a")
      .join(e.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.VectorFunctions
        .cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    val out = e.select("vec_id", "cluster")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        not(coalesce(col("is_dup"), lit(false))).as("keep"))
    graft.DiamondCaches.register(e, out)
  }

  /** Cluster-capped diversity sampling: keep only the `cap` most
    * prototypical members (smallest squared centroid distance, ties to
    * the lower vec_id) of every k-means cluster — the
    * prototypes-style diversity-aware pruning that complements
    * [[semDedup]]: semDedup drops near-identical PAIRS but leaves a
    * dense semantic mode uncapped; a per-cluster cap bounds every
    * mode's contribution to the kept corpus regardless of its raw
    * frequency.
    *
    * Scale shape: the assignment is scan-stage codebook arithmetic
    * (zero shuffle, [[kmeansLloyd]]); the cap is one window
    * partitioned BY CLUSTER. Parallelism = k — which is how this is
    * deployed at 100 TB: the prototype literature runs k in the tens
    * of thousands (cluster population ≈ corpus/k stays bounded), so
    * the per-cluster rank never degenerates into a global sort. The
    * spec-scale k here is small only because the test corpus is.
    *
    * Output: (vec_id, cluster, dist2, ck_rank, kept).
    */
  def clusterCapSample(
      embeddings: DataFrame, k: Int, iters: Int, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(asc("dist2"), asc("vec_id"))
    kmeansLloyd(embeddings, k, iters)
      .withColumn("ck_rank", row_number().over(w).cast("int"))
      .withColumn("kept", col("ck_rank") <= cap)
  }

  /** End-to-end near-dup clustering over a corpus: exact n-gram Jaccard
    * pairs ([[Dedup.jaccardPairs]] — swap in [[Dedup.minHashPairs]] for
    * the approximate scale path, same shape) → connected components →
    * one row per document with its cluster representative and a keep
    * flag (the minimum doc_id of each cluster survives).
    */
  def dupClusters(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val pairs = Dedup.jaccardPairs(docs, n, threshold).select("id_a", "id_b")
    val comp = connectedComponents(pairs).withColumnRenamed("id", "doc_id")
    docs.select("doc_id").join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("keep", col("component") === col("doc_id"))
  }

  /** Soft deduplication: instead of DROPPING near-duplicates, every
    * member of a dup cluster is kept with a sampling weight of
    * 1/cluster-size, so each distinct piece of content contributes one
    * expected epoch occurrence regardless of how many copies the crawl
    * found (the reweight-don't-remove strand of the dedup literature —
    * hard removal loses the natural distribution over near-variants;
    * downweighting preserves it at equal effective mass).
    *
    * The weight is emitted in integer parts-per-million
    * (`1000000 div n_members`) — exact in any engine, no FP division —
    * ready for [[Sampling.mixtureUpsample]]-style per-mille thinning or
    * a loss-weighting column at training time.
    *
    * Scale shape: [[dupClusters]] CC machinery (pointer jumping,
    * O(log n) rounds) plus ONE count window partitioned by COMPONENT —
    * near-dup clusters are tiny and singletons dominate, so the window
    * key is almost unique and AQE-friendly. Output: (doc_id, component,
    * n_members, weight_ppm).
    */
  def dupClustersSoftWeight(
      docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    dupClusters(docs, n, threshold)
      .select(col("doc_id"), col("component"))
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("weight_ppm", expr("1000000L div n_members"))
  }
}
