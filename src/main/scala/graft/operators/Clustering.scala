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

  /** Component label (= min reachable node id) for every node that
    * appears in `edges`. Output: (id, component).
    */
  def connectedComponents(
      edges: DataFrame, src: String = "id_a", dst: String = "id_b"): DataFrame = {
    val bi = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = bi.select(col("u").as("id")).distinct()
      .withColumn("lb", col("id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // min label over the neighborhood…
      val nbrMin = bi.join(labels, bi("u") === labels("id"))
        .groupBy(bi("v").as("id")).agg(min(col("lb")).as("nlb"))
      val prop = labels.as("l")
        .join(nbrMin.as("n"), col("l.id") === col("n.id"), "left")
        .select(col("l.id").as("id"),
          least(col("l.lb"), coalesce(col("n.nlb"), col("l.lb"))).as("lb"))
        .localCheckpoint()
      // …then jump: adopt the label of the current representative. Labels
      // are always node ids, so the self-join is total.
      val jumped = prop.as("c").join(prop.as("p"), col("c.lb") === col("p.id"))
        .select(col("c.id").as("id"), col("p.lb").as("lb"))
        .localCheckpoint()
      changed = jumped.as("a").join(labels.as("b"), col("a.id") === col("b.id"))
        .filter(col("a.lb") =!= col("b.lb")).count()
      labels = jumped
    }
    bi.unpersist()
    labels.select(col("id"), col("lb").as("component"))
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
}
