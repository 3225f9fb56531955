package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the diamond-persist janitor: a registered frame stays
  * cached while the witness plan is strongly reachable — INCLUDING
  * across build-time legs and completed executions, the race that
  * killed the release-on-first-completed-read design — and is
  * unpersisted once the witness is garbage-collected and a sweep runs.
  */
class DiamondCachesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def awaitRelease(df: org.apache.spark.sql.DataFrame): Boolean = {
    val deadline = System.nanoTime() + 15_000_000_000L
    while (df.storageLevel != StorageLevel.NONE &&
        System.nanoTime() < deadline) {
      System.gc()
      DiamondCaches.sweep()
      Thread.sleep(100)
    }
    df.storageLevel == StorageLevel.NONE
  }

  test("held while the witness is reachable, released once it is dropped") {
    val diamond = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var witness = DiamondCaches.register(diamond,
      diamond.crossJoin(broadcast(diamond.agg(max(col("v")).as("m"))))
        .filter(col("v") === col("m")))

    // the witness EXECUTES — the r16-advice race: completion of a
    // query that read the cache must NOT release it while the caller
    // still holds the plan
    witness.collect()
    System.gc(); DiamondCaches.sweep(); Thread.sleep(300)
    assert(diamond.storageLevel != StorageLevel.NONE,
      "a reachable witness must keep its diamond cached across executions")
    witness.collect() // still executable against the live cache

    witness = null // the long-lived-session moment: query dropped
    assert(awaitRelease(diamond),
      "an unreachable witness must release its diamond")
  }

  test("drain reaps regardless of reachability") {
    val diamond = spark.range(0, 100).toDF("id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val witness = DiamondCaches.register(diamond, diamond.select(col("id")))
    DiamondCaches.drain()
    assert(diamond.storageLevel == StorageLevel.NONE ||
      awaitRelease(diamond), "drain must unpersist")
    witness.collect() // recomputes from lineage — still correct
  }

  test("operator smoke: passAtK executes with its diamond live, then frees") {
    val docs = (1L to 64L).map(i =>
      (i, s"src${i % 4}", s"alpha beta doc $i text ${"x " * (i % 7).toInt}"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val before = spark.sparkContext.getPersistentRDDs.size
    var out = graft.operators.Preference
      .passAtK(docs, groupSize = 8, ks = Seq(1, 2), iters = 1)
    assert(out.collect().nonEmpty)
    out = null
    // every operator-internal persist (the scored diamond via the
    // janitor AND the training-side ptk persists released by trainCore
    // itself) must be gone once the query is dropped
    val deadline = System.nanoTime() + 15_000_000_000L
    var now = spark.sparkContext.getPersistentRDDs.size
    while (now > before && System.nanoTime() < deadline) {
      System.gc()
      DiamondCaches.sweep()
      Thread.sleep(100)
      now = spark.sparkContext.getPersistentRDDs.size
    }
    assert(now <= before,
      s"persisted RDDs leaked: before=$before after=$now")
  }
}
