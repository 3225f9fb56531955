package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form fixtures for the round-13 operators (the retention and
  * sketch families have their own specs — ArtifactRetentionSpec,
  * TextAnalysisSketchSpec).
  */
class NorthStar9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("packingEfficiencySweep: hand-computed pad vs concat at L=4") {
    import spark.implicits._
    // token counts 3, 5, 10 → at L=4: pad ⌈3/4⌉+⌈5/4⌉+⌈10/4⌉ = 1+2+3
    // sequences (24 slots for 18 tokens); concat ⌈18/4⌉ = 5 (20 slots)
    val docs = Seq(
      (1L, "s", "a b c"),
      (2L, "s", "a b c d e"),
      (3L, "s", "a b c d e f g h i j"))
      .toDF("doc_id", "source", "text")
    val r = graft.operators.Packing
      .packingEfficiencySweep(docs, Seq(4L)).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "s" && row.getLong(1) == 4L)
    assert(row.getLong(2) == 3L, "n_docs")
    assert(row.getLong(3) == 18L, "total_tokens")
    assert(row.getLong(4) == 6L, "pad_seqs")
    assert(row.getLong(5) == 6L, "pad_waste")
    assert(row.getDouble(6) == 18.0 / 24.0, "pad_efficiency")
    assert(row.getLong(7) == 5L, "concat_seqs")
    assert(row.getLong(8) == 2L, "concat_waste")
    assert(row.getDouble(9) == 18.0 / 20.0, "concat_efficiency")
  }

  test("packingEfficiencySweep: NULL text is out, concat gap closes with L") {
    import spark.implicits._
    val docs = Seq((1L, "s", "a b c"), (2L, "s", "d e"))
      .toDF("doc_id", "source", "text")
      .unionByName(Seq((3L, "s")).toDF("doc_id", "source")
        .withColumn("text", lit(null).cast("string"))
        .select("doc_id", "source", "text"))
    val r = graft.operators.Packing
      .packingEfficiencySweep(docs, Seq(2L, 8L))
      .orderBy("context_len").collect()
    assert(r.forall(_.getLong(2) == 2L), "NULL-text doc must not count")
    // L=2: pad ⌈3/2⌉+⌈2/2⌉=3 seqs, concat ⌈5/2⌉=3; L=8: pad 2, concat 1
    assert(r(0).getLong(4) == 3L && r(0).getLong(7) == 3L)
    assert(r(1).getLong(4) == 2L && r(1).getLong(7) == 1L)
    // pad efficiency falls with L (more padding per doc), concat's only
    // boundary loss: the policy gap at L=8 is the pad waste
    assert(r(1).getDouble(6) == 5.0 / 16.0 && r(1).getDouble(9) == 5.0 / 8.0)
  }

  test("epochShufflePlan: determinism, per-epoch permutations, shard balance") {
    import spark.implicits._
    val docs = (1L to 12L)
      .map(id => (id, "s", ("w " * id.toInt).trim))
      .toDF("doc_id", "source", "text")
    def plan() = graft.operators.Packing
      .epochShufflePlan(docs, epochs = 2, shards = 2)
      .orderBy("epoch", "doc_id").collect().toSeq
    val p = plan()
    // byte-identical across runs — the reproducible-training property
    assert(p == plan(), "two runs of the same corpus must agree exactly")
    val total = (1L to 12L).sum // 78 tokens; shard size ceil(78/2) = 39
    for (e <- 0 to 1) {
      val rows = p.filter(_.getInt(0) == e)
      assert(rows.map(_.getLong(2)).sum == total)
      // offsets are an exact exclusive prefix sum of SOME permutation:
      // sorted offsets + their tokens tile [0, total) with no gaps
      val byOff = rows.sortBy(_.getLong(3))
      assert(byOff.head.getLong(3) == 0L, s"epoch $e must start at 0")
      byOff.sliding(2).foreach { case Seq(a, b) =>
        assert(a.getLong(3) + a.getLong(2) == b.getLong(3),
          s"epoch $e offsets must tile without gaps")
      }
      // contiguous token-balanced sharding: shard = start_off DIV 39
      rows.foreach(r => assert(r.getInt(4) == (r.getLong(3) / 39L).toInt))
      assert(rows.map(_.getInt(4)).distinct.sorted == Seq(0, 1))
    }
    // the two epochs are genuinely different permutations
    val off0 = p.filter(_.getInt(0) == 0).map(r => r.getLong(1) -> r.getLong(3))
    val off1 = p.filter(_.getInt(0) == 1).map(r => r.getLong(1) -> r.getLong(3))
    assert(off0 != off1, "epoch draws must reshuffle the order")
  }

  test("repetitionExposure: hand-computed dup supply, allocation, epochs") {
    import spark.implicits._
    // src a: "x y z" twice (one fingerprint group) + "p q" →
    //   total 8 tokens, unique 5; src b: "m n o p" → 4/4; Σunique = 9
    // budget 18: alloc_a = 18·5 DIV 9 = 10 → epochs ⌈10/5⌉ = 2,
    //   repeat (10−5)/10 = 0.5; alloc_b = 18·4 DIV 9 = 8 → epochs 2,
    //   repeat 0.5
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "x y z"), (3L, "a", "p q"),
      (4L, "b", "m n o p"))
      .toDF("doc_id", "source", "text")
    val r = graft.operators.Mixture.repetitionExposure(docs, 18L)
      .orderBy("source").collect()
    assert(r.length == 2)
    val a = r(0); val b = r(1)
    assert((a.getString(0), a.getLong(1), a.getLong(2), a.getLong(3)) ==
      ("a", 3L, 8L, 5L))
    assert(a.getDouble(4) == 3.0 / 8.0, "dup_token_frac")
    assert((a.getLong(5), a.getLong(6)) == (10L, 2L), "alloc/epochs")
    assert(a.getDouble(7) == 0.5, "repeat_frac")
    assert((b.getString(0), b.getLong(3), b.getLong(5), b.getLong(6),
      b.getDouble(7)) == ("b", 4L, 8L, 2L, 0.5))
    // under-allocated regime: a huge unique supply relative to budget
    // must read epochs ≤ 1 and repeat 0
    val r2 = graft.operators.Mixture.repetitionExposure(docs, 9L)
      .orderBy("source").collect()
    assert(r2.forall(_.getLong(6) == 1L))
    assert(r2.forall(_.getDouble(7) == 0.0))
  }

  test("splitLeakage: planted twins land in md5-derived split groups exactly") {
    import spark.implicits._
    // 10 twin pairs (2i-1, 2i) with identical per-pair text — Jaccard 1,
    // so jaccardPairs finds exactly these pairs; the expected grouping
    // is derived from the SAME md5 bucket rule evaluated standalone
    val docs = (1L to 20L).map { id =>
      val pair = (id + 1) / 2
      (id, "s", s"twin text number $pair with padding tokens $pair")
    }.toDF("doc_id", "source", "text")
    val split: Map[Long, String] = spark.range(1, 21)
      .select(col("id"),
        (conv(substring(md5(concat_ws(":", col("id"), lit("split"))), 1, 8),
          16, 10).cast("long") % 100).as("b"))
      .collect().map { r =>
        val b = r.getLong(1)
        r.getLong(0) ->
          (if (b < 80) "train" else if (b < 90) "val" else "test")
      }.toMap
    val expected = (1L to 10L).map { p =>
      val (a, b) = (split(2 * p - 1), split(2 * p))
      (Seq(a, b).min, Seq(a, b).max)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Dedup.splitLeakage(docs, 3, 0.8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == expected.keySet,
      s"split-pair groups: got ${got.keySet}, expected ${expected.keySet}")
    got.foreach { case (k @ (a, b), (cross, nPairs, nDocs, maxJ)) =>
      assert(nPairs == expected(k), s"$k pair count")
      assert(cross == (a != b), s"$k cross flag")
      // twins are disjoint pairs, so docs = 2× pairs in every group
      assert(nDocs == 2 * nPairs, s"$k doc count")
      assert(maxJ == 1.0, s"$k max jaccard")
    }
  }
}
