package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form fixtures for the round-14 dataloader/tokenizer cards
  * (the geometry family has its own spec — EmbeddingGeometrySpec).
  */
class NorthStar10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5Draw(docId: Long, shard: Int): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId:shard:$shard".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString, 16)

  test("shardStability: rendezvous matches a plain-Scala HRW replay, mod moves more") {
    import spark.implicits._
    val ids = (0L until 200L)
    val docs = ids.map(i => (i, "t", "s")).toDF("doc_id", "text", "source")
    val r = graft.operators.Packing
      .shardStability(docs, fromShards = 8, toShards = 9).collect().head
    assert(r.getInt(0) == 8 && r.getInt(1) == 9)
    assert(r.getLong(2) == 200L)
    // plain-Scala HRW: argmax draw, ties to the larger shard id
    def hrw(id: Long, w: Int): Int =
      (0 until w).maxBy(s => (md5Draw(id, s), s))
    val movedRdv = ids.count(i => hrw(i, 8) != hrw(i, 9))
    val movedMod = ids.count(i => i % 8 != i % 9)
    assert(r.getLong(3) == movedRdv, "rendezvous movement replay")
    assert(r.getLong(4) == movedMod, "mod movement replay")
    // HRW moves ~1/9 (only docs whose NEW shard-8 draw wins); mod
    // reshuffles ~8/9 — the whole point of the card
    assert(r.getDouble(5) < 0.3, s"HRW moved ${r.getDouble(5)}")
    assert(r.getDouble(6) > 0.7, s"mod moved ${r.getDouble(6)}")
    assert(r.getDouble(5) < r.getDouble(6))
  }

  test("shardStability: HRW from-assignment is a prefix of the to-assignment argmax") {
    // the defining HRW property: a doc moves on 8→9 IFF shard 8's draw
    // beats all of 0..7 — so every moved doc must land on shard 8
    def hrw(id: Long, w: Int): Int =
      (0 until w).maxBy(s => (md5Draw(id, s), s))
    (0L until 500L).foreach { id =>
      val (a, b) = (hrw(id, 8), hrw(id, 9))
      if (a != b) assert(b == 8, s"doc $id moved to $b, not the new shard")
    }
  }

  test("groupAdvantages: zero-mean unit-variance within groups, degenerate group -> 0") {
    import spark.implicits._
    // enough docs for pair mining; group size 4 over 24 docs
    val docs = (0L until 24L).map(i =>
        (i, s"w$i x y z common tokens ${"pad " * (i % 5).toInt}", "s"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Preference
      .groupAdvantages(docs, groupSize = 4, iters = 1)
      .collect()
    assert(r.length == 24)
    r.groupBy(_.getLong(0)).foreach { case (g, rows) =>
      assert(rows.length == 4)
      val adv = rows.map(_.getDouble(6))
      val std = rows.head.getDouble(5)
      if (std > 0) {
        // normalized: mean ~0, population variance ~1 (the moments are
        // DECIMAL(38,12)-rounded, so the error scales with 1e-12/σ²)
        assert(math.abs(adv.sum / 4) < 1e-6, s"group $g mean")
        assert(math.abs(adv.map(a => a * a).sum / 4 - 1.0) < 1e-6,
          s"group $g variance")
      } else adv.foreach(a => assert(a == 0.0, s"group $g degenerate"))
    }
  }

  test("tokenizerFertility: exact sums on an ASCII vs multibyte fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab cd", "en", "web"),     // 5 chars, 5 bytes, 2 ws, 2 bpe
      (2L, "a,b", "en", "web"),       // 3 chars, 3 bytes, 1 ws, 4 bpe (a , b → 3? a ',' b)
      (3L, "éé", "fr", "web")) // 2 chars, 4 bytes (é = 2 bytes)
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.TextAnalysis.tokenizerFertility(docs)
      .orderBy("lang").collect()
    val en = r(0)
    assert(en.getString(1) == "en")
    assert(en.getLong(2) == 2L, "n_docs")
    assert(en.getLong(3) == 8L, "chars 5+3")
    assert(en.getLong(4) == 8L, "bytes 5+3")
    assert(en.getLong(5) == 3L, "ws tokens 2+1")
    // bpe: "ab cd" → [ab, cd]; "a,b" → [a, ',', b]
    assert(en.getLong(6) == 5L, "bpe tokens 2+3")
    assert(en.getDouble(7) == 5.0 * 100.0 / 8.0, "bpe per 100 chars")
    val fr = r(1)
    assert(fr.getLong(3) == 2L && fr.getLong(4) == 4L,
      "multibyte: 2 chars, 4 bytes")
  }
}
