package graft

import graft.operators.{LanguageModel, TextAnalysis}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-4 corpus statistics: byte-histogram diversity
  * and bigram-LM fluency, pinned on hand-computed fixtures.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ByteHistogram counts every UTF-8 byte, including multi-byte chars") {
    val h = graft.expressions.ByteHistogram(Literal("é a"))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // "é a" = C3 A9 20 61
    assert(h.numElements() == 256)
    assert(h.getLong(0xC3) == 1 && h.getLong(0xA9) == 1 &&
      h.getLong(0x20) == 1 && h.getLong(0x61) == 1)
    assert((0 until 256).map(h.getLong).sum == 4)
  }

  test("byteDiversity: exact stats on known strings, null-safe on empty") {
    import spark.implicits._
    val docs = Seq((1L, "aab"), (2L, "éé"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.byteDiversity(docs).orderBy("doc_id").collect()
    // "aab": bytes {a:2, b:1}; Σc²=5; simpson=5/9; effective=9/5
    assert(out(0).getLong(1) == 3 && out(0).getInt(2) == 2)
    assert(out(0).getDouble(3) == 2.0 / 3)
    assert(out(0).getDouble(4) == 5.0 / 9)
    assert(out(0).getDouble(5) == 9.0 / 5)
    // "éé" = C3 A9 C3 A9: 4 bytes, 2 distinct, Σc²=8 → simpson 0.5
    assert(out(1).getLong(1) == 4 && out(1).getInt(2) == 2)
    assert(out(1).getDouble(4) == 0.5 && out(1).getDouble(5) == 2.0)
    // empty text: zero counts, null ratios (no division by zero)
    assert(out(2).getLong(1) == 0 && out(2).getInt(2) == 0)
    assert(out(2).isNullAt(3) && out(2).isNullAt(4) && out(2).isNullAt(5))
  }

  test("bigramFluency: add-one smoothed likelihood on a hand-computed corpus") {
    import spark.implicits._
    // corpus: "a b a", "a b", "x" → V=3; c(a,b)=2, c(b,a)=1; c1(a)=2, c1(b)=1
    // p(a,b) = (2+1)/(2+3) = 0.6 → 600000 ppm
    // p(b,a) = (1+1)/(1+3) = 0.5 → 500000 ppm
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = LanguageModel.bigramFluency(docs).orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2)
    assert(out(0).getDouble(2) == 550000.0) // (600000 + 500000) / 2
    assert(out(0).getBoolean(3))
    assert(out(1).getLong(1) == 1)
    assert(out(1).getDouble(2) == 600000.0)
    // single-token doc: no bigrams, null score, null gate
    assert(out(2).getLong(1) == 0 && out(2).isNullAt(2) && out(2).isNullAt(3))
  }
}
