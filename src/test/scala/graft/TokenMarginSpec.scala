package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Bit-exactness of the native token-scoring expression
  * ([[graft.expressions.TokenBucketMargin]]) against the classic
  * exploded formulation it replaced (tokenize → explode → md5 hex →
  * bucket CASE → per-doc decimal-sum aggregation). The engine's
  * cross-engine hash gate rides this equality: every DuckDB oracle
  * over the scoring queries (n83/n94/n140/n148/n154, s21/s27/s44) was
  * written against the exploded arithmetic.
  */
class TokenMarginSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The r15 scoring pipeline, reconstructed verbatim from public
    * column functions: same normalize, same split-on-space token
    * count, same md5-hex bucket parse, same DECIMAL(38,12)-routed sum.
    */
  private def classicScores(docs: DataFrame, w: IndexedSeq[Double]): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val toks = split(norm, " ")
    def hexDigit(i: Int) =
      s"""(CASE WHEN ascii(substring(h, $i, 1)) >= 97
                THEN ascii(substring(h, $i, 1)) - 87
                ELSE ascii(substring(h, $i, 1)) - 48 END)"""
    docs
      .select(col("doc_id"), size(toks).as("n"), explode(toks).as("tk"))
      .select(col("doc_id"), col("n"), md5(col("tk")).as("h"))
      .withColumn("b", expr(s"((${hexDigit(1)} % 4) * 16 + ${hexDigit(2)})"))
      .groupBy("doc_id")
      .agg(sum((element_at(typedLit(w), col("b") + 1) /
        col("n").cast("double")).cast(DecimalType(38, 12)))
        .cast("double").as("score"))
  }

  private val w: IndexedSeq[Double] =
    Vector.tabulate(64)(i => math.sin(i + 1) * 0.37 - 0.11)

  test("native margin == exploded decimal-sum scoring on the sf0.001 corpus, doc for doc") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val native = graft.operators.Preference.scoreWith(docs, w)
    val classic = classicScores(docs, w)
    val joined = native.as("a").join(classic.as("b"), "doc_id")
      .select(col("doc_id"), col("a.score").as("sa"), col("b.score").as("sb"))
      .collect()
    assert(joined.length == docs.count(),
      "every doc scored by both formulations")
    joined.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"doc ${r.getLong(0)}: native ${r.getDouble(1)} != " +
          s"classic ${r.getDouble(2)} (must be bit-identical)")
    }
  }

  test("native margin edge cases: empty text, repeated spaces, unicode, null text dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), // one empty token: md5("") bucket
      (2L, "  a  b  "), // collapsed + trimmed by normalized()
      (3L, "héllo wörld h©llo"), // multibyte UTF-8, 0x20-split safe
      (4L, "a a a a a a a"), // repeated token: count-multiply path
      (5L, null.asInstanceOf[String])) // dropped, as explode did
      .toDF("doc_id", "text")
    val native = graft.operators.Preference.scoreWith(docs, w)
      .orderBy("doc_id").collect()
    val classic = classicScores(docs, w).orderBy("doc_id").collect()
    assert(native.length == 4 && classic.length == 4,
      "null text yields no score row on either path")
    native.zip(classic).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) &&
        a.getDouble(1) == b.getDouble(1),
        s"doc ${a.getLong(0)}: ${a.getDouble(1)} != ${b.getDouble(1)}")
    }
  }

  test("scoring plan is a stateless per-row projection — no explode, no aggregate") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val plan = graft.operators.Preference.scoreWith(docs, w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate") && !plan.contains("HashAggregate"),
      s"scoring regressed to explode+aggregate:\n${plan.take(800)}")
  }
}
