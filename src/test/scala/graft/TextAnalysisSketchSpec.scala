package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound pin for the rows-only n128 sketch card: approx
  * percentiles carry no DuckDB oracle (GK returns a value inside the
  * rank band, not a cross-engine-exact one), so the guarantee that
  * REPLACES the hash compare is pinned here — every sketch value must
  * be an actual data value within the Greenwald–Khanna rank-error
  * band around the exact n114 rank.
  */
class TextAnalysisSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sketch p50/p90/p99 sit within the GK rank band of the exact card") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val sketch = graft.operators.TextAnalysis
      .lengthPercentilesSketch(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // per-source sorted length multisets (sf0.001 is test-sized)
    val lengths: Map[String, Array[Long]] = docs
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok").isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(sketch.keySet == lengths.keySet)
    for ((src, arr) <- lengths; (p, got) <- Seq(
        50 -> sketch(src)._1, 90 -> sketch(src)._2, 99 -> sketch(src)._3)) {
      val n = arr.length
      // exact target rank (the n114 convention) ± the GK rank error
      // (n/accuracy) ± 1 for the engines' differing rank definition
      val target = math.max(1, (n * p + 99) / 100)
      val tol = n / 10000 + 1
      val window = arr.slice(math.max(0, target - 1 - tol),
        math.min(n, target + tol))
      assert(window.contains(got),
        s"$src p$p: sketch $got outside rank band ${window.mkString(",")}")
    }
  }

  test("rank error stays bounded at 100k rows (10 ranks at accuracy 10000)") {
    // 1000 docs per token-length 1..100: any value within ±10 ranks of
    // the exact target differs from it by at most 1 token — the bound
    // a plan change (e.g. silently lowering accuracy) would break
    import spark.implicits._
    val docs = spark.range(0L, 100000L)
      .select(col("id").as("doc_id"), lit("x").as("source"),
        concat_ws(" ",
          array_repeat(lit("w"), (col("id") % 100 + 1).cast("int")))
          .as("text"))
    val r = graft.operators.TextAnalysis
      .lengthPercentilesSketch(docs).as[(String, Long, Long, Long, Long, Long)]
      .head()
    assert(r._2 == 100000L)
    assert(math.abs(r._3 - 50L) <= 1, s"p50 ${r._3} off by more than 1")
    assert(math.abs(r._4 - 90L) <= 1, s"p90 ${r._4} off by more than 1")
    assert(math.abs(r._5 - 99L) <= 1, s"p99 ${r._5} off by more than 1")
    assert(r._6 == 100L)
  }

  test("NULL text never enters the sketch") {
    import spark.implicits._
    val clean = Seq((1L, "a b c", "s"), (2L, "a b", "s"), (3L, "a", "s"))
      .toDF("doc_id", "text", "source")
    val dirty = clean.unionByName(
      Seq((4L, "s")).toDF("doc_id", "source")
        .withColumn("text", lit(null).cast("string"))
        .select("doc_id", "text", "source"))
    def card(df: org.apache.spark.sql.DataFrame) = graft.operators
      .TextAnalysis.lengthPercentilesSketch(df).collect().toSeq
    assert(card(dirty) == card(clean),
      "a NULL-text doc moved the sketch percentiles or counts")
  }
}
