package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the native expressions (GraftFunctions/GraftExtensions). */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_* functions register and evaluate through SQL") {
    GraftFunctions.register(spark)
    val cos = spark.sql(
      """SELECT graft_cosine(
           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val sig = spark.sql(
      """SELECT graft_minhash(graft_shingle_hashes('a b c d e', 3), 16) AS s""")
      .head().getSeq[Long](0)
    assert(sig.size == 16)

    val sim = spark.sql(
      """SELECT graft_simhash(array('tok1', 'tok2')) AS h""").head().getLong(0)
    val sim2 = spark.sql(
      """SELECT graft_simhash(array('tok1', 'tok2')) AS h""").head().getLong(0)
    assert(sim == sim2)
  }

  test("SQL shingle hashes agree with the DataFrame-level function") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("the quick brown fox jumps").toDF("text")
    val viaCol = df.select(
      graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("h"))
      .head().getSeq[Long](0)
    df.createOrReplaceTempView("ext_t")
    val viaSql = spark.sql(
      "SELECT graft_shingle_hashes(text, 3) AS h FROM ext_t")
      .head().getSeq[Long](0)
    assert(viaCol == viaSql)
  }
}
