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

  test("cosine: degenerate inputs yield null, never NaN") {
    GraftFunctions.register(spark)
    def one(sql: String): org.apache.spark.sql.Row =
      spark.sql(s"SELECT $sql AS c").head()
    // zero-norm vector
    assert(one("graft_cosine(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))").isNullAt(0))
    // empty arrays
    assert(one("graft_cosine(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>))").isNullAt(0))
    // null element inside the compared prefix
    assert(one("graft_cosine(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").isNullAt(0))
    // null argument
    assert(one("graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").isNullAt(0))
  }

  test("cosine: codegen path is bit-identical to the HOF formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(64)((Array.fill(16)(rng.nextFloat()),
      Array.fill(16)(rng.nextFloat())))
    val df = rows.toDF("a", "b")
    val hof = df.select(
      (graft.functions.VectorFunctions.dotProduct(col("a"), col("b")) /
        (graft.functions.VectorFunctions.l2Norm(col("a")) *
          graft.functions.VectorFunctions.l2Norm(col("b")))).as("c"))
      .collect().map(_.getDouble(0))
    val native = df.select(
      graft.functions.VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(hof.zip(native).forall { case (x, y) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    })
  }

  test("native expressions participate in whole-stage codegen (no fallback)") {
    import org.apache.spark.sql.functions.col
    // parquet-backed so the projection is a real codegen stage (a local
    // Seq folds into LocalTableScan and would vacuously pass/fail)
    val t = Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select(
      graft.functions.VectorFunctions.cosine(
        col("embedding"), col("embedding")).as("c"))
    val doc = t.documents.select(
      graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("h"))
    for (df <- Seq(emb, doc)) {
      val physical = df.queryExecution.executedPlan.toString()
      assert(physical.contains("*("), // the WholeStageCodegen span marker
        s"expected whole-stage codegen, got:\n$physical")
    }
    // the real guard: none of the native expressions fall back to the
    // interpreter inside an otherwise-codegen'd stage
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    for (c <- Seq(classOf[graft.expressions.CosineSim],
        classOf[graft.expressions.WordShingleHashes],
        classOf[graft.expressions.MinHashSig],
        classOf[graft.expressions.MinHashSigFromHashes],
        classOf[graft.expressions.SimHash64]))
      assert(!classOf[CodegenFallback].isAssignableFrom(c),
        s"${c.getSimpleName} must implement doGenCode")
    // self-cosine through the generated path is exactly 1.0
    assert(emb.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
    assert(doc.head().getSeq[Long](0).nonEmpty)
  }

  test("token count: byte scan equals size(split) on every edge case") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val cases = Seq("", " ", "a", "a b", "a  b", " a", "a ", "  ",
      "héllo wörld", "多字节 字符 x")
    val got = cases.toDF("s")
      .selectExpr("graft_token_count(s) AS n").collect().map(_.getInt(0))
    val expected = cases.map(_.split(" ", -1).length)
    assert(got.toList == expected.toList)
    // null in, null out
    assert(spark.sql("SELECT graft_token_count(CAST(NULL AS STRING)) AS n")
      .head().isNullAt(0))
  }

  test("optimizer rule rewrites size(split(text, ' ')) to the byte scan") {
    import org.apache.spark.sql.functions._
    GraftSession.installOptimizations(spark)
    // build on range() so constant folding can't collapse the projection
    val s = concat(lit("a b "), col("id").cast("string"))
    val df = spark.range(3).select(size(split(s, " ")).as("n"))
    assert(df.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("spacetokencount"))
    assert(df.collect().map(_.getInt(0)).toList == List(3, 3, 3))
    // a non-space separator is left untouched
    val other = spark.range(1)
      .select(size(split(concat(lit("a,b,"), col("id").cast("string")), ","))
        .as("n"))
    assert(!other.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("spacetokencount"))
    assert(other.head().getInt(0) == 3)
  }

  test("GraftExtensions injection path: functions + rule in a fresh session") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val prev = spark // force-init the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // new session object on the SAME SparkContext, extensions applied at
    // build time (the spark.sql.extensions=graft.GraftExtensions path)
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply)
      .getOrCreate()
    try {
      assert(s2 ne prev)
      assert(s2.sql("SELECT graft_token_count('a b') AS n").head().getInt(0) == 2)
      val df = s2.range(2).select(
        size(split(concat(lit("a b "), col("id").cast("string")), " ")).as("n"))
      assert(df.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("spacetokencount"))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
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
