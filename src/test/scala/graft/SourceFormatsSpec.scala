package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Batch source/format coverage (SURVEY §2.2): the engine reads parquet
  * first-class (the harness tables) — csv, json and orc round-trip
  * through the same Catalyst source machinery with pushdown/pruning.
  */
class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val sample = Tables(spark, "/root/testdata/sf0.001")
    .lineitem.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private def roundTrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-$format").toFile.getAbsolutePath
    sample.write.format(format).option("header", "true")
      .mode("overwrite").save(dir)
    val back = spark.read.format(format)
      .option("header", "true").option("inferSchema", "true")
      .load(dir)
      .selectExpr("CAST(l_orderkey AS LONG) AS l_orderkey",
        "CAST(l_linenumber AS INT) AS l_linenumber",
        "CAST(l_quantity AS DOUBLE) AS l_quantity", "l_returnflag")
    val a = sample.orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toList
    val b = back.orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toList
    assert(a == b, s"$format round-trip mismatch")
  }

  test("csv source round-trips")(roundTrip("csv"))
  test("json source round-trips")(roundTrip("json"))
  test("orc source round-trips")(roundTrip("orc"))

  test("binaryFile source: raw media ingestion with pathGlobFilter + length pruning") {
    // the multimodal ingestion front door (SURVEY §2.7): raw image/audio
    // payloads enter as whole-file binary rows (path, modificationTime,
    // length, content) — the layer operators/Multimodal consumes. The
    // source supports glob selection and pushes the `length` filter so
    // oversized payloads are skipped without reading their bytes.
    val dir = Files.createTempDirectory("graft-binary").toFile
    def put(name: String, bytes: Array[Byte]): Unit =
      Files.write(new java.io.File(dir, name).toPath, bytes)
    put("a.img", Array.tabulate(64)(_.toByte))
    put("b.img", Array.tabulate(512)(i => (i % 7).toByte))
    put("skip.txt", "not media".getBytes)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img")
      .load(dir.getAbsolutePath)
      .filter(org.apache.spark.sql.functions.col("length") < 256)
    val rows = df.collect()
    assert(rows.length == 1, "glob + length filter must leave exactly a.img")
    val r = rows.head
    assert(r.getAs[String]("path").endsWith("a.img"))
    assert(r.getAs[Long]("length") == 64L)
    assert(r.getAs[Array[Byte]]("content").toSeq ==
      Array.tabulate(64)(_.toByte).toSeq)
    // the length predicate is pushed to the source (skipped before the
    // content bytes are read), not applied row-by-row after materializing
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(length"),
      s"length filter not pushed to the binaryFile scan:\n${plan.take(800)}")
  }

  test("parquet filter pushdown reaches the scan (PushedFilters)") {
    val plan = Tables(spark, "/root/testdata/sf0.001").lineitem
      .filter($"l_quantity" > 45.0).select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity,45.0)"), plan.take(2000))
  }

  test("schema evolution: mergeSchema unions columns across parquet files") {
    // a corpus that gains columns over time must stay readable as ONE
    // table: old files surface the new columns as nulls, nothing is
    // rewritten. This is the parquet schema-evolution contract an
    // append-only 100 TB corpus depends on.
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-evolve").toFile.getAbsolutePath
    import spark.implicits._
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
      .write.mode("append").parquet(dir)
    Seq((3L, "gamma", "en", 0.9)).toDF("id", "text", "lang", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toList == List("id", "lang", "quality", "text"))
    val rows = merged.orderBy("id")
      .select("id", "text", "lang", "quality").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3),
      "pre-evolution rows expose new columns as null")
    assert(rows(2).getString(2) == "en" && rows(2).getDouble(3) == 0.9)
    // and the evolved column still prunes/pushes down:
    val plan = merged.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    // assert the CONCRETE pushed predicate — 'PushedFilters' appears on
    // every FileScan even when the list is empty
    assert(plan.contains("EqualTo(lang,en)"), plan.take(1500))
  }

  test("s16 quality gate genuinely splits the fixture corpus") {
    // guard against a silent data regen making the streaming-curation
    // gate vacuous (pass == all): at minTokens = 25 some docs must fail
    // and some must pass on every fixture
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ok = graft.functions.TextFunctions.qualityOk(
      graft.functions.TextFunctions.normalized(col("text")), minTokens = 25)
    val total = docs.count()
    val pass = docs.filter(ok).count()
    assert(pass > 0 && pass < total,
      s"gate must split the corpus, got pass=$pass of $total")
  }
}
