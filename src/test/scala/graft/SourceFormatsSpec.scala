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

  test("parquet filter pushdown reaches the scan (PushedFilters)") {
    val plan = Tables(spark, "/root/testdata/sf0.001").lineitem
      .filter($"l_quantity" > 45.0).select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity,45.0)"), plan.take(2000))
  }
}
