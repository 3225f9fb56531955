package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning: hive-style partitioned layout + a partition-key
  * predicate must prune at planning time (`PartitionFilters`), reading
  * only the matching directories — the other half of scan efficiency
  * next to PushedFilters (SourceFormatsSpec).
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("year-partitioned writes prune to the selected partition") {
    val dir = Files.createTempDirectory("graft-part").toFile.getAbsolutePath
    val t = Tables(spark, "/root/testdata/sf0.001")
    val withYear = t.orders.withColumn("y", year(col("o_orderdate")))
    withYear.write.partitionBy("y").mode("overwrite").parquet(dir)
    val years = withYear.select("y").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(years.length > 1, "need multiple partitions for the test to mean anything")
    val target = years.head

    val pruned = spark.read.parquet(dir).filter(col("y") === target)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      s"\\(y#\\d+ = $target\\)".r.findFirstIn(plan).isDefined,
      s"partition filter must prune at the scan:\n${plan.take(1500)}")
    val want = withYear.filter(col("y") === target).count()
    assert(pruned.count() == want)
  }
}
