package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Resilient reads at fleet scale. A 100 TB ingest directory will
  * eventually contain a truncated or garbage file (an executor killed
  * mid-write, a partial upload). Spark's contract: by default the read
  * FAILS LOUDLY — corruption is never silently dropped — and only an
  * explicit `spark.sql.files.ignoreCorruptFiles` (or the per-read
  * option) trades completeness for availability, skipping unreadable
  * files while returning every row of the healthy ones. Both sides of
  * that contract matter: the default protects correctness, the opt-in
  * keeps a nightly 100 TB job from dying on one bad file. These tests
  * pin both so neither regresses via session config drift.
  */
class CorruptFilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mixedDir(): (String, Long) = {
    val dir = Files.createTempDirectory("graft-corrupt").toFile.getAbsolutePath
    val good = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select("l_orderkey", "l_quantity")
    good.write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir).count()
    // a garbage file with the .parquet suffix — wrong magic, not a footer
    Files.write(Paths.get(dir, "part-corrupt.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    (dir, rows)
  }

  test("default: a corrupt file fails the read loudly") {
    val (dir, _) = mixedDir()
    assert(spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false",
      "session must keep the fail-loud default")
    val e = intercept[Exception] {
      spark.read.parquet(dir).agg(count(lit(1))).head
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(m =>
        m.contains("parquet") || m.contains("Parquet") ||
          m.contains("magic") || m.contains("footer") ||
          m.contains("FAILED_READ_FILE")),
      s"expected a corruption-shaped failure, got: ${messages(e).take(3)}")
  }

  test("opt-in ignoreCorruptFiles: healthy rows all survive, bad file skipped") {
    val (dir, goodRows) = mixedDir()
    val n = spark.read
      .option("ignoreCorruptFiles", "true")
      .parquet(dir)
      .count()
    assert(n == goodRows,
      s"expected all $goodRows healthy rows with the bad file skipped, got $n")
  }
}
