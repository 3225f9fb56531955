package graft.tools

import graft.{GraftSession, SparkEntry}

/** CC-family codegen-cache experiment (r16 verdict "Next round" #3):
  * CcDebt's secondary finding was that the CC loop Janino-compiles
  * ~30–135 stages on EVERY execution — per-round plans never hit the
  * codegen cache — with n58 carrying 5–7 s of concurrent JIT per run.
  * Two candidate mechanisms, separable by one experiment:
  *
  *   M1 — the sources really are distinct per round/execution (expr-id
  *        or RDD-id text leaking into the generated code): a larger
  *        cache changes nothing; the recompiles are irreducible
  *        without a cache-key normalization inside Spark.
  *   M2 — the sources repeat but `spark.sql.codegen.cache.maxEntries`
  *        (default 100, an LRU keyed on generated SOURCE TEXT) is far
  *        too small for this engine: one 285-query sweep evicts
  *        everything many times over, and even a single CC query's
  *        30–135 stage compiles thrash it. Signature: back-to-back
  *        executions of the SAME query recompile ~everything at the
  *        default size and ~nothing at a size that fits.
  *
  * For each target, times 3 back-to-back executions (Bench.retime
  * hygiene) and prints wall + Janino compile-count/compile-time deltas
  * per execution. Run once with the session default and once with
  * SPARK_GRAFT_CODEGEN_CACHE set to compare:
  *
  *   sbt "runMain graft.tools.CcCodegen /root/testdata/sf0.1 n22_dup_clusters"
  *   SPARK_GRAFT_CODEGEN_CACHE=4096 sbt "runMain graft.tools.CcCodegen ..."
  *
  * Findings land in docs/PLANS.md ("Round 17: CC codegen cache").
  */
object CcCodegen {
  private def janinoCount(): Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
  private def janinoMs(): Long = {
    val s = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getSnapshot
    // histogram of per-compile ms; count × mean ≈ total
    (s.getMean * org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount).toLong
  }
  private def jitMs(): Long =
    java.lang.management.ManagementFactory.getCompilationMXBean
      .getTotalCompilationTime

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val targets =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("n22_dup_clusters", "n58_curation_pipeline_v2")
    val spark = GraftSession.build("graft-cc-codegen")
    spark.sparkContext.setLogLevel("WARN")
    println(s"CcCodegen: spark.sql.codegen.cache.maxEntries = " +
      spark.conf.getOption("spark.sql.codegen.cache.maxEntries")
        .getOrElse("(default 100)"))
    targets.foreach { name =>
      (1 to 3).foreach { i =>
        GraftSession.dropAllBlocks(spark)
        System.gc()
        val (c0, m0, j0) = (janinoCount(), janinoMs(), jitMs())
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"CCCODEGEN $name exec$i wall=$wall%.2fs " +
          f"janino_compiles=${janinoCount() - c0} " +
          f"janino_ms~${janinoMs() - m0} jit_ms=${jitMs() - j0}")
      }
    }
    spark.stop()
  }
}
