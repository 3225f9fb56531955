package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Queries are materialized through the `noop` sink so the full plan
  * (projections included) executes — `.count()` would let Catalyst prune
  * the very work being measured.
  */
object Bench {
  /** Warmed, cache-isolated timing pass over every registered query:
    * (name, seconds, error). Shared with [[graft.tools.BenchGuard]] so
    * the regression gate times exactly what the driver times.
    */
  def run(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[(String, Double, Option[String])] = {
    // JVM/codegen warmup on the smallest SF so per-query times measure
    // the engine, not first-use JIT (one full pass, results discarded).
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // A failing query records -1 (never a small positive time) and lands
    // in the errors map — failures must be visible in the JSON, not
    // silently folded into 'total'.
    def dropAllBlocks(): Unit = GraftSession.dropAllBlocks(spark)
    // warm-up left caches behind: start the timed section clean
    dropAllBlocks()
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        // operators persist their diamond intermediates (bigram tables,
        // shingle indexes); queries never unpersist — over 100+ queries
        // the stale blocks pile into executor memory and the GC/spill
        // pressure lands on whichever query runs later (the r3 q01
        // outlier). Dropping caches between queries keeps each
        // measurement independent; the clear happens OUTSIDE the timed
        // window because it is harness hygiene, not query work. The
        // explicit gc drains the garbage the previous query left behind
        // (dropped cache blocks, broadcasts, codegen classes) so its
        // collection cost is not billed to the NEXT query — standalone
        // 0.9s queries were recording 7s purely from inherited heap debt.
        dropAllBlocks()
        System.gc()
        (name, t, None: Option[String])
      } catch {
        case e: Throwable =>
          // best-effort: a clearCache failure after a query failure must
          // not abort the run and lose every recorded timing
          try dropAllBlocks() catch { case _: Throwable => () }
          (name, -1.0, Some(s"${e.getClass.getSimpleName}: ${
            String.valueOf(e.getMessage).take(80)}"))
      }
    }
  }

  /** One isolated re-measurement of a single query (clean caches, gc'd
    * heap) — [[graft.tools.BenchGuard]]'s noise-confirm pass. Mirrors
    * the timed section of [[run]] exactly.
    */
  def retime(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, name: String): Double = {
    GraftSession.dropAllBlocks(spark)
    System.gc()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val t = (System.nanoTime() - t0) / 1e9
    GraftSession.dropAllBlocks(spark)
    t
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // GraftSession.build = the engine's real configuration, including its
    // optimizer rules (RewriteSizeOfSplit). A hand-rolled session here
    // would benchmark a different engine than Verify checks.
    val spark = GraftSession.build("graft-bench")
    val results = run(spark, sfDir)
    val line = jsonLine(results, sfDir)
    println(line)
    writeArtifact(line)
    spark.stop()
  }

  /** Also persist the full one-line JSON to a file: driver log captures
    * keep only the final ~2 kB of stdout, which clips the per-query map
    * once the registry passes ~100 queries (BENCH_r05.json lost every
    * c, n, and q01–q08 timing). The committed file is the durable
    * per-query record.
    */
  def writeArtifact(line: String, path: String = "bench_last.json"): Unit =
    try java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      println(s"Bench: could not write $path: ${e.getMessage}")
    }

  /** The one-line bench JSON (shared with BenchGuard, whose timing runs
    * would otherwise discard the very numbers that justify its verdict).
    */
  def jsonLine(results: Seq[(String, Double, Option[String])],
      sfDir: String): String = {
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // full JSON string escape — AnalysisException messages are often
    // multiline within the first 80 chars; a raw control char would make
    // the whole benchmark line unparseable exactly when a query fails
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + esc(k) + "\":\"" + esc(m) + "\""
    }.mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    // environment fields make warm-vs-cold harness deltas explainable
    // from the artifact alone (round 4 carried a README band 25% under
    // the driver-observed total with nothing in either to reconcile them)
    val rt = Runtime.getRuntime
    val env = s""""cpus":${rt.availableProcessors()},""" +
      s""""max_heap_gb":${fmt(rt.maxMemory() / 1e9)},""" +
      s""""java":"${esc(System.getProperty("java.version"))}","""
    // "value" (the headline total) goes LAST: log captures that keep only
    // the final ~2k chars of output still contain it after the per-query
    // map outgrows that window (which it did once the registry passed ~100
    // queries).
    s"""{"metric":"total","unit":"sec","sf":"$sfDir",$env"queries":$qs,"errors":$errs,"value":${fmt(total)}}"""
  }
}
