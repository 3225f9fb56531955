package graft.tools

import graft.{Bench, GraftSession, SparkEntry}

/** Streaming-tail creep experiment (r14 verdict "What's missing" #2):
  * s21/s27 grew 11.8→15.5 s / 10.2→11.7 s across five same-code
  * committed sweeps while the registry grew 249→268 — sub-ceiling,
  * unattributed. This tool isolates POSITION-IN-SWEEP debt from plan
  * cost: it times the target queries in a fresh JVM, replays the first
  * `prefixN` sweep-order queries with exactly Bench.run's per-query
  * hygiene (noop sink, dropAllBlocks, System.gc), re-times the targets,
  * and prints the JVM-debt fingerprint at each phase — used heap after
  * full GC, cumulative GC ms, loaded classes, metaspace bytes, and the
  * count of `graft_stream_*` memory-sink tables still registered (each
  * holds its result rows on the driver for the life of the session).
  *
  * Run: sbt "runMain graft.tools.TailDebt [sfDir] [prefixN] [target ...]"
  * Findings land in docs/PLANS.md ("Round 15: streaming-tail creep").
  */
object TailDebt {
  private def gcTotalMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixN = args.drop(1).headOption.map(_.toInt).getOrElse(220)
    val targets =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("s21_stream_quality_gate", "s27_stream_reward_gate")
    val spark = GraftSession.build("graft-tail-debt")
    spark.sparkContext.setLogLevel("WARN")
    def fingerprint(label: String): Unit = {
      // memory-sink tables are counted BEFORE dropAllBlocks: the r15
      // hygiene fix makes dropAllBlocks reap graft_stream_* views, so
      // counting after it would always print 0 and the instrument
      // would no longer see the accumulation it was built to measure
      val memTables = spark.catalog.listTables().collect()
        .count(_.name.startsWith("graft_stream_"))
      GraftSession.dropAllBlocks(spark)
      System.gc()
      import scala.jdk.CollectionConverters._
      import java.lang.management.ManagementFactory
      val heapGb = ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / 1e9
      val meta = ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.contains("Metaspace"))
        .map(_.getUsage.getUsed).sum / 1e6
      val classes =
        ManagementFactory.getClassLoadingMXBean.getLoadedClassCount
      println(f"TailDebt[$label]: heap=${heapGb}%.2fGB gc=${gcTotalMs()}ms " +
        f"classes=$classes metaspace=${meta}%.0fMB memSinkTables=$memTables")
    }
    def timeTargets(label: String): Map[String, Double] =
      targets.map { n =>
        val best = (1 to 3).map(_ => Bench.retime(spark, sfDir, n)._1).min
        println(f"TailDebt[$label]: $n min-of-3 ${best}%.2fs")
        n -> best
      }.toMap

    // warmup (JIT/codegen) on the smallest SF, as Bench.run does
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    GraftSession.dropAllBlocks(spark)
    System.gc()
    fingerprint("post-warmup")
    val fresh = timeTargets("fresh")
    fingerprint("post-fresh-times")

    val prefix = Bench.sweepOrder(SparkEntry.queries.keySet.toSeq)
      .filterNot(targets.contains(_)).take(prefixN)
    println(s"TailDebt: replaying ${prefix.size}-query prefix at $sfDir " +
      "with Bench.run hygiene")
    prefix.foreach { n =>
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        GraftSession.dropAllBlocks(spark)
        System.gc()
      } catch { case _: Throwable =>
        try GraftSession.dropAllBlocks(spark)
        catch { case _: Throwable => () }
      }
    }
    fingerprint("post-prefix")
    val loaded = timeTargets("after-prefix")
    fingerprint("final")
    targets.foreach { n =>
      println(f"TailDebt RESULT $n: fresh ${fresh(n)}%.2fs -> " +
        f"after-prefix ${loaded(n)}%.2fs (${loaded(n) / fresh(n)}%.2fx)")
    }
    spark.stop()
  }
}
