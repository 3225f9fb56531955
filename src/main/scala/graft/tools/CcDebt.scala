package graft.tools

import graft.{Bench, GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dedup-CC first-pass flap experiment (r15 verdict "Next round" #1):
  * every committed sweep retimes the SAME four connected-components
  * queries — n22 (10.3 → 2.9 s), n57 (10.7 → 5.4), n58 (19.4 → 10.1),
  * n144 (10.4 → 4.8) — first pass ~2–3.5× the isolated retry, ~25 s of
  * rescue cost per sweep, with tiny first-pass GC (99–329 ms), so the
  * gap is NOT heap debt. TailDebt pinned the streaming tail as
  * environmental; this is the batch twin, built to separate the two
  * live hypotheses the artifact alone cannot:
  *
  *   H1 — per-JVM FIRST-sf0.1-EXECUTION cost (Janino codegen compile +
  *        C2 JIT of plan shapes the sf0.001 warmup never produces —
  *        AQE picks different strategies at 100× the data, and the CC
  *        loop multiplies stages by its round count). Signature: the
  *        very first sf0.1 execution is slow in a fresh JVM with NO
  *        sweep prefix at all, and the JIT/Janino channels spike on
  *        exactly that execution.
  *   H2 — POSITIONAL debt from the preceding sweep (persist-pool
  *        pressure, block-manager fragmentation, ContextCleaner
  *        backlog). Signature: the first execution is fast with no
  *        prefix and slow after replaying the sweep prefix.
  *
  * For each target it times 3 back-to-back executions with exactly
  * Bench.retime's hygiene and prints EVERY channel per execution
  * (TailDebt's min-of-3 hid the first reading — the one under test):
  * wall, GC delta, HotSpot JIT-compile-time delta, Janino
  * compilation-count delta, and the listener-summed executor
  * run/CPU/GC task time (a wall gap with flat executor CPU = driver or
  * compile stall; doubled executor run time = executor-side work/IO).
  *
  * Run: sbt "runMain graft.tools.CcDebt [sfDir] [prefixN] [target ...]"
  *   prefixN = 0  → fresh mode (H1 test)
  *   prefixN = 63 → replay the 63-query sweep prefix before n22 (H2)
  * Findings land in docs/PLANS.md ("Round 16: dedup-CC first-pass").
  */
object CcDebt {
  private def gcTotalMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }
  private def jitTotalMs(): Long =
    try java.lang.management.ManagementFactory.getCompilationMXBean
      .getTotalCompilationTime
    catch { case _: Throwable => -1L }
  private def janinoCount(): Long =
    try org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    catch { case _: Throwable => -1L }

  /** JIT code-cache occupancy (used/committed/max MB per CodeHeap
    * pool) — the deep-tail hypothesis channel: 280 queries of
    * generated classes can fill the default 240 MB ReservedCodeCache,
    * and HotSpot then EVICTS compiled methods (flushing), so a
    * late-sweep query's first pass re-runs interpreted while re-JITing
    * — slow wall, doubled task CPU, tiny heap GC: exactly the CC
    * family's flap fingerprint.
    */
  private def codeHeaps(): String = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map { p =>
        val u = p.getUsage
        f"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=" +
          f"${u.getUsed / 1e6}%.0f/${u.getMax / 1e6}%.0fMB"
      }.mkString(" ")
  }

  /** Task-metric sums since construction, from stage-completed events
    * (driver-local listener; local[32] shares the JVM but the split
    * between executorRunTime and executorCpuTime still separates
    * blocked-vs-computing inside task threads).
    */
  private final class TaskChannel extends SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong()
    val cpuMs = new java.util.concurrent.atomic.AtomicLong()
    val gcMs = new java.util.concurrent.atomic.AtomicLong()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        cpuMs.addAndGet(m.executorCpuTime / 1000000L)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def snap(): (Long, Long, Long) = (runMs.get(), cpuMs.get(), gcMs.get())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixN = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val targets =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("n22_dup_clusters", "n57_dedup_keep_best",
        "n58_curation_pipeline_v2", "n144_dup_size_histogram")
    val spark = GraftSession.build("graft-cc-debt")
    spark.sparkContext.setLogLevel("WARN")
    val chan = new TaskChannel
    spark.sparkContext.addSparkListener(chan)

    // warmup (JIT/codegen) on the smallest SF, exactly as Bench.run does
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    GraftSession.dropAllBlocks(spark)
    System.gc()
    println(s"CcDebt: warmup done (sf0.001, full registry); mode = " +
      (if (prefixN == 0) "FRESH (no prefix)" else s"PREFIX($prefixN)"))

    if (prefixN > 0) {
      val prefix = Bench.sweepOrder(SparkEntry.queries.keySet.toSeq)
        .filterNot(targets.contains(_)).take(prefixN)
      println(s"CcDebt: replaying ${prefix.size}-query prefix at $sfDir " +
        "with Bench.run hygiene")
      prefix.foreach { n =>
        try {
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          GraftSession.dropAllBlocks(spark)
          System.gc()
        } catch { case e: Throwable =>
          println(s"CcDebt: prefix $n failed: ${e.getClass.getSimpleName}")
          try GraftSession.dropAllBlocks(spark) catch { case _: Throwable => () }
        }
      }
      println(s"CcDebt: prefix replayed | ${codeHeaps()}")
    }

    targets.foreach { name =>
      (1 to 3).foreach { i =>
        GraftSession.dropAllBlocks(spark)
        System.gc()
        val g0 = gcTotalMs(); val j0 = jitTotalMs(); val c0 = janinoCount()
        val (r0, u0, tg0) = chan.snap()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val (r1, u1, tg1) = chan.snap()
        println(f"CcDebt[$name#$i]: wall=${wall}%.2fs " +
          f"gc=${gcTotalMs() - g0}ms jit=${jitTotalMs() - j0}ms " +
          f"janino=${janinoCount() - c0} compiles " +
          f"taskRun=${r1 - r0}ms taskCpu=${u1 - u0}ms taskGc=${tg1 - tg0}ms " +
          s"| ${codeHeaps()}")
        GraftSession.dropAllBlocks(spark)
      }
    }
    spark.stop()
  }
}
