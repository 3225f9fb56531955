package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Repeat-bench for single queries: runs each named query `reps` times
  * in one JVM (after one warmup) and prints min/median — min is the
  * contention-robust statistic on a noisy host, median shows spread.
  * Run: sbt "runMain graft.tools.BenchOne <sfDir> <reps> <query> [query ...]"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: BenchOne <sfDir> <reps> <query> [query ...]")
    val spark = GraftSession.build("graft-bench-one")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = Registry.queries(name)
      def once(): Double = {
        // COLD=1 reproduces the Bench main's measurement (cache cleared
        // before each run, so persisted diamond intermediates recompute;
        // RDD-layer checkpoint blocks reaped too, same as Bench)
        if (sys.env.get("SPARK_GRAFT_COLD").contains("1"))
          GraftSession.dropAllBlocks(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val times = Seq.fill(reps)(once()).sorted
      println(f"$name%-28s min=${times.head}%.3f median=${times(times.size / 2)}%.3f reps=$reps")
    }
    spark.stop()
  }
}
