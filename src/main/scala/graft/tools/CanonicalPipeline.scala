package graft.tools

import graft.GraftSession
import graft.api.Flow

/** The reference's performance-baseline pipeline
  * (PerformanceBaselineReport.scala:5-36: fromList → parMap ×2 →
  * asyncBoundary → fold-sum, defaults 20000 elements / parallelism 4)
  * on this engine, printing the same machine-readable key=value lines
  * for a direct BASELINE.md comparison. The asyncBoundary maps to
  * Spark's stage boundary introduced by the repartition in parMap.
  *
  * Run: sbt "runMain graft.tools.CanonicalPipeline [elementCount] [parallelism]"
  */
object CanonicalPipeline {
  def main(args: Array[String]): Unit = {
    val elementCount = args.headOption.map(_.toInt).getOrElse(20000)
    val parallelism = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.build("graft-canonical")
    import spark.implicits._

    // warmup (JIT + codegen), then measure
    def run(): Long = Flow.fromDataset(
      spark.range(1, elementCount + 1).as[Long])
      .parMap(parallelism)(_ * 2)
      .filter(_ % 2 == 0)
      .fold(0L)(_ + _, _ + _)
    run()
    val t0 = System.nanoTime()
    val sum = run()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    val expected = elementCount.toLong * (elementCount + 1L)
    require(sum == expected, s"checksum: got $sum want $expected")
    println(f"elements=$elementCount")
    println(f"parallelism=$parallelism")
    println(f"elapsed_ms=${elapsedMs}%.1f")
    println(f"throughput_per_sec=${elementCount / (elapsedMs / 1000.0)}%.0f")
    spark.stop()
  }
}
