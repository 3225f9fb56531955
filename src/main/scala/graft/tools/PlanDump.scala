package graft.tools

import graft.GraftSession
import graft.queries.{Registry, StreamingQueries}

/** Prints `explain("formatted")` for the named queries, resolving
  * s-queries to their un-executed audit-mode lineage (the batch-planned
  * pre-sink frame(s) from [[StreamingQueries.auditFrames]]) instead of
  * the memory-sink LocalTableScan the registered run returns — the
  * registered streaming run executes the stream and its returned frame
  * says nothing about the computation. Used to produce the committed
  * plan evidence under the plans/ directory.
  * Run: sbt "runMain graft.tools.PlanDump [sfDir] query [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.tail.toSeq
    val spark = GraftSession.build("graft-plandump")
    // audit frames are batch plans over streaming-shaped lineage
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    lazy val audit = StreamingQueries.auditFrames(spark, sfDir).toMap
    names.foreach { name =>
      println(s"\n=== $name ===")
      if (name.startsWith("s") && audit.contains(name)) {
        val frames = audit(name)
        frames.zipWithIndex.foreach { case (f, i) =>
          if (frames.size > 1) println(s"--- audit frame $i ---")
          f.explain("formatted")
        }
      } else Registry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
