package graft.tools

import graft.GraftSession
import graft.queries.StreamingQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Micro-batch floor decomposition for the heaviest single-stream
  * monitors (r17 verdict task 7: s44 / s08): times the pre-stream
  * frame construction (any offline training / source listing), the
  * streaming execution itself (AvailableNow → memory sink — the
  * candidate "floor"), and the batch-side report over the sink, so
  * "machinery dominates" vs "payload dominates" is a printed receipt
  * instead of an assertion. These queries stream ONE file in ONE batch
  * — there is no staging batch to merge (the staged-slice queries
  * s20/s22/s25/s31 are the stageSlices sites); what remains is query
  * start/stop, state-store setup, and the payload itself.
  * Run: sbt "runMain graft.tools.StreamFloorProfile [sfDir] [reps]"
  */
object StreamFloorProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val s = GraftSession.build("graft-stream-floor")
    s.sparkContext.setLogLevel("WARN")
    val counter = new java.util.concurrent.atomic.AtomicLong()
    def timed[T](rep: Int, label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FLOOR r$rep $label%-14s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def runToTable(df: org.apache.spark.sql.DataFrame, mode: String)
        : org.apache.spark.sql.DataFrame = {
      val name = s"graft_floor_${counter.incrementAndGet()}"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        math.min(8, prev.toInt).toString)
      try {
        val q = df.writeStream.outputMode(mode)
          .format("memory").queryName(name)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(name)
    }
    (1 to reps).foreach { rep =>
      // ---- s44: update-mode reward agg + batch-side pass@k report
      val f44 = timed(rep, "s44.frames")(StreamingQueries.Frames.s44(s, dir))
      val sink44 = timed(rep, "s44.stream")(runToTable(f44, "update"))
      timed(rep, "s44.report") {
        val scores = sink44.select("doc_id", "score")
        val P = graft.operators.Preference
        P.passAtKFromScores(scores, P.medianThreshold(scores),
            groupSize = 8, ks = Seq(1, 2, 4))
          .orderBy("group_id")
          .write.format("noop").mode("overwrite").save()
      }
      // ---- s08: stateful stream-stream outer join, sink is the result
      val f08 = timed(rep, "s08.frames")(StreamingQueries.Frames.s08(s, dir))
      val sink08 = timed(rep, "s08.stream")(runToTable(f08, "append"))
      timed(rep, "s08.report") {
        sink08.orderBy("view_id", "purchase_id")
          .write.format("noop").mode("overwrite").save()
      }
      GraftSession.dropAllBlocks(s)
      System.gc()
    }
    s.stop()
  }
}
