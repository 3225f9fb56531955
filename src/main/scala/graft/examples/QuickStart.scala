package graft.examples

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import graft.GraftSession
import graft.api._
import graft.streaming.EventTimeWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end tour of the engine's framework surface: the typed Flow
  * pipeline (the reference's canonical StreamingApp program), async
  * execution with cancellation, and a watermarked streaming window.
  * Run: sbt "runMain graft.examples.QuickStart"
  */
object QuickStart {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-quickstart")
    import spark.implicits._

    // 1. the reference StreamingApp slice (StreamingApp.scala:16-31)
    val sum = Flow.fromSeq(spark, (1 to 9999).toList)
      .map(_ * 2)
      .filter(_ % 2 == 0)
      .fold(0L)((acc, x) => acc + x, _ + _)
    println(s"quickstart.fold_sum=$sum (expect 99990000)")

    // 2. element-level recovery (docs/examples.md:131-143)
    val attempts = Flow.fromDataset(
      spark.createDataset(List(1, 0, 2)).coalesce(1))
      .mapAttempt(10 / _).runToList()
    val recovered = Attempt.recoverWithPrefix(attempts) {
      case (cls, _) if cls.endsWith("ArithmeticException") => Seq(99, 100)
    }
    println(s"quickstart.recover_with=$recovered (expect List(10, 99, 100))")

    // 3. async handle with cancellation outcome
    val handle = Flow.fromSeq(spark, (1 to 100).toList)
      .map(_ + 1).runToListAsync()
    val outcome = handle.await(60.seconds)
    println(s"quickstart.async=${outcome.getClass.getSimpleName}")

    // 4. watermarked event-time window over a memory stream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val q = EventTimeWindows.tumblingAgg(
      input.toDF().toDF("ts", "v"), "ts", "v", "5 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("qs_windows").start()
    input.addData((new java.sql.Timestamp(1000), 1.0),
      (new java.sql.Timestamp(3000), 2.0))
    q.processAllAvailable()
    input.addData((new java.sql.Timestamp(8000), 3.0))
    q.processAllAvailable()
    val windows = spark.table("qs_windows")
      .selectExpr("unix_timestamp(w_start) AS s", "n", "sum_value")
      .collect().toList
    println(s"quickstart.windows=$windows (expect [0,5) n=2 sum=3.0)")
    q.stop()
    spark.stop()
  }
}
