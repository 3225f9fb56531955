package graft

import scala.collection.mutable.ListBuffer
import graft.api.Flow
import org.scalatest.funsuite.AnyFunSuite

/** The reference's PracticalUseCases demos (PracticalUseCases.scala,
  * golden values from FIXTURES.md §B) replayed on this engine.
  */
case class Transaction(userId: String, amount: Int)
case class LogLine(level: String, message: String)

class PracticalUseCasesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fraud screening: risky transaction count == 2 (PracticalUseCases.scala:29-35)") {
    val txs = List(
      Transaction("u1", 25), Transaction("u2", 2000), Transaction("u3", 75),
      Transaction("u4", 4100), Transaction("u5", 130))
    val risky = Flow.fromSeq(spark, txs)
      .parMap(2)(t => if (t.amount > 1000) 1 else 0)
      .fold(0)(_ + _, _ + _)
    assert(risky == 2)
  }

  test("log monitoring: error counts per window of 3 == List(1, 2) (docs/examples.md:53)") {
    val logs = List(
      LogLine("ERROR", "a"), LogLine("INFO", "b"), LogLine("INFO", "c"),
      LogLine("ERROR", "d"), LogLine("ERROR", "e"))
    val ds = spark.createDataset(logs.zipWithIndex)
    val windows = Flow.groupedGlobal(ds, 3, Seq("_2"))
      .collect().toList
      .map(w => w.map { case (l, _) => if (l.level == "ERROR") 1 else 0 }.sum)
    assert(windows == List(1, 2))
  }

  test("audit pipeline: managed sink records every order then closes (PracticalUseCases.scala:79-86)") {
    AuditProbe.reset()
    Flow.fromDataset(spark.createDataset(List("o1", "o2", "o3")).coalesce(1))
      .map(o => s"$o:processed")
      .toManagedSink(() => new AuditProbe.Writer)((w, line) => w.write(line))
    assert(AuditProbe.lines.toArray(Array.empty[String]).toList.sorted ==
      List("o1:processed", "o2:processed", "o3:processed"))
    assert(AuditProbe.closed)
  }
}

object AuditProbe {
  val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile var closed = false
  def reset(): Unit = { lines.clear(); closed = false }
  final class Writer extends AutoCloseable {
    def write(s: String): Unit = { lines.add(s); () }
    def close(): Unit = closed = true
  }
}
