package graft

import graft.api.{Attempt, Flow}
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator semantic tests mirroring the reference's suite
  * (SimpleStreamProcessorTest.scala) — golden values from the reference
  * docs/tests, re-verified against this engine.
  */
class FlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("StreamingApp slice: 1..9999 map *2 filter even fold-sum == 99990000") {
    // StreamingApp.scala:16-31
    val result = Flow.fromSeq(spark, (1 to 9999).toList)
      .map(_ * 2)
      .filter(_ % 2 == 0)
      .fold(0L)((acc, x) => acc + x, _ + _)
    assert(result == 99990000L)
  }

  test("map/filter pipeline preserves values (test :22-28)") {
    val out = Flow.fromSeq(spark, List(1, 2, 3, 4, 5))
      .map(_ * 10)
      .filter(_ > 20)
      .runToList()
      .sorted
    assert(out == List(30, 40, 50))
  }

  test("flatMap expands and drops empties (test :37-43)") {
    val out = Flow.fromSeq(spark, List(1, 2, 3))
      .flatMap(i => if (i == 2) Nil else List(i, i * 100))
      .runToList()
      .sorted
    assert(out == List(1, 3, 100, 300))
  }

  test("append keeps operand ordering via tag (Stream.scala:49-54)") {
    val a = Flow.fromSeq(spark, List(1, 2)).map(v => ("a", v))
    val b = Flow.fromSeq(spark, List(3, 4)).map(v => ("b", v))
    val out = a.append(b).runToList().sorted
    assert(out == List(("a", 1), ("a", 2), ("b", 3), ("b", 4)))
  }

  test("fold requires associative combine; sums match sequential") {
    val xs = (1 to 1000).toList
    val dist = Flow.fromSeq(spark, xs).fold(0L)((b, a) => b + a, _ + _)
    assert(dist == xs.map(_.toLong).sum)
  }

  test("foldOrdered is strict left-to-right (Stream.scala:56-68)") {
    // order-sensitive fold: string concat over a single sorted partition
    val out = Flow.fromDataset(
      spark.createDataset(List(1, 2, 3, 4)).coalesce(1))
      .foldOrdered("")((b, a) => b + a)
    assert(out == "1234")
  }

  test("groupedGlobal: 1..7 size 3 -> [[1,2,3],[4,5,6],[7]] (test :268-275)") {
    val ds = spark.createDataset((1 to 7).map(i => i))
    val out = Flow.groupedGlobal(ds, 3, Seq("value")).collect().toList
    assert(out == List(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7)))
  }

  test("grouped (per-partition) emits full and final partial windows") {
    val out = Flow.fromDataset(spark.createDataset(1 to 10).repartition(2))
      .grouped(4).runToList()
    assert(out.map(_.size).count(_ == 4) >= 1)
    assert(out.flatten.sorted == (1 to 10).toList)
  }

  test("grouped/parMap fail fast on non-positive arg (Stream.scala:104,231)") {
    val f = Flow.fromSeq(spark, List(1))
    intercept[IllegalArgumentException](f.grouped(0))
    intercept[IllegalArgumentException](f.parMap(0)(identity[Int]))
  }

  test("parMap preserves multiset and runs at requested width") {
    val out = Flow.fromSeq(spark, (1 to 100).toList)
      .parMap(4)(_ * 2).runToList().sorted
    assert(out == (1 to 100).map(_ * 2).toList)
  }

  test("parMapOrdered restores input order under skewed latency (test :82-94)") {
    val rng = new scala.util.Random(3)
    val delays = (1 to 60).map(i => i -> rng.nextInt(8)).toMap
    val out = Flow.fromSeq(spark, (1 to 60).toList)
      .parMapOrdered(4) { i => Thread.sleep(delays(i)); i * 10 }
      .runToList()
    assert(out == (1 to 60).map(_ * 10).toList,
      "output order must equal input order despite skewed task latency")
  }

  test("recover: prefix then one fallback then halt (docs/examples.md:131-137)") {
    // List(1, 0, 2).map(10 / _) recovers to List(10, 99)
    val attempts = Flow.fromDataset(
      spark.createDataset(List(1, 0, 2)).coalesce(1))
      .mapAttempt(10 / _)
      .runToList()
    val out = Attempt.recoverPrefix(attempts) {
      case (cls, _) if cls == classOf[ArithmeticException].getName => 99
    }
    assert(out == List(10, 99))
  }

  test("recoverWith: prefix ++ fallback stream (docs/examples.md:138-143)") {
    val attempts = Flow.fromDataset(
      spark.createDataset(List(1, 0, 2)).coalesce(1))
      .mapAttempt(10 / _)
      .runToList()
    val out = Attempt.recoverWithPrefix(attempts) {
      case (cls, _) if cls == classOf[ArithmeticException].getName =>
        Seq(99, 100)
    }
    assert(out == List(10, 99, 100))
  }

  test("unmatched error rethrows (fail-fast, ADR-0003)") {
    val attempts = Flow.fromDataset(
      spark.createDataset(List(1, 0)).coalesce(1))
      .mapAttempt(10 / _).runToList()
    intercept[RuntimeException] {
      Attempt.recoverPrefix(attempts) { case ("nope", _) => -1 }
    }
  }

  test("zipWithOrdinal pins global order") {
    val out = Flow.fromSeq(spark, List("a", "b", "c", "d"))
      .zipWithOrdinal.runToList().sortBy(_._2).map(_._1)
    assert(out == List("a", "b", "c", "d"))
  }

  test("iterator pulls lazily in order") {
    val it = Flow.fromDataset(
      spark.createDataset(List(5, 6, 7)).coalesce(1)).iterator()
    assert(it.next() == 5)
    assert(it.toList == List(6, 7))
  }
}
