package graft

import graft.api.Attempt
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the pure semantics kernels (SURVEY §5 plan:
  * ordering, window assignment, recovery prefix laws).
  */
object LawsCheck extends Properties("graft.laws") {

  private val attemptsGen: Gen[(List[Int], Boolean)] = for {
    vals <- Gen.listOf(Gen.chooseNum(-1000, 1000))
    hasError <- Gen.oneOf(true, false)
  } yield (vals, hasError)

  private def mk(vals: List[Int], hasError: Boolean): Seq[Attempt[Int]] = {
    val ok = vals.map(v => Attempt[Int](Some(v), None, None))
    if (hasError)
      ok :+ Attempt[Int](None, Some("boom.Err"), Some("msg")) :+
        Attempt[Int](Some(424242), None, None) // element after the error
    else ok
  }

  property("recoverPrefix = success prefix :+ one fallback, then halt") =
    forAll(attemptsGen) { case (vals, hasError) =>
      val out = Attempt.recoverPrefix(mk(vals, hasError)) {
        case ("boom.Err", _) => -1
      }
      if (hasError) out == vals :+ -1
      else out == vals
    }

  property("recoverWithPrefix = success prefix ++ fallback stream") =
    forAll(attemptsGen) { case (vals, hasError) =>
      val out = Attempt.recoverWithPrefix(mk(vals, hasError)) {
        case ("boom.Err", _) => Seq(-1, -2)
      }
      if (hasError) out == vals ++ Seq(-1, -2)
      else out == vals
    }

  property("unmatched error always throws (fail-fast)") =
    forAll(Gen.listOf(Gen.chooseNum(0, 100))) { vals =>
      val attempts = mk(vals, hasError = true)
      Prop.throws(classOf[RuntimeException]) {
        Attempt.recoverPrefix(attempts) { case ("other.Err", _) => 0 }
      }
    }

  property("tumbling window assignment: start ≤ ts < start+size, aligned") =
    forAll(Gen.chooseNum(0L, 4102444800000L), Gen.chooseNum(1L, 86400000L)) {
      (tsMs, sizeMs) =>
        // Node.scala:327: start = (ts / windowSizeMs) * windowSizeMs
        val start = (tsMs / sizeMs) * sizeMs
        start <= tsMs && tsMs < start + sizeMs && start % sizeMs == 0
    }

  property("minhash coeff family is in-range and deterministic") =
    forAll(Gen.chooseNum(1, 256)) { k =>
      val c1 = graft.functions.TextFunctions.minHashCoeffs(k)
      val c2 = graft.functions.TextFunctions.minHashCoeffs(k)
      val p = graft.functions.TextFunctions.MinHashPrime
      c1 == c2 && c1.size == k &&
        c1.forall { case (a, b) => a >= 1 && a < p && b >= 0 && b < p }
    }

  property("SpaceTokenCount == size(split(s, ' ')) on arbitrary unicode") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(3)), Gen.const(" "), Gen.const("é"),
      Gen.const("字"), Gen.const("\t"),
      Gen.const("𝒳"))).map(_.mkString)) { s =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.unsafe.types.UTF8String
      val got = graft.expressions.SpaceTokenCount(Literal(s))
        .eval(null).asInstanceOf[Int]
      got == s.split(" ", -1).length &&
        got == graft.expressions.SpaceTokenCount(Literal(s))
          .compute(UTF8String.fromString(s))
    }

  property("ByteHistogram == brute-force UTF-8 byte counts on arbitrary unicode") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(3)), Gen.const(" "), Gen.const("é"),
      Gen.const("字"), Gen.const("𝒳"))).map(_.mkString)) { s =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val h = graft.expressions.ByteHistogram(Literal(s)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val bytes = s.getBytes("UTF-8")
      val want = bytes.groupBy(b => b & 0xff).view.mapValues(_.length.toLong)
      h.numElements() == 256 &&
        (0 until 256).forall(i => h.getLong(i) == want.getOrElse(i, 0L)) &&
        (0 until 256).map(h.getLong).sum == bytes.length
    }

  property("RepetitionCounts == brute-force gram counting on arbitrary unicode") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.oneOf("a", "b", "ab", "é", "字"), Gen.const(" "))).map(_.mkString)) { s =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val row = graft.expressions.RepetitionCounts(Literal(s)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val ts = s.split(" ", -1).toVector
      val bgs = if (ts.size < 2) Vector() else ts.sliding(2).map(_.mkString(" ")).toVector
      val tgs = if (ts.size < 3) Vector() else ts.sliding(3).map(_.mkString(" ")).toVector
      val maxBg = if (bgs.isEmpty) 0 else bgs.groupBy(identity).values.map(_.size).max
      row.getInt(0) == ts.size &&
        row.getInt(1) == ts.size - ts.distinct.size &&
        row.getInt(2) == maxBg &&
        row.getInt(3) == bgs.size &&
        row.getInt(4) == tgs.size - tgs.distinct.size &&
        row.getInt(5) == tgs.size
    }

  property("int8 quantization round-trip error is within half a step") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1e6f, 1e6f))) { vs =>
      val mn = vs.min.toDouble
      val mx = vs.max.toDouble
      vs.forall { v =>
        val q = if (mx > mn)
          math.floor((v.toDouble - mn) / (mx - mn) * 255 + 0.5) else 0.0
        val deq = mn + q / 255 * (mx - mn)
        val halfStep = if (mx > mn) (mx - mn) / 255 / 2 else 0.0
        q >= 0 && q <= 255 && math.abs(deq - v.toDouble) <= halfStep + 1e-9
      }
    }

  property("simhash hamming bound: chunk blocking is pigeonhole-complete") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.listOfN(3, Gen.chooseNum(0, 63))) { (h, flips) =>
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      // hamming(h, h2) <= 3 => they agree on >= 1 of the 4 16-bit chunks
      (0 until 4).exists(c =>
        ((h >>> (c * 16)) & 0xFFFFL) == ((h2 >>> (c * 16)) & 0xFFFFL))
    }
}
