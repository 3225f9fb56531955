package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck bit-equality laws for the portable signature
  * expressions: each native per-row pass must equal a direct Scala
  * replay of the exploded formulation its docstring claims — the
  * unit-level twin of the n63/n119 end-to-end oracles, matching the
  * TokenMarginSpec / DsirGramScoreCheck convention. Text generators
  * bias toward the adversarial shapes: consecutive separators (empty
  * tokens), leading/trailing spaces, empty text, sub-n token counts
  * (the null gate), multi-byte UTF-8 (0x20 never occurs inside a
  * UTF-8 continuation, so the byte split and the string split agree).
  */
object PortableSignatureCheck extends Properties("graft.portable.signatures") {

  private def md5(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(b)

  private val wordGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "", "x", "émigré", "データ")

  private val textGen: Gen[String] = for {
    nWords <- Gen.chooseNum(0, 10)
    ws <- Gen.listOfN(nWords, wordGen)
    doubled <- Gen.prob(0.3)
  } yield ws.mkString(if (doubled) "  " else " ")

  // --- SimHash ---------------------------------------------------------

  private def refSimHash(text: String): Seq[Int] = {
    val votes = new Array[Int](64)
    text.split(" ", -1).foreach { t =>
      val d = md5(t.getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        if (((d(b / 8) >> (7 - b % 8)) & 1) == 1) votes(b) += 1
        else votes(b) -= 1
        b += 1
      }
    }
    votes.map(v => if (v > 0) 1 else 0).toSeq
  }

  property("PortableSimHashBits == per-token md5 vote replay") =
    forAll(textGen) { text =>
      val got = graft.expressions.PortableSimHashBits(Literal(text))
        .compute(UTF8String.fromString(text))
        .asInstanceOf[ArrayData].toIntArray().toSeq
      got == refSimHash(text)
    }

  // --- MinHash ---------------------------------------------------------

  private def refMinHash(
      text: String, n: Int, numHashes: Int): Option[Seq[String]] = {
    val ts = text.split(" ", -1)
    if (ts.length < n) return None
    val shingles = (0 to ts.length - n).map(i => ts.slice(i, i + n).mkString(" "))
    Some((0 until numHashes).map { h =>
      shingles.map { s =>
        md5((s"$h|" + s).getBytes("UTF-8"))
          .map(b => f"${b & 0xFF}%02x").mkString.substring(0, 15)
      }.min
    })
  }

  property("PortableMinHashSig == exploded md5-hex-prefix min replay") =
    forAll(textGen, Gen.chooseNum(1, 4), Gen.oneOf(4, 16)) {
      (text, n, numHashes) =>
        val raw = graft.expressions.PortableMinHashSig(Literal(text), n, numHashes)
          .compute(UTF8String.fromString(text))
        val got = Option(raw).map(_.asInstanceOf[ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq)
        got == refMinHash(text, n, numHashes)
    }

  property("sub-n token counts yield null, >= n yield a full signature") =
    forAll(Gen.chooseNum(0, 6), Gen.chooseNum(1, 4)) { (nWords, n) =>
      val text = Seq.fill(nWords)("w").mkString(" ")
      val raw = graft.expressions.PortableMinHashSig(Literal(text), n, 8)
        .compute(UTF8String.fromString(text))
      // "" splits to one empty token, so nWords = 0 still has 1 token
      val tokens = math.max(nWords, 1)
      if (tokens < n) raw == null
      else raw != null && raw.asInstanceOf[ArrayData].numElements() == 8
    }
}
