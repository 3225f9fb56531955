package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for [[graft.expressions.DsirGramScore]]: the native
  * per-row score must equal a direct replay of the exploded
  * formulation — `split(text, " ", -1)` unigrams plus adjacent
  * bigrams, each occurrence contributing its BIGINT imp_ppm, unseen
  * grams 0 — on adversarial text: consecutive spaces (empty tokens),
  * leading/trailing spaces (kept by limit -1), empty text (the single
  * "" gram), single-token text (no bigrams), and multi-byte UTF-8.
  */
object DsirGramScoreCheck extends Properties("graft.dsir.gramscore") {

  private val wordGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "", "x", "émigré", "データ", "a b".trim)

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, wordGen)
    doubled <- Gen.prob(0.3) // consecutive separators → empty tokens
  } yield ws.mkString(if (doubled) "  " else " ")

  private val impGen: Gen[Map[String, Long]] = for {
    uni <- Gen.someOf(Seq("alpha", "beta", "gamma", "x", "émigré",
      "データ", ""))
    bi <- Gen.someOf(Seq("alpha beta", "beta gamma", "x x", " alpha",
      "alpha ", " ", "émigré データ"))
    vs <- Gen.listOfN(uni.size + bi.size, Gen.chooseNum(-1000000L, 1000000L))
  } yield (uni ++ bi).zip(vs).toMap

  private def reference(text: String, imp: Map[String, Long]): Long = {
    val ts = text.split(" ", -1)
    val unis = ts.iterator.map(t => imp.getOrElse(t, 0L)).sum
    val bis = ts.iterator.sliding(2).withPartial(false)
      .map(p => imp.getOrElse(p.mkString(" "), 0L)).sum
    unis + bis
  }

  property("compute == exploded-formulation replay") =
    forAll(textGen, impGen) { (text, imp) =>
      val e = graft.expressions.DsirGramScore(
        org.apache.spark.sql.catalyst.expressions.Literal(text), imp)
      e.compute(UTF8String.fromString(text)) == reference(text, imp)
    }

  property("empty text scores the single \"\" gram") =
    forAll(impGen) { imp =>
      val e = graft.expressions.DsirGramScore(
        org.apache.spark.sql.catalyst.expressions.Literal(""), imp)
      e.compute(UTF8String.fromString("")) == imp.getOrElse("", 0L)
    }
}
