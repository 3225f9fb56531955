package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the dedup prerequisite for any corpus
  * beyond ASCII: composed ("é") and decomposed ("e" + U+0301) encodings
  * of the same text otherwise fingerprint differently and defeat exact
  * dedup. Spark has no normalization builtin; this wraps
  * `java.text.Normalizer` (ICU-equivalent for NFC) as a codegen-capable
  * expression. DuckDB's `nfc_normalize` implements the same canonical
  * composition, so results are oracle-checkable cross-engine.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects a string argument, got ${child.dataType.sql}")

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is O(n) with no allocation and
    // true for all-ASCII (the overwhelmingly common case)
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this,
      classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, s => s"$ref.compute($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
