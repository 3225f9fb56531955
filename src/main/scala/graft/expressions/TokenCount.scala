package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Size, StringSplit, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token count as one byte scan: semantically identical to
  * `size(split(text, " "))` — Java `split` with limit -1 keeps every
  * empty segment, so the array length is always (number of 0x20 bytes)
  * + 1 — without materializing the token array. A 0x20 byte never
  * occurs inside a UTF-8 multi-byte sequence (continuation bytes are
  * ≥ 0x80), so the byte scan is exact on any input.
  */
case class SpaceTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_token_count expects a string argument, got ${child.dataType.sql}")

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCount", this,
      classOf[SpaceTokenCount].getName)
    defineCodeGen(ctx, ev, s => s"$ref.compute($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: `size(split(text, " ", -1))` → [[SpaceTokenCount]].
  * The pattern appears throughout the corpus queries (token counting,
  * quality gates, packing); when column pruning leaves only the size,
  * this removes the per-row token-array allocation entirely. Applies
  * only under three-valued `size(NULL) = NULL` semantics
  * (legacySizeOfNull = false) — the legacy -1 convention would change
  * the null contract.
  */
object RewriteSizeOfSplit extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(StringSplit(str, Literal(sep, StringType), Literal(-1, IntegerType)), false)
          if sep != null && sep.toString == " " && s.child.deterministic =>
        SpaceTokenCount(str)
    }
}
