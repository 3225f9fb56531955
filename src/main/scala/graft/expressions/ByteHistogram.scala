package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 256-bin byte histogram of a string's UTF-8 encoding, as one scan-stage
  * pass per row (index i = count of byte value i). The downstream
  * diversity statistics (distinct bytes, Σc², max c) are then plain
  * declarative folds over the fixed-length array — integer-exact, so
  * cross-engine parity needs no ordered floating-point accumulation at
  * all. Reference capability anchor: per-element inspection combinators
  * (`Stream.scala:56-79` fold); the histogram is the columnar form of a
  * per-row byte fold.
  */
case class ByteHistogram(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_byte_histogram expects a string argument, got ${child.dataType.sql}")

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xff) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteHistogram", this,
      classOf[ByteHistogram].getName)
    defineCodeGen(ctx, ev, s => s"$ref.compute($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
