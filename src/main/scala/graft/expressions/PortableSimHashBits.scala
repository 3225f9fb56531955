package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable SimHash signature (n63) as ONE native per-row
  * pass: 64 0/1 ints, bit i set iff the ±1 vote sum over the
  * document's tokens is positive. The exploded formulation fanned
  * every token out ×64 bit rows (tokens × 64 through a (doc, bit)
  * hash aggregation, with an md5 HEX STRING and an ascii-CASE digit
  * parse per row); this expression walks the token bytes once per
  * document row and votes in a 64-int buffer.
  *
  * Bit-exactness contract (the n63 oracle replays the exploded
  * arithmetic in DuckDB):
  *   - input is the NORMALIZED text; tokens split on 0x20 keeping
  *     empty segments — identical to `explode(split(text, " "))`
  *     ([[TokenBucketMargin]]'s argument);
  *   - bit b of a token = bit (3 − b%4) of md5 hex digit ⌊b/4⌋, which
  *     is exactly bit (7 − b%8) of md5 BYTE ⌊b/8⌋ — the first 8 md5
  *     bytes MSB-first;
  *   - a signature bit is 1 iff its integer vote sum is > 0 (ties and
  *     negatives → 0), matching `CASE WHEN s > 0 THEN 1 ELSE 0 END`
  *     over the aggregated votes. Vote sums are exact integers, so the
  *     collapse is order-free.
  *
  * Null text yields SQL null (the explode path produced no rows for a
  * null doc; callers filter).
  */
case class PortableSimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_bits expects a string argument, got ${child.dataType.sql}")

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    val md = PortableSimHashBits.md5.get()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var k = 0
        while (k < 8) {
          val v = d(k)
          var j = 0
          while (j < 8) {
            if (((v >> (7 - j)) & 1) == 1) votes(k * 8 + j) += 1
            else votes(k * 8 + j) -= 1
            j += 1
          }
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](64)
    var b = 0
    while (b < 64) {
      out(b) = if (votes(b) > 0) 1 else 0
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("portableSimHash", this,
      classOf[PortableSimHashBits].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): PortableSimHashBits =
    copy(child = c)
}

object PortableSimHashBits {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
