package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The trained-model scoring margin Σ_tokens w_b(t) / n as ONE native
  * per-row expression — the streaming token-scoring hot path
  * (s21/s27/s44 and the batch reward cards) previously paid, per
  * micro-batch: a second tokenize for the count, an explode to one row
  * PER TOKEN, an md5 HEX STRING per token, a 2-digit hex parse as a
  * nested CASE tree, and a per-doc hash aggregation. This expression
  * does the same arithmetic in one tight byte-level pass per document
  * row (the HashExpressions precedent — round 5's ~2× whole-bench win
  * on the sketch family), eliminating the row inflation and the
  * aggregation entirely.
  *
  * Bit-exactness contract (the engine's cross-engine hash gate):
  *   - input is the NORMALIZED text (callers compose
  *     `TextFunctions.normalized` outside, exactly as `tokenBuckets`
  *     did); tokens are byte-split on 0x20 keeping empty segments —
  *     identical to `split(text, " ")` with Java limit -1 (the
  *     SpaceTokenCount argument: 0x20 never occurs inside a UTF-8
  *     multi-byte sequence), and n = spaces + 1 matches
  *     `size(split(...))`;
  *   - the feature bucket is md5's first byte split into nibbles,
  *     b = (hi % 4) * 16 + lo — exactly `bucketExpr`'s parse of the
  *     first two hex chars;
  *   - each per-token term w_b / n is one IEEE double division, then
  *     cast to DECIMAL(38,12) exactly as Spark's double→decimal Cast:
  *     shortest decimal representation (`Double.toString`) rounded
  *     HALF_UP at scale 12; the sum is exact decimal addition (order-
  *     free — equal terms collapse to one multiply by their count),
  *     and the final value is the decimal's `doubleValue`, matching
  *     `xsum`'s closing cast. Same token multiset → same double, so
  *     every DuckDB oracle over the old formulation stays green.
  *
  * Null text yields SQL null (callers filter, preserving the old
  * explode semantics where a null-text doc produced no score row).
  */
case class TokenBucketMargin(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  require(weights.size == 64,
    s"TokenBucketMargin expects the 64-bucket model, got ${weights.size}")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_token_margin expects a string argument, got ${child.dataType.sql}")

  @transient private lazy val wArr: Array[Double] = weights.toArray

  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) n += 1
      i += 1
    }
    val nD = n.toDouble
    val counts = new Array[Int](64)
    val md = TokenBucketMargin.md5.get()
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d0 = md.digest()(0)
        counts((((d0 >> 4) & 0xF) % 4) * 16 + (d0 & 0xF)) += 1
        start = i + 1
      }
      i += 1
    }
    var acc = java.math.BigDecimal.ZERO
    var b = 0
    while (b < 64) {
      val c = counts(b)
      if (c > 0) {
        val dec = new java.math.BigDecimal(
          java.lang.Double.toString(wArr(b) / nD))
          .setScale(12, java.math.RoundingMode.HALF_UP)
        acc = acc.add(
          if (c == 1) dec
          else dec.multiply(java.math.BigDecimal.valueOf(c.toLong)))
      }
      b += 1
    }
    acc.doubleValue()
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenMargin", this,
      classOf[TokenBucketMargin].getName)
    defineCodeGen(ctx, ev, s => s"$ref.compute($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenBucketMargin {
  /** MessageDigest is stateful and expressions are shared across task
    * threads — one instance per thread, reset per token.
    */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
