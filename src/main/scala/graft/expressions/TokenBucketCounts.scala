package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document feature-bucket token counts as ONE native per-row
  * pass: a 64-int array where slot b counts the document's tokens
  * hashing to bucket b ([[TokenBucketMargin]]'s md5-nibble bucket,
  * same 0x20 split keeping empties). This is the training-side twin
  * of TokenBucketMargin: the GD loop re-reads the per-TOKEN exploded
  * feature frame every round, and collapsing it to one counts row per
  * document shrinks the persisted frame ~100× and turns each round's
  * margin into a per-row expression ([[BucketCountMargin]]) — while
  * the per-bucket gradient stays bit-exact because equal decimal
  * terms collapse to one multiply by their count.
  *
  * The token count n is the array's element sum (every token lands in
  * exactly one bucket), so callers derive it without a second
  * tokenize. Null text yields SQL null (the exploded path produced no
  * rows; callers filter).
  */
case class TokenBucketCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_token_buckets expects a string argument, got ${child.dataType.sql}")

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    val md = TokenBucketCounts.md5.get()
    var start = 0
    var i = 0
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
    val out = new Array[Any](64)
    var b = 0
    while (b < 64) { out(b) = counts(b); b += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenBucketCounts", this,
      classOf[TokenBucketCounts].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): TokenBucketCounts =
    copy(child = c)
}

object TokenBucketCounts {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** The scoring margin Σ_b counts(b) · dec₁₂(w(b)/n) over a
  * [[TokenBucketCounts]] array — [[TokenBucketMargin]]'s decimal
  * arithmetic with the tokenize+md5 pass already collapsed into the
  * counts (n = Σ counts). Bit-identical to the exploded
  * `xsum(termCol(w))`: each per-token term rounds to DECIMAL scale 12
  * HALF_UP off its `Double.toString` shortest representation, equal
  * terms multiply by their count (exact), the sum is exact decimal
  * addition, and the result is the decimal's double value.
  */
case class BucketCountMargin(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  require(weights.size == 64,
    s"BucketCountMargin expects the 64-bucket model, got ${weights.size}")

  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bucket_margin expects array<int>, got ${t.sql}")
    }

  @transient private lazy val wArr: Array[Double] = weights.toArray

  def compute(arr: ArrayData): Double = {
    var n = 0
    var b = 0
    while (b < 64) { n += arr.getInt(b); b += 1 }
    val nD = n.toDouble
    var acc = java.math.BigDecimal.ZERO
    b = 0
    while (b < 64) {
      val c = arr.getInt(b)
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
    java.lang.Double.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketCountMargin", this,
      classOf[BucketCountMargin].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): BucketCountMargin =
    copy(child = c)
}

/** The SIGNED per-side decimal term sum Σ_b counts(b) · dec₁₂(sgn·w(b)/n)
  * of the Bradley–Terry pair margin, emitted AS DECIMAL(38,12): the
  * pair margin sums the chosen and rejected sides' per-token decimal
  * terms in ONE decimal total before its single cast to double, so the
  * side sums must stay decimal — two per-side doubles subtracted would
  * round twice and break the oracle hash. Callers aggregate these with
  * a plain decimal `sum` per pair (decimal addition is exact and
  * grouping-free) and cast once, exactly like the exploded
  * `xsum(sgn·w_b/n)`. The per-token double is `(sgn · w_b) / n` in
  * that operation order, matching the exploded column's arithmetic.
  */
case class SignedBucketTermSum(
    left: Expression, right: Expression, weights: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(weights.size == 64,
    s"SignedBucketTermSum expects the 64-bucket model, got ${weights.size}")

  override def dataType: DataType =
    org.apache.spark.sql.types.DecimalType(38, 12)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_signed_term_sum expects (array<int>, int), got ${l.sql}, ${r.sql}")
    }

  @transient private lazy val wArr: Array[Double] = weights.toArray

  def compute(arr: ArrayData, sgn: Int): org.apache.spark.sql.types.Decimal = {
    var n = 0
    var b = 0
    while (b < 64) { n += arr.getInt(b); b += 1 }
    val nD = n.toDouble
    val sD = sgn.toDouble
    var acc = java.math.BigDecimal.ZERO
    b = 0
    while (b < 64) {
      val c = arr.getInt(b)
      if (c > 0) {
        val dec = new java.math.BigDecimal(
          java.lang.Double.toString((sD * wArr(b)) / nD))
          .setScale(12, java.math.RoundingMode.HALF_UP)
        acc = acc.add(
          if (c == 1) dec
          else dec.multiply(java.math.BigDecimal.valueOf(c.toLong)))
      }
      b += 1
    }
    org.apache.spark.sql.types.Decimal(acc, 38, 12)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Integer])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signedTermSum", this,
      classOf[SignedBucketTermSum].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.compute($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignedBucketTermSum =
    copy(left = newLeft, right = newRight)
}
