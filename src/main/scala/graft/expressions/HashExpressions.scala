package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketching hot path.
  *
  * The higher-order-function formulations (transform/aggregate lambdas)
  * are interpreted per element — O(numHashes × shingles) Catalyst-eval
  * steps per row. These expressions do the same math in one tight JVM
  * loop per row (~15× faster on the sf0.1 dedup bench) while producing
  * bit-identical results: same xxhash64 seed (42, Spark's default), same
  * affine family, same tie rules.
  *
  * All four implement `doGenCode` (not `CodegenFallback`): the generated
  * code calls the expression's own `compute` method through a codegen
  * reference object, so the enclosing stage keeps whole-stage codegen —
  * one virtual call per row instead of a fallback that re-enters the
  * interpreter and boxes an `InternalRow` per row.
  */

/** Cosine similarity between two float-array embeddings, evaluated as
  * one tight loop per row. Accumulation is strict left-to-right in
  * double — bit-identical to the higher-order
  * `aggregate(zip_with(...))` formulation (and to the DuckDB oracle's
  * `list_reduce`), just ~20× cheaper. Arrays of unequal length compare
  * over the common prefix.
  *
  * Degenerate inputs yield SQL null, never NaN: empty common prefix,
  * zero-norm input, or a null array element (parquet list columns are
  * `containsNull=true` by default even when no nulls exist, so element
  * nulls are handled at runtime rather than rejected at analysis).
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemType(left).isDefined && elemType(right).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects array<float> or array<double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  @transient private lazy val leftIsDouble =
    elemType(left).contains(DoubleType)
  @transient private lazy val rightIsDouble =
    elemType(right).contains(DoubleType)

  /** Boxed so both the interpreted and generated paths share one body;
    * null means "no defined cosine" (empty / zero norm / null element).
    */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val tmp = ctx.freshName("cos")
      s"""
         |java.lang.Double $tmp = $ref.compute($x, $y);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
}

/** Distinct xxhash64 (seed 42) hashes of `n`-word shingles of a text
  * column, in first-occurrence order — the fused form of
  * split → shingle → hash → distinct that every dedup variant consumes.
  * One pass over the text per row; shingle strings never materialize in
  * the plan. Rows with fewer than `n` tokens hash the whole text as one
  * shingle (same rule as TextFunctions.wordShingles).
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"shingle width must be > 0, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val text = input.toString
    val toks = text.split(" ", -1)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length < n) {
      out.add(hashOf(text))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(hashOf(sb.toString))
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  private def hashOf(s: String): Long =
    XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType, 42L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this,
      classOf[WordShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): WordShingleHashes =
    copy(child = c)
}

/** MinHash signature over a pre-hashed array<long> of shingles (the
  * output of [[WordShingleHashes]]): sig[j] = min over hashes h of
  * (a_j · (h mod P) + b_j) mod P — identical math to [[MinHashSig]],
  * skipping the string re-hash.
  */
case class MinHashSigFromHashes(child: Expression, coeffs: Seq[(Long, Long)])
    extends UnaryExpression {

  private val P = 2147483647L
  private val as: Array[Long] = coeffs.map(_._1).toArray
  private val bs: Array[Long] = coeffs.map(_._2).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val base = ((h % P) + P) % P
      var j = 0
      while (j < k) {
        val v = (as(j) * base + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashFromHashes", this,
      classOf[MinHashSigFromHashes].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigFromHashes =
    copy(child = c)
}

/** MinHash signature over an array<string> of shingles:
  * sig[j] = min over shingles of (a_j · (xxhash64(s) mod P) + b_j) mod P,
  * P = 2^31-1. `coeffs` must come from TextFunctions.minHashCoeffs so
  * DataFrame-level and expression-level signatures agree.
  */
case class MinHashSig(child: Expression, coeffs: Seq[(Long, Long)])
    extends UnaryExpression {

  private val P = 2147483647L
  private val as: Array[Long] = coeffs.map(_._1).toArray
  private val bs: Array[Long] = coeffs.map(_._2).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      val base = ((h % P) + P) % P
      var j = 0
      while (j < k) {
        val v = (as(j) * base + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** 64-bit SimHash over an array<string> of tokens: per-token xxhash64
  * (seed 42), each bit position votes ±1, sign of the vote becomes the
  * output bit — identical semantics to the unrolled HOF version.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}
