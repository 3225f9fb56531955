package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable MinHash signature (n119/s20 family) as ONE
  * native per-row pass over the normalized text: component i is the
  * minimum over the document's word n-gram shingles of
  * `substr(md5(i || '|' || shingle), 1, 15)`. The exploded formulation
  * built every shingle STRING, fanned each out ×numHashes rows, md5'd
  * into a hex string per row, and collapsed through a (doc, i) hash
  * aggregation; this expression walks the text bytes once — a shingle
  * is a byte SLICE of the normalized text (tokens are single-space
  * separated after normalization, so the n-gram IS the substring from
  * token i's start to token i+n−1's end), each md5 runs over the
  * prefix bytes + that slice with no string materialization, and the
  * running minimum per component is a 60-bit integer compare.
  *
  * Bit-exactness contract (the n119 oracle replays the exploded SQL):
  *   - the first 15 md5 hex chars are the digest's first 60 bits
  *     MSB-first; the kept long is those bits, and the output string
  *     is its zero-padded lowercase hex — byte-identical to
  *     `substr(md5(...), 1, 15)`;
  *   - lexicographic min over fixed-length lowercase hex equals
  *     numeric min over the 60-bit values;
  *   - duplicate shingles cannot change a minimum, so the per-doc
  *     DISTINCT in the exploded path is immaterial here;
  *   - documents with fewer than `n` tokens yield SQL null (the
  *     exploded path's `size(ts) >= n` filter; callers filter).
  */
case class PortableMinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 1 && numHashes >= 1,
    s"need n >= 1 and numHashes >= 1, got n=$n numHashes=$numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects a string argument, got ${child.dataType.sql}")

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i =>
      (i.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    // token start offsets (split on 0x20, empties kept — the
    // TokenBucketMargin byte-split argument)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) starts += i + 1
      i += 1
    }
    val nTok = starts.length
    if (nTok < n) return null
    def tokenEnd(t: Int): Int =
      if (t == nTok - 1) bytes.length else starts(t + 1) - 1
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = PortableMinHashSig.md5.get()
    var t = 0
    while (t <= nTok - n) {
      val from = starts(t)
      val until = tokenEnd(t + n - 1)
      var h = 0
      while (h < numHashes) {
        md.reset()
        md.update(prefixes(h))
        md.update(bytes, from, until - from)
        val d = md.digest()
        // first 60 bits MSB-first = hex chars 1..15
        var v = 0L
        var k = 0
        while (k < 8) { v = (v << 8) | (d(k) & 0xFFL); k += 1 }
        v = v >>> 4
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      t += 1
    }
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = UTF8String.fromString(f"${mins(j)}%015x")
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("portableMinHash", this,
      classOf[PortableMinHashSig].getName)
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("mhs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp = $ref.compute($x);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PortableMinHashSig =
    copy(child = c)
}

object PortableMinHashSig {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
