package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Integer repetition counters for the Gopher-style filters (reference
  * capability: per-element stream inspection, `Stream.scala:56-79`), in
  * ONE hash-map pass per row: token/distinct-token counts, the most
  * frequent bigram's count, and duplicated-trigram counts. Replaces an
  * interpreted HOF pipeline (gram-string arrays + array_sort + struct
  * folds) that dominated the n19 scan stage; the fractions stay
  * DECLARATIVE single divisions downstream, so the cross-engine oracle
  * is untouched — this expression only produces exact integers.
  *
  * Token ids intern through a hash map, bigrams key as (id1<<32 | id2)
  * longs; tokens are split on single 0x20 bytes with empty segments
  * kept, exactly like `split(text, " ", -1)` — tokens never contain a
  * space, so id-pair keying is injective exactly like the previous
  * join-with-space gram strings.
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_dup_words", IntegerType, nullable = false),
    StructField("max_bg", IntegerType, nullable = false),
    StructField("n_bg", IntegerType, nullable = false),
    StructField("n_dup_tg", IntegerType, nullable = false),
    StructField("n_tg", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_repetition_counts expects a string argument, got ${child.dataType.sql}")

  private val space = UTF8String.fromString(" ")

  def compute(s: UTF8String): InternalRow = {
    val toks = s.split(space, -1)
    val n = toks.length
    val ids = new java.util.HashMap[UTF8String, Integer](n * 2)
    val tokIds = new Array[Int](n)
    var i = 0
    while (i < n) {
      var id = ids.get(toks(i))
      if (id == null) { id = ids.size(); ids.put(toks(i), id) }
      tokIds(i) = id
      i += 1
    }
    val nDupWords = n - ids.size()
    var maxBg = 0
    val nBg = math.max(n - 1, 0)
    if (nBg > 0) {
      val bg = new java.util.HashMap[java.lang.Long, Integer](nBg * 2)
      i = 0
      while (i < nBg) {
        val key = java.lang.Long.valueOf(
          (tokIds(i).toLong << 32) | (tokIds(i + 1).toLong & 0xffffffffL))
        val c = bg.get(key)
        val nc = if (c == null) 1 else c + 1
        bg.put(key, nc)
        if (nc > maxBg) maxBg = nc
        i += 1
      }
    }
    val nTg = math.max(n - 2, 0)
    var nDupTg = 0
    if (nTg > 0) {
      val tg = new java.util.HashSet[(Int, Int, Int)](nTg * 2)
      i = 0
      while (i < nTg) {
        if (!tg.add((tokIds(i), tokIds(i + 1), tokIds(i + 2)))) nDupTg += 1
        i += 1
      }
    }
    InternalRow(n, nDupWords, maxBg, nBg, nDupTg, nTg)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionCounts", this,
      classOf[RepetitionCounts].getName)
    defineCodeGen(ctx, ev, s => s"$ref.compute($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
