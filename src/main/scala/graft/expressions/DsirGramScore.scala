package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR document score Σ_g count_g(doc) · imp(g) as ONE native
  * per-row pass over the text: unigrams plus adjacent bigrams of the
  * single-space split, each looked up in the vocab-sized importance
  * map; grams absent from the trained vocabulary contribute 0 (the
  * `dsirScore` LEFT-join rule, so a fully-unseen document still scores
  * an explicit 0). Bit-identical to the exploded formulation — gram
  * explode → broadcast model join → per-doc SUM(c · imp_ppm) — because
  * every occurrence contributes its BIGINT imp_ppm and integer
  * addition is order-free; `"a b".split(" ", -1)` is the same Java
  * regex split (trailing empties kept, `""` → `[""]`) that Spark's
  * `split(text, ' ')` performs, and the bigram key joins the two
  * tokens with the same single space as `concat_ws`.
  *
  * Replaces, per call site: the ~2-rows-per-token gram explode, the
  * broadcast join against the model table, and the per-doc score
  * aggregation — which in the streaming gate (s19) held one state row
  * per doc_id in update mode. The streaming apply becomes fully
  * stateless scan-stage work.
  *
  * Scale: the map is the MODEL, not data — vocab-sized by the same
  * argument that let `dsirScore` broadcast it (DSIR itself hashes
  * grams into 10⁴ buckets to fix the model size at corpus scale; this
  * synthetic corpus' vocab is ~10³). It rides the plan to executors
  * exactly like a broadcast hashed relation. Assumes unique doc_id
  * rows at the call site (the corpus contract, as
  * [[graft.operators.QualityModel.scoreWith]]): the old groupBy would
  * have merged duplicate ids into one score.
  */
case class DsirGramScore(child: Expression, imp: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dsir_score expects a string argument, got ${child.dataType.sql}")

  // immutable-Map lookups box and hash per probe through the Scala
  // wrapper; one java.util.HashMap per executor keeps the hot loop
  // allocation-free on the probe side
  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](imp.size * 2)
    imp.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  def compute(text: UTF8String): Long = {
    val ts = text.toString.split(" ", -1)
    var acc = 0L
    var i = 0
    while (i < ts.length) {
      val u = table.get(ts(i))
      if (u ne null) acc += u.longValue()
      if (i + 1 < ts.length) {
        val b = table.get(ts(i) + " " + ts(i + 1))
        if (b ne null) acc += b.longValue()
      }
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirGramScore", this,
      classOf[DsirGramScore].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(c: Expression): DsirGramScore =
    copy(child = c)
}
