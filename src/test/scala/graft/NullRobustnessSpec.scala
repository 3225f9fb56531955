package graft

import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** NULL-text robustness for the oracle families the r9/r10 gate fix did
  * not cover (gram-agg, GD-trajectory, prefix-sum — the r9 task-7
  * residue): inject a NULL-text document into a scratch copy of the
  * corpus and pin each family's disposition of it.
  *
  * Why this pins Spark↔DuckDB parity without running DuckDB here: every
  * lineage in these families enters the text through the SAME
  * ANSI-NULL-propagating pair of expressions on both sides —
  * `split`/`explode`/`size` in Spark (ANSI mode, the Spark 4 default,
  * so `size(NULL)` is NULL, not the legacy −1) and
  * `string_split`/`unnest`/`len` in DuckDB — under which a NULL text
  * yields NULL token arrays and ZERO exploded token rows in BOTH
  * engines. So the cross-engine-identical disposition is a property of
  * the lineage shape: token-explode families never see the document
  * (gram-agg, GD-trajectory), and row-preserving families carry it with
  * NULL token stats and a zero prefix-sum contribution (the operator
  * coalesces the running-total value to 0; the oracle's window SUM
  * skips NULLs — same number). The asserts below pin exactly those
  * dispositions on the live registry lineages, so any edit that breaks
  * the property (a non-null-safe cast, a count that switches from
  * token-rows to doc-rows) fails here instead of as a driver hash
  * mismatch on a future corpus.
  *
  * The committed data manifest additionally pins that the CURRENT
  * driver corpus has zero NULLs column-wide (tools/manifest.py records
  * per-column null counts), so these dispositions are a guarantee about
  * robustness, not a behavior the driver data exercises today.
  */
class NullRobustnessSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  private val srcDir = "/root/testdata/sf0.001"

  // the scratch tree holds a parquet corpus copy — deleteOnExit is a
  // no-op on non-empty directories, so remove it explicitly
  override def afterAll(): Unit = {
    if (scratchBuilt) {
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmTree))
        f.delete(); ()
      }
      rmTree(new java.io.File(scratchDir))
    }
    super.afterAll()
  }
  @volatile private var scratchBuilt = false

  /** Scratch corpus: sf0.001 documents plus ONE NULL-text row with
    * doc_id −1 (sorts FIRST in every doc_id order, so a zero
    * prefix-sum contribution leaves every real row's offsets
    * untouched), injected into an existing (lang, source) so no
    * grouping key appears or vanishes with it.
    */
  private lazy val scratchDir: String = {
    val base = java.nio.file.Files.createTempDirectory("graft_nullrob_")
    scratchBuilt = true
    val docs = Tables(spark, srcDir).documents
    val extra = spark.sql(
      """SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(NULL AS STRING) AS text,
        |  'en' AS lang, 'src0' AS source, CAST(0 AS BIGINT) AS n_chars
        |""".stripMargin)
    docs.unionByName(extra).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    base.toString
  }

  private def rows(name: String, dir: String): Seq[Row] =
    queries.Registry.queries(name)(spark, dir).collect().toSeq

  test("prefix-sum family (n16): NULL text keeps its row, counts zero tokens") {
    val base = rows("n16_sequence_packing", srcDir)
    val injected = rows("n16_sequence_packing", scratchDir)
    // every real document's (n_tokens, start_off, pack_id) is untouched
    assert(injected.filter(_.getLong(0) >= 0L) == base,
      "a NULL-text row shifted real rows' prefix sums — it must count as 0")
    // the injected row is PRESENT (row-preserving family) with NULL
    // token stats and a zero offset: size(split(NULL)) is NULL under
    // ANSI exactly as len(string_split(NULL)) is NULL in the oracle,
    // and the running total coalesces it to 0 exactly as the oracle's
    // window SUM skips NULLs
    val nullRow = injected.filter(_.getLong(0) == -1L)
    assert(nullRow.size == 1, "the injected NULL-text row vanished")
    assert(nullRow.head.isNullAt(1), "n_tokens must be NULL for NULL text")
    assert(nullRow.head.getLong(2) == 0L, "first-row start_off must be 0")
  }

  test("gram-agg family (n40): a NULL-text doc is invisible to the model, null in the output") {
    // both engines build the bigram LM from exploded token rows
    // (explode/unnest of a NULL array each produce zero rows), so the
    // injected doc contributes nothing to c12/c1/vocab — every real
    // doc's score is bit-identical to the base corpus. The output IS
    // row-preserving on both sides (the oracle's final
    // `documents LEFT JOIN pd` + COALESCE(n_bigrams, 0)), so the
    // injected doc appears with the same (0, NULL, NULL) disposition
    // the engine's left-join + coalesce produces.
    val base = rows("n40_bigram_fluency", srcDir)
    val injected = rows("n40_bigram_fluency", scratchDir)
    assert(injected.filter(_.getLong(0) >= 0L) == base,
      "a NULL-text doc changed real docs' bigram-LM scores")
    val nullRow = injected.filter(_.getLong(0) == -1L)
    assert(nullRow.size == 1, "the injected NULL-text row vanished")
    assert(nullRow.head.getLong(1) == 0L &&
      nullRow.head.isNullAt(2) && nullRow.head.isNullAt(3),
      s"NULL-text disposition must be (0 bigrams, NULL, NULL): ${nullRow.head}")
  }

  test("order-statistics family (n114): a NULL-text doc is out of the ranks") {
    // Spark windows default NULLS FIRST, DuckDB NULLS LAST — an
    // unfiltered NULL n_tok row would shift EVERY rank on one side
    // only. lengthPercentiles declares NULL lengths out of the order
    // statistics (and the oracle pins the same filter), so the
    // injected doc must leave every per-source card bit-identical.
    assert(rows("n114_length_percentiles", scratchDir) ==
      rows("n114_length_percentiles", srcDir),
      "a NULL-text doc shifted the per-source length order statistics")
  }

  test("binned-ECDF family (n111/s33): NULL values are out of the distribution") {
    // same NULLS FIRST / NULLS LAST hazard in ksFromBinCounts'
    // cumulative window: a NULL bin would shift every ECDF step on the
    // Spark side only. ksBinCounts filters NULL values (oracle pinned
    // with WHERE value IS NOT NULL) — injecting NULL-value rows must
    // not move the statistic.
    import spark.implicits._
    val clean = Seq(("a", 1L, 1.0), ("a", 2L, 2.5), ("a", 3L, 2.7),
      ("a", 4L, 9.0), ("a", 5L, 9.5), ("a", 6L, 1.2))
      .toDF("event_type", "event_id", "value")
    val dirty = clean.unionByName(
      Seq(("a", 7L), ("a", 8L)).toDF("event_type", "event_id")
        .withColumn("value",
          org.apache.spark.sql.functions.lit(null).cast("double")))
    def ks(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Drift.ksDrift(df, "event_type", "value",
        org.apache.spark.sql.functions.col("event_id") % 2 === 0)
        .collect().toSeq
    assert(ks(dirty) == ks(clean),
      "NULL-value rows moved the binned KS statistic")
  }

  test("robust-bounds family (n117): NULL values are out of the MAD ranks") {
    // madBounds runs TWO rank windows (values, then absolute
    // deviations) — the same NULLS FIRST / NULLS LAST hazard as n114,
    // doubled. The operator declares NULL values out of both rank
    // passes (its n117 oracle pins WHERE value IS NOT NULL), so
    // injecting NULL-value rows must leave every per-key card
    // bit-identical — including n (which must count non-NULL values
    // only) and the clip counts (a NULL v is neither below nor above).
    import spark.implicits._
    val clean = Seq(("a", 1.0), ("a", 2.5), ("a", 2.7), ("a", 9.0),
      ("a", 9.5), ("a", 1.2), ("b", 4.0), ("b", 4.5))
      .toDF("event_type", "value")
    val dirty = clean.unionByName(
      Seq("a", "a", "b").toDF("event_type").withColumn("value",
        org.apache.spark.sql.functions.lit(null).cast("double")))
    def mad(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Drift.madBounds(df, "event_type", "value")
        .orderBy("event_type").collect().toSeq
    assert(mad(dirty) == mad(clean),
      "NULL values moved the median/MAD order statistics or counts")
  }

  test("GD-trajectory family (n70): a NULL-text doc moves no weight") {
    // domainTokenProbs starts at explode(split(text)) — the NULL doc
    // adds zero token mass to its source, and no count in the trainer
    // is doc-grained, so every round's (loss, excess, weight) is
    // bit-identical; the oracle's unnest-based CTEs drop it the same way
    assert(rows("n70_doremi_mixture", scratchDir) ==
      rows("n70_doremi_mixture", srcDir))
  }
}
