package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality / language / token analytics over a document corpus
  * (SURVEY §2.7). All per-row expression work — embarrassingly parallel,
  * no shuffle beyond any final aggregation the caller adds.
  */
object TextAnalysis {

  /** Word-boundary token pattern shared by the BPE-ish counter: runs of
    * letters, runs of digits, or single non-space symbols — a cheap,
    * deterministic proxy for subword tokenization.
    */
  val TokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Per-language marker wordlists for the n-gram/stopword language-ID
    * heuristic. Deterministic and intentionally tiny: the score is the
    * count of marker-token occurrences.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "fast", "key"),
    "de" -> Seq("der", "und", "slow", "window", "gross"),
    "es" -> Seq("el", "la", "data", "stream", "filter"),
    "fr" -> Seq("le", "la", "query", "order", "petit"),
    "zh" -> Seq("zh", "big", "join", "merge", "line"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Token statistics: counts by whitespace and by the BPE-ish regex,
    * plus mean token length.
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0)))
        .as("n_bpe_tokens"),
      length(regexp_replace(col("text"), " ", "")).as("n_non_space_chars"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(toks)).as("mean_token_len"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, digit
    * ratio, and a composite keep/drop flag — the standard pre-training
    * corpus filter shape.
    */
  /** The [[qualityScore]] keep predicate as a single per-row Column —
    * identical arithmetic (the gaSql oracle form), usable inside any
    * one-scan projection ([[gateAgreement]], the n100 healthcheck).
    */
  private[operators] def qualityOkCol: Column = {
    val toks = tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val punct = (nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
    val digits = (nChars - length(regexp_replace(col("text"), "[0-9]", "")))
    // coalesce: an empty text makes both ratios NULL (x/0) and a NULL
    // text makes everything NULL — either must land deterministically
    // in the not-kept cell, or the kappa/healthcheck four-cell counts
    // stop summing to n (the oracle applies the same COALESCE)
    coalesce(
      (size(toks) >= 5) && ((punct / nChars) < 0.2) &&
        ((digits / nChars) < 0.3),
      lit(false))
  }

  /** The [[gopherQualityRules]] composite as a single per-row Column
    * (the gbSql oracle form).
    */
  private[operators] def gopherOkCol: Column = {
    val ts = split(col("text"), " ")
    val nWords = size(ts)
    val sumLen = length(translate(col("text"), " ", ""))
    val meanLen = sumLen.cast("double") / nWords
    val nAlpha = size(filter(ts, t => t.rlike("[a-zA-Z]")))
    val stopHits = Seq("the", "a", "and", "of", "to")
      .map(w => when(array_contains(ts, w), 1).otherwise(0))
      .reduce(_ + _)
    // same NULL-text determinism contract as [[qualityOkCol]]
    coalesce(
      (nWords >= 10 && nWords <= 100000) &&
        (meanLen >= 3.0 && meanLen <= 10.0) &&
        (nAlpha * 5 >= nWords * 4) &&
        (stopHits >= 2),
      lit(false))
  }

  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val punct = (nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
    val digits = (nChars - length(regexp_replace(col("text"), "[0-9]", "")))
    val stop = markerCount(toks, Seq("the", "a", "and", "of", "to"))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      (punct / nChars).as("punct_ratio"),
      (digits / nChars).as("digit_ratio"),
      (stop.cast("double") / size(toks)).as("stopword_ratio"))
      .withColumn("quality_ok",
        (col("n_tokens") >= 5) && (col("punct_ratio") < 0.2) &&
          (col("digit_ratio") < 0.3))
  }

  /** Stopword-scoring language ID: count marker hits per language, pick
    * the argmax with fixed priority order on ties (the declared order of
    * [[LangMarkers]]).
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs.select(
      (col("doc_id") +: col("lang").as("labeled_lang") +:
        LangMarkers.map { case (l, ws) =>
          markerCount(toks, ws).as(s"score_$l")
        }): _*)
    val best = LangMarkers.map(_._1).map(l => col(s"score_$l"))
      .reduce((a, b) => greatest(a, b))
    val pred = LangMarkers.map(_._1).foldRight(lit("und")) { (l, els) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(els)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Document fingerprints: md5-prefix of the normalized text (exact
    * content key) — see also [[graft.functions.TextFunctions.winnowingFingerprints]]
    * for the rolling-hash near-dup variant.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Repetition filters in the style of the Gopher corpus pipeline
    * (Rae et al. 2021, §A1.1): fraction of duplicated words, share of
    * the single most frequent bigram, fraction of duplicated trigrams,
    * and a composite keep flag. The integer counters come from ONE
    * native hash-map pass per row
    * ([[graft.expressions.RepetitionCounts]] — the corpus is never
    * exploded or shuffled); only the single-division fractions are
    * declarative, so the cross-engine FP contract is unchanged.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val rc = ColumnBridge.column(graft.expressions.RepetitionCounts(
      ColumnBridge.expression(col("text"))))
    docs.select(col("doc_id"), rc.as("rc"))
      .select(
        col("doc_id"),
        col("rc.n_tokens").as("n_tokens"),
        (col("rc.n_dup_words").cast("double") / col("rc.n_tokens"))
          .as("dup_word_frac"),
        when(col("rc.n_bg") > 0,
          col("rc.max_bg").cast("double") / col("rc.n_bg"))
          .as("top_bigram_frac"),
        when(col("rc.n_tg") > 0,
          col("rc.n_dup_tg").cast("double") / col("rc.n_tg"))
          .as("dup_trigram_frac"))
      .withColumn("rep_ok",
        col("dup_word_frac") < 0.3 &&
          coalesce(col("top_bigram_frac"), lit(0.0)) < 0.2 &&
          coalesce(col("dup_trigram_frac"), lit(0.0)) < 0.3)
  }

  /** PII redaction patterns, applied in declared order (emails first —
    * their local parts contain digit runs that must not be half-eaten by
    * the generic long-number rule). ASCII-only character classes so the
    * Java-regex (Spark) and RE2 (cross-engine) interpretations coincide.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("longnum", "[0-9]{8,}", "<ID>"))

  /** PII scrubbing: redact emails, IPv4 addresses, and 8+-digit runs
    * (account/phone-shaped identifiers), with per-category match counts
    * (counted on the ORIGINAL text; replacements then apply
    * sequentially). Pure per-row regex work in the scan stage.
    */
  def scrubPii(docs: DataFrame): DataFrame = {
    val scrubbed = PiiPatterns.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    docs.select(
      (col("doc_id") +:
        PiiPatterns.map { case (name, pat, _) =>
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .as(s"n_$name")
        }) :+ scrubbed.as("scrubbed"): _*)
  }

  /** Tokenizer-fit step: fit a frequency vocabulary of the `vocabSize`
    * most frequent whitespace terms (ties broken lexicographically, so
    * the fitted vocab is deterministic at any parallelism), then score
    * every document's out-of-vocabulary rate against it — the standard
    * "will this corpus tokenize well" diagnostic before BPE training.
    *
    * Scale shape: one term-keyed count aggregate with map-side partials
    * (vocabulary-sized output), a TakeOrdered top-V (vocabSize rows —
    * never the corpus), and an explicitly broadcast left join of the
    * fitted vocab back over the exploded corpus feeding one per-doc
    * fan-in aggregate.
    */
  def fitVocabOovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be > 0, got $vocabSize")
    val terms = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    terms.join(broadcast(fitVocab(docs, vocabSize)), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        count(when(col("in_vocab").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_terms"))
  }

  /** Top-`k` most salient terms per document by TF-IDF. The score is the
    * rational form `tf * N / df` (not `tf * ln(N/df)`): libm `ln` is not
    * bit-reproducible across engines, the rational form is — and it
    * induces the identical per-document ranking since `ln` is monotonic
    * and `tf` multiplies a positive constant either way.
    *
    * Scale shape: term counting is one (doc, term)-keyed aggregation
    * with map-side partials; document frequency is a second,
    * vocabulary-sized aggregation reusing the first; the df join is a
    * plain equi-join on term (AQE broadcasts it when the vocabulary is
    * small); top-k is a window partitioned BY DOCUMENT. No global order,
    * no driver materialization — the corpus total lands via a broadcast
    * one-row cross join.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    // tf feeds the df aggregate AND the scored join — without
    // materialization the corpus explode runs once per consumer
    // (ScanAudit: documents×3, zero exchange reuse); the n110 policy
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("score"), asc("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }

  /** Per-source "dataset card": the one-pass corpus summary a training
    * run publishes next to its data mix — volume, token counts,
    * exact-dup rate, language mix. Everything is an integer-exact
    * aggregate or a single double division, so the card is bit-stable
    * across engines and parallelism.
    *
    * Scale shape: one hash aggregation keyed on source (map-side
    * partials; source cardinality is tiny so the final exchange is a few
    * rows). Token counts ride the [[graft.expressions.SpaceTokenCount]]
    * byte scan via the RewriteSizeOfSplit rule; the distinct-fingerprint
    * count is Spark's Expand-based distinct aggregate over the 16-byte
    * md5 prefix, NOT a per-source window.
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    docs
      .select(col("doc_id"), col("source"), col("lang"),
        toks.as("n_toks"), fingerprint(col("text")).as("fp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"),
        sum(col("n_toks")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        count(when(col("lang") === "en", 1)).as("n_en"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        col("n_exact_dups"), col("total_tokens"), col("n_langs"),
        (col("total_tokens").cast("double") / col("n_docs"))
          .as("mean_doc_tokens"),
        (col("n_en").cast("double") / col("n_docs")).as("en_frac"))
  }

  /** Cross-source content-overlap matrix — the dataset-card companion
    * that answers "which sources ship the same content": for every
    * source pair, how many distinct n-gram shingles they share, plus a
    * containment fraction against the smaller side. The standard
    * mix-design input (two crawls sharing 30% of their text should not
    * both be upweighted).
    *
    * Scale shape: the corpus reduces to DISTINCT (source, shingle-hash)
    * — one hash-aggregate, shingles hashed scan-side by the native
    * expression — then a self-join ON the hash restricted to
    * source_a < source_b. Join fan-out per shingle is bounded by the
    * SOURCE count (a few dozen), never by document multiplicity,
    * because multiplicity collapses in the distinct.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 5): DataFrame = {
    val sh = docs
      .select(col("source"), explode(shingleHashes(col("text"), n)).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = sh.groupBy("source").agg(count(lit(1)).as("tot"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_shingles"))
      .join(broadcast(totals.withColumnRenamed("source", "source_a")
        .withColumnRenamed("tot", "tot_a")), "source_a")
      .join(broadcast(totals.withColumnRenamed("source", "source_b")
        .withColumnRenamed("tot", "tot_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("shared_shingles"),
        col("tot_a"), col("tot_b"),
        (col("shared_shingles").cast("double") /
          least(col("tot_a"), col("tot_b"))).as("containment"))
  }

  /** Byte-level diversity statistics — the log-free form of the Gopher
    * character-entropy quality gate. A [[graft.expressions.ByteHistogram]]
    * pass in the scan stage yields per-row byte counts; the statistics
    * are integer folds over the fixed 256-bin array, so every output is
    * either an exact integer or a SINGLE double division — bit-identical
    * across engines with no ordered-FP accumulation and no libm calls
    * (ln/log2 are not cross-engine exact, which is why this reports the
    * Simpson index Σp² and its inverse "effective alphabet size" instead
    * of Shannon entropy: same ordering of documents, exact parity).
    *
    * Scale shape: pure per-row expression work, no shuffle at all.
    */
  def byteDiversity(docs: DataFrame): DataFrame = {
    val h = byteHistogram(col("text"))
    docs
      .select(col("doc_id"), h.as("hist"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        size(filter(col("hist"), c => c > 0)).as("distinct_bytes"),
        aggregate(col("hist"), lit(0L), (a, c) => a + c * c).as("sum_c2"),
        array_max(col("hist")).as("max_c"))
      .select(col("doc_id"), col("n_bytes"), col("distinct_bytes"),
        when(col("n_bytes") === 0, lit(null))
          .otherwise(col("max_c").cast("double") / col("n_bytes"))
          .as("top_byte_frac"),
        when(col("n_bytes") === 0, lit(null))
          .otherwise(col("sum_c2").cast("double") /
            (col("n_bytes") * col("n_bytes"))).as("simpson"),
        when(col("n_bytes") === 0, lit(null))
          .otherwise((col("n_bytes") * col("n_bytes")).cast("double") /
            col("sum_c2")).as("effective_bytes"))
  }

  /** Gopher word-level quality rules (Rae et al. 2021 §A1.1) — the
    * document-shape complement of [[repetitionStats]]' repetition rules:
    * word-count bounds, mean word length in [3, 10], ≥ 80% of words
    * containing an alphabetic character, and at least two distinct
    * stopword hits. The alpha-fraction gate is kept integer-exact
    * (`5·n_alpha ≥ 4·n_words`, no FP ratio); mean word length is one
    * single-rounded division of two exact integers, so every flag is
    * engine-reproducible.
    *
    * The word-count floor is 10 (not the paper's 50): the corpus here is
    * short synthetic documents, and a gate that fails every row tests
    * nothing. Scale shape: pure per-row expression work in the scan
    * stage — no shuffle at all.
    */
  /** Per-source Spearman rank correlation between the composite quality
    * score and document length — the "is my quality metric just a
    * length proxy?" calibration check a curation pipeline runs before
    * trusting a gate. Ranks are `row_number` over (metric, doc_id) —
    * deterministic total order rather than averaged tie ranks, so the
    * statistic is EXACT integer arithmetic until one final division:
    * ρ = 1 − 6·Σd² / (n·(n²−1)), NULL for sources with n < 2.
    *
    * Scale shape: two windows partitioned BY SOURCE over the same
    * shuffle (Spark plans one exchange; the second sort is in-partition)
    * and one hash aggregation — no global order anywhere.
    */
  def qualityLengthSpearman(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityScore(docs)
      .select(col("doc_id"),
        (col("stopword_ratio") - col("punct_ratio") - col("digit_ratio"))
          .as("score"))
      .join(docs.select(col("doc_id"), col("source"), col("n_chars")), "doc_id")
    val byScore = Window.partitionBy("source").orderBy(desc("score"), asc("doc_id"))
    val byLen = Window.partitionBy("source").orderBy(desc("n_chars"), asc("doc_id"))
    scored
      .withColumn("rs", row_number().over(byScore).cast("long"))
      .withColumn("rl", row_number().over(byLen).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("rs") - col("rl")) * (col("rs") - col("rl"))).as("sum_d2"))
      .withColumn("rho",
        when(col("n_docs") < 2, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            (lit(6L) * col("sum_d2")).cast("double") /
              (col("n_docs") * (col("n_docs") * col("n_docs") - 1L)).cast("double")))
  }

  def gopherQualityRules(docs: DataFrame): DataFrame = {
    val ts = split(col("text"), " ")
    val nWords = size(ts)
    // Σ token length via space-stripping — identical arithmetic exists
    // in any engine, and it never explodes the token array
    val sumLen = length(translate(col("text"), " ", ""))
    val nAlpha = size(filter(ts, t => t.rlike("[a-zA-Z]")))
    val stopHits = Seq("the", "a", "and", "of", "to")
      .map(w => when(array_contains(ts, w), 1).otherwise(0))
      .reduce(_ + _)
    docs.select(col("doc_id"), nWords.as("n_words"),
      (sumLen.cast("double") / nWords).as("mean_word_len"),
      nAlpha.as("n_alpha"), stopHits.as("n_stop_hits"))
      .withColumn("word_count_ok",
        col("n_words") >= 10 && col("n_words") <= 100000)
      .withColumn("mean_len_ok",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("alpha_ok", col("n_alpha") * 5 >= col("n_words") * 4)
      .withColumn("stop_ok", col("n_stop_hits") >= 2)
      .withColumn("gopher_ok",
        col("word_count_ok") && col("mean_len_ok") &&
          col("alpha_ok") && col("stop_ok"))
  }

  /** Vocabulary-coverage curve: what fraction of all token occurrences
    * do the top-k most frequent terms cover, for each checkpoint k —
    * the analysis that sizes a tokenizer vocabulary (coverage
    * saturates long before the long tail ends). Rank is the
    * [[GlobalOrder]] distributed sort by (freq desc, term asc); the
    * checkpoints fold into ONE single-row aggregation (conditional
    * sums), so the plan is explode + vocab hash-agg + range sort +
    * one reduce — no window, no limit. Fractions are single exact-int
    * divisions.
    */
  def vocabCoverage(docs: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val tf = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
    val ranked = GlobalOrder
      .withGlobalIndexCols(tf, Seq(desc("freq"), asc("t")))
      .withColumnRenamed("_global_rank", "rank")
    val covCols = ks.map(k =>
      sum(when(col("rank") <= k, col("freq")).otherwise(lit(0L)))
        .as(s"cov_$k"))
    val base = ranked.agg(covCols.head,
      (covCols.tail :+ sum(col("freq")).as("total_tokens") :+
        count(lit(1)).as("vocab_size")): _*)
    ks.foldLeft(base)((d, k) => d.withColumn(s"frac_$k",
      col(s"cov_$k").cast("double") / col("total_tokens").cast("double")))
  }

  /** Fit the top-`vocabSize` frequency vocabulary: (term, in_vocab) —
    * the fixed-k trained artifact [[fitVocabOovRate]] and the s28
    * streaming OOV monitor both consume (vocabSize is a constant, so
    * the global limit is the whitelisted bounded top-k shape).
    */
  def fitVocab(docs: DataFrame, vocabSize: Int): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term")).limit(vocabSize)
      .select(col("term"), lit(true).as("in_vocab"))

  /** Per-source OOV share under a fitted vocabulary — runs unchanged
    * on a STREAMING corpus (broadcast vocab join + ONE aggregation,
    * update mode): the ingest monitor that flags a feed drifting away
    * from the tokenizer's vocabulary.
    */
  def oovBySource(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs.select(col("source"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        count(when(col("in_vocab").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_terms"))

  /** Agreement between two quality GATES — the heuristic composite
    * ([[qualityScore]]'s keep flag) and the Gopher word-shape rules
    * ([[gopherQualityRules]]'s composite) — as Cohen's kappa: raw
    * agreement corrected for the agreement two independent gates with
    * these keep rates would show by chance. Two filters that look 90%
    * consistent can be barely better than coin flips once both keep
    * most documents; kappa is the number that says whether running the
    * second gate adds signal. Degenerate margins (pe = 1: both gates
    * constant) yield NULL, not a 0/0 NaN. Output: one row
    * (n, n11, n10, n01, n00, po, pe, kappa).
    *
    * Scale shape: two scan-stage predicate projections joined on
    * doc_id, ONE global aggregation of four conditional counts;
    * the kappa arithmetic is driver-free column math on the 1-row
    * result.
    */
  def gateAgreement(docs: DataFrame): DataFrame = {
    // ONE scan: both predicates are per-row expressions ([[qualityOkCol]]
    // / [[gopherOkCol]] — identical arithmetic to the frame-producing
    // operators), so the 4-cell table never joins or rescans the corpus
    docs.select(qualityOkCol.as("ga"), gopherOkCol.as("gb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ga") && col("gb"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("ga") && !col("gb"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("ga") && col("gb"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("ga") && !col("gb"), 1L).otherwise(0L)).as("n00"))
      .withColumn("po",
        (col("n11") + col("n00")).cast("double") / col("n").cast("double"))
      .withColumn("pa",
        (col("n11") + col("n10")).cast("double") / col("n").cast("double"))
      .withColumn("pb",
        (col("n11") + col("n01")).cast("double") / col("n").cast("double"))
      .withColumn("pe",
        col("pa") * col("pb") +
          (lit(1.0) - col("pa")) * (lit(1.0) - col("pb")))
      .withColumn("kappa",
        when(col("pe") === 1.0, lit(null))
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe"))))
      .select("n", "n11", "n10", "n01", "n00", "po", "pe", "kappa")
  }

  /** Language-ID confusion matrix: [[languageId]]'s predictions
    * against the labeled language, with per-label recall rates — the
    * eval that says where the n09 heuristic misroutes documents (and
    * therefore which languages a lang-gated mixture over- or
    * under-samples). Output: (labeled_lang, pred_lang, n, n_labeled,
    * rate). One hash aggregation + one label-partitioned window.
    */
  def langConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    languageId(docs)
      .groupBy("labeled_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_labeled",
        sum(col("n")).over(Window.partitionBy(col("labeled_lang"))))
      .withColumn("rate",
        col("n").cast("double") / col("n_labeled").cast("double"))
  }

  /** Per-source quality-gate keep-rate with a Wilson 95% score
    * interval, flagged when the interval excludes the pooled rate —
    * the sampling-error-aware version of a per-source health report
    * (a 14/25 source is NOT evidence of decay; a 140/250 source is).
    * Uses the Gopher gate ([[gopherOkCol]]), whose keep rate actually
    * varies across the corpus.
    *
    * Exactness: counts are integers; every double expression below is
    * written with ONE fixed shape (same parse tree in the DuckDB
    * oracle), and sqrt is correctly rounded in both engines, so lo/hi
    * hash-match bit-for-bit. z = 1.96 (z² = 3.8416) as double
    * literals.
    *
    * Scale shape: one scan + source-keyed count agg; the pooled rate
    * is a one-row scalar broadcast back over the D-row frame.
    */
  def sourceGateHealth(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"),
        when(gopherOkCol, 1L).otherwise(0L).as("keep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_keep"))
    val pool = per.agg(sum(col("n_docs")).as("n_tot"),
      sum(col("n_keep")).as("k_tot"))
    val nD = col("n_docs").cast("double")
    val p = col("n_keep").cast("double") / nD
    val zz = lit(3.8416)
    val denom = lit(1.0) + zz / nD
    val center = (p + zz / (lit(2.0) * nD)) / denom
    val half = lit(1.96) *
      sqrt(p * (lit(1.0) - p) / nD + zz / (lit(4.0) * nD * nD)) / denom
    per.crossJoin(broadcast(pool))
      .withColumn("keep_rate", p)
      .withColumn("pool_rate",
        col("k_tot").cast("double") / col("n_tot").cast("double"))
      .withColumn("wilson_lo", center - half)
      .withColumn("wilson_hi", center + half)
      .withColumn("flagged",
        col("wilson_hi") < col("pool_rate") ||
          col("wilson_lo") > col("pool_rate"))
      .select("source", "n_docs", "n_keep", "keep_rate", "pool_rate",
        "wilson_lo", "wilson_hi", "flagged")
  }

  /** Per-term burstiness: the variance-to-mean ratio (index of
    * dispersion) of a term's per-document counts — zeros included — and
    * the Church–Gale adaptation probability P(c ≥ 2 | c ≥ 1). Under a
    * Poisson (non-bursty) occurrence model dispersion ≈ 1; content
    * words cluster (dispersion ≫ 1) while function words spread evenly
    * — the signal that separates topical from structural vocabulary
    * without any language resource. Restricted to terms with document
    * frequency ≥ `minDf` so the ratio has support.
    *
    * Exactness: df/cf/Σc²/df₂ are exact integers (zeros contribute 0
    * to every sum, so "zeros included" costs nothing); the three
    * output doubles are fixed-shape divisions of exact-int-valued
    * doubles, reproduced verbatim in the oracle.
    *
    * Scale shape: explode → (term, doc) count agg → term-keyed fold,
    * both with map-side partials; the corpus doc count joins back as a
    * one-row broadcast scalar (BNLJ by construction — whitelisted).
    */
  def termBurstiness(docs: DataFrame, minDf: Long = 25L): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("t"), col("doc_id")).agg(count(lit(1)).as("c"))
    val perTerm = perDoc.groupBy("t")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"),
        sum(col("c") * col("c")).as("sq"),
        sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("df2"))
      .filter(col("df") >= minDf)
    val total = docs.agg(count(lit(1)).as("n_docs"))
    perTerm.crossJoin(broadcast(total))
      .withColumn("mean_rate",
        col("cf").cast("double") / col("n_docs").cast("double"))
      .withColumn("msq",
        col("sq").cast("double") / col("n_docs").cast("double"))
      .withColumn("dispersion",
        (col("msq") - col("mean_rate") * col("mean_rate")) /
          col("mean_rate"))
      .withColumn("adaptation",
        col("df2").cast("double") / col("df").cast("double"))
      .select("t", "df", "cf", "mean_rate", "dispersion", "adaptation")
  }

  /** The n23 PII patterns as one per-row hit predicate (any category
    * matches) — the [[Curation.releaseHealthcheck]] signal, shared so
    * the Fleiss rater below and the healthcheck cannot drift.
    */
  private[graft] def piiHitCol: Column =
    PiiPatterns
      .map { case (_, pat, _) =>
        size(regexp_extract_all(col("text"), lit(pat), lit(0))) > 0
      }
      .reduce(_ || _)

  /** Fleiss' kappa across the THREE per-row document gates — the
    * heuristic quality gate ([[qualityOkCol]]), the Gopher rules
    * ([[gopherOkCol]]), and PII-freedom (no [[PiiPatterns]] hit) — per
    * source. n98 answers "do gates A and B agree"; this answers
    * whether the whole gate PANEL is measuring one underlying quality
    * axis (κ high) or orthogonal defects (κ near 0), per source, which
    * is what decides if a cheaper single-gate pipeline would keep the
    * same corpus. Binary categories, m = 3 raters:
    * P_i = (k(k−1) + (3−k)(2−k))/6 for k = keep votes, so
    * ΣP_i·6 = Σ(k(k−1)+(3−k)(2−k)) stays an exact integer;
    * P̄ = that/(6n), p = Σk/(3n), P_e = p² + (1−p)², and
    * κ = (P̄−P_e)/(1−P_e) with the degenerate P_e = 1 margin (all
    * three gates constant within a source) yielding NULL, not 0/0.
    *
    * NULL/empty text lands deterministically in the not-kept cell of
    * every rater (the same COALESCE contract as the gates themselves;
    * PII-freedom of a NULL text is coalesced false).
    *
    * Scale shape: ONE scan computing all three predicates in the same
    * projection, one source-keyed aggregation of two integer sums; the
    * kappa arithmetic is column math on the S-row result.
    */
  def gateFleiss(docs: DataFrame): DataFrame = {
    val k = qualityOkCol.cast("int") + gopherOkCol.cast("int") +
      coalesce(!piiHitCol, lit(false)).cast("int")
    docs.select(col("source"), k.cast("long").as("k"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("k")).as("keep_votes"),
        sum(col("k") * (col("k") - lit(1L)) +
          (lit(3L) - col("k")) * (lit(2L) - col("k"))).as("agree_pairs6"))
      .withColumn("pbar",
        col("agree_pairs6").cast("double") /
          (lit(6.0) * col("n_docs").cast("double")))
      .withColumn("p_keep",
        col("keep_votes").cast("double") /
          (lit(3.0) * col("n_docs").cast("double")))
      .withColumn("pe",
        col("p_keep") * col("p_keep") +
          (lit(1.0) - col("p_keep")) * (lit(1.0) - col("p_keep")))
      .withColumn("kappa",
        when(col("pe") === 1.0, lit(null))
          .otherwise((col("pbar") - col("pe")) / (lit(1.0) - col("pe"))))
      .select("source", "n_docs", "keep_votes", "agree_pairs6",
        "pbar", "p_keep", "pe", "kappa")
  }

  /** Pairwise source affinity: term-count-vector cosine and
    * vocabulary Jaccard for every source pair that shares at least one
    * term — "which sources are textually redundant", the corpus-mix
    * diagnostic that says whether two scrapes buy one distribution
    * twice. Deliberately log-free (the registry's TF-IDF precedent):
    * dot products and intersection sizes are exact integer sums, the
    * norms are sqrt of exact ints (correctly rounded in both engines),
    * so cosine and Jaccard are fixed-shape divisions — engine-exact
    * with no DECIMAL routing needed.
    *
    * Pairs with zero shared vocabulary drop out (inner join on term) —
    * declared semantics, identical in the oracle; with natural text
    * every pair shares stopwords, so the output is the full S·(S−1)/2
    * triangle in practice.
    *
    * Scale shape: explode → (source, term) count agg with map-side
    * partials (S·V rows); the pair pass is a term-keyed equi-self-join
    * whose per-term fanout is bounded by S² (S = #sources, a handful),
    * then an (src_a, src_b)-keyed agg of two integer sums; per-source
    * norms re-aggregate the same S·V frame and broadcast-join onto the
    * S² pair rows. No corpus² anywhere.
    */
  def sourceAffinity(docs: DataFrame): DataFrame = {
    // the (source, term) count frame feeds BOTH self-join sides AND
    // the norms, and the executed plan WITHOUT materialization scans+
    // explodes the corpus 4× with zero exchange reuse (verified on the
    // post-execution adaptive plan: ReusedExchange count 0, scan count
    // 4 — AQE does not canonicalize these subtrees together). At
    // corpus scale four explode passes over 100 TB lose categorically
    // to one spillable materialization, so the jaccardPairs
    // shingle-table policy applies: persist MEMORY_AND_DISK. Measured
    // at sf0.1 the persist is also (slightly) faster cold: 1.11 s
    // min-of-5 vs 1.36 s min-of-3 unpersisted.
    val tc = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = tc.groupBy("source")
      .agg(sum(col("c") * col("c")).as("sq"), count(lit(1)).as("v"))
    val a = tc.select(col("source").as("src_a"), col("t"),
      col("c").as("ca"))
    val b = tc.select(col("source").as("src_b"), col("t"),
      col("c").as("cb"))
    val pairs = a.join(b, Seq("t"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(col("ca") * col("cb")).as("dot"),
        count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(norms.select(col("source").as("src_a"),
        col("sq").as("sq_a"), col("v").as("v_a"))), Seq("src_a"))
      .join(broadcast(norms.select(col("source").as("src_b"),
        col("sq").as("sq_b"), col("v").as("v_b"))), Seq("src_b"))
      .withColumn("cosine",
        col("dot").cast("double") /
          (sqrt(col("sq_a").cast("double")) *
            sqrt(col("sq_b").cast("double"))))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("v_a") + col("v_b") - col("n_shared")).cast("double"))
      .select("src_a", "src_b", "n_shared", "dot", "v_a", "v_b",
        "cosine", "jaccard")
  }

  /** Per-source signature terms: the top-k terms by the add-one odds
    * ratio (tf_in_source + 1)/(tf_elsewhere + 1), tf ≥ minTf — "what
    * does this feed talk about that the rest of the corpus doesn't",
    * the one-page per-source content summary. RATIONAL by design (the
    * TF-IDF precedent — no log-odds, so every score is a fixed-shape
    * division of exact integers and the ranking is engine-exact);
    * ties break lexicographically, so the top-k is deterministic at
    * any parallelism.
    *
    * Scale shape: one (source, term) count agg and one term-keyed
    * total agg (both map-side partial) joined on term; the top-k
    * window partitions BY SOURCE — key-parallel, never global.
    */
  def sourceSignatureTerms(
      docs: DataFrame, k: Int = 10, minTf: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shared by the per-term total AND the scored join — persisted for
    // the same reason as [[sourceAffinity]]'s tc: the executed plan
    // otherwise re-explodes the corpus per consumer (no AQE exchange
    // reuse, measured), and at scale one spillable materialization
    // beats repeated corpus passes
    val tc = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = tc.groupBy("t").agg(sum(col("tf")).as("tf_all"))
    val scored = tc.join(tot, "t")
      .filter(col("tf") >= minTf)
      .withColumn("tf_rest", col("tf_all") - col("tf"))
      .withColumn("odds",
        (col("tf") + lit(1L)).cast("double") /
          (col("tf_rest") + lit(1L)).cast("double"))
    val w = Window.partitionBy("source").orderBy(desc("odds"), asc("t"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("source", "rank", "t", "tf", "tf_rest", "odds")
  }

  /** Per-source token-length distribution card: exact order
    * statistics (p50/p90/p99 as the VALUE at rank ⌈p·n/100⌉, clamped
    * ≥ 1 — the winsorizeBounds convention, not interpolated
    * percentiles, so they are tie-stable and engine-exact), plus max
    * and the exact mean — the batch-sizing input a training pipeline
    * reads before packing sequences. Ordering by the value alone is
    * enough: row_number breaks ties arbitrarily but the value at a
    * given rank of a sorted multiset is permutation-invariant.
    *
    * Scale shape: one scan computing the token count per row, one
    * window partitioned BY SOURCE (rank + per-partition count over
    * the same shuffle), one per-source aggregation — key-parallel.
    */
  def lengthPercentiles(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL text ⇒ NULL n_tok is OUT of the order statistics, explicitly:
    // Spark windows default NULLS FIRST while DuckDB defaults NULLS
    // LAST, so an unfiltered NULL row would shift every rank and
    // silently diverge operator from oracle (the oracle pins the same
    // filter). A doc with no tokenizable text has no length.
    val base = docs.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok").isNotNull)
    val w = Window.partitionBy(col("source")).orderBy(asc("n_tok"))
    val ranked = base
      .withColumn("rn", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("source"))))
    def kAt(p: Int) =
      greatest(lit(1L), expr(s"(n * $p + 99) DIV 100"))
    ranked.groupBy("source")
      .agg(max(col("n")).as("n_docs"),
        min(when(col("rn") === kAt(50), col("n_tok"))).as("p50_tok"),
        min(when(col("rn") === kAt(90), col("n_tok"))).as("p90_tok"),
        min(when(col("rn") === kAt(99), col("n_tok"))).as("p99_tok"),
        max(col("n_tok")).as("max_tok"),
        (sum(col("n_tok")).cast("double") /
          count(lit(1)).cast("double")).as("mean_tok"))
  }

  /** The mergeable-sketch companion of [[lengthPercentiles]]: the same
    * per-source p50/p90/p99 card via `approx_percentile`
    * (Greenwald–Khanna quantile summaries) instead of exact ranks.
    *
    * The trade, stated for 100 TB: the exact card pays one window sort
    * PER KEY over every row (a full per-source shuffle+sort of the
    * corpus — fine when sources are many and each fits a partition,
    * the n114 regime); the sketch is a HASH AGGREGATE — per-partition
    * summaries of bounded size (O(accuracy) per key) merged
    * associatively map-side, so no row ever shuffles, only sketches
    * do. At a million-row source the sort moves ~8 MB/key across the
    * wire; the sketch moves ~80 kB/key regardless of source size.
    *
    * The cost is exactness: GK guarantees rank error ≤ n/accuracy
    * (here ≤ 0.01 % of the rows per key), and the returned value is
    * some DATA value within that rank band — not cross-engine
    * bit-stable (DuckDB's approx_quantile is t-digest; even two Spark
    * runs can differ under repartitioning). So this registers
    * rows-only (the q30 approx_count_distinct pattern, pinned by
    * RegistryInvariantsSpec), and TextAnalysisSketchSpec pins the
    * rank-error bound against the exact [[lengthPercentiles]] values
    * instead of a hash oracle. NULL lengths are out of the
    * distribution (the [[lengthPercentiles]] convention — NULLs never
    * enter the sketch on either engine).
    */
  def lengthPercentilesSketch(docs: DataFrame,
      accuracy: Int = 10000): DataFrame = {
    val base = docs.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok").isNotNull)
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        percentile_approx(col("n_tok"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("pcts"),
        max(col("n_tok")).as("max_tok"))
      .select(col("source"), col("n_docs"),
        col("pcts")(0).as("p50_tok"),
        col("pcts")(1).as("p90_tok"),
        col("pcts")(2).as("p99_tok"),
        col("max_tok"))
  }

  /** Per-source total variation distance between the source's
    * token-length-bin distribution and the corpus-wide one — the
    * mixture-shape card that says WHICH feeds are length-outliers
    * (a source of tweets in a corpus of articles reads TVD ≈ 1):
    * TVD = ½ Σ_bins |c_s/n_s − c_a/n_a|. Complements [[lengthPercentiles]]
    * (point statistics) with a whole-distribution distance, and n110's
    * cosine/Jaccard affinity (CONTENT overlap) with a SHAPE distance.
    *
    * Exactness: the absolute difference is kept in cross-multiplied
    * integer form, |c_s·n_a − c_a·n_s| / (n_s·n_a) — the per-bin
    * numerators sum EXACTLY in DECIMAL(38,0), and the only doubles are
    * one final division's fixed shape, so the statistic is
    * engine-exact with no decimal-routing of per-bin quotients.
    * NULL-length docs are out of the distribution (the
    * [[lengthPercentiles]] convention).
    *
    * Scale shape: ONE corpus scan into a (source, bin) hash aggregate
    * with map-side partials; everything after runs on the S·B-sized
    * count frame (persisted — it feeds the corpus totals, the source
    * totals, and the dense grid join; without the persist each
    * consumer would re-scan the corpus, the n110 diamond). The dense
    * grid is sources × corpus bins — model-sized, broadcast — so bins
    * a source never hit still contribute their |0 − c_a·n_s| mass.
    * Output: (source, n_docs, n_bins, tvd).
    */
  def sourceLengthTvd(docs: DataFrame, binWidth: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    val base = docs.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok").isNotNull)
      .select(col("source"), expr(s"n_tok DIV $binWidth").as("bin"))
    val srcBin = base.groupBy("source", "bin")
      .agg(count(lit(1)).as("c_s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusBin = srcBin.groupBy("bin").agg(sum(col("c_s")).as("c_a"))
    val srcTot = srcBin.groupBy("source").agg(sum(col("c_s")).as("n_s"))
    val corpusTot = corpusBin.groupBy().agg(sum(col("c_a")).as("n_a"))
    val grid = srcTot
      .crossJoin(broadcast(corpusBin))
      .crossJoin(broadcast(corpusTot))
      .join(srcBin, Seq("source", "bin"), "left")
      .withColumn("c_s", coalesce(col("c_s"), lit(0L)))
    // DECIMAL(18,0) × DECIMAL(18,0) → 37 digits: wide enough for
    // count products at 100 TB (counts ≤ ~1e12 → products ≤ 1e24) and
    // the widest multiply BOTH engines accept (DuckDB binds decimal
    // multiplication only up to combined width 38)
    val term = abs(
      col("c_s").cast(DecimalType(18, 0)) * col("n_a").cast(DecimalType(18, 0))
        - col("c_a").cast(DecimalType(18, 0)) * col("n_s").cast(DecimalType(18, 0)))
    grid.groupBy(col("source"), col("n_s"), col("n_a"))
      .agg(count(lit(1)).as("n_bins"), sum(term).as("num"))
      .withColumn("tvd", col("num").cast("double") /
        (lit(2.0) * col("n_s").cast("double") * col("n_a").cast("double")))
      .select(col("source"), col("n_s").as("n_docs"), col("n_bins"),
        col("tvd"))
  }

  /** Per-source vocabulary richness: observed vocabulary, Chao1
    * species estimate, and Good-Turing coverage — "how much vocabulary
    * has this source NOT shown yet", the growth diagnostic that says
    * whether scraping more of a source buys new tokens or repeats.
    * Chao1 (bias-corrected): V + f1·(f1−1)/(2·(f2+1)); coverage:
    * 1 − f1/N. Both from exact integer term counts; the two final
    * divisions are fixed-shape doubles.
    *
    * Scale shape: explode → (source, term) hash agg with map-side
    * partials (vocab-bounded output), then a source-keyed fold of the
    * frequency-of-frequencies — no window, no global order.
    */
  def vocabRichness(docs: DataFrame): DataFrame = {
    val termCounts = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    termCounts.groupBy("source")
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1",
        col("vocab_obs").cast("double") +
          (col("f1") * (col("f1") - lit(1L))).cast("double") /
          (lit(2.0) * (col("f2") + lit(1L)).cast("double")))
      .withColumn("coverage",
        lit(1.0) - col("f1").cast("double") /
          col("n_tokens").cast("double"))
  }

  /** Zipf rank-octave spectrum — the corpus's frequency-rank shape as
    * an EXACT card: the global term-frequency table ranked by
    * (count DESC, term), ranks bucketed into octaves
    * o = ⌊log₂(rank)⌋ — computed as the binary-string length of the
    * rank minus one (both engines' `bin()`), never a transcendental —
    * and per octave the term count and token-mass share. Under Zipf
    * s ≈ 1 the mass per octave is near-constant (Σ 1/r over an octave
    * ≈ ln 2), so a head-heavy spectrum (boilerplate/template mass) or
    * a fat tail (OCR noise, concatenation junk) reads directly off the
    * share column — the doubling diagnostic a full log-log regression
    * would need `ln` for (the no-transcendentals policy keeps the fit
    * itself out of the oracle; [[vocabRichness]] carries the tail via
    * f1/f2).
    *
    * Scale shape: one explode → vocab-bounded hash agg with map-side
    * partials; the rank is [[GlobalOrder]]'s range-partitioned
    * distributed sort (never a single-task window); the final
    * aggregation is ≤ ~40 octave rows.
    */
  def zipfOctaves(docs: DataFrame): DataFrame = {
    val tc = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val total = tc.agg(sum(col("c")).as("n_total"))
    GlobalOrder.withGlobalIndexCols(tc, Seq(desc("c"), asc("t")))
      .withColumnRenamed("_global_rank", "rank")
      .withColumn("octave", (length(bin(col("rank"))) - 1).cast("int"))
      .groupBy("octave")
      .agg(min(col("rank")).as("rank_lo"), max(col("rank")).as("rank_hi"),
        count(lit(1)).as("n_terms"), sum(col("c")).as("octave_tokens"))
      .crossJoin(broadcast(total))
      .select(col("octave"), col("rank_lo"), col("rank_hi"), col("n_terms"),
        col("octave_tokens"),
        (col("octave_tokens").cast("double") / col("n_total").cast("double"))
          .as("token_share"))
  }

  /** Tokenizer fertility card, per (source, lang): how many tokens the
    * BPE-ish regex tokenizer ([[TokenPattern]] — the n07 scheme)
    * spends per unit of text, beside the whitespace baseline — the
    * per-corpus-slice compression accounting that decides whether a
    * tokenizer (or a source's script/formatting) is inflating the
    * token budget. One scan into a hash agg of exact BIGINT sums;
    * every ratio divides AFTER the sums, so the card is hash-exact.
    */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    fertilityReportFromCounts(fertilityCounts(docs))

  /** The counting half of [[tokenizerFertility]] — one scan into a
    * hash agg of exact BIGINT sums per (source, lang). Shared with the
    * s41 streaming monitor, where the SAME aggregation runs in update
    * mode (every sum is a monotone integer, so max-per-key over the
    * emitted state is the latest value — the s37/s39 collapse).
    */
  def fertilityCounts(docs: DataFrame): DataFrame = {
    val bpe = size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0)))
    docs
      .select(col("source"), col("lang"),
        length(col("text")).cast("long").as("chars"),
        octet_length(col("text")).cast("long").as("bytes"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        bpe.cast("long").as("bpe"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("n_chars"),
        sum(col("bytes")).as("n_bytes"),
        sum(col("ws")).as("n_ws_tokens"),
        sum(col("bpe")).as("n_bpe_tokens"))
  }

  /** The report half of [[tokenizerFertility]]: every ratio divides
    * AFTER the exact sums (engine-identical IEEE on exact inputs).
    */
  def fertilityReportFromCounts(counts: DataFrame): DataFrame =
    counts
      .select(col("source"), col("lang"), col("n_docs"), col("n_chars"),
        col("n_bytes"), col("n_ws_tokens"), col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") * 100.0 /
          col("n_chars").cast("double")).as("bpe_per_100_chars"),
        (col("n_bpe_tokens").cast("double") /
          col("n_ws_tokens").cast("double")).as("fertility_vs_words"),
        (col("n_bytes").cast("double") /
          col("n_bpe_tokens").cast("double")).as("bytes_per_token"))
}
