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
}
