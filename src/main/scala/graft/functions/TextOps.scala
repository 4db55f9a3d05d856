package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, language ID, quality scoring, fingerprinting.
  *
  * All are pure `Column` combinators (whole-stage-codegen'd Catalyst
  * expressions — no UDFs), and each has an exact ANSI-SQL twin used as the
  * DuckDB oracle. This follows the reference's open scalar-extension style
  * (`backend-literal->grafter-type` multimethod,
  * /root/reference/grafter.io/src/grafter_2/rdf4j/io.clj:48-56) with a
  * registry of composable column functions instead of a multimethod.
  */
object TextOps {

  /** Portable 4-decimal rounding: floor(x*1e4 + 0.5)/1e4. IEEE-identical in
    * Spark and DuckDB, unlike round() whose tie-breaking differs (Spark
    * rounds the exact decimal expansion, DuckDB rounds in binary).
    */
  def round4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Whitespace token count via pure arithmetic (portable across engines:
    * split() trailing-empty semantics differ, length arithmetic does not).
    */
  def wsTokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", ""))) + 1

  /** BPE-ish token estimate: count of maximal lowercase-alpha runs plus
    * count of digit runs (a cheap proxy for subword segmentation).
    */
  def alphaRunCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+")) + regexp_count(text, lit("[0-9]+"))

  /** Occurrences of a literal marker inside text, by length arithmetic
    * (deterministic, join-free).
    */
  def markerCount(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text,
      java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("int")

  /** N-gram-heuristic language ID: score a handful of high-frequency marker
    * words per language and argmax. Deterministic tie-break by score then
    * fixed language order.
    */
  def langId(text: Column): Column = {
    val en = markerCount(text, " the ") + markerCount(text, " and ")
    val es = markerCount(text, " el ") + markerCount(text, " de ")
    val de = markerCount(text, " der ") + markerCount(text, " und ")
    when(en >= es && en >= de && en > 0, "en")
      .when(es >= de && es > 0, "es")
      .when(de > 0, "de")
      .otherwise("unk")
  }

  /** Quality-score feature block: length, whitespace ratio, mean word
    * length, stopword ratio — the standard cheap filters of a pretraining
    * pipeline. Returns (n_chars, n_words, mean_word_len, stop_ratio,
    * quality) columns to attach via select.
    */
  def nWords(text: Column): Column = wsTokenCount(text)

  def meanWordLen(text: Column): Column =
    round4((length(text) - (wsTokenCount(text) - 1)).cast("double") /
      wsTokenCount(text).cast("double"))

  def stopRatio(text: Column): Column = {
    val stops = markerCount(text, " the ") + markerCount(text, " a ") +
      markerCount(text, " of ") + markerCount(text, " and ")
    round4(stops.cast("double") / wsTokenCount(text).cast("double"))
  }

  def qualityScore(text: Column): Column =
    round4(least(lit(1.0), length(text).cast("double") / lit(400.0)) * lit(0.5)
      + least(lit(1.0), stopRatio(text) * lit(10.0)) * lit(0.3)
      + when(meanWordLen(text).between(3.0, 8.0), lit(0.2)).otherwise(lit(0.0)))

  /** Shingle fingerprint: the min over all w-length character shingles of
    * md5(shingle) — a locality-ish document fingerprint whose SQL twin is
    * exact (md5 is md5 everywhere). `positions` must be
    * sequence(1, n-w+1); callers explode it.
    */
  def shingleAt(text: Column, pos: Column, w: Int): Column =
    md5(text.substr(pos, lit(w)))

  /** Simple whole-prefix fingerprint. */
  def prefixFingerprint(text: Column, prefixLen: Int): Column =
    md5(substring(text, 1, prefixLen))

  /** Within-doc repetition ratio over `w`-char shingles of the first
    * `maxLen` chars: 1 − distinct/total, rounded to 4 decimals — the
    * boilerplate/looping-text signal of a pretraining quality filter
    * (high ratio ⇒ the doc repeats itself). Column-only arithmetic: the
    * shingle positions ride a `sequence` explode at the call site
    * ([[graft.operators.TermStats.repetitionRatio]] packages the
    * explode+aggregate; this is the per-doc formula).
    */
  def repetitionRatioFrom(distinctShingles: Column, totalShingles: Column): Column =
    round4(lit(1.0) - distinctShingles.cast("double") / totalShingles.cast("double"))

  /** Email and URL patterns for scrubbing — deliberately restricted to
    * character classes + bounded quantifiers (no lookaround, no
    * backreferences), the regex subset where Java (Spark) and RE2-style
    * (DuckDB) engines agree exactly, so redaction is oracle-checkable.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
  val UrlPattern = "https?://[^ ]+"

  /** Scrub emails then URLs to fixed placeholder tokens — the PII-hygiene
    * pass a pretraining pipeline runs before anything is retained. Pure
    * regexp_replace: narrow, codegen'd, no UDF.
    */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      UrlPattern, "<URL>")

  /** Redaction-need indicator: counts of matches per category. */
  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(EmailPattern)), regexp_count(text, lit(UrlPattern)))
}
