package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data curation: language ID (marker
  * n-gram heuristic), quality scoring (length/punct/stopword ratios), token
  * counting (whitespace + a BPE-ish chars/4 estimate), and document
  * fingerprinting (winnowing-style min-hash over character 8-grams). All are
  * single-pass column expressions — no shuffle, fully codegen'd.
  */
object TextAnalysis {

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Marker words per language for the voting heuristic. Order of the CASE
    * chain (en > es > de > fr > zh) breaks score ties deterministically. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Distinct-marker hit count for one language. */
  def markerHits(tokenSet: Column, lang: String): Column =
    size(array_intersect(tokenSet,
      typedLit(langMarkers.toMap.apply(lang))))

  /** Predicted language: argmax of marker hits with fixed tie order. */
  def predictedLang(tokenSet: Column): Column = {
    val s = langMarkers.map { case (l, _) => l -> markerHits(tokenSet, l) }.toMap
    when(s("en") >= s("es") && s("en") >= s("de") && s("en") >= s("fr") &&
      s("en") >= s("zh"), "en")
      .when(s("es") >= s("de") && s("es") >= s("fr") && s("es") >= s("zh"), "es")
      .when(s("de") >= s("fr") && s("de") >= s("zh"), "de")
      .when(s("fr") >= s("zh"), "fr")
      .otherwise("zh")
  }

  /** Punctuation-character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Stopword occurrence count (not distinct). */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  /** BPE-ish token estimate: ⌈chars/4⌉ — the published rule of thumb for
    * byte-pair vocabularies. */
  def bpeEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** Winnowing-style fingerprint: min of md5 over all character 8-grams of
    * the normalized text. Stable under whitespace/case edits elsewhere in
    * the doc; expressible in both engines for the oracle. Native one-pass
    * kernel ([[graft.ops.expr.RollingMinMd5]]) — the expression form
    * (`array_min(transform(sequence(...), i -> md5(substring(norm, i, 8))))`)
    * was O(n²) per document (SQL substring re-scans from the start per
    * position) plus an md5-hex allocation per window, and round 13 measured
    * it as the suite's #1 hotspot once Bench stopped letting count() prune
    * it away. TextAnalysisSpec pins the kernel to the expression form. */
  def fingerprint(norm: Column): Column =
    graft.ops.expr.RollingMinMd5.column(norm)

  /** The pre-round-13 expression form of [[fingerprint]] — kept as the
    * in-JVM cross-check the spec compares the native kernel against. */
  def fingerprintExpr(norm: Column): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(norm) - 7, lit(1))),
      i => md5(substring(norm, i, lit(8)))))
}
