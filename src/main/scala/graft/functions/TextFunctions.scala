package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks for the training-data
  * pipeline operators. Everything here is built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs — so the expressions stay
  * inside whole-stage codegen and the same logic is expressible as the
  * DuckDB oracle SQL.
  */
object TextFunctions {

  /** Whitespace tokens. The corpus is single-space separated; a general
    * engine would split on `\\s+` — kept as a single space for exact
    * oracle parity. */
  def tokens(text: Column): Column = split(text, " ")

  /** Occurrences of `marker` in `s` via length arithmetic — exact
    * integer math, no regex dialect issues. */
  def occurrences(s: Column, marker: String): Column =
    (length(s) - length(replace(s, lit(marker), lit("")))) / marker.length

  /** Language-ID n-gram/stopword heuristic: score each language by
    * stopword-marker hits in the space-padded text, argmax with a fixed
    * priority order, 'und' when nothing matches. Public-knowledge
    * stopword lists. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "),
    "de" -> Seq(" der ", " und ", " die "),
    "zh" -> Seq("的"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    markers.map(m => occurrences(padded, m)).reduce(_ + _)
  }

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> langScore(text, ms) }
    val allZero = scores.map(_._2 === 0).reduce(_ && _)
    // argmax with ties resolved by list order (en > fr > es > de > zh)
    val ranked = scores.zipWithIndex.map { case ((l, s), i) =>
      val laterScores = scores.drop(i + 1).map(_._2)
      val isMax = laterScores.foldLeft(lit(true))((acc, o) => acc && s >= o)
      (l, s, isMax)
    }
    ranked.foldRight(lit(scores.last._1)) { case ((l, _, isMax), elseCol) =>
      when(isMax, lit(l)).otherwise(elseCol)
    } match {
      case argmax => when(allZero, lit("und")).otherwise(argmax)
    }
  }

  val stopwords: Seq[String] = Seq("the", "a", "and", "of")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("long")

  /** Mean token length: non-space chars / token count (double). */
  def avgTokenLength(text: Column): Column =
    length(replace(text, lit(" "), lit(""))).cast("double") / tokenCount(text)

  /** Document quality score in [0,1] from length / token-shape /
    * stopword-ratio heuristics (C4/Gopher-style rule scoring). */
  def qualityScore(text: Column): Column = {
    val nTok    = tokenCount(text)
    val avgLen  = avgTokenLength(text)
    val stopR   = stopwordCount(text).cast("double") / nTok
    val lenOk   = when(nTok >= 10 && nTok <= 1000, lit(0.4)).otherwise(lit(0.0))
    val shapeOk = when(avgLen >= 3.0 && avgLen <= 10.0, lit(0.3)).otherwise(lit(0.0))
    val stopOk  = when(stopR >= 0.01 && stopR <= 0.5, lit(0.3)).otherwise(lit(0.0))
    lenOk + shapeOk + stopOk
  }

  /** Content fingerprint: md5 of the lower-cased text. Deterministic,
    * engine-agnostic (same hex in DuckDB). */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Canonical token-set signature: sorted distinct tokens re-joined —
    * the key for bag-of-words near-dup grouping. */
  def tokenSetSignature(text: Column): Column =
    array_join(array_sort(array_distinct(tokens(text))), " ")
}
