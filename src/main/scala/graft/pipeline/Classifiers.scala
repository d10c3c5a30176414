package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text classification stage — the engine's replacement for the
  * reference's Spark NLP pretrained pipelines (SURVEY.md §2.10 U1/U2:
  * sentiment via `analyze_sentimentdl_use_twitter`, emotion via
  * `distilbert_sequence_classifier_emotion`).
  *
  * Pretrained weights aren't public-knowledge-reproducible, so the
  * default implementations are deterministic lexicon/keyword scorers
  * with the same output contract (`annotate: df[text] → df[text+label]`,
  * same label vocabularies). They are pure Column expressions — codegen
  * friendly, no UDFs, trivially distributed. A real model (e.g. Spark
  * NLP's Scala artifacts) can be dropped in behind the same trait.
  */
trait TextClassifier {
  /** Name of the label column this classifier appends. */
  def outputCol: String
  /** Append the label column derived from `textCol`. */
  def annotate(df: DataFrame, textCol: String): DataFrame
}

/** Binary sentiment from public-style positive/negative lexicons:
  * label = positive iff positive hits ≥ negative hits. */
object LexiconSentimentClassifier extends TextClassifier {
  val labels: Seq[String] = Seq("positive", "negative")
  val positiveLexicon: Seq[String] = Seq("good", "great", "fast", "love", "win", "best", "big", "value", "spark")
  val negativeLexicon: Seq[String] = Seq("bad", "terrible", "slow", "worst", "hate", "small", "dup")

  override val outputCol = "sentiment"

  def lexiconHits(text: Column, lexicon: Seq[String]): Column =
    size(filter(split(text, " "), t => t.isin(lexicon: _*)))

  def sentiment(text: Column): Column =
    when(lexiconHits(text, positiveLexicon) >= lexiconHits(text, negativeLexicon), "positive")
      .otherwise("negative")

  override def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(outputCol, sentiment(col(textCol)))
}

/** Six-class emotion via first-match keyword rules with a deterministic
  * length-hash fallback (same label set as the reference's DistilBERT
  * classifier, streamlit/main.py:100-101). */
object KeywordEmotionClassifier extends TextClassifier {
  val labels: Seq[String] = Seq("anger", "fear", "joy", "love", "sadness", "surprise")
  /** emotion -> trigger keyword, checked in label order. */
  val keywords: Seq[(String, String)] = Seq(
    "anger" -> "slow", "fear" -> "filter", "joy" -> "fast",
    "love" -> "value", "sadness" -> "dup", "surprise" -> "spark")

  override val outputCol = "emotion"

  def emotion(text: Column, nChars: Column): Column = {
    val fallback = labels.zipWithIndex.tail.foldLeft(
      when(nChars % 6 === 0, labels.head)) { case (acc, (l, i)) =>
      acc.when(nChars % 6 === i, l)
    }
    keywords.foldRight(fallback: Column) { case ((label, kw), rest) =>
      when(text.contains(kw), label).otherwise(rest)
    }
  }

  override def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(outputCol, emotion(col(textCol), length(col(textCol))))
}
