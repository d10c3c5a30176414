package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private def enrichedFixture = {
    import spark.implicits._
    Seq(
      ("alpha", "positive", "joy"),
      ("alpha", "negative", "joy"),
      ("alpha", "positive", "fear"),
      ("alpha", null, "anger"), // null sentiment counts as non-positive (<=>)
      ("beta", "negative", "sadness"),
      ("beta", "negative", "sadness")
    ).toDF("topic", "sentiment", "emotion")
  }

  test("hourly aggregate: positivity with null-safe equality + pivot + join") {
    val out = HourlyAggregate.aggregate(enrichedFixture)
      .orderBy("topic_agg").collect()
    assert(out.length === 2)
    val alpha = out.head
    assert(alpha.getAs[String]("topic_agg") === "alpha")
    // 2 positives / 4 rows, null counted as 0 not null
    assert(alpha.getAs[Double]("positivity_rate") === 0.5)
    assert(alpha.getAs[Long]("counts") === 4)
    assert(alpha.getAs[Long]("joy") === 2)
    assert(alpha.getAs[Long]("fear") === 1)
    assert(alpha.getAs[Long]("surprise") === 0) // explicit label, filled 0
    val beta = out(1)
    assert(beta.getAs[Double]("positivity_rate") === 0.0)
    assert(beta.getAs[Long]("sadness") === 2)
  }

  test("aggregate with stampTime appends created_at") {
    val out = HourlyAggregate.aggregate(enrichedFixture, stampTime = true)
    assert(out.columns.contains("created_at"))
    assert(out.select("created_at").distinct().count() === 1)
  }

  test("lexicon sentiment: positive wins ties, negatives flip") {
    import spark.implicits._
    val df = Seq(
      (1, "spark is fast and big"),  // 3 positive hits
      (2, "slow and small and dup"), // 3 negative hits
      (3, "neutral words only here") // 0-0 tie -> positive
    ).toDF("id", "text")
    val got = LexiconSentimentClassifier.annotate(df, "text")
      .orderBy("id").select("sentiment").as[String].collect()
    assert(got === Array("positive", "negative", "positive"))
  }

  test("keyword emotion: first-match keyword order, then length fallback") {
    import spark.implicits._
    val df = Seq(
      (1, "the slow fast mix"),   // slow (anger) checked before fast (joy)
      (2, "a fast one"),          // joy
      (3, "xx")                   // no keyword -> length 2 % 6 = 2 -> joy
    ).toDF("id", "text")
    val got = KeywordEmotionClassifier.annotate(df, "text")
      .orderBy("id").select("emotion").as[String].collect()
    assert(got === Array("anger", "joy", "joy"))
  }

  test("end-to-end serving aggregate invariants on harness data") {
    val agg = graft.operators.ServingQueries.pipelineAggregateQ.run(spark, sf001)
    val labels = KeywordEmotionClassifier.labels
    val bad = agg.filter(
      labels.map(col).reduce(_ + _) =!= col("counts") ||
        col("positivity_rate") < 0 || col("positivity_rate") > 1)
    assert(bad.count() === 0, "emotion counts must sum to group count; rate in [0,1]")
  }
}
