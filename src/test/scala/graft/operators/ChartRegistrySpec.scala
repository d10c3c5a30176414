package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChartRegistrySpec extends SparkSpec {

  test("aggregate fixture plants replays and processData drops them keep-first") {
    val agg = ChartRegistry.aggregates(spark, sf001)
    val processed = ChartRegistry.processed(spark, sf001)
    val replayed = agg.filter(minute(col("created_at")) === 10).count()
    assert(replayed > 0, "fixture must contain replayed batches")
    assert(processed.count() === agg.count() - replayed,
      "dedup must keep exactly one batch per (topic, hour)")
    // keep-first: the original (minute 0, lower counts) batch wins
    assert(processed.filter(minute(col("created_at")) === 10).count() === 0)
  }

  test("latest-wins dedup keeps the corrected replay instead") {
    val agg = ChartRegistry.aggregates(spark, sf001)
    val latest = graft.serving.ChartQueries.processData(agg, latestWins = true)
    val replayHours = agg.filter(minute(col("created_at")) === 10)
      .select("topic", "created_at").distinct().count()
    assert(latest.filter(minute(col("created_at")) === 10).count() === replayHours)
  }

  test("share queries are normalized per partition") {
    val processed = ChartRegistry.processed(spark, sf001)
    graft.serving.ChartQueries.emotionShare(processed, "date")
      .groupBy("date").agg(sum("percent").as("s")).collect()
      .foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9))
    graft.serving.ChartQueries.countsTopicPeriod(processed, "date")
      .groupBy("date").agg(sum("share").as("s")).collect()
      .foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9))
  }

  test("boxplot bounds ordered; latest inputs capped at 25") {
    val processed = ChartRegistry.processed(spark, sf001)
    graft.serving.ChartQueries.positivityBoxplot(processed).collect().foreach { r =>
      assert(r.getAs[Double]("whisker_lo") <= r.getAs[Double]("q1") + 1e-9)
      assert(r.getAs[Double]("q1") <= r.getAs[Double]("median"))
      assert(r.getAs[Double]("median") <= r.getAs[Double]("q3"))
      assert(r.getAs[Double]("q3") <= r.getAs[Double]("whisker_hi") + 1e-9)
    }
    assert(graft.serving.ChartQueries.latestInputs(processed).count() <= 25)
  }

  test("boxplot emits a NULL-stat row for a group whose rates are all NULL") {
    import spark.implicits._
    val fixture = Seq(
      ("t1", Some(0.2)), ("t1", Some(0.4)), ("t1", Some(0.6)),
      ("t2", None), ("t2", None)) // all-NULL group must keep its row
      .toDF("topic", "positivity_rate")
    val out = graft.serving.ChartQueries.positivityBoxplot(fixture)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("t1", "t2"))
    val t1 = out("t1") // ranks ceil(p*3): q1=1st, median=2nd, q3=3rd
    assert(t1.getDouble(1) == 0.2 && t1.getDouble(2) == 0.4 && t1.getDouble(3) == 0.6)
    val t2 = out("t2")
    assert((1 to 8).forall(t2.isNullAt), "all stats NULL, row retained")
  }
}
