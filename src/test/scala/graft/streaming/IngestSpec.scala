package graft.streaming

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

// KafkaMsg moved to graft.streaming.IngestBench (main) so the bench
// can drive the same fixture shape.

class IngestSpec extends SparkSpec {

  private def msg(id: Int, topic: String, createdAt: String, text: String): KafkaMsg =
    KafkaMsg(
      key = s"${topic.take(2).toUpperCase}$id".getBytes("UTF-8"),
      value =
        s"""{"data": {"id": "$id", "created_at": "$createdAt", "text": "$text"}}"""
          .getBytes("UTF-8"),
      topic = topic)

  private val fixture = Seq(
    msg(1, "alpha", "2022-03-01T10:15:00Z", "spark is fast"),
    msg(2, "alpha", "2022-03-01T10:45:00Z", "kafka is slow"),
    msg(3, "beta",  "2022-03-01T11:05:00Z", "streams stream"),
    msg(4, "beta",  "2022-03-01T23:59:00Z", "late night"))

  test("parse extracts key/created_at/text/topic + event-time partition cols") {
    import spark.implicits._
    val parsed = TweetIngest.parse(fixture.toDF()).orderBy("key").collect()
    assert(parsed.length === 4)
    val r = parsed.head
    assert(r.getAs[String]("key") === "AL1")
    assert(r.getAs[String]("text") === "spark is fast")
    assert(r.getAs[String]("topic") === "alpha")
    assert(r.getAs[String]("date") === "2022-03-01")
    assert(r.getAs[String]("hour") === "10")
    // late-night row partitions into hour 23 of the same event date
    val late = parsed.find(_.getAs[String]("key") == "BE4").get
    assert(late.getAs[String]("hour") === "23")
  }

  test("streaming: memory source -> parse -> partitioned parquet lake -> pruned read-back") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lake = Files.createTempDirectory("lake").toString
    val ckpt = Files.createTempDirectory("ckpt").toString

    val source = MemoryStream[KafkaMsg]
    source.addData(fixture: _*)
    val q = TweetIngest.startLake(TweetIngest.parse(source.toDF()), lake, ckpt)
    q.processAllAvailable()
    q.stop()

    // lake is hive-partitioned by event-time date/hour
    val dirs = new java.io.File(lake).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.contains("date=2022-03-01"))

    val hour10 = TweetIngest.readHour(spark, lake, "2022-03-01", "10")
    assert(hour10.count() === 2)
    // partition pruning reaches the scan: only the matching directory is read
    val scanned = hour10.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanned.contains("PartitionFilters") &&
      scanned.contains("2022-03-01") && scanned.contains("10"),
      s"scan must carry partition filters, got: $scanned")
    assert(hour10.select("key").orderBy("key").as[String].collect() === Array("AL1", "AL2"))

    // restart with same checkpoint + same data: no duplicates (exactly-once sink)
    val q2 = TweetIngest.startLake(
      TweetIngest.parse(source.toDF()), lake, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(TweetIngest.readHour(spark, lake, "2022-03-01", "10").count() === 2)
  }

  test("streaming: new data after restart lands exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lake = Files.createTempDirectory("lake2").toString
    val ckpt = Files.createTempDirectory("ckpt2").toString

    val source = MemoryStream[KafkaMsg]
    source.addData(fixture.take(2): _*)
    val q = TweetIngest.startLake(TweetIngest.parse(source.toDF()), lake, ckpt)
    q.processAllAvailable(); q.stop()

    source.addData(fixture.drop(2): _*)
    val q2 = TweetIngest.startLake(TweetIngest.parse(source.toDF()), lake, ckpt)
    q2.processAllAvailable(); q2.stop()

    val all = spark.read.schema(TweetIngest.lakeSchema).parquet(lake)
    assert(all.count() === 4)
    assert(all.select("key").distinct().count() === 4)
  }

  test("IngestBench canary writes exactly the deduped row count") {
    // the throughput line is only a regression signal if its OWN
    // output is pinned: 10% planted replays must dedup, nothing else
    val (written, sec) = IngestBench.run(spark, nRows = 3000, batches = 3)
    assert(written === 2700, s"expected 0.9x fed rows, got $written")
    assert(sec > 0.0)
  }

  test("HourlyClock.previousHour handles midnight rollover") {
    assert(HourlyClock.previousHour(LocalDateTime.of(2022, 3, 2, 0, 30)) ===
      ("2022-03-01", "23"))
    assert(HourlyClock.previousHour(LocalDateTime.of(2022, 3, 1, 13, 5)) ===
      ("2022-03-01", "12"))
    assert(HourlyClock.previousHour(LocalDateTime.of(2022, 1, 1, 0, 0)) ===
      ("2021-12-31", "23"))
  }
}
