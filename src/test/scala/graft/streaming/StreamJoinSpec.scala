package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.ParquetAggregateSink

final case class Ev(event_id: Long, user_id: Long, ts: Timestamp)
final case class LakeEv(topic: String, created_at: Timestamp)

/** Stream-stream interval join semantics and the foreachBatch
  * streaming→serving bridge, over MemoryStream fixtures.
  */
class StreamJoinSpec extends SparkSpec {

  private def t(minutes: Long) = new Timestamp(minutes * 60000L)

  test("interval join attributes clicks inside the window, strictly before") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val out = StreamJoins.clickAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      clicks.addData(
        Ev(1L, 7L, t(40)),  // 10 min before -> attributed
        Ev(2L, 7L, t(15)),  // 35 min before -> outside 30-min window
        Ev(3L, 7L, t(50)),  // at the purchase instant -> strict, excluded
        Ev(4L, 7L, t(55)),  // after the purchase -> excluded
        Ev(5L, 9L, t(45)))  // other user -> excluded
      purchases.addData(Ev(100L, 7L, t(50)), Ev(101L, 9L, t(47)))
      out.processAllAvailable()
      val rows = spark.table("attrib")
        .select(col("purchase_id"), col("click_id"), col("gap_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((100L, 1L, 600000000L), (101L, 5L, 120000000L)))
    } finally out.stop()
  }

  test("serving bridge lands closed windows in the aggregate sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bridge").toString
    val sink = new ParquetAggregateSink(s"$dir/agg")
    val src = MemoryStream[LakeEv]
    val q = StreamJoins.servingBridge(
      TweetIngest.windowedTopicCounts(src.toDF()), sink, s"$dir/ckpt").start()
    try {
      src.addData(LakeEv("a", t(5)), LakeEv("a", t(20)), LakeEv("b", t(30)))
      q.processAllAvailable()
      // watermark = max(event) - 2h: push past 01:00 to close hour 0
      src.addData(LakeEv("a", t(200)))
      q.processAllAvailable()
      val served = sink.readBack(spark)
        .select(col("hour_start"), col("topic"), col("counts"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(served == Set((t(0), "a", 2L), (t(0), "b", 1L)))
    } finally q.stop()
  }
}
