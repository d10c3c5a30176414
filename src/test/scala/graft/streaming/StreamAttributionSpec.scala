package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StatefulOps.{AttrEvent, AttributionCredit}

/** Streaming session attribution (`flatMapGroupsWithState`): each
  * converting session emits its first-/last-touch credit pair exactly
  * once, only after the watermark passes the session's gap deadline —
  * so late-but-admissible events land in their true position before
  * the conversion, exact parity with the batch q45 operator.
  */
class StreamAttributionSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def got(name: String): Seq[AttributionCredit] = {
    import spark.implicits._
    spark.table(name).as[AttributionCredit].collect().toSeq
      .sortBy(c => (c.user_id, c.session_start.getTime, c.model))
  }

  test("converting, direct, and non-converting sessions credit like the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[AttrEvent]
    val q = StatefulOps.attributionStream(source.toDS())
      .writeStream.format("memory").queryName("attr_basic")
      .outputMode("append").start()
    try {
      source.addData(
        // u1: view -> click -> purchase -> purchase (one credit pair)
        AttrEvent(1L, 1L, "view", ts("2022-03-01T10:00:00Z")),
        AttrEvent(2L, 1L, "click", ts("2022-03-01T10:01:00Z")),
        AttrEvent(3L, 1L, "purchase", ts("2022-03-01T10:02:00Z")),
        AttrEvent(4L, 1L, "purchase", ts("2022-03-01T10:03:00Z")),
        // u2: purchase opens the session -> '(direct)'
        AttrEvent(5L, 2L, "purchase", ts("2022-03-01T10:00:00Z")),
        AttrEvent(6L, 2L, "view", ts("2022-03-01T10:00:30Z")),
        // u3: never converts -> nothing
        AttrEvent(7L, 3L, "view", ts("2022-03-01T10:00:00Z")))
      q.processAllAvailable()
      // push the watermark far past every gap deadline
      source.addData(AttrEvent(99L, 9L, "view", ts("2022-03-01T12:00:00Z")))
      q.processAllAvailable()
      source.addData(AttrEvent(100L, 9L, "view", ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      val out = got("attr_basic").filter(_.user_id <= 3L)
      assert(out === Seq(
        AttributionCredit(1L, "first_touch", "view", ts("2022-03-01T10:00:00Z")),
        AttributionCredit(1L, "last_touch", "click", ts("2022-03-01T10:00:00Z")),
        AttributionCredit(2L, "first_touch", "purchase", ts("2022-03-01T10:00:00Z")),
        AttributionCredit(2L, "last_touch", "(direct)", ts("2022-03-01T10:00:00Z"))))
    } finally q.stop()
  }

  test("late-but-admissible event inserts before the conversion and becomes the last touch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[AttrEvent]
    val q = StatefulOps.attributionStream(source.toDS())
      .writeStream.format("memory").queryName("attr_late")
      .outputMode("append").start()
    try {
      // view at 10:00, purchase at 10:04 arrive first; the click at
      // 10:02 arrives later but inside the watermark — in true order
      // the click is the last touch, not the view
      source.addData(
        AttrEvent(1L, 7L, "view", ts("2022-03-01T10:00:00Z")),
        AttrEvent(3L, 7L, "purchase", ts("2022-03-01T10:04:00Z")))
      q.processAllAvailable()
      source.addData(AttrEvent(2L, 7L, "click", ts("2022-03-01T10:02:00Z")))
      q.processAllAvailable()
      source.addData(AttrEvent(99L, 9L, "view", ts("2022-03-01T12:00:00Z")))
      q.processAllAvailable()
      source.addData(AttrEvent(100L, 9L, "view", ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      val out = got("attr_late").filter(_.user_id == 7L)
      assert(out === Seq(
        AttributionCredit(7L, "first_touch", "view", ts("2022-03-01T10:00:00Z")),
        AttributionCredit(7L, "last_touch", "click", ts("2022-03-01T10:00:00Z"))))
    } finally q.stop()
  }

  test("checkpoint restart: credits emit exactly once, open sessions survive the bounce") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("attr_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("attr_out").toString
    val source = MemoryStream[AttrEvent]
    def start() = StatefulOps.attributionStream(source.toDS())
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", dir)
      .outputMode("append").start()
    val q1 = start()
    try {
      // session 1 converts and finalizes before the bounce
      source.addData(
        AttrEvent(1L, 5L, "view", ts("2022-03-01T10:00:00Z")),
        AttrEvent(2L, 5L, "purchase", ts("2022-03-01T10:01:00Z")))
      source.addData(AttrEvent(50L, 9L, "view", ts("2022-03-01T11:00:00Z")))
      q1.processAllAvailable()
      source.addData(AttrEvent(51L, 9L, "view", ts("2022-03-01T12:00:00Z")))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      // a second session converts only after the restart
      source.addData(
        AttrEvent(3L, 5L, "click", ts("2022-03-01T14:00:00Z")),
        AttrEvent(4L, 5L, "purchase", ts("2022-03-01T14:02:00Z")))
      q2.processAllAvailable()
      source.addData(AttrEvent(52L, 9L, "view", ts("2022-03-01T16:00:00Z")))
      q2.processAllAvailable()
      source.addData(AttrEvent(53L, 9L, "view", ts("2022-03-01T17:00:00Z")))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).as[AttributionCredit]
        .collect().toSeq.filter(_.user_id == 5L)
        .sortBy(c => (c.session_start.getTime, c.model))
      assert(rows === Seq(
        AttributionCredit(5L, "first_touch", "view", ts("2022-03-01T10:00:00Z")),
        AttributionCredit(5L, "last_touch", "view", ts("2022-03-01T10:00:00Z")),
        AttributionCredit(5L, "first_touch", "click", ts("2022-03-01T14:00:00Z")),
        AttributionCredit(5L, "last_touch", "click", ts("2022-03-01T14:00:00Z"))),
        s"restart must resume exactly once, got $rows")
    } finally q2.stop()
  }
}
