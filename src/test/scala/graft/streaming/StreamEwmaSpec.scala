package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StatefulOps.{HourEwma, TypedEvent}

/** Streaming hourly EWMA (the stream twin of q36): an hour emits its
  * smoothed trend exactly once when the watermark passes its end; the
  * fixed-order addition chain is the batch operator's, so the emitted
  * ewma doubles are bit-identical to `TemporalOps.ewmaTrend`.
  */
class StreamEwmaSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  /** k events of `etype` inside hour `h` of 2022-03-01 (minutes 0..k). */
  private def hourEvents(idBase: Long, etype: String, h: Int, k: Int): Seq[TypedEvent] =
    (0 until k).map(i =>
      TypedEvent(idBase + i, 1L, etype, ts(f"2022-03-01T$h%02d:${i % 50}%02d:30Z")))

  test("stream ewma equals the batch operator bit-for-bit, incl. a missing hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.ewmaStream(source.toDS())
      .writeStream.format("memory").queryName("ewma_parity")
      .outputMode("append").start()
    // hours 0,1,2 then a GAP at hour 3, then 4 and 5: the gap must
    // shorten the lag window (renormalize), not zero-fill
    val fixture =
      hourEvents(100, "a", 0, 4) ++ hourEvents(200, "a", 1, 7) ++
        hourEvents(300, "a", 2, 2) ++ hourEvents(500, "a", 4, 9) ++
        hourEvents(600, "a", 5, 5)
    try {
      fixture.grouped(6).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
      source.addData(TypedEvent(900, 9L, "flush", ts("2022-03-01T08:00:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(901, 9L, "flush", ts("2022-03-01T09:00:00Z")))
      q.processAllAvailable()

      val streamRows = spark.table("ewma_parity").as[HourEwma].collect().toSeq
        .filter(_.event_type == "a")
        .map(r => (r.event_type, r.date_hour, r.n, r.ewma)).sortBy(_._2)
      val batch = graft.operators.TemporalOps.ewmaTrend(
        fixture.toDF().select(col("event_id"), col("user_id"),
          col("event_type"), col("ts")))
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._2)
      assert(streamRows === batch,
        s"stream/batch divergence:\n stream=$streamRows\n batch=$batch")
      // the gap hour renormalizes: hour 4's window is hours {0,1,2}
      // at lags 2,3,4 (hour 3 missing), never a zero-filled lag 1
      assert(streamRows.map(_._2) ===
        Seq("2022-03-01 00:00:00", "2022-03-01 01:00:00", "2022-03-01 02:00:00",
          "2022-03-01 04:00:00", "2022-03-01 05:00:00"))
    } finally q.stop()
  }

  test("late-but-admissible events accumulate into their true hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.ewmaStream(source.toDS())
      .writeStream.format("memory").queryName("ewma_late")
      .outputMode("append").start()
    try {
      source.addData(
        TypedEvent(1, 1L, "a", ts("2022-03-01T10:20:00Z")),
        TypedEvent(2, 1L, "a", ts("2022-03-01T10:40:00Z")))
      q.processAllAvailable()
      // late but inside the 10-minute watermark of 10:40
      source.addData(TypedEvent(3, 1L, "a", ts("2022-03-01T10:35:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(9, 9L, "flush", ts("2022-03-01T12:30:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(10, 9L, "flush", ts("2022-03-01T13:30:00Z")))
      q.processAllAvailable()
      val rows = spark.table("ewma_late").as[HourEwma].collect().toSeq
        .filter(_.event_type == "a")
      assert(rows.map(r => (r.date_hour, r.n, r.ewma)) ===
        Seq(("2022-03-01 10:00:00", 3L, 3.0)),
        s"late event must land in hour 10, got $rows")
    } finally q.stop()
  }
}
