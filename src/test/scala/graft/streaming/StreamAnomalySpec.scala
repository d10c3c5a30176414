package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StatefulOps.{DailyAnomaly, TypedEvent}

/** Streaming daily anomaly (the stream twin of q39): a day's count is
  * emitted with its z-score exactly once, when the watermark passes
  * the day's end; out-of-order arrivals inside a day accumulate in
  * state and are invisible in the output; the trailing ≤7-observed-day
  * baseline matches the batch operator's window exactly.
  */
class StreamAnomalySpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  /** k events of `etype` spread across day `d` (2022-03-0d UTC). */
  private def dayEvents(idBase: Long, etype: String, d: Int, k: Int): Seq[TypedEvent] =
    (0 until k).map(i =>
      TypedEvent(idBase + i, 1L, etype, ts(f"2022-03-0$d%dT0${i % 9}%d:10:00Z")))

  private def got(name: String): Seq[DailyAnomaly] = {
    import spark.implicits._
    spark.table(name).as[DailyAnomaly].collect().toSeq
      .sortBy(a => (a.event_type, a.day))
  }

  test("days finalize once with the batch z; out-of-order within a day accumulates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.anomalyStream(source.toDS())
      .writeStream.format("memory").queryName("anom_basic")
      .outputMode("append").start()
    try {
      // day1: 1 event; day2: 3 events, one arriving LATE (in-watermark)
      source.addData(dayEvents(100, "a", 1, 1): _*)
      source.addData(dayEvents(200, "a", 2, 2): _*)
      q.processAllAvailable()
      source.addData(TypedEvent(299, 1L, "a", ts("2022-03-02T01:05:00Z")))
      q.processAllAvailable()
      // day3: 2 events; day4 spike: 10 events
      source.addData(dayEvents(300, "a", 3, 2): _*)
      source.addData(dayEvents(400, "a", 4, 10): _*)
      q.processAllAvailable()
      // a fifth-day sentinel pushes the watermark past day4's end
      source.addData(TypedEvent(900, 9L, "flush", ts("2022-03-05T12:00:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(901, 9L, "flush", ts("2022-03-06T12:00:00Z")))
      q.processAllAvailable()

      val a = got("anom_basic").filter(_.event_type == "a")
      // batch-identical vector: counts 1,3,2 then spike 10 (see the
      // TemporalVectorSpec q39 fixture — same arithmetic)
      assert(a.map(r => (r.day, r.n, r.base_days)) === Seq(
        ("2022-03-01", 1L, 0L), ("2022-03-02", 3L, 1L),
        ("2022-03-03", 2L, 2L), ("2022-03-04", 10L, 3L)))
      assert(a.map(_.z) === Seq(None, None, Some(0.0),
        Some(24.0 / math.sqrt(6.0))))
      assert(a.map(_.is_anomaly) === Seq(false, false, false, true))
    } finally q.stop()
  }

  test("stream output equals the batch operator on the finalized prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.anomalyStream(source.toDS())
      .writeStream.format("memory").queryName("anom_parity")
      .outputMode("append").start()
    // two types, irregular counts, sparse days (type b skips day 3);
    // fed in timestamp order so cross-type disorder stays inside the
    // 10-minute watermark (a per-type feed would push the watermark
    // past the other type's earlier hours and legitimately drop them)
    val fixture =
      (dayEvents(1000, "a", 1, 4) ++ dayEvents(2000, "b", 1, 2) ++
        dayEvents(1100, "a", 2, 6) ++ dayEvents(2100, "b", 2, 2) ++
        dayEvents(1200, "a", 3, 5) ++
        dayEvents(1300, "a", 4, 9) ++ dayEvents(2300, "b", 4, 8))
        .sortBy(_.ts.getTime)
    try {
      fixture.grouped(7).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
      source.addData(TypedEvent(9000, 9L, "flush", ts("2022-03-06T12:00:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(9001, 9L, "flush", ts("2022-03-07T12:00:00Z")))
      q.processAllAvailable()

      val streamRows = got("anom_parity")
        .filter(r => r.event_type == "a" || r.event_type == "b")
        .map(r => (r.event_type, r.day, r.n, r.base_days, r.z, r.is_anomaly))
      val batch = graft.operators.TemporalOps.dailyAnomaly(
        fixture.toDF().select(col("event_id"), col("user_id"),
          col("event_type"), col("ts")))
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
        .sortBy(t => (t._1, t._2))
      assert(streamRows === batch,
        s"stream/batch divergence:\n stream=$streamRows\n batch=$batch")
    } finally q.stop()
  }

  test("restart from checkpoint neither loses nor duplicates day rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("anom_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("anom_out").toString
    val source = MemoryStream[TypedEvent]
    def start() = StatefulOps.anomalyStream(source.toDS())
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", dir)
      .outputMode("append").start()
    val q1 = start()
    try {
      source.addData(dayEvents(100, "a", 1, 2): _*)
      source.addData(dayEvents(200, "a", 2, 5): _*)
      q1.processAllAvailable()
      // push the watermark just past day2's end (03-03T00:05 - 10 min
      // lateness) WITHOUT overrunning day3's own events
      source.addData(TypedEvent(900, 9L, "flush", ts("2022-03-03T00:15:00Z")))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      source.addData(dayEvents(300, "a", 3, 4): _*)
      q2.processAllAvailable()
      source.addData(TypedEvent(901, 9L, "flush", ts("2022-03-05T12:00:00Z")))
      q2.processAllAvailable()
      val out = spark.read.parquet(outDir).as[DailyAnomaly]
        .collect().toSeq.filter(_.event_type == "a").sortBy(_.day)
      assert(out.map(r => (r.day, r.n, r.base_days)) === Seq(
        ("2022-03-01", 2L, 0L), ("2022-03-02", 5L, 1L), ("2022-03-03", 4L, 2L)),
        s"restart must resume exactly once, got $out")
    } finally q2.stop()
  }
}
