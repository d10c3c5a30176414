package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StatefulOps.{HeavyHitter, SsCounter, TypedEvent}

/** Streaming daily heavy hitters (the bounded-state twin of q44):
  * each (type, day)'s top-k users emit exactly once when the
  * watermark passes the day's end; a day that stays under the sketch
  * capacity is EXACT (err 0, batch parity); an over-capacity day
  * emits SpaceSaving estimates whose (est, err, guaranteed) contract
  * is pinned here and property-tested in PropertySpec.
  */
class StreamHeavyHitterSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  /** `k` events for `user` of type `etype` inside day `2022-03-0d`.
    * Stamps stay inside one 9-minute window so ANY arrival order
    * across batches remains admissible under the default 10-minute
    * watermark (hour-scale spreads would let an earlier batch's
    * watermark drop a later batch's rows as late). */
  private def userEvents(
      idBase: Long, etype: String, d: Int, user: Long, k: Int): Seq[TypedEvent] =
    (0 until k).map(i =>
      TypedEvent(idBase + i, user, etype, ts(f"2022-03-0$d%dT08:0${i % 9}%d:15Z")))

  test("under-capacity days emit exact batch-identical top-k, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.heavyHitterStream(source.toDS())
      .writeStream.format("memory").queryName("hh_exact")
      .outputMode("append").start()
    val fixture =
      userEvents(100, "a", 1, 7L, 5) ++ userEvents(200, "a", 1, 8L, 3) ++
        userEvents(300, "a", 1, 9L, 5) ++ // ties 7 at count 5 -> user id breaks
        userEvents(400, "b", 1, 7L, 2) ++
        userEvents(500, "a", 2, 8L, 4)
    try {
      // day 1 arrives split across batches and out of order within the day
      source.addData(fixture.slice(0, 6): _*)
      q.processAllAvailable()
      source.addData(fixture.slice(6, 15): _*)
      q.processAllAvailable()
      source.addData(fixture.drop(15): _*)
      q.processAllAvailable()
      // flush: watermark beyond day 2
      source.addData(TypedEvent(900, 99L, "flush", ts("2022-03-04T00:30:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(901, 99L, "flush", ts("2022-03-05T00:30:00Z")))
      q.processAllAvailable()

      val got = spark.table("hh_exact").as[HeavyHitter].collect().toSeq
        .filter(h => h.event_type == "a" || h.event_type == "b")
        .sortBy(h => (h.event_type, h.day, h.rank))
      // every row exact and guaranteed (all days under the 32 cap)
      assert(got.nonEmpty && got.forall(h => h.err == 0L && h.guaranteed))
      // batch parity on the finalized days: same (type, day, rank, user, count)
      val batch = graft.operators.TemporalOps.dailyTopUsers(
        fixture.toDF().select(col("event_type"), col("ts"), col("user_id")))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
      assert(got.map(h => (h.event_type, h.day, h.rank, h.user_id, h.est)) === batch)
      // the tie at count 5 broke to the smaller user id
      val a1 = got.filter(h => h.event_type == "a" && h.day == "2022-03-01")
      assert(a1.map(h => (h.rank, h.user_id, h.est)) ===
        Seq((1L, 7L, 5L), (2L, 9L, 5L), (3L, 8L, 3L)))
    } finally q.stop()
  }

  test("over-capacity day: estimates bound truth, a dominant hitter is guaranteed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    // tiny sketch to force eviction: cap 4, emit top 3
    val q = StatefulOps.heavyHitterStream(source.toDS(), cap = 4, k = 3)
      .writeStream.format("memory").queryName("hh_over")
      .outputMode("append").start()
    // 10 distinct users; user 1 dominates with 12 of 21 events
    val noise = (2L to 10L).flatMap(u =>
      userEvents(1000 + u * 10, "a", 1, u, 1))
    val heavy = userEvents(2000, "a", 1, 1L, 12)
    try {
      source.addData((noise ++ heavy): _*)
      q.processAllAvailable()
      source.addData(TypedEvent(3000, 99L, "flush", ts("2022-03-03T00:30:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(3001, 99L, "flush", ts("2022-03-04T00:30:00Z")))
      q.processAllAvailable()

      val got = spark.table("hh_over").as[HeavyHitter].collect().toSeq
        .filter(_.event_type == "a")
      assert(got.size == 3)
      val truth = Map(1L -> 12L) ++ (2L to 10L).map(_ -> 1L).toMap
      got.foreach { h =>
        val t = truth(h.user_id)
        assert(h.est - h.err <= t && t <= h.est,
          s"user ${h.user_id}: true $t outside [${h.est - h.err}, ${h.est}]")
      }
      // the dominant user (share 12/21 >> 1/4) is rank 1 and guaranteed
      val top = got.find(_.rank == 1L).get
      assert(top.user_id == 1L && top.guaranteed)
    } finally q.stop()
  }

  test("checkpoint restart: no re-emission, pending days survive the bounce") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hh_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("hh_out").toString
    val source = MemoryStream[TypedEvent]
    def start() = StatefulOps.heavyHitterStream(source.toDS())
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", dir)
      .outputMode("append").start()
    val q1 = start()
    try {
      source.addData(userEvents(100, "a", 1, 7L, 4): _*)
      source.addData(TypedEvent(200, 9L, "flush", ts("2022-03-03T00:30:00Z")))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      // day 2 arrives only after the bounce; the second flush finalizes it
      source.addData(userEvents(300, "a", 3, 8L, 2): _*)
      q2.processAllAvailable()
      source.addData(TypedEvent(201, 9L, "flush", ts("2022-03-05T00:30:00Z")))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).as[HeavyHitter]
        .collect().toSeq.filter(_.event_type == "a").sortBy(_.day)
      assert(rows.map(h => (h.day, h.rank, h.user_id, h.est)) ===
        Seq(("2022-03-01", 1L, 7L, 4L), ("2022-03-03", 1L, 8L, 2L)),
        s"restart must resume exactly once, got $rows")
    } finally q2.stop()
  }
}
