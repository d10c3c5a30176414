package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StatefulOps.{ClosedSession, SessionEvent}

/** Streaming gap sessionization (`flatMapGroupsWithState` +
  * event-time timeout): closed sessions emit exactly once, idle users
  * evict from state. */
class SessionizeSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def closed(name: String): Seq[ClosedSession] = {
    import spark.implicits._
    spark.table(name).as[ClosedSession].collect().toSeq
  }

  test("an in-batch gap splits and emits the earlier session immediately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_split")
      .outputMode("append").start()
    try {
      source.addData(
        SessionEvent(3L, ts("2022-03-01T10:00:00Z")),
        SessionEvent(3L, ts("2022-03-01T10:05:00Z")),
        SessionEvent(3L, ts("2022-03-01T10:30:00Z"))) // > 10 min after 10:05
      q.processAllAvailable()
      val out = closed("sess_split")
      assert(out === Seq(ClosedSession(3L,
        ts("2022-03-01T10:00:00Z"), ts("2022-03-01T10:05:00Z"), 2L)),
        s"the pre-gap session must close in-batch, got $out")
    } finally q.stop()
  }

  test("idle sessions close via event-time timeout and evict their state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    try {
      source.addData(
        SessionEvent(1L, ts("2022-03-01T10:00:00Z")),
        SessionEvent(1L, ts("2022-03-01T10:05:00Z")),
        SessionEvent(2L, ts("2022-03-01T10:04:00Z")))
      q.processAllAvailable()
      assert(closed("sess_timeout").isEmpty, "nothing may emit while sessions are open")
      val open = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(open === 2L, s"one state row per active user, got $open")

      // push the watermark far past both gap deadlines; the timeout
      // fires on the following trigger
      source.addData(SessionEvent(9L, ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:01:00Z")))
      q.processAllAvailable()

      val out = closed("sess_timeout").sortBy(_.user_id)
      assert(out === Seq(
        ClosedSession(1L, ts("2022-03-01T10:00:00Z"), ts("2022-03-01T10:05:00Z"), 2L),
        ClosedSession(2L, ts("2022-03-01T10:04:00Z"), ts("2022-03-01T10:04:00Z"), 1L)),
        s"both idle sessions must close exactly once, got $out")
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after === 1L,
        s"closed users must leave state (only user 9 stays), got $after")
    } finally q.stop()
  }

  test("a late-but-in-watermark event merges into its session, absorbing start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      source.addData(SessionEvent(5L, ts("2022-03-01T10:05:00Z")))
      q.processAllAvailable()
      // 10:03 is before the session start but inside gap + watermark
      source.addData(SessionEvent(5L, ts("2022-03-01T10:03:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:01:00Z")))
      q.processAllAvailable()
      val out = closed("sess_late").filter(_.user_id == 5L)
      assert(out === Seq(ClosedSession(5L,
        ts("2022-03-01T10:03:00Z"), ts("2022-03-01T10:05:00Z"), 2L)),
        s"late event must extend the session backward, got $out")
    } finally q.stop()
  }
}
