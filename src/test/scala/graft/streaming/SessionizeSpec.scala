package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StatefulOps.{ClosedSession, SessionEvent}

/** Streaming gap sessionization (`flatMapGroupsWithState` +
  * event-time timeout): sessions emit exactly once and ONLY when the
  * watermark has passed their gap deadline; idle users evict from
  * state. */
class SessionizeSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def closed(name: String): Seq[ClosedSession] = {
    import spark.implicits._
    spark.table(name).as[ClosedSession].collect().toSeq
  }

  test("an in-batch gap splits, but the earlier session waits for the watermark") {
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
      // the 10:30 event pushes the watermark to 10:20, past the early
      // session's 10:15 deadline — it emits on the follow-up trigger;
      // the 10:30 session (deadline 10:40) must still be open
      assert(closed("sess_split") === Seq(ClosedSession(3L,
        ts("2022-03-01T10:00:00Z"), ts("2022-03-01T10:05:00Z"), 2L)),
        "exactly the watermark-passed session emits, the open one waits")
      source.addData(SessionEvent(9L, ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:01:00Z")))
      q.processAllAvailable()
      val out = closed("sess_split").filter(_.user_id == 3L).sortBy(_.session_start.getTime)
      assert(out === Seq(
        ClosedSession(3L, ts("2022-03-01T10:00:00Z"), ts("2022-03-01T10:05:00Z"), 2L),
        ClosedSession(3L, ts("2022-03-01T10:30:00Z"), ts("2022-03-01T10:30:00Z"), 1L)),
        s"the in-batch gap must produce exactly two sessions, got $out")
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

  test("a late event bridges two provisional sessions into one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()
    try {
      // 16 minutes apart: two provisional sessions
      source.addData(
        SessionEvent(5L, ts("2022-03-01T10:00:00Z")),
        SessionEvent(5L, ts("2022-03-01T10:16:00Z")))
      q.processAllAvailable()
      // 10:08 is within the gap of BOTH — they must merge into one
      source.addData(SessionEvent(5L, ts("2022-03-01T10:08:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:01:00Z")))
      q.processAllAvailable()
      val out = closed("sess_bridge").filter(_.user_id == 5L)
      assert(out === Seq(ClosedSession(5L,
        ts("2022-03-01T10:00:00Z"), ts("2022-03-01T10:16:00Z"), 3L)),
        s"the bridge event must fuse both sessions, got $out")
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

  test("a far-older late event forms its OWN session, not a merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    // wide lateness so a 15-minutes-early event is still admitted
    val q = StatefulOps.sessionize(source.toDS(), lateness = "30 minutes")
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      source.addData(SessionEvent(6L, ts("2022-03-01T10:20:00Z")))
      q.processAllAvailable()
      // 15 min before the open session: > gap, so a separate session
      source.addData(SessionEvent(6L, ts("2022-03-01T10:05:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:01:00Z")))
      q.processAllAvailable()
      val out = closed("sess_ooo").filter(_.user_id == 6L).sortBy(_.session_start.getTime)
      assert(out === Seq(
        ClosedSession(6L, ts("2022-03-01T10:05:00Z"), ts("2022-03-01T10:05:00Z"), 1L),
        ClosedSession(6L, ts("2022-03-01T10:20:00Z"), ts("2022-03-01T10:20:00Z"), 1L)),
        s"a > gap predecessor must stay its own session, got $out")
    } finally q.stop()
  }

  test("null event times drop instead of killing the query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val q = StatefulOps.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_null")
      .outputMode("append").start()
    try {
      source.addData(
        SessionEvent(7L, null),
        SessionEvent(7L, ts("2022-03-01T10:00:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:00:00Z")))
      q.processAllAvailable()
      source.addData(SessionEvent(9L, ts("2022-03-01T13:01:00Z")))
      q.processAllAvailable()
      val out = closed("sess_null").filter(_.user_id == 7L)
      assert(out === Seq(ClosedSession(7L,
        ts("2022-03-01T10:00:00Z"), ts("2022-03-01T10:00:00Z"), 1L)),
        s"the timed event sessionizes alone, got $out")
    } finally q.stop()
  }
}
