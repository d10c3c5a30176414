package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StatefulOps.{Transition, TypedEvent}

/** Streaming event-type transitions (`flatMapGroupsWithState`):
  * transitions chain in EVENT order (not arrival order) because
  * nothing emits until the watermark finalizes it; the anchor
  * persists across idle gaps so the cross-gap transition is never
  * lost — exact parity with the batch q38 operator.
  */
class StreamTransitionsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def got(name: String): Seq[Transition] = {
    import spark.implicits._
    spark.table(name).as[Transition].collect().toSeq
      .sortBy(t => (t.user_id, t.ts.getTime))
  }

  test("gap stream: exact micro gaps in true event order, late insert included (q49 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.gapStream(source.toDS())
      .writeStream.format("memory").queryName("gaps_basic")
      .outputMode("append").start()
    try {
      // A at 10:00 and C at 10:02 arrive first; B at 10:00:30 arrives
      // later but inside the watermark — true gaps are B: 30 s after A,
      // C: 90 s after B (arrival order would give C: 120 s, B: -90 s)
      source.addData(
        TypedEvent(1L, 7L, "A", ts("2022-03-01T10:00:00Z")),
        TypedEvent(3L, 7L, "C", ts("2022-03-01T10:02:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(2L, 7L, "B", ts("2022-03-01T10:00:30Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(9L, 99L, "Z", ts("2022-03-01T11:00:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(10L, 99L, "Z", ts("2022-03-01T12:00:00Z")))
      q.processAllAvailable()
      val out = spark.table("gaps_basic").as[StatefulOps.EventGap]
        .collect().toSeq.filter(_.user_id == 7L).sortBy(_.ts.getTime)
      assert(out.map(g => (g.event_type, g.gap_us)) ===
        Seq(("B", 30000000L), ("C", 90000000L)))
    } finally q.stop()
  }

  test("late-but-admissible event chains in its true position") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.transitionStream(source.toDS())
      .writeStream.format("memory").queryName("trans_late")
      .outputMode("append").start()
    try {
      // A at 10:00 and C at 10:04 arrive first; B at 10:02 arrives in
      // a later batch (inside the 10-minute watermark). True order is
      // A->B->C; arrival order would wrongly give A->C->B.
      source.addData(
        TypedEvent(1L, 7L, "A", ts("2022-03-01T10:00:00Z")),
        TypedEvent(3L, 7L, "C", ts("2022-03-01T10:04:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(2L, 7L, "B", ts("2022-03-01T10:02:00Z")))
      q.processAllAvailable()
      // push the watermark past everything to finalize
      source.addData(TypedEvent(9L, 99L, "Z", ts("2022-03-01T11:00:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(10L, 99L, "Z", ts("2022-03-01T12:00:00Z")))
      q.processAllAvailable()
      assert(got("trans_late").filter(_.user_id == 7L) === Seq(
        Transition(7L, "A", "B", ts("2022-03-01T10:02:00Z")),
        Transition(7L, "B", "C", ts("2022-03-01T10:04:00Z"))))
    } finally q.stop()
  }

  test("anchor persists across an idle gap; tied timestamps break on event_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.transitionStream(source.toDS())
      .writeStream.format("memory").queryName("trans_anchor")
      .outputMode("append").start()
    try {
      source.addData(
        TypedEvent(1L, 5L, "X", ts("2022-03-01T10:00:00Z")),
        TypedEvent(2L, 5L, "Y", ts("2022-03-01T10:00:00Z"))) // tie -> id orders X,Y
      q.processAllAvailable()
      // watermark passes; X,Y finalize, Y becomes the anchor
      source.addData(TypedEvent(3L, 99L, "Z", ts("2022-03-01T11:00:00Z")))
      q.processAllAvailable()
      // hours later the user returns: the cross-gap transition Y->W
      // must still be counted
      source.addData(TypedEvent(4L, 5L, "W", ts("2022-03-01T14:00:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(5L, 99L, "Z", ts("2022-03-01T15:00:00Z")))
      q.processAllAvailable()
      assert(got("trans_anchor").filter(_.user_id == 5L) === Seq(
        Transition(5L, "X", "Y", ts("2022-03-01T10:00:00Z")),
        Transition(5L, "Y", "W", ts("2022-03-01T14:00:00Z"))))
    } finally q.stop()
  }

  test("finalized transitions match the batch q38 operator on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TypedEvent]
    val q = StatefulOps.transitionStream(source.toDS())
      .writeStream.format("memory").queryName("trans_parity")
      .outputMode("append").start()
    try {
      val events = Seq(
        TypedEvent(1L, 1L, "view", ts("2022-03-01T10:00:00Z")),
        TypedEvent(2L, 1L, "click", ts("2022-03-01T10:01:00Z")),
        TypedEvent(3L, 2L, "view", ts("2022-03-01T10:00:30Z")),
        TypedEvent(4L, 1L, "purchase", ts("2022-03-01T10:03:00Z")),
        TypedEvent(5L, 2L, "click", ts("2022-03-01T10:02:00Z")),
        TypedEvent(6L, 2L, "view", ts("2022-03-01T10:02:00Z"))) // tie with 5
      // two arrival batches, each internally out of order
      source.addData(events(3), events(0), events(4))
      q.processAllAvailable()
      source.addData(events(5), events(1), events(2))
      q.processAllAvailable()
      source.addData(TypedEvent(9L, 99L, "z", ts("2022-03-01T11:00:00Z")))
      q.processAllAvailable()
      source.addData(TypedEvent(10L, 99L, "z", ts("2022-03-01T12:00:00Z")))
      q.processAllAvailable()
      val stream = got("trans_parity").filterNot(_.user_id == 99L)
        .map(t => (t.user_id, t.from_type, t.to_type)).sorted
      val batch = graft.operators.TemporalOps.transitionMatrix(events.toDF())
      // batch emits (from,to,n,p); recover the pair list from the counts
      val batchPairs = batch.collect()
        .flatMap(r => Seq.fill(r.getLong(2).toInt)((r.getString(0), r.getString(1))))
        .sorted
      assert(stream.map(t => (t._2, t._3)).sorted === batchPairs.toSeq,
        s"stream $stream vs batch ${batchPairs.toSeq}")
    } finally q.stop()
  }

  test("restart from checkpoint neither loses nor duplicates transitions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("trans_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("trans_out").toString
    val source = MemoryStream[TypedEvent]
    // memory sink cannot recover a checkpoint; the parquet sink is the
    // production shape and exactly-once across restarts
    def start() = StatefulOps.transitionStream(source.toDS())
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", dir)
      .outputMode("append").start()
    val q1 = start()
    try {
      source.addData(
        TypedEvent(1L, 3L, "A", ts("2022-03-01T10:00:00Z")),
        TypedEvent(2L, 3L, "B", ts("2022-03-01T10:01:00Z")))
      q1.processAllAvailable()
      source.addData(TypedEvent(3L, 99L, "Z", ts("2022-03-01T11:00:00Z")))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      source.addData(TypedEvent(4L, 3L, "C", ts("2022-03-01T11:30:00Z")))
      q2.processAllAvailable()
      source.addData(TypedEvent(5L, 99L, "Z", ts("2022-03-01T13:00:00Z")))
      q2.processAllAvailable()
      val out = spark.read.parquet(outDir).as[Transition]
        .collect().toSeq.filter(_.user_id == 3L).sortBy(_.ts.getTime)
      assert(out === Seq(
        Transition(3L, "A", "B", ts("2022-03-01T10:01:00Z")),
        Transition(3L, "B", "C", ts("2022-03-01T11:30:00Z"))),
        s"restart must resume the chain exactly once, got $out")
    } finally q2.stop()
  }
}
