package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
  * — the one Structured Streaming surface the built-in operators
  * (windowed aggs, watermark dedup) don't cover. Running per-topic
  * ingest statistics: total rows seen and the latest event time, one
  * updated row per topic per micro-batch.
  *
  * State is O(|topics|) — bounded by key cardinality, not stream
  * length, so no timeout-based eviction is needed here (an unbounded
  * key domain would use GroupStateTimeout.EventTimeTimeout and drop
  * idle keys on expiry instead of NoTimeout).
  */
object StatefulOps {

  // lastSeen is Option: a malformed tweet parses to null created_at and
  // a sentinel Timestamp(Long.MinValue) would overflow the encoder's
  // millis->micros conversion (multiplyExact) and kill the whole query
  final case class TopicState(count: Long, lastSeen: Option[Timestamp])
  final case class TopicStats(topic: String, count: Long, lastSeen: Option[Timestamp])

  // --------------------------------------------------------------
  // Streaming sessionization (flatMapGroupsWithState + event-time
  // timeout)
  // --------------------------------------------------------------

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  /** Open-session state: O(1) per user regardless of session length. */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** Streaming gap sessionization — the streaming twin of the batch
    * gaps-and-islands kernel (q23/q34, 10-minute inactivity gap): a
    * user's session closes when event time goes quiet past the gap,
    * and the CLOSED session is emitted exactly once (append mode).
    *
    * This is the `flatMapGroupsWithState` shape the built-in operators
    * can't express: `session_window` aggregation emits fixed
    * aggregates, while this keeps arbitrary per-session state and
    * decides eviction itself. Scale contract: state is one
    * [[OpenSession]] per ACTIVE user (three longs — idle users are
    * evicted by `EventTimeTimeout` when the watermark passes their
    * gap deadline, so state is bounded by concurrent activity, never
    * by the user domain or stream length); in-batch gap splits fold
    * over each user's sorted batch slice, so a firehose user costs
    * one local sort of their own events, not state growth.
    *
    * @param lateness watermark for late events — also the floor for
    *        timeout firing (a session cannot close before the
    *        watermark allows no more of its events) */
  def sessionize(
      events: Dataset[SessionEvent], gapMs: Long = 600000L,
      lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(
              user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n))
          } else {
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.lastMs < gapMs =>
                  // a late-but-in-watermark event may precede the
                  // session it joins — start/end absorb it either way
                  open = Some(OpenSession(math.min(s.startMs, t),
                    math.max(s.lastMs, t), s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(
                    user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
                  open = Some(OpenSession(t, t, 1L))
                case None =>
                  open = Some(OpenSession(t, t, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // a timeout at-or-below the watermark is illegal; clamp
              // so a session fed only by late events still closes (on
              // the next watermark advance)
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Running stats over parsed lake rows (topic, created_at). Use with
    * outputMode("update"): each micro-batch emits one row per topic
    * that received data. Null event times count toward `count` but not
    * `lastSeen`. */
  def runningTopicStats(lakeRows: DataFrame): Dataset[TopicStats] = {
    val spark = lakeRows.sparkSession
    import spark.implicits._
    lakeRows
      .select("topic", "created_at").as[(String, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[TopicState, TopicStats](GroupStateTimeout.NoTimeout) {
        case (topic, rows, state) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(TopicState(0L, None))
          val stamps = batch.flatMap(r => Option(r._2)) ++ prev.lastSeen
          // (getTime, getNanos): getTime alone is millis and would let
          // lastSeen regress between same-millisecond microstamps
          val seen =
            if (stamps.isEmpty) None
            else Some(stamps.maxBy(t => (t.getTime, t.getNanos)))
          val next = TopicState(prev.count + batch.size, seen)
          state.update(next)
          TopicStats(topic, next.count, next.lastSeen)
      }
  }
}
