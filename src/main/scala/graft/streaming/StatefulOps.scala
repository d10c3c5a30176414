package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
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
  /** One unfinalized session: O(1) regardless of session length. */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  /** Per-user state: the user's unfinalized sessions, kept sorted by
    * start. Bounded by the watermark horizon (a session leaves state
    * the moment the watermark passes its gap deadline), never by
    * stream length. */
  final case class SessionList(sessions: List[OpenSession])
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** Gap-chain fold: merge provisional sessions / points (a point is
    * a degenerate session) into maximal sessions under the gap rule —
    * two pieces chain when the later one starts within `gapMs` of the
    * earlier one's end. Output ascending by start. Pure — property-
    * tested against a reference grouping in PropertySpec. */
  private[graft] def mergeChain(
      pieces: Seq[OpenSession], gapMs: Long): List[OpenSession] =
    pieces.sortBy(s => (s.startMs, s.lastMs)).foldLeft(List.empty[OpenSession]) {
      case (cur :: done, next) if next.startMs - cur.lastMs < gapMs =>
        OpenSession(cur.startMs, math.max(cur.lastMs, next.lastMs),
          cur.n + next.n) :: done
      case (acc, next) => next :: acc
    }.reverse

  /** Streaming gap sessionization — the streaming twin of the batch
    * gaps-and-islands kernel (q23/q34, 10-minute inactivity gap): a
    * user's session is emitted exactly once (append mode), and ONLY
    * when the watermark has passed `session_end + gap` — before that
    * a late-but-in-watermark event may still extend it, start a
    * predecessor that chains into it, or bridge it with a neighbor
    * session, so earlier emission would be wrong (this matches
    * `session_window`'s emission discipline).
    *
    * This is the `flatMapGroupsWithState` shape the built-in
    * operators can't express: `session_window` aggregation emits
    * fixed aggregates, while this keeps arbitrary per-session state
    * and decides eviction itself. Events and existing sessions merge
    * by one [[mergeChain]] fold per batch — which also handles
    * out-of-order points and session bridging — so a firehose user
    * costs one local sort of their own events, not state growth. Null
    * event times are dropped (a point without a time cannot join any
    * gap chain).
    *
    * @param lateness watermark for late events — also the floor for
    *        finalization (a session cannot close before the watermark
    *        allows no more of its events) */
  def sessionize(
      events: Dataset[SessionEvent], gapMs: Long = 600000L,
      lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionList, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          val prev = state.getOption.map(_.sessions).getOrElse(Nil)
          val points = rows.map(r => { val t = r.ts.getTime; OpenSession(t, t, 1L) }).toSeq
          val merged = mergeChain(prev ++ points, gapMs)
          // finalize: the watermark has passed end + gap, so no
          // admissible future event can extend, precede-and-chain, or
          // bridge these sessions
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(_.lastMs + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionList(open))
            // fire when the EARLIEST unfinalized session becomes
            // final; clamp above the watermark (at-or-below is
            // illegal)
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastMs).min + gapMs, wm + 1))
          }
          closed.iterator.map(s => ClosedSession(
            user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n))
      }
  }

  // --------------------------------------------------------------
  // Streaming event-type transitions (the stream twin of q38)
  // --------------------------------------------------------------

  final case class TypedEvent(
      event_id: Long, user_id: Long, event_type: String, ts: Timestamp)
  final case class Transition(
      user_id: Long, from_type: String, to_type: String, ts: Timestamp)
  /** Per-user chain state: the last FINALIZED event (the anchor the
    * next transition chains from) plus the not-yet-finalized buffer.
    * The buffer is bounded by the watermark horizon — an event leaves
    * it the moment the watermark passes its timestamp — and the anchor
    * is O(1), so state is O(users·horizon-density), never stream
    * length. */
  final case class ChainState(anchor: Option[TypedEvent], pending: List[TypedEvent])

  /** Per-user event-type transitions over a stream, with exact
    * [[graft.operators.TemporalOps.transitionMatrix]] parity for any
    * stream whose disorder stays inside the watermark: transitions are
    * emitted only between watermark-FINALIZED events, ordered by
    * (ts, event_id) — a late-but-admissible event lands in its true
    * chain position instead of the arrival position, because nothing
    * after it is chained until the watermark passes. Downstream, the
    * (from, to) counts are one windowed groupBy — this operator emits
    * the transition ROWS so the aggregation stays a built-in.
    *
    * Anchor-only state (user went idle) persists without a timeout —
    * dropping it would silently lose the cross-gap transition the
    * batch twin counts. */
  def transitionStream(
      events: Dataset[TypedEvent], lateness: String = "10 minutes"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._

    // (millis, nanos, id): nanos carries sub-millisecond order, id is
    // the same tiebreak the batch twin uses
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ChainState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          val prev = state.getOption.getOrElse(ChainState(None, Nil))
          val wm = state.getCurrentWatermarkMs()
          val (pairs, anchor, rest) = chainStep(prev.anchor, prev.pending, rows.toSeq, wm)
          if (rest.isEmpty && anchor.isEmpty) state.remove()
          else {
            state.update(ChainState(anchor, rest))
            if (rest.nonEmpty) // fire when the earliest buffered event finalizes
              state.setTimeoutTimestamp(
                math.max(rest.map(_.ts.getTime).min + 1, wm + 1))
          }
          pairs.iterator.map { case (from, to) =>
            Transition(user, from.event_type, to.event_type, to.ts)
          }
      }
  }

  /** Pure per-invocation chain step (property-tested in PropertySpec
    * against the batch ordering over random batch splits and watermark
    * schedules): merge the buffered and newly-arrived events in
    * (ts, nanos, event_id) order, finalize everything strictly below
    * the watermark (an admissible future row can still carry ts == wm),
    * and emit the consecutive pairs of anchor ++ finalized. Returns
    * (pairs, new anchor, still-buffered rest). */
  private[graft] def chainStep(
      anchor: Option[TypedEvent], pending: List[TypedEvent],
      batch: Seq[TypedEvent], wmMs: Long)
      : (List[(TypedEvent, TypedEvent)], Option[TypedEvent], List[TypedEvent]) = {
    // (millis, nanos, id): nanos carries sub-millisecond order, id is
    // the same tiebreak the batch twin uses
    def key(e: TypedEvent): (Long, Int, Long) = (e.ts.getTime, e.ts.getNanos, e.event_id)
    val all = (pending ++ batch).sortBy(key)
    val (ready, rest) = all.partition(_.ts.getTime < wmMs)
    val chain = anchor.toList ++ ready
    val pairs = chain.iterator.sliding(2).withPartial(false)
      .map(w => (w(0), w(1))).toList
    (pairs, chain.lastOption, rest)
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
