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
  /** One unfinalized session, ranges in exact event MICROS (the batch
    * q23 contract is microsecond gaps — millisecond truncation would
    * let a pair within 1 ms of the gap boundary chain differently in
    * stream and batch): O(1) regardless of session length. */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
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
      pieces: Seq[OpenSession], gap: Long): List[OpenSession] =
    pieces.sortBy(s => (s.startUs, s.lastUs)).foldLeft(List.empty[OpenSession]) {
      case (cur :: done, next) if next.startUs - cur.lastUs < gap =>
        OpenSession(cur.startUs, math.max(cur.lastUs, next.lastUs),
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
      events: Dataset[SessionEvent], gapUs: Long = 600000000L,
      lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    def usToTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L)).toInt * 1000)
      t
    }
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionList, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          val prev = state.getOption.map(_.sessions).getOrElse(Nil)
          val points = rows.map(r => { val t = eventUs(r.ts); OpenSession(t, t, 1L) }).toSeq
          val merged = mergeChain(prev ++ points, gapUs)
          // finalize: the watermark has passed end + gap, so no
          // admissible future event can extend, precede-and-chain, or
          // bridge these sessions (wm is millis; ranges are micros —
          // the attrStep convention)
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(_.lastUs + gapUs <= wm * 1000L)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionList(open))
            // fire when the EARLIEST unfinalized session becomes
            // final: eligibility is wm·1000 ≥ lastUs+gapUs and the
            // engine fires when timeout < wm, so ceil-div minus 1 (the
            // r7 review convention); clamp above the watermark
            // (at-or-below is illegal)
            state.setTimeoutTimestamp(math.max(
              (open.map(_.lastUs).min + gapUs + 999L) / 1000L - 1L, wm + 1))
          }
          closed.iterator.map(s => ClosedSession(
            user, usToTs(s.startUs), usToTs(s.lastUs), s.n))
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
  /** The one chain-state driver both chain consumers (transitions,
    * gaps) run on: [[chainStep]] per batch, anchor-only state persists
    * without a timeout (dropping it would lose the cross-gap pair the
    * batch twins count), and the timeout fires when the earliest
    * buffered event finalizes — eligibility is wm ≥ ts+1 and the
    * engine fires when timeout < wm, so the exact trigger is
    * timeout = ts (r7 review), clamped above the watermark. Keeping
    * the discipline in ONE place means a future eviction/timeout fix
    * cannot silently diverge the twins. */
  private def chainDriver[Out: org.apache.spark.sql.Encoder](
      events: Dataset[TypedEvent], lateness: String)(
      emit: (Long, TypedEvent, TypedEvent) => Out): Dataset[Out] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ChainState, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          val prev = state.getOption.getOrElse(ChainState(None, Nil))
          val wm = state.getCurrentWatermarkMs()
          val (pairs, anchor, rest) = chainStep(prev.anchor, prev.pending, rows.toSeq, wm)
          if (rest.isEmpty && anchor.isEmpty) state.remove()
          else {
            state.update(ChainState(anchor, rest))
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(rest.map(_.ts.getTime).min, wm + 1))
          }
          pairs.iterator.map { case (from, to) => emit(user, from, to) }
      }
  }

  def transitionStream(
      events: Dataset[TypedEvent], lateness: String = "10 minutes"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    chainDriver(events, lateness) { (user, from, to) =>
      Transition(user, from.event_type, to.event_type, to.ts)
    }
  }

  final case class EventGap(
      user_id: Long, event_type: String, gap_us: Long, ts: Timestamp)

  /** Inter-event arrival gaps over a stream — the stream twin of the
    * batch q49 ([[graft.operators.TemporalOps.interEventGaps]]): for
    * every consecutive pair of a user's watermark-FINALIZED events,
    * the exact microsecond gap attributed to the LATER event's type.
    * This is [[chainStep]] verbatim (same state, same ordering, same
    * emission discipline as the q38 twin) with the gap instead of the
    * type pair as the payload — one chain machinery, two surfaces.
    * Downstream banding/aggregation is the stateless q49 tail. */
  def gapStream(
      events: Dataset[TypedEvent], lateness: String = "10 minutes"): Dataset[EventGap] = {
    val spark = events.sparkSession
    import spark.implicits._
    def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    chainDriver(events, lateness) { (user, from, to) =>
      EventGap(user, to.event_type, us(to.ts) - us(from.ts), to.ts)
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

  // --------------------------------------------------------------
  // Streaming session attribution (the stream twin of q45)
  // --------------------------------------------------------------

  final case class AttrEvent(
      event_id: Long, user_id: Long, event_type: String, ts: Timestamp)

  /** One open session, COMPACTED: ranges in exact microseconds plus the
    * O(1) summary of its watermark-finalized prefix — first event type,
    * the last pre-conversion type seen so far (the candidate
    * last-touch), whether the first conversion already landed, and its
    * recorded predecessor. Events strictly below the watermark are
    * final in order, so the summary never needs revisiting; the
    * not-yet-final tail lives in the per-user pending buffer, bounded
    * by the watermark horizon. State is therefore O(open sessions +
    * horizon density), never session length. */
  final case class SessAcc(
      startUs: Long, lastUs: Long, first: Option[String],
      prevType: Option[String], convDone: Boolean, lastBefore: Option[String])

  final case class AttrState(open: List[SessAcc], pending: List[AttrEvent])

  /** One conversion credit, emitted exactly once per converting session
    * at finalization — two rows per conversion (both models), exactly
    * the rows the batch q45 aggregates; downstream counting stays a
    * built-in groupBy. */
  final case class AttributionCredit(
      user_id: Long, model: String, event_type: String, session_start: Timestamp)

  private def eventUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Absorb one finalized event (arriving in true event order) into a
    * session summary. */
  private def absorb(s: SessAcc, e: AttrEvent, eu: Long, convType: String): SessAcc = {
    val base = s.copy(lastUs = math.max(s.lastUs, eu),
      first = s.first.orElse(Some(e.event_type)))
    if (base.convDone) base
    else if (e.event_type == convType)
      base.copy(convDone = true, lastBefore = s.prevType)
    else base.copy(prevType = Some(e.event_type))
  }

  /** Pure q45-twin step (property-tested over random batch splits and
    * watermark schedules): merge buffer + batch in (ts, nanos, id)
    * order, absorb everything strictly below the watermark into the
    * gap-chained sessions (a finalized event either extends the LATEST
    * session — its predecessor in event order is that session's last
    * event — or opens a new one), then close every session whose gap
    * deadline the watermark has passed. Returns (closed, open, rest). */
  private[graft] def attrStep(
      open: List[SessAcc], pending: List[AttrEvent], batch: Seq[AttrEvent],
      wmMs: Long, gapUs: Long, convType: String)
      : (List[SessAcc], List[SessAcc], List[AttrEvent]) = {
    def key(e: AttrEvent): (Long, Int, Long) = (e.ts.getTime, e.ts.getNanos, e.event_id)
    val all = (pending ++ batch).sortBy(key)
    val (ready, rest) = all.partition(_.ts.getTime < wmMs)
    var sessions = open.sortBy(s => (s.startUs, s.lastUs))
    ready.foreach { e =>
      val eu = eventUs(e.ts)
      sessions = sessions match {
        case init :+ last if eu - last.lastUs < gapUs =>
          init :+ absorb(last, e, eu, convType)
        case _ =>
          sessions :+ absorb(
            SessAcc(eu, eu, None, None, convDone = false, None), e, eu, convType)
      }
    }
    val (closed, stillOpen) = sessions.partition(_.lastUs + gapUs <= wmMs * 1000L)
    (closed, stillOpen, rest)
  }

  /** Sessionized conversion attribution over a stream — the stream twin
    * of the batch q45 ([[graft.operators.TemporalOps.attribution]]):
    * per converting session, exactly one first-touch and one last-touch
    * credit, emitted only when the watermark passes the session's gap
    * deadline (before that a late-but-admissible event may still extend
    * the session, open it earlier, or insert before the first
    * conversion — the q23/sessionize emission discipline). Parity with
    * the batch operator holds for any stream whose disorder stays
    * inside the watermark, because credits derive from events absorbed
    * in true (ts, event_id) order, not arrival order. */
  def attributionStream(
      events: Dataset[AttrEvent], gapUs: Long = 600000000L,
      lateness: String = "10 minutes",
      convType: String = "purchase"): Dataset[AttributionCredit] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttributionCredit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          val prev = state.getOption.getOrElse(AttrState(Nil, Nil))
          val wm = state.getCurrentWatermarkMs()
          val (closed, open, rest) =
            attrStep(prev.open, prev.pending, rows.toSeq, wm, gapUs, convType)
          if (open.isEmpty && rest.isEmpty) state.remove()
          else {
            state.update(AttrState(open, rest))
            // fire at the earlier of: the earliest open session's gap
            // deadline (eligibility wm·1000 ≥ lastUs+gap, engine fires
            // when timeout < wm ⇒ ceil-div minus 1) or the earliest
            // pending event's finalization (timeout = its ts, the
            // transitionStream convention); clamp above the watermark
            val deadlines =
              open.map(s => (s.lastUs + gapUs + 999L) / 1000L - 1L) ++
                rest.map(_.ts.getTime)
            if (deadlines.nonEmpty)
              state.setTimeoutTimestamp(math.max(deadlines.min, wm + 1))
          }
          closed.iterator.filter(_.convDone).flatMap { s =>
            val start = new Timestamp(s.startUs / 1000L)
            start.setNanos((s.startUs % 1000000L).toInt * 1000)
            Iterator(
              AttributionCredit(user, "first_touch", s.first.get, start),
              AttributionCredit(user, "last_touch",
                s.lastBefore.getOrElse(graft.operators.TemporalOps.DirectTouch), start))
          }
      }
  }

  // --------------------------------------------------------------
  // Streaming daily anomaly (the stream twin of q39)
  // --------------------------------------------------------------

  /** One finalized-or-pending day's event count (day = UTC epoch day —
    * the session is pinned to UTC, so this is exactly the batch twin's
    * `date_trunc('day')` bucket). */
  final case class DayCount(day: Long, n: Long)
  /** Per-type state: counts still inside the watermark horizon plus
    * the trailing ≤7 FINALIZED observed days the next z-score reads.
    * Pending is bounded by horizon/1-day + 1 and history by 7 — O(1)
    * per event type, never stream length. */
  final case class AnomalyState(pending: List[DayCount], history: List[DayCount])
  final case class DailyAnomaly(
      event_type: String, day: String, n: Long, base_days: Long,
      z: Option[Double], is_anomaly: Boolean)

  private val DayMs = 86400000L
  /** Trailing observed days in the q39 baseline window. */
  private val AnomalyBaseDays = 7

  private def dayStr(epochDay: Long): String =
    java.time.LocalDate.ofEpochDay(epochDay).toString

  /** The generic watermark-finalized bucket fold both bucketed twins
    * (q39 anomaly / q36 EWMA) instantiate: merge buffered per-bucket
    * counts with the batch's, finalize every bucket strictly below
    * the watermark's bucket (bucket B is safe exactly when
    * wm ≥ (B+1)·bucketMs — a future admissible row can still carry
    * ts == wm, hence the floor), emit each finalized bucket through
    * `emit` against the trailing ≤histKeep previously-finalized
    * observed buckets, and keep the rest buffered. Buckets finalize
    * in ascending order (the watermark is monotone and a finalized
    * bucket can never receive a late row again — such a row would be
    * below the watermark and is filtered upstream), so the history
    * is exactly the batch window's "previous ≤k observed buckets". */
  private[graft] def bucketStep[T](
      pending: List[DayCount], history: List[DayCount],
      batchBuckets: Seq[Long], wmMs: Long, bucketMs: Long, histKeep: Int)(
      emit: (List[DayCount], DayCount) => T)
      : (List[T], List[DayCount], List[DayCount]) = {
    val merged = batchBuckets.foldLeft(pending.map(d => d.day -> d.n).toMap) {
      (m, d) => m.updated(d, m.getOrElse(d, 0L) + 1L)
    }
    val cutoff = Math.floorDiv(wmMs, bucketMs)
    val (readyM, restM) = merged.partition(_._1 < cutoff)
    val ready = readyM.toList.map { case (d, n) => DayCount(d, n) }.sortBy(_.day)
    var hist = history
    val out = ready.map { dc =>
      val r = emit(hist, dc)
      hist = (hist :+ dc).takeRight(histKeep)
      r
    }
    (out, hist, restM.toList.map { case (d, n) => DayCount(d, n) }.sortBy(_.day))
  }

  /** Pure q39-twin step (property-tested over random batch splits and
    * watermark schedules): the batch twin's exact integer arithmetic,
    * z = (m·n − S1)/√(m·S2 − S1²) over longs, NULL-gated on m<2 /
    * zero variance, against the trailing ≤7 finalized observed
    * days. */
  private[graft] def anomalyStep(
      eventType: String, pending: List[DayCount], history: List[DayCount],
      batchDays: Seq[Long], wmMs: Long)
      : (List[DailyAnomaly], List[DayCount], List[DayCount]) =
    bucketStep(pending, history, batchDays, wmMs, DayMs, AnomalyBaseDays) { (hist, dc) =>
      val base = hist // bucketStep caps history at AnomalyBaseDays
      val m = base.size.toLong
      val s1 = base.map(_.n).sum
      val s2 = base.map(c => c.n * c.n).sum
      val z =
        if (m >= 2 && m * s2 > s1 * s1)
          Some((m * dc.n - s1).toDouble / math.sqrt((m * s2 - s1 * s1).toDouble))
        else None
      DailyAnomaly(eventType, dayStr(dc.day), dc.n, m, z,
        z.exists(v => math.abs(v) >= 3.0))
    }

  /** Trailing-window daily anomaly scores over a stream — exact
    * [[graft.operators.TemporalOps.dailyAnomaly]] parity for any
    * stream whose disorder stays inside the watermark: a day's count
    * is emitted (with its z against the previous ≤7 observed days)
    * exactly once, when the watermark passes the day's end. Counts
    * accumulate in state until then, so out-of-order arrivals within
    * a day are invisible in the output. History-only state (an idle
    * type) persists without a timeout — dropping it would shift the
    * baseline window the batch twin uses when the type resumes. */
  def anomalyStream(
      events: Dataset[TypedEvent], lateness: String = "10 minutes"): Dataset[DailyAnomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, DailyAnomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (etype, rows, state) =>
          val prev = state.getOption.getOrElse(AnomalyState(Nil, Nil))
          val wm = state.getCurrentWatermarkMs()
          val days = rows.map(e => Math.floorDiv(e.ts.getTime, DayMs)).toSeq
          val (out, hist, rest) = anomalyStep(etype, prev.pending, prev.history, days, wm)
          if (rest.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(AnomalyState(rest, hist))
            if (rest.nonEmpty)
              // fire when the earliest buffered day becomes final:
              // eligibility is wm >= (D+1)*DayMs and the engine fires
              // when timeout < wm, so set dayEnd-1 (r7 review); clamp
              // above the watermark
              state.setTimeoutTimestamp(
                math.max((rest.map(_.day).min + 1) * DayMs - 1, wm + 1))
          }
          out.iterator
      }
  }

  // --------------------------------------------------------------
  // Streaming hourly EWMA trend (the stream twin of q36)
  // --------------------------------------------------------------

  final case class HourEwma(event_type: String, date_hour: String, n: Long, ewma: Double)

  private val HourMs = 3600000L
  private val HourFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:00:00")

  private def hourStr(epochHour: Long): String =
    java.time.LocalDateTime
      .ofEpochSecond(epochHour * 3600L, 0, java.time.ZoneOffset.UTC).format(HourFmt)

  /** Pure q36-twin step: the batch operator's EXACT fixed-order
    * addition chain — num = ((n + l₁·β) + l₂·β²)…, den = ((1 + β) +
    * β²)… over the lags that EXIST (series starts renormalize), β=½
    * so every weight is an exact binary double, one terminal
    * division — so stream and batch emit bit-identical ewma. */
  private[graft] def ewmaStep(
      eventType: String, pending: List[DayCount], history: List[DayCount],
      batchHours: Seq[Long], wmMs: Long)
      : (List[HourEwma], List[DayCount], List[DayCount]) = {
    val terms = graft.operators.TemporalOps.EwmaTerms
    bucketStep(pending, history, batchHours, wmMs, HourMs, terms - 1) { (hist, dc) =>
      val lags = hist.reverse // nearest finalized hour first = lag 1
      var num = dc.n.toDouble
      var den = 1.0
      lags.zipWithIndex.foreach { case (c, i) =>
        val w = math.pow(0.5, i + 1)
        num += c.n.toDouble * w
        den += w
      }
      HourEwma(eventType, hourStr(dc.day), dc.n, num / den)
    }
  }

  /** Hourly EWMA trend over a stream — exact
    * [[graft.operators.TemporalOps.ewmaTrend]] parity for any stream
    * whose disorder stays inside the watermark: an hour's count is
    * emitted with its smoothed trend exactly once, when the watermark
    * passes the hour's end, weighted over the trailing ≤5 OBSERVED
    * finalized hours (missing hours shorten the window, exactly the
    * batch row-lag semantics). State is O(types · (horizon + 5)). */
  def ewmaStream(
      events: Dataset[TypedEvent], lateness: String = "10 minutes"): Dataset[HourEwma] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, HourEwma](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (etype, rows, state) =>
          val prev = state.getOption.getOrElse(AnomalyState(Nil, Nil))
          val wm = state.getCurrentWatermarkMs()
          val hours = rows.map(e => Math.floorDiv(e.ts.getTime, HourMs)).toSeq
          val (out, hist, rest) = ewmaStep(etype, prev.pending, prev.history, hours, wm)
          if (rest.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(AnomalyState(rest, hist))
            if (rest.nonEmpty)
              // exact fire at eligibility: engine fires when
              // timeout < wm, eligibility is wm >= (H+1)*HourMs
              state.setTimeoutTimestamp(
                math.max((rest.map(_.day).min + 1) * HourMs - 1, wm + 1))
          }
          out.iterator
      }
  }

  // --------------------------------------------------------------
  // Streaming daily heavy hitters (bounded-state twin of q44)
  // --------------------------------------------------------------

  /** One SpaceSaving counter: `est` overestimates the user's true
    * count by at most `err` (the evicted minimum the counter
    * inherited), so `est − err ≤ true ≤ est`. */
  final case class SsCounter(user: Long, est: Long, err: Long)
  final case class HhState(days: Map[Long, List[SsCounter]])
  final case class HeavyHitter(
      event_type: String, day: String, rank: Long, user_id: Long,
      est: Long, err: Long, guaranteed: Boolean)

  /** SpaceSaving capacity per (type, day). Any user with true count
    * > n_day / HhCap is guaranteed a counter (Metwally et al. 2005),
    * and days with ≤ HhCap distinct users are tracked EXACTLY. */
  val HhCap = 32
  /** Emitted rows per (type, day) — q44's DailyTopK. */
  val HhK: Int = graft.operators.TemporalOps.DailyTopK

  /** Merge a batch's exact per-user counts into a SpaceSaving sketch.
    * Deterministic given (sketch, adds): adds fold in (count DESC,
    * user ASC) order and the eviction victim is pinned to (est ASC,
    * user ASC). Batch-SPLIT invariance is inherently approximate for
    * an over-capacity sketch — the spec pins the estimator's
    * GUARANTEES under random splits (q22's sketch-contract
    * philosophy), and exactness whenever the day stays under
    * capacity. */
  private[graft] def spaceSavingMerge(
      sketch: List[SsCounter], adds: Seq[(Long, Long)], cap: Int): List[SsCounter] = {
    val sorted = adds.sortBy { case (u, n) => (-n, u) }
    sorted.foldLeft(sketch) { case (sk, (u, n)) =>
      if (sk.exists(_.user == u))
        sk.map(c => if (c.user == u) c.copy(est = c.est + n) else c)
      else if (sk.size < cap) sk :+ SsCounter(u, n, 0L)
      else {
        val victim = sk.minBy(c => (c.est, c.user))
        sk.filterNot(_.user == victim.user) :+
          SsCounter(u, victim.est + n, victim.est)
      }
    }
  }

  /** Top-k emission for one finalized day: rank by (est DESC, user
    * ASC); a row is `guaranteed` in the true top-k when even its
    * worst-case true count (est − err) still clears the best possible
    * count outside the emitted set (the (k+1)-th estimate — an upper
    * bound on every untracked user too, by the SpaceSaving
    * invariant). */
  private[graft] def heavyHitters(
      etype: String, day: Long, sketch: List[SsCounter], k: Int): List[HeavyHitter] = {
    val ordered = sketch.sortBy(c => (-c.est, c.user))
    val thresh = ordered.drop(k).headOption.map(_.est).getOrElse(0L)
    ordered.take(k).zipWithIndex.map { case (c, i) =>
      HeavyHitter(etype, dayStr(day), (i + 1).toLong, c.user, c.est, c.err,
        c.est - c.err >= thresh)
    }
  }

  /** Pure heavy-hitter step (property-tested): exact per-(day, user)
    * batch counts merge into each day's sketch; days strictly below
    * the watermark's day finalize in ascending order and emit their
    * top-k. */
  private[graft] def hhStep(
      etype: String, pending: Map[Long, List[SsCounter]],
      batch: Seq[(Long, Long)], wmMs: Long, cap: Int, k: Int)
      : (List[HeavyHitter], Map[Long, List[SsCounter]]) = {
    val adds = batch.groupBy(identity).toSeq
      .map { case ((d, u), xs) => (d, u, xs.size.toLong) }
    val merged = adds.groupBy(_._1).foldLeft(pending) { case (m, (d, rows)) =>
      m.updated(d, spaceSavingMerge(
        m.getOrElse(d, Nil), rows.map(r => (r._2, r._3)), cap))
    }
    val cutoff = Math.floorDiv(wmMs, DayMs)
    val (ready, rest) = merged.partition(_._1 < cutoff)
    val out = ready.toList.sortBy(_._1)
      .flatMap { case (d, sk) => heavyHitters(etype, d, sk, k) }
    (out, rest)
  }

  /** Daily heavy hitters over a stream — the bounded-state twin of
    * [[graft.operators.TemporalOps.dailyTopUsers]]: where the batch
    * operator ranks EXACT per-user counts (state O(users·day)), the
    * stream keeps a [[HhCap]]-counter SpaceSaving sketch per
    * (type, day) — O(types · days-in-horizon · cap) state at any
    * stream length — and emits each day's top-k exactly once when the
    * watermark passes the day's end, with per-row (est, err,
    * guaranteed) so a consumer can tell exact rows (err = 0; always
    * the case when the day stayed under capacity, where stream ≡
    * batch) from bounded estimates. */
  def heavyHitterStream(
      events: Dataset[TypedEvent], lateness: String = "10 minutes",
      cap: Int = HhCap, k: Int = HhK): Dataset[HeavyHitter] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[HhState, HeavyHitter](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (etype, rows, state) =>
          val prev = state.getOption.getOrElse(HhState(Map.empty))
          val wm = state.getCurrentWatermarkMs()
          val batch = rows
            .map(e => (Math.floorDiv(e.ts.getTime, DayMs), e.user_id)).toSeq
          val (out, rest) = hhStep(etype, prev.days, batch, wm, cap, k)
          if (rest.isEmpty) state.remove()
          else {
            state.update(HhState(rest))
            // exact fire at eligibility (r7 review convention): the
            // engine fires when timeout < wm, eligibility for day D
            // is wm >= (D+1)*DayMs
            state.setTimeoutTimestamp(
              math.max((rest.keys.min + 1) * DayMs - 1, wm + 1))
          }
          out.iterator
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
