package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.operators.TemporalOps
import StatefulOps.{AttrEvent, TypedEvent}

/** Deterministic batch-replay of the streaming state machines — the
  * driver-gate rows that prove STREAM-BATCH PARITY to the oracle, not
  * just to ScalaTest (r8 verdict item 5): each st* row feeds a
  * deterministic slice of the events table through the real
  * Structured Streaming operator (MemoryStream → micro-batches → a
  * real watermark schedule → memory sink), collects the
  * watermark-FINALIZED output, runs the batch twin's relational tail
  * over it, and hash-matches the batch twin's DuckDB oracle.
  *
  * The replay schedule is fully deterministic: events sort by
  * (ts, event_id), split into [[ReplayChunks]] chronological
  * micro-batches, and each batch is REVERSED internally (intra-batch
  * disorder is free under a watermark — order within a micro-batch
  * must not matter, and this proves it). Two sentinel batches (a
  * dedicated user, +2d/+4d past the corpus) then push the watermark
  * beyond every gap deadline so all state finalizes; sentinel rows
  * are excluded before the tail. Cross-batch disorder and checkpoint
  * restarts stay property-tested in the Stream*Specs (×300 random
  * schedules) — the gate row's job is the end-to-end hash claim.
  *
  * The replay restricts to a deterministic user slice
  * (user_id % [[UserMod]] = 0, mirrored in the oracle texts): parity
  * is per-user, so the slice proves the same theorem at a bounded
  * event volume, and the whole relation — chains, sessions, credits,
  * bands — still exercises every state machine path. This harness is
  * audit machinery: the production path is readStream from the bus
  * ([[TweetIngest]]); nothing here collects unbounded state (the
  * slice is a fixture, the streams hold O(users·horizon) state as
  * always).
  */
object StreamReplay {

  /** Micro-batches in the replay schedule — enough to exercise several
    * watermark advances and timeout firings while keeping the
    * per-micro-batch fixed cost (planning + state-store commit +
    * offset/commit log IO) a bounded share of the bench row. 4 (plus
    * the two sentinel flushes) still advances the watermark through
    * mid-stream finalizations on every machine; the finalized OUTPUT
    * is schedule-independent by the parity theorem the rows prove, and
    * the ×300 random-schedule Stream*Specs keep proving it across
    * chunkings — 6 → 4 only drops a third of the fixed state-store
    * commits from the audit fixture (r9 verdict item 4). */
  val ReplayChunks = 4

  /** Deterministic user-slice modulus (mirrored in the oracles). */
  val UserMod = 7L

  private val SentinelUser = -1L
  private val nameCounter = new AtomicInteger()

  /** /dev/shm-backed EPHEMERAL checkpoint dir (platform temp
    * fallback) — replay checkpoints are throwaway scratch, and tmpfs
    * spares the offset/commit/state fsyncs; production streams
    * checkpoint to durable storage (TweetIngest). One definition for
    * every replay row (st12–st18 had inline copies — a cleanup fix
    * must not need N edits). */
  private def scratchCkptDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** Depth-first delete of a scratch dir. Tolerates already-missing
    * entries; the state-store straggler RETRY (a provider re-creating
    * a file between walk and delete) lives only in the replay
    * harness's own sweep, which is the one place it was observed. */
  private def rmScratch(d: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(d)
    try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  /** st12's streamed ingest unit (explicit product encoder — tuple
    * encoders for Seq-valued fields don't derive inside the lambda). */
  final case class EmbRow(vec_id: Long, v: Seq[Double])
  private implicit val embRowEnc: org.apache.spark.sql.Encoder[EmbRow] =
    org.apache.spark.sql.Encoders.product[EmbRow]

  /** Collected schedules memoized per (session, sf): all st* rows
    * replay the SAME slice, so the sort+collect job runs once and the
    * later five rows start at addData (the SignatureLake first-consumer
    * pattern, driver-side because a replay schedule is driver data by
    * nature — the slice is a bounded audit fixture). Entries of
    * stopped sessions are swept on access. */
  private val schedCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Seq[Seq[TypedEvent]]]()

  /** The sorted, sliced, intra-batch-reversed replay schedule plus the
    * two watermark-flushing sentinel batches. */
  private def schedule(spark: SparkSession, sf: String): Seq[Seq[TypedEvent]] = {
    val it = schedCache.keySet().iterator()
    while (it.hasNext) { if (it.next()._1.sparkContext.isStopped) it.remove() }
    schedCache.computeIfAbsent((spark, sf), _ => {
      import spark.implicits._
      val evs = Tables.events(spark, sf)
        .filter(col("user_id") % UserMod === 0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .as[TypedEvent].collect().toSeq
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      require(evs.nonEmpty, s"replay slice is empty at $sf")
      val sz = math.max(1, math.ceil(evs.size / ReplayChunks.toDouble).toInt)
      val chunks = evs.grouped(sz).map(_.reverse).toSeq
      val maxMs = evs.map(_.ts.getTime).max
      val day = 86400000L
      chunks ++ Seq(
        Seq(TypedEvent(-1L, SentinelUser, "__flush", new Timestamp(maxMs + 2 * day))),
        Seq(TypedEvent(-2L, SentinelUser, "__flush", new Timestamp(maxMs + 4 * day))))
    })
  }

  /** Run `build`'s stream over the replay schedule and return the
    * finalized output rows (sentinel rows included — callers filter on
    * their own user column). Shuffle partitions drop to 1 for the
    * micro-batches (state-store commit cost is per partition per
    * batch and dominates a fixture-sized batch; single-partition state
    * changes nothing the rows claim — watermark semantics are
    * partitioning-independent, and the cross-partition paths stay
    * covered by the Stream*Specs' default-partitioned schedules) and
    * restore after; snapshot retention drops to the minimum for the
    * same reason (the checkpoint is throwaway by design). */
  /** @param mapBatch per-micro-batch rewrite of the shared schedule
    *        (st08 injects exact duplicate rows with it) — applied at
    *        addData time so the memoized schedule itself stays shared
    *        and untouched */
  /** @param coarse replay the shared schedule at half density (data
    *        chunks merged pairwise, the two sentinels as one batch —
    *        3 micro-batches instead of 6). For the PASS-THROUGH dedup
    *        rows (st09/st10) whose operators emit on arrival, batch
    *        count is pure fixed cost — st10 pays it across 8 chained
    *        state stores — and nothing watermark-FIRED needs the
    *        denser schedule; the finalizing rows (st01–st07) keep the
    *        4-chunk density. Cross-batch state is still exercised
    *        (batch 2 dedups against batch 1's stored keys). */
  private def runReplay[O](spark: SparkSession, sf: String,
      mapBatch: Seq[TypedEvent] => Seq[TypedEvent] = identity,
      coarse: Boolean = false)(
      build: Dataset[TypedEvent] => Dataset[O]): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevRetain = spark.conf.getOption("spark.sql.streaming.minBatchesToRetain")
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "1")
    // No-data batches exist to fire watermark-only state transitions
    // when no further data arrives — the replay schedule never needs
    // them (the SECOND sentinel batch is a DATA batch whose start-of-
    // batch watermark, set by sentinel 1 at +2d, already exceeds every
    // real finalization deadline), and with multi-stateful-operator
    // rows (st10 chains 8 dedup stores) each suppressed no-data batch
    // saves a full plan+commit cycle across every store: measured
    // st10 13.1 -> 6.9 s, st01 3.3 -> 2.6 s at sf0.1.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val source = MemoryStream[TypedEvent]
      val name = s"graft_replay_${nameCounter.incrementAndGet()}"
      // tmpfs spares ~0.8 s/row of offset/commit/state-delta fsyncs
      // vs disk temp (see scratchCkptDir); deleted below with the
      // straggler-tolerant sweep.
      val ckpt = scratchCkptDir(s"graft_replay_$name")
      try {
        val q = build(source.toDS())
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append").start()
        try {
          val sched0 = schedule(spark, sf)
          val sched =
            if (!coarse) sched0
            else {
              val (data, sentinels) = sched0.splitAt(sched0.size - 2)
              data.grouped(2).map(_.flatten).toSeq :+ sentinels.flatten
            }
          sched.foreach { batch =>
            source.addData(mapBatch(batch): _*)
            q.processAllAvailable()
          }
          val out = spark.table(name)
          // localize: the memory sink's view is dropped before returning
          spark.createDataFrame(
            java.util.Arrays.asList(out.collect(): _*), out.schema)
        } finally {
          q.stop()
          spark.catalog.dropTempView(name)
        }
      } finally {
        // Best-effort cleanup that tolerates the state-store
        // maintenance thread: q.stop() returns before StateStore's
        // async unload finishes, so a provider can re-create a file
        // between our walk and the delete (observed once in CI as
        // DirectoryNotEmptyException on state/0/0). One bounded retry
        // after a short pause clears the straggler; a directory that
        // STILL will not empty is left behind in tmpfs rather than
        // failing the replay — the checkpoint is throwaway by design.
        def sweep(): Boolean =
          try {
            val walk = java.nio.file.Files.walk(ckpt)
            try {
              import scala.jdk.CollectionConverters._
              walk.iterator().asScala.toSeq
                .sortBy(-_.getNameCount)
                .foreach(p => java.nio.file.Files.deleteIfExists(p))
              true
            } finally walk.close()
          } catch {
            case _: java.nio.file.DirectoryNotEmptyException => false
            case _: java.nio.file.NoSuchFileException => true
          }
        if (!sweep()) { Thread.sleep(200); sweep() }
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevRetain match {
        case Some(v) => spark.conf.set("spark.sql.streaming.minBatchesToRetain", v)
        case None => spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
      }
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
    }
  }

  /** st01 — the q38 transition matrix computed BY THE STREAM: pair
    * rows from [[StatefulOps.transitionStream]] (watermark-finalized,
    * true event order), counted by the shared q38 tail, checked
    * against q38's oracle on the same user slice. */
  val streamTransitionsQ: GraftQuery = GraftQuery(
    "st01_stream_transitions",
    s"""WITH e AS (SELECT event_id, user_id, event_type,
      |             epoch_ns(ts) // 1000 AS ts_us FROM events
      |           WHERE user_id % $UserMod = 0),
      |nx AS (SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts_us, event_id) AS to_type
      |       FROM e),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM nx
      |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
      |       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
      |FROM c""".stripMargin) { (spark, sf) =>
    val pairs = runReplay(spark, sf)(StatefulOps.transitionStream(_))
      .filter(col("user_id") =!= SentinelUser)
      .select(col("from_type"), col("to_type"))
    TemporalOps.transitionTail(pairs)
  }

  /** st02 — q45's attribution credits computed BY THE STREAM:
    * [[StatefulOps.attributionStream]] emits each converting session's
    * two credits exactly once at finalization; counting them is the
    * batch tail, and the oracle is q45's session replay on the same
    * user slice. */
  val streamAttributionQ: GraftQuery = GraftQuery(
    "st02_stream_attribution",
    s"""WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_ns(ts) // 1000 AS us
      |  FROM events WHERE user_id % $UserMod = 0),
      |d AS (
      |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w >= 600000000
      |                 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, sid
      |                               ORDER BY us, event_id) AS rn
      |  FROM s),
      |p AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
      |              OVER (PARTITION BY user_id, sid) AS prn
      |  FROM r),
      |conv AS (
      |  SELECT user_id, sid, prn,
      |         max(CASE WHEN rn = 1 THEN event_type END) AS first_t,
      |         coalesce(max(CASE WHEN rn = prn - 1 THEN event_type END),
      |                  '${TemporalOps.DirectTouch}') AS last_t
      |  FROM p WHERE prn IS NOT NULL GROUP BY user_id, sid, prn)
      |SELECT 'first_touch' AS model, first_t AS event_type,
      |       CAST(count(*) AS BIGINT) AS n_conversions
      |FROM conv GROUP BY first_t
      |UNION ALL
      |SELECT 'last_touch', last_t, CAST(count(*) AS BIGINT)
      |FROM conv GROUP BY last_t""".stripMargin) { (spark, sf) =>
    runReplay(spark, sf) { ds =>
      val spark2 = ds.sparkSession
      import spark2.implicits._
      StatefulOps.attributionStream(ds.map(e =>
        AttrEvent(e.event_id, e.user_id, e.event_type, e.ts)))
    }
      .filter(col("user_id") =!= SentinelUser)
      .groupBy(col("model"), col("event_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** st03 — q49's inter-event gap bands computed BY THE STREAM: exact
    * microsecond gaps from [[StatefulOps.gapStream]] (the q38 chain
    * machinery with the gap payload), banded by the shared q49 tail,
    * against q49's oracle on the same user slice. */
  val streamGapsQ: GraftQuery = GraftQuery(
    "st03_stream_gaps",
    s"""WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_ns(ts) // 1000 AS us
      |  FROM events WHERE user_id % $UserMod = 0),
      |g AS (
      |  SELECT event_type,
      |         us - lag(us) OVER (PARTITION BY user_id
      |                            ORDER BY us, event_id) AS gap_us
      |  FROM e),
      |b AS (
      |  SELECT event_type, gap_us,
      |         CASE WHEN gap_us < 1000000 THEN '00_lt_1s'
      |              WHEN gap_us < 60000000 THEN '01_1s_1m'
      |              WHEN gap_us < 600000000 THEN '02_1m_10m'
      |              ELSE '03_ge_10m' END AS band
      |  FROM g WHERE gap_us IS NOT NULL)
      |SELECT event_type, band, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(gap_us AS HUGEINT)) AS DOUBLE) / count(*) AS mean_us,
      |       CAST(min(gap_us) AS BIGINT) AS min_us,
      |       CAST(max(gap_us) AS BIGINT) AS max_us
      |FROM b GROUP BY event_type, band""".stripMargin) { (spark, sf) =>
    val gaps = runReplay(spark, sf)(StatefulOps.gapStream(_))
      .filter(col("user_id") =!= SentinelUser)
      .select(col("event_type"), col("gap_us"))
    TemporalOps.gapBandTail(gaps)
  }

  /** st04 — q23-contract sessions computed BY THE STREAM:
    * [[StatefulOps.sessionize]] (exact-micros gap chains, emit at
    * watermark-passes-gap-deadline) against the gaps-and-islands
    * session relation in SQL on the same user slice — per session,
    * its exact start/end micros and event count. The boundary-exact
    * claim: an event pair within 1 µs of the 10-minute gap splits or
    * chains identically in both engines. */
  val streamSessionsQ: GraftQuery = GraftQuery(
    "st04_stream_sessions",
    s"""WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us
      |  FROM events WHERE user_id % $UserMod = 0),
      |d AS (
      |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w >= 600000000
      |                 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d)
      |SELECT user_id,
      |       CAST(min(us) AS BIGINT) AS start_us,
      |       CAST(max(us) AS BIGINT) AS end_us,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin) { (spark, sf) =>
    runReplay(spark, sf) { ds =>
      val spark2 = ds.sparkSession
      import spark2.implicits._
      StatefulOps.sessionize(ds.map(e =>
        StatefulOps.SessionEvent(e.user_id, e.ts)))
    }
      .filter(col("user_id") =!= SentinelUser)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"))
  }

  /** st05 — q36's hourly EWMA trend computed BY THE STREAM:
    * [[StatefulOps.ewmaStream]] emits each finalized hour exactly once
    * with its renormalized β=½ trend over the trailing ≤5 OBSERVED
    * finalized hours ([[graft.operators.TemporalOps.EwmaTerms]] − 1) — the same fixed-order addition chain as the
    * batch lag window, so the ewma doubles are bit-identical and the
    * relation hash-matches q36's oracle on the slice. The sentinel
    * type's own buckets are filtered; its job is pushing the
    * watermark past every real hour. */
  val streamEwmaQ: GraftQuery = GraftQuery(
    "st05_stream_ewma",
    TemporalOps.ewmaOracleSql(s"WHERE user_id % $UserMod = 0")) { (spark, sf) =>
    runReplay(spark, sf)(StatefulOps.ewmaStream(_))
      .filter(col("event_type") =!= "__flush")
      .select(col("event_type"), col("date_hour"), col("n"), col("ewma"))
  }

  /** st06 — q39's trailing-window daily anomaly computed BY THE
    * STREAM: [[StatefulOps.anomalyStream]] finalizes each (type, day)
    * count at watermark-passes-day-end and scores it against the
    * previous ≤7 finalized observed days with the batch twin's exact
    * integer z arithmetic — NULL-gated identically, so z and the
    * 3σ flag hash-match q39's oracle on the slice. */
  val streamAnomalyQ: GraftQuery = GraftQuery(
    "st06_stream_anomaly",
    TemporalOps.anomalyOracleSql(s"WHERE user_id % $UserMod = 0")) { (spark, sf) =>
    runReplay(spark, sf)(StatefulOps.anomalyStream(_))
      .filter(col("event_type") =!= "__flush")
      .select(col("event_type"), col("day"), col("n"),
        col("base_days"), col("z"), col("is_anomaly"))
  }

  /** st07 — the SpaceSaving daily heavy hitters computed BY THE
    * STREAM: [[StatefulOps.heavyHitterStream]] finalizes each (type,
    * day) sketch at watermark-passes-day-end and emits its top-k with
    * (est, err, guaranteed); the row scores those rows against the
    * batch-exact per-user counts on the same slice with q54's theorem
    * claims — every emitted bound contains the true count, every
    * GUARANTEED row really is in the exact top-k — and the oracle
    * replays the replayable side (days and min(k, users) row
    * cardinalities) expecting TRUE booleans. Closes the count-sketch
    * triangle: exact q44 ↔ batch sketch q54 ↔ this stream sketch,
    * the one state machine the st* replay family didn't yet gate. */
  val streamHeavyHittersQ: GraftQuery = GraftQuery(
    "st07_stream_heavy_hitters",
    s"""WITH e AS (
      |  SELECT user_id, event_type, strftime(ts, '%Y-%m-%d') AS day
      |  FROM events WHERE user_id % $UserMod = 0),
      |c AS (SELECT event_type, day, user_id, count(*) AS n
      |      FROM e GROUP BY 1, 2, 3),
      |d AS (SELECT event_type, day, count(*) AS u FROM c GROUP BY 1, 2)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(least(${StatefulOps.HhK}, u)) AS BIGINT) AS n_rows,
      |       TRUE AS bounds_ok,
      |       TRUE AS guaranteed_sound
      |FROM d GROUP BY event_type""".stripMargin) { (spark, sf) =>
    import org.apache.spark.sql.expressions.Window
    val out = runReplay(spark, sf)(StatefulOps.heavyHitterStream(_))
      .filter(col("event_type") =!= "__flush")
    val counts = Tables.events(spark, sf)
      .filter(col("user_id") % UserMod === 0)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val exactTop = counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("n").desc, col("user_id"))))
      .filter(col("rank") <= StatefulOps.HhK)
    out
      .join(counts, Seq("event_type", "day", "user_id"), "left")
      .join(exactTop.select(col("event_type"), col("day"), col("user_id"))
        .withColumn("__intop", lit(true)),
        Seq("event_type", "day", "user_id"), "left")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("n_rows"),
        (min(when(col("n").isNotNull
          && col("est") >= col("n")
          && col("est") - col("err") <= col("n"), 1L).otherwise(0L)) === 1L)
          .as("bounds_ok"),
        (min(when(!col("guaranteed")
          || coalesce(col("__intop"), lit(false)), 1L).otherwise(0L)) === 1L)
          .as("guaranteed_sound"))
  }

  /** st08's injection rule: events with event_id % 3 == 0 are added
    * TWICE to their micro-batch as EXACT copies (same id, ts, payload)
    * — so the dedup claim is payload-independent: whichever copy the
    * state store sees first, the emitted row is THE row, and
    * intra-batch disorder stays free. */
  private def injectDupes(batch: Seq[TypedEvent]): Seq[TypedEvent] =
    batch.flatMap(e => if (e.event_id % 3 == 0) Seq(e, e) else Seq(e))

  /** st08 — the reference's keyed ingest dedup (F3, q12's streaming
    * twin — the ONE reference streaming semantic the st* family didn't
    * yet gate) proven at the driver: exact duplicates injected into
    * every micro-batch vanish at the sink. The machine is the
    * watermark-keyed `dropDuplicatesWithinWatermark` shape of
    * [[TweetIngest.dedupedParse]], run on the replay's event slice;
    * the oracle is the PLAIN slice aggregate — it never models the
    * injection, because "the duplicates are invisible" is precisely
    * the claim. Chronological micro-batches mean no row is ever late
    * (the watermark can only evict state, never drop rows), and
    * id_sum makes the hash sensitive to WHICH rows survived, not just
    * how many. State is O(keys inside the watermark horizon), the
    * same bound the production ingest pays. */
  val streamDedupQ: GraftQuery = GraftQuery(
    "st08_stream_dedup",
    s"""SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |       CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM events WHERE user_id % $UserMod = 0
      |GROUP BY event_type""".stripMargin) { (spark, sf) =>
    runReplay(spark, sf, injectDupes) { ds =>
      ds.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
    }
      .filter(col("user_id") =!= SentinelUser)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum"))
  }

  /** st09/st10's variant-injection encoding: a replayed copy of event
    * `e` carries `event_id + DupOffset` — the copy is distinguishable
    * (different Kafka KEY and raw bytes, so neither keyed nor raw-bytes
    * dedup can claim the drop) while `event_id % DupOffset` recovers
    * the doc identity on BOTH sides, making the sink aggregate
    * invariant to WHICH of a colliding pair the state store saw first
    * (intra-batch order is not a streaming guarantee). Offset chosen
    * far above any real event_id (max 99,999 at sf0.1). */
  private val DupOffset = 10000000L

  /** Inject a lightly-disguised replay copy for every third doc (same
    * user/type/ts; id offset per [[DupOffset]]); sentinels (negative
    * ids) are never copied. The copy's TEXT disguise is applied by the
    * row's kafka-shaping, keyed off the offset. */
  private def injectVariantCopies(batch: Seq[TypedEvent]): Seq[TypedEvent] =
    batch.flatMap(e =>
      if (e.event_id >= 0 && e.event_id % 3 == 0)
        Seq(e, e.copy(event_id = e.event_id + DupOffset)) else Seq(e))

  /** Deterministic synthetic tweet text for a replay doc: 20 tokens,
    * each embedding the doc id verbatim — so token sets (hence 3-gram
    * shingle sets, hence MinHash band keys) are PROVABLY disjoint
    * across distinct docs, and the only near-dup pairs in the fixture
    * are the ones st10 plants. That is what makes a full hash row
    * (rather than a floor-contract row) honest here: zero accidental
    * collisions by construction, not by measured luck. */
  private def docTokens(base: Column): Column =
    transform(sequence(lit(0), lit(19)),
      i => concat(lit("e"), base, lit("x"), i))

  /** Replay events as Kafka-shaped tweet messages (the [[TweetIngest]]
    * input shape): key = raw event_id (copies get distinct keys),
    * value = the reference's Twitter-envelope JSON with a synthetic
    * text chosen per (doc id, is-variant-copy) by `text`. Micros-exact
    * timestampFormat so created_at (the watermark column) round-trips
    * the JSON hop losslessly. */
  private def kafkaShaped(ds: Dataset[TypedEvent],
      text: (Column, Column) => Column): DataFrame = {
    val base = col("event_id") % DupOffset
    val isVariant = col("event_id") >= DupOffset
    ds.toDF().select(
      col("event_id").cast("string").as("key"),
      to_json(
        struct(struct(
          (col("event_id") % DupOffset).cast("string").as("id"),
          col("ts").as("created_at"),
          text(base, isVariant).as("text")).as("data")),
        Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")).as("value"),
      col("event_type").as("topic"))
  }

  /** Shared sink tail for the content/near-dup gates: doc identity is
    * recovered from the Kafka key ([[DupOffset]] encoding), so every
    * aggregate column is invariant to which copy of a colliding pair
    * survived; `n_rows` vs `n_docs` is the teeth — ONE surviving
    * injected copy splits them and the hash goes red. */
  private def dedupSinkTail(sink: DataFrame): DataFrame =
    sink.filter(col("topic") =!= "__flush")
      .withColumn("base", col("key").cast("long") % DupOffset)
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("base")).as("n_docs"),
        sum(col("base")).as("id_sum"))

  /** The oracle for both dedup gates is the PLAIN slice aggregate — it
    * never models the injection, because "the replays are invisible at
    * the sink" is precisely the claim (the st08 device, one tier up
    * the dedup ladder). */
  private val dedupOracle: String =
    s"""SELECT event_type AS topic,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(DISTINCT event_id) AS BIGINT) AS n_docs,
      |       CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM events WHERE user_id % $UserMod = 0
      |GROUP BY event_type""".stripMargin

  /** st09 — CONTENT-level stream dedup ([[TweetIngest.contentDedupedParse]],
    * the F3 ladder's second rung) proven at the driver: every third doc
    * is replayed inside its micro-batch as an UPPERCASED copy under a
    * different Kafka key and different raw bytes — so only the
    * normalized-content fingerprint (lowercase, whitespace-collapsed)
    * can identify it — and the sink hash-matches the plain slice
    * aggregate that never saw a copy. Deterministic by construction:
    * normalization is exact, copies arrive in the same chronological
    * micro-batch as their original (never late), and distinct docs
    * have disjoint texts ([[docTokens]]). Also gates the JSON
    * round-trip: a copy with a null parsed event time would bypass
    * watermark state and surface as n_rows > n_docs. */
  val streamContentDedupQ: GraftQuery = GraftQuery(
    "st09_stream_content_dedup", dedupOracle) { (spark, sf) =>
    dedupSinkTail(
      runReplay(spark, sf, injectVariantCopies, coarse = true) { ds =>
        TweetIngest.contentDedupedParse(kafkaShaped(ds, (base, isVariant) => {
          val t = concat_ws(" ", docTokens(base))
          when(isVariant, upper(t)).otherwise(t)
        }))
      })
  }

  /** st10 — NEAR-dup stream dedup ([[TweetIngest.nearDupDedupedParse]],
    * the top F3 rung — batch d03's streaming twin) proven at the
    * driver: every third doc is replayed with a trailing tracker token
    * appended (the classic re-crawl mutation; J = 18/19 ≈ 0.947, far
    * above the 0.6 band-geometry midpoint), under a different key, raw
    * bytes, AND content fingerprint — only a shared MinHash band can
    * drop it. The sink hash-matches the never-injected slice
    * aggregate at all 3 sfs. Two claims ride on one hash: no injected
    * copy survives (miss probability per copy (1−J⁴)⁸ ≈ 2·10⁻⁶ —
    * ~0.01 expected misses across sf0.1's ~4.8k copies; deterministic
    * per fixture, verified green at every sf), and NO original is
    * falsely dropped — docs have provably disjoint shingle sets
    * ([[docTokens]]), so a missing doc identity would shrink n_docs.
    * The mid-similarity false-drop rate of the per-band OR path (docs
    * BELOW the 0.6 contract) is measured in StreamDedupSpec against
    * the 1−(1−J⁴)⁸ envelope — that trade is a property of the band
    * geometry, not of this fixture. */
  val streamNearDupDedupQ: GraftQuery = GraftQuery(
    "st10_stream_neardup_dedup", dedupOracle) { (spark, sf) =>
    dedupSinkTail(
      runReplay(spark, sf, injectVariantCopies, coarse = true) { ds =>
        TweetIngest.nearDupDedupedParse(kafkaShaped(ds, (base, isVariant) => {
          val toks = docTokens(base)
          when(isVariant,
            concat_ws(" ", concat(toks, array(concat(lit("trk"), base)))))
            .otherwise(concat_ws(" ", toks))
        }))
      })
  }

  /** st11 — event-time tumbling WINDOW aggregation under a watermark
    * ([[TweetIngest.windowedTopicCounts]] — SURVEY §2.9's "Windows"
    * row, the idiomatic streaming alternative to the hourly batch
    * tier; previously unit-only), gated at the driver: the replayed
    * slice flows kafka-shaped through parse → 2 h watermark → 1-hour
    * window counts in APPEND mode, so only watermark-FINALIZED windows
    * reach the sink, and the finalized relation hash-matches the plain
    * batch hour×topic aggregate. Determinism argument: the schedule is
    * time-ordered across chunks (disorder only INSIDE a chunk, and
    * finalization uses the start-of-batch watermark, so within-chunk
    * reversal can never cross it), and the sentinel batches push the
    * watermark two days past max event time, closing every real
    * window; the sentinels' own __flush windows are dropped at the
    * sink tail. A window that finalized early (losing late rows), fired
    * twice, or never closed splits the hash. */
  val streamWindowCountsQ: GraftQuery = GraftQuery(
    "st11_stream_window_counts",
    s"""SELECT event_type AS topic,
      |       date_trunc('hour', ts) AS hour_start,
      |       CAST(count(*) AS BIGINT) AS counts
      |FROM events WHERE user_id % $UserMod = 0
      |GROUP BY 1, 2""".stripMargin) { (spark, sf) =>
    runReplay(spark, sf) { ds =>
      TweetIngest.windowedTopicCounts(TweetIngest.parse(
        kafkaShaped(ds, (base, _) => concat_ws(" ", docTokens(base)))))
    }
      .filter(col("topic") =!= "__flush")
      .select(col("topic"), col("hour_start"), col("counts"))
  }

  /** st12 — streaming ingest composed with INCREMENTAL INDEX
    * MAINTENANCE: the base posting generation is written once, then
    * the delta slice (vec_id % 10 == 0) arrives through a real
    * Structured Streaming query whose foreachBatch calls
    * [[graft.sources.SignatureLake.appendEmbeddingDelta]] per
    * micro-batch — the production shape where the stream IS the
    * index's ingest path (each micro-batch hashes only its own
    * vectors; SaveMode.Append validates the bucket spec, so a
    * micro-batch can never de-bucket the index). Two claims ride one
    * hash, both replayed by the d26-style oracle: (1) conservation —
    * the streamed lake full-outer-matches the independent full-corpus
    * assignment, posting for posting; (2) RETRIEVAL — an s21-style
    * within-bucket top-k serve off the streamed lake retrieves
    * mid-stream vectors, and the count of distinct delta neighbors
    * retrieved matches the oracle's replay of the same serve over the
    * full assignment (a lost or mis-bucketed append would shift the
    * count). The delta fixture is driver-collected (a bounded audit
    * slice, the [[schedule]] convention) and split into three
    * micro-batches; the throwaway generation table is dropped after
    * the result is localized, so bench reps rebuild deterministically
    * (the c19 fresh-store pattern). */
  val streamIndexAppendQ: GraftQuery = GraftQuery(
    "st12_stream_index_append",
    s"""WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ab AS (${graft.operators.DedupOps.portableAnnBucketsSql}),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM ev),
      |sz AS (SELECT tbl, bucket, count(*) AS bn FROM ab GROUP BY 1, 2),
      |ok AS (SELECT tbl, bucket FROM sz
      |       WHERE bn <= ${graft.operators.SimilarityOps.MaxBucket}),
      |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
      |         FROM ab a JOIN ok USING (tbl, bucket)
      |         JOIN ab b ON a.tbl = b.tbl AND a.bucket = b.bucket
      |          AND a.vec_id <> b.vec_id
      |         WHERE a.vec_id % ${graft.operators.SimilarityOps.GraphSampleMod} = 0),
      |p AS (SELECT c.vec_id, c.neighbor_id,
      |        CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN 0.0
      |             ELSE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) END AS cos_sim
      |      FROM cand c JOIN n na ON na.vec_id = c.vec_id
      |                  JOIN n nb ON nb.vec_id = c.neighbor_id),
      |ar AS (SELECT vec_id, neighbor_id,
      |         row_number() OVER (PARTITION BY vec_id
      |                            ORDER BY cos_sim DESC, neighbor_id) AS rank
      |       FROM p),
      |srv AS (SELECT CAST(count(DISTINCT CASE WHEN neighbor_id % 10 = 0
      |                 THEN neighbor_id END) AS BIGINT) AS n_delta_neighbors
      |        FROM ar WHERE rank <= ${graft.operators.SimilarityOps.PortableKnnK})
      |SELECT CAST((SELECT count(*) FROM ab) AS BIGINT) AS n_postings,
      |       TRUE AS matches_full, srv.n_delta_neighbors
      |FROM srv""".stripMargin) { (spark, sf) =>
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.functions.VectorFunctions.toDouble
    import graft.sources.SignatureLake
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // driver-collected delta fixture, three chronological micro-batches
    val delta = emb.filter(col("vec_id") % 10 === 0)
      .as[EmbRow].collect().sortBy(_.vec_id).toSeq
    val chunks = delta.grouped(math.max(1, (delta.size + 2) / 3)).toSeq
    val table = s"graft_lake_st12append_${sf.replaceAll("[^A-Za-z0-9]+", "_")}" +
      s"_p${ProcessHandle.current().pid()}_s${nameCounter.incrementAndGet()}"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    SignatureLake.appendEmbeddingDelta(spark, table,
      emb.filter(col("vec_id") % 10 =!= 0)) // generation 0: the base build
    try {
      val ckpt = scratchCkptDir("graft_st12")
      try {
        val source = MemoryStream[EmbRow]
        val q = source.toDS().toDF("vec_id", "v")
          .writeStream
          .foreachBatch((batch: DataFrame, _: Long) =>
            SignatureLake.appendEmbeddingDelta(spark, table, batch))
          .option("checkpointLocation", ckpt.toString)
          .start()
        try {
          chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
        } finally q.stop()
      } finally rmScratch(ckpt)
      val postings = spark.table(table)
      val full = SignatureLake.portableAnnBuckets(spark, sf)
        .select(col("vec_id"), col("table").as("tbl"),
          col("bucket").as("bucket_full"))
      val conserve = postings
        .select(col("vec_id"), col("tbl"), col("bucket").as("bucket_inc"))
        .join(full, Seq("vec_id", "tbl"), "full_outer")
        .agg(
          coalesce(sum(when(col("bucket_inc").isNotNull, 1L).otherwise(0L)),
            lit(0L)).as("n_postings"),
          (coalesce(sum(when(col("bucket_inc") <=> col("bucket_full"), 0L)
            .otherwise(1L)), lit(0L)) === 0L).as("matches_full"))
      val serve = graft.operators.SimilarityOps
        .lshLakeServe(postings, metric = "st12_serve_guard")
        .agg(countDistinct(when(col("neighbor_id") % 10 === 0,
          col("neighbor_id"))).as("n_delta_neighbors"))
      val out = conserve.crossJoin(broadcast(serve))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  /** st13 — TAKEDOWNS arriving on the stream (st12's delete twin,
    * completing the stream × index-maintenance matrix): the posting
    * lake is built for the full corpus, then the tombstone batch
    * (vec_id % 7 == 3 — the d28/d29/s22 takedown slice) arrives
    * through a real streaming query whose foreachBatch calls
    * [[graft.sources.SignatureLake.appendTombstones]] per micro-batch
    * — the production right-to-be-forgotten path, where delete
    * requests are a stream like everything else and each batch is one
    * bounded append to the tombstone store, never an index rewrite.
    * The gate serves off the tombstone-MASKED view and one d29-style
    * oracle hash carries three claims: conservation (masked view ≡
    * full assignment over survivors), retrieval still works (the
    * distinct-neighbor count of an s21-style serve over the masked
    * lake replays exactly over the surviving assignment — note the
    * bucket cap is measured over SURVIVORS), and NO deleted vector is
    * retrievable (the oracle pins n_deleted_neighbors at literal 0;
    * the engine counts what the masked serve actually returned). */
  val streamTombstoneQ: GraftQuery = GraftQuery(
    "st13_stream_tombstone_delete", {
      import graft.operators.DedupOps.{TombMod, TombRem}
      import graft.operators.SimilarityOps.{GraphSampleMod, MaxBucket, PortableKnnK}
      s"""WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ab0 AS (${graft.operators.DedupOps.portableAnnBucketsSql}),
        |ab AS (SELECT * FROM ab0 WHERE vec_id % $TombMod <> $TombRem),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM ev),
        |sz AS (SELECT tbl, bucket, count(*) AS bn FROM ab GROUP BY 1, 2),
        |ok AS (SELECT tbl, bucket FROM sz WHERE bn <= $MaxBucket),
        |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
        |         FROM ab a JOIN ok USING (tbl, bucket)
        |         JOIN ab b ON a.tbl = b.tbl AND a.bucket = b.bucket
        |          AND a.vec_id <> b.vec_id
        |         WHERE a.vec_id % $GraphSampleMod = 0),
        |p AS (SELECT c.vec_id, c.neighbor_id,
        |        CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN 0.0
        |             ELSE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) END AS cos_sim
        |      FROM cand c JOIN n na ON na.vec_id = c.vec_id
        |                  JOIN n nb ON nb.vec_id = c.neighbor_id),
        |ar AS (SELECT vec_id, neighbor_id,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY cos_sim DESC, neighbor_id) AS rank
        |       FROM p),
        |srv AS (SELECT CAST(count(DISTINCT neighbor_id) AS BIGINT) AS n_neighbors
        |        FROM ar WHERE rank <= $PortableKnnK)
        |SELECT CAST((SELECT count(*) FROM ab) AS BIGINT) AS n_postings,
        |       TRUE AS matches_full, srv.n_neighbors,
        |       CAST(0 AS BIGINT) AS n_deleted_neighbors
        |FROM srv""".stripMargin
    }) { (spark, sf) =>
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.functions.VectorFunctions.toDouble
    import graft.operators.DedupOps.{TombMod, TombRem}
    import graft.sources.SignatureLake
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val deleted = emb.filter(col("vec_id") % TombMod === TombRem)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    val chunks = deleted.grouped(math.max(1, (deleted.size + 2) / 3)).toSeq
    val table = s"graft_lake_st13tomb_${sf.replaceAll("[^A-Za-z0-9]+", "_")}" +
      s"_p${ProcessHandle.current().pid()}_s${nameCounter.incrementAndGet()}"
    val tomb = s"${table}_tomb"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $tomb")
    SignatureLake.appendEmbeddingDelta(spark, table, emb) // full-corpus build
    // bootstrap an EMPTY tombstone store before the stream: a corpus
    // whose takedown slice is empty fires no micro-batch, and the
    // masked serve below must degrade to a no-op takedown, not fail
    // to resolve the side table
    SignatureLake.appendTombstones(spark, table,
      emb.select(col("vec_id")).limit(0), "vec_id")
    try {
      val ckpt = scratchCkptDir("graft_st13")
      try {
        val source = MemoryStream[Long]
        val q = source.toDS().toDF("vec_id")
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            SignatureLake.appendTombstones(spark, table, batch, "vec_id"); ()
          }
          .option("checkpointLocation", ckpt.toString)
          .start()
        try {
          chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
        } finally q.stop()
      } finally rmScratch(ckpt)
      val served = SignatureLake.maskTombstones(
        spark.table(table), spark.table(tomb), "vec_id")
      val full = SignatureLake.portableAnnBuckets(spark, sf)
        .filter(col("vec_id") % TombMod =!= TombRem)
        .select(col("vec_id"), col("table").as("tbl"),
          col("bucket").as("bucket_full"))
      val conserve = served
        .select(col("vec_id"), col("tbl"), col("bucket").as("bucket_inc"))
        .join(full, Seq("vec_id", "tbl"), "full_outer")
        .agg(
          coalesce(sum(when(col("bucket_inc").isNotNull, 1L).otherwise(0L)),
            lit(0L)).as("n_postings"),
          (coalesce(sum(when(col("bucket_inc") <=> col("bucket_full"), 0L)
            .otherwise(1L)), lit(0L)) === 0L).as("matches_full"))
      val serve = graft.operators.SimilarityOps
        .lshLakeServe(served, metric = "st13_serve_guard")
        .agg(
          countDistinct(col("neighbor_id")).as("n_neighbors"),
          coalesce(sum(when(col("neighbor_id") % TombMod === TombRem, 1L)
            .otherwise(0L)), lit(0L)).as("n_deleted_neighbors"))
      val out = conserve.crossJoin(broadcast(serve))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $tomb")
    }
  }

  final case class DocRow(doc_id: Long, source: String, text: String)

  /** One st14 micro-batch, IDEMPOTENT under Structured Streaming's
    * at-least-once foreachBatch contract: the batch stages under a
    * batchId-named subdirectory with overwrite — a replayed batchId
    * replaces its own staging rather than doubling it (the sink side
    * already has the two-rename discipline; this is the source side
    * of the same guarantee) — and the hour recompute reads
    * initial ∪ ALL staged batches, so re-running any batchId leaves
    * the store byte-equal to the first run. StreamReplaySpec proves
    * both: a literal double-invocation with the same batchId, and a
    * stop/restart-from-checkpoint mid-stream. */
  private[graft] def st14UpsertBatch(spark: SparkSession,
      sink: graft.pipeline.CompactingAggregateSink, initial: DataFrame,
      staging: String, batch: DataFrame, batchId: Long): Unit = {
    import graft.operators.ChartRegistry
    batch.write.mode("overwrite").parquet(s"$staging/batch_$batchId")
    val affected = batch
      .select((col("doc_id") % ChartRegistry.HourBuckets).as("bucket"))
      .distinct()
    def inAffected(d: DataFrame): DataFrame =
      d.join(broadcast(affected),
        (col("doc_id") % ChartRegistry.HourBuckets) === col("bucket"),
        "left_semi")
    val relevant = inAffected(initial.select("doc_id", "source", "text"))
      .unionByName(inAffected(spark.read.parquet(s"$staging/batch_*")))
    sink.replaceHours(spark, ChartRegistry.aggregatesPlanFrom(relevant))
  }

  /** st14 — LATE DATA arriving on the stream, absorbed by hour-level
    * UPSERTS of the aggregate store (c23's stream twin, and the
    * composition the maintenance matrix was missing: st12/st13
    * maintain the INDEX from a stream; this maintains the SERVING
    * STORE). The store is built from the initial load, then the late
    * slice (c23's model: doc_id % 5 == 0 within hour buckets
    * h % 7 == 3) arrives through a real Structured Streaming query
    * whose foreachBatch (1) appends the raw docs to a staging lake
    * and (2) recomputes ONLY the hour buckets the batch touches —
    * from initial ∪ staged-so-far, so a bucket hit by two
    * micro-batches is re-upserted with everything it has received —
    * and swaps them in via
    * [[graft.pipeline.CompactingAggregateSink.replaceHours]] (the
    * two-rename publish, every crash window self-healing). The gate
    * is maximal: after the last batch the store must serve EXACTLY
    * the full-corpus c01 relation (the oracle never models the
    * stream, the staging, or the upserts), `recomputed` is re-derived
    * by the oracle from the late-arrival model, and `store_rows` pins
    * the store's physical content to the full-corpus pre-dedup
    * aggregate count — an upsert that dropped, doubled, or
    * half-filled an hour splits the hash. */
  val streamUpsertQ: GraftQuery = GraftQuery(
    "st14_stream_upsert_recompute", {
      import graft.operators.ChartRegistry
      ChartRegistry.withProcessed(
        s"""SELECT p.*,
          |       (date_diff('hour', TIMESTAMP '${ChartRegistry.Epoch}', p.date_hour)
          |          % ${ChartRegistry.LateHourMod} = 3
          |        AND EXISTS (SELECT 1 FROM documents d
          |                    WHERE d.doc_id % ${ChartRegistry.HourBuckets} =
          |                          date_diff('hour', TIMESTAMP '${ChartRegistry.Epoch}', p.date_hour)
          |                      AND d.doc_id % ${ChartRegistry.LateDocMod} = 0)) AS recomputed,
          |       (SELECT CAST(count(*) AS BIGINT) FROM aggregates) AS store_rows
          |FROM processed p""".stripMargin)
    }) { (spark, sf) =>
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.ChartRegistry
    val docs = Tables.documents(spark, sf)
    val bucket = col("doc_id") % ChartRegistry.HourBuckets
    val isLate = (bucket % ChartRegistry.LateHourMod === 3) &&
      (col("doc_id") % ChartRegistry.LateDocMod === 0)
    val initial = docs.filter(!isLate)
    val sink = ChartRegistry.freshSink(sf, "st14")
    sink.append(ChartRegistry.aggregatesPlanFrom(initial))
    val late = docs.filter(isLate).select("doc_id", "source", "text")
      .as[DocRow].collect().sortBy(_.doc_id).toSeq
    val chunks = late.grouped(math.max(1, (late.size + 2) / 3)).toSeq
    val staging = java.nio.file.Files
      .createTempDirectory("graft_st14_staging").toString + "/docs"
    val ckpt = scratchCkptDir("graft_st14")
    try {
      val source = MemoryStream[DocRow]
      val q = source.toDS().toDF("doc_id", "source", "text")
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          st14UpsertBatch(spark, sink, initial, staging, batch, batchId)
        }
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      val store = sink.readBack(spark)
      val served = graft.serving.ChartQueries.processData(store)
      val lateBuckets = docs.filter(isLate)
        .select(bucket.as("b")).distinct()
        .select(expr(s"timestampadd(HOUR, CAST(b AS INT), " +
          s"TIMESTAMP'${ChartRegistry.Epoch}')").as("__ch"))
      val out = served
        .join(broadcast(lateBuckets), col("date_hour") === col("__ch"), "left")
        .withColumn("recomputed", col("__ch").isNotNull)
        .drop("__ch")
        .crossJoin(broadcast(store.agg(count(lit(1)).as("store_rows"))))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally Seq(ckpt, java.nio.file.Paths.get(staging).getParent)
      .foreach(rmScratch)
  }

  /** st15 — the LEXICAL index joins the stream-maintained-index
    * matrix (ANN postings st12, tombstones st13, serving store st14 —
    * and now term postings): the base 9/10 of the corpus is indexed
    * once, then the delta slice (doc_id % 10 == 7) arrives through a
    * real streaming query whose foreachBatch calls
    * [[graft.sources.SignatureLake.appendTermPostings]] — each
    * micro-batch tokenizes only its own documents, and the
    * term-bucketed Append can never de-bucket the index. The gate
    * serves the PRODUCTION ranking — s30's budget-capped two-tier
    * serve (bm25RankCapped: champion tier + exact rescore, s29's
    * posting budget enforced) — off the streamed lake with corpus
    * statistics (N, L, df) derived from the lake rows themselves
    * (the index as single source of truth), against the capped
    * chain's full-recompute oracle: a lost posting shifts df/L and
    * splits score hashes corpus-wide, a lost delta doc drops a result
    * row. The uncapped parity serve stays s27's row; this row is the
    * one that must look like production at 100 TB, so it carries the
    * cap. `n_delta_hits` additionally pins that mid-stream documents
    * are actually RETRIEVED (non-vacuous at every sf), replayed by
    * the oracle over its own result relation. */
  val streamTermPostingsQ: GraftQuery = GraftQuery(
    "st15_stream_term_postings", {
      import graft.operators.SimilarityOps
      s"""WITH ${SimilarityOps.bm25CappedOracleCtes("TRUE")},
        |res AS (SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
        |               score_scaled
        |        FROM rkc WHERE rank <= ${SimilarityOps.Bm25TopK})
        |SELECT r.*, (SELECT CAST(count(*) AS BIGINT) FROM res
        |             WHERE doc_id % ${graft.operators.DedupOps.DocDeltaMod} = ${graft.operators.DedupOps.DocDeltaRem}) AS n_delta_hits
        |FROM res r""".stripMargin
    }) { (spark, sf) =>
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.SimilarityOps
    import graft.sources.SignatureLake
    val docs = Tables.documents(spark, sf)
    val isDelta = col("doc_id") % graft.operators.DedupOps.DocDeltaMod === graft.operators.DedupOps.DocDeltaRem
    val table = s"graft_lake_st15terms_${sf.replaceAll("[^A-Za-z0-9]+", "_")}" +
      s"_p${ProcessHandle.current().pid()}_s${nameCounter.incrementAndGet()}"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    SignatureLake.appendTermPostings(spark, table, docs.filter(!isDelta))
    val delta = docs.filter(isDelta).select("doc_id", "source", "text")
      .as[DocRow].collect().sortBy(_.doc_id).toSeq
    val chunks = delta.grouped(math.max(1, (delta.size + 2) / 3)).toSeq
    try {
      val ckpt = scratchCkptDir("graft_st15")
      try {
        val source = MemoryStream[DocRow]
        val q = source.toDS().toDF("doc_id", "source", "text")
          .writeStream
          .foreachBatch((batch: DataFrame, _: Long) =>
            SignatureLake.appendTermPostings(spark, table, batch))
          .option("checkpointLocation", ckpt.toString)
          .start()
        try {
          chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
        } finally q.stop()
      } finally rmScratch(ckpt)
      // post-stream maintenance write: materialize impacts + champion
      // tier over the streamed lake, then serve off those tables —
      // the production two-tier serve with no window over the posting
      // relation on the serve plan (r15)
      val termServe = SignatureLake.writeTermServeTables(spark, table)
      val served = SimilarityOps.bm25RankCappedFromTier(
        SimilarityOps.bm25QueryTerms(docs, SimilarityOps.Bm25QueryMod),
        termServe.impacts, termServe.tier, SimilarityOps.Bm25TopK,
        excludeSelf = false, budget = SimilarityOps.PostingBudget)
      val out = served.crossJoin(broadcast(
        served.filter(col("doc_id") % graft.operators.DedupOps.DocDeltaMod === graft.operators.DedupOps.DocDeltaRem)
          .agg(count(lit(1)).as("n_delta_hits"))))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally Seq(table, s"${table}_si", s"${table}_tier")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** st16 — the CDC chunk-digest lake joins the stream-maintained-
    * index matrix (band keys st10/st12, tombstones st13, serving
    * store st14, term postings st15 — and now block-level dedup
    * state): the base 9/10 of the corpus is chunked once, then the
    * delta slice (doc_id % 10 == 7) arrives through a real streaming
    * query whose foreachBatch chunks ONLY its own payloads and
    * appends digest-bucketed rows
    * ([[graft.sources.SignatureLake.appendChunkDigests]] — payload
    * bytes never ride a shuffle key, m11's rule, and the chunk rule
    * is the graft_cdc_cuts expression, row-local per batch). The
    * gate serves m13's FULL per-doc dedup report off the lake against
    * m13's unchanged full-recompute oracle text (shared verbatim —
    * [[graft.operators.MultimodalOps.cdcOracleSql]]): a lost or
    * doubled chunk shifts a digest group's keep-first ranks and
    * splits dup_bytes hashes corpus-wide. `n_delta_docs` pins that
    * mid-stream documents actually REPORT (50/50/500 at the three
    * sfs — non-vacuous), replayed by the oracle over its own result
    * relation. */
  val streamChunkLakeQ: GraftQuery = GraftQuery(
    "st16_stream_chunk_lake", {
      import graft.operators.MultimodalOps
      s"""WITH res AS (${MultimodalOps.cdcOracleSql})
        |SELECT r.*, (SELECT CAST(count(*) AS BIGINT) FROM res
        |             WHERE doc_id % ${graft.operators.DedupOps.DocDeltaMod} = ${graft.operators.DedupOps.DocDeltaRem}) AS n_delta_docs
        |FROM res r""".stripMargin
    }) { (spark, sf) =>
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.MultimodalOps
    import graft.sources.SignatureLake
    val isDelta = col("doc_id") % graft.operators.DedupOps.DocDeltaMod === graft.operators.DedupOps.DocDeltaRem
    val table = s"graft_lake_st16chunks_${sf.replaceAll("[^A-Za-z0-9]+", "_")}" +
      s"_p${ProcessHandle.current().pid()}_s${nameCounter.incrementAndGet()}"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    SignatureLake.appendChunkDigests(spark, table,
      MultimodalOps.asCdcPayloads(spark, sf).filter(!isDelta))
    val delta = Tables.documents(spark, sf).filter(isDelta)
      .select("doc_id", "source", "text")
      .as[DocRow].collect().sortBy(_.doc_id).toSeq
    val chunks = delta.grouped(math.max(1, (delta.size + 2) / 3)).toSeq
    try {
      val ckpt = scratchCkptDir("graft_st16")
      try {
        val source = MemoryStream[DocRow]
        val q = source.toDS().toDF("doc_id", "source", "text")
          .writeStream
          .foreachBatch((batch: DataFrame, _: Long) =>
            SignatureLake.appendChunkDigests(spark, table,
              batch.select(col("doc_id"),
                MultimodalOps.cdcPayloadCol(col("doc_id"), col("text"))
                  .as("payload"))))
          .option("checkpointLocation", ckpt.toString)
          .start()
        try {
          chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
        } finally q.stop()
      } finally rmScratch(ckpt)
      val served = MultimodalOps.cdcReport(spark.table(table))
      val out = served.crossJoin(broadcast(
        served.filter(col("doc_id") % graft.operators.DedupOps.DocDeltaMod === graft.operators.DedupOps.DocDeltaRem)
          .agg(count(lit(1)).as("n_delta_docs"))))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  /** st17 — takedowns against the LEXICAL index arriving on the
    * stream (st13's device pointed at the term lake, the stream twin
    * of d34), gated on the PRODUCTION TIER PATH (r16 — the r15
    * verdict's hole): the term-posting lake is built for the full
    * corpus and its impact + champion-tier tables are MATERIALIZED
    * (the maintenance-window write — this happens BEFORE the takedown
    * exists, so pre-takedown corpus stats are baked in, exactly the
    * production timeline), then the tombstone batch (doc_id % 7 == 3,
    * the standard takedown slice) arrives through a real streaming
    * query whose foreachBatch appends doc-id tombstones per
    * micro-batch — never an index rewrite, never a tier recut. The
    * gate serves [[graft.operators.SimilarityOps.bm25RankCappedFromTierMasked]]
    * off those materialized tables with the streamed tombstones
    * anti-joined on BOTH scans, against the masked-tier chain
    * replayed bit-for-bit (stale stats and all —
    * [[graft.operators.SimilarityOps.bm25MaskedTierChainCtes]],
    * shared verbatim with s34, which prices the drift; the
    * mask-before-stats serve stays gated by d34's batch row).
    * `n_deleted_results` is pinned at literal 0 by the oracle while
    * the engine counts what the masked serve actually returned — one
    * leaked tier posting would both split the ranking hash and flip
    * this count. */
  val streamTermTombstoneQ: GraftQuery = GraftQuery(
    "st17_stream_term_tombstone", {
      import graft.operators.DedupOps.{TombMod, TombRem}
      import graft.operators.SimilarityOps
      s"""WITH ${SimilarityOps.bm25PrefixCtes},
        |${SimilarityOps.bm25MaskedTierChainCtes(TombMod, TombRem)},
        |res AS (SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
        |               score_scaled
        |        FROM rkm WHERE rank <= ${SimilarityOps.Bm25TopK})
        |SELECT r.*, CAST(0 AS BIGINT) AS n_deleted_results
        |FROM res r""".stripMargin
    }) { (spark, sf) =>
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.DedupOps.{TombMod, TombRem}
    import graft.operators.SimilarityOps
    import graft.sources.SignatureLake
    val docs = Tables.documents(spark, sf)
    val deleted = docs.filter(col("doc_id") % TombMod === TombRem)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    val chunks = deleted.grouped(math.max(1, (deleted.size + 2) / 3)).toSeq
    val table = s"graft_lake_st17terms_${sf.replaceAll("[^A-Za-z0-9]+", "_")}" +
      s"_p${ProcessHandle.current().pid()}_s${nameCounter.incrementAndGet()}"
    val tomb = s"${table}_tomb"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $tomb")
    SignatureLake.appendTermPostings(spark, table, docs) // full-corpus build
    // the maintenance window's serve-side materialization — written
    // BEFORE any takedown arrives, so the impacts/tier bake in
    // pre-takedown corpus stats (the production timeline s34 prices)
    val termServe = SignatureLake.writeTermServeTables(spark, table)
    // empty-tombstone bootstrap (st13's rule): an empty takedown
    // slice must serve the unmasked ranking, not throw on the
    // unresolvable side table
    SignatureLake.appendTombstones(spark, table,
      docs.select(col("doc_id")).limit(0), "doc_id")
    try {
      val ckpt = scratchCkptDir("graft_st17")
      try {
        val source = MemoryStream[Long]
        val q = source.toDS().toDF("doc_id")
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            SignatureLake.appendTombstones(spark, table, batch, "doc_id"); ()
          }
          .option("checkpointLocation", ckpt.toString)
          .start()
        try {
          chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
        } finally q.stop()
      } finally rmScratch(ckpt)
      val survivors = docs.filter(col("doc_id") % TombMod =!= TombRem)
      val ranking = SimilarityOps.bm25RankCappedFromTierMasked(
        SimilarityOps.bm25QueryTerms(survivors, SimilarityOps.Bm25QueryMod),
        termServe.impacts, termServe.tier, spark.table(tomb),
        SimilarityOps.Bm25TopK, excludeSelf = false,
        budget = SimilarityOps.PostingBudget)
      val out = ranking.crossJoin(broadcast(ranking.agg(
        coalesce(sum(when(col("doc_id") % TombMod === TombRem, 1L)
          .otherwise(0L)), lit(0L)).as("n_deleted_results"))))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally Seq(table, s"${table}_si", s"${table}_tier", tomb)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** st18 — the s33 REFRESH RULE wired into stream-path tier
    * maintenance (st15 recuts si/tier unconditionally post-stream; a
    * deployment recutting per micro-batch would pay a full tier
    * rewrite per batch): the base 9/10 of the corpus is indexed and
    * its impact + champion-tier tables materialized (recut #0), then
    * the delta slice streams in THREE micro-batches whose
    * foreachBatch appends postings and consults
    * [[graft.operators.SimilarityOps.shouldRecutTier]] — the
    * two-counter delta-fraction estimator calibrated by s33's overlap
    * sweep — which must HOLD at every batch (the full delta is 10% of
    * the corpus, under the 15% threshold: `mid_recuts` pinned 0, the
    * advisory's negative branch). The frozen tier then serves the
    * post-append query sample and the gate prices exactly what the
    * hold cost: `frozen_mean_overlap` vs a full recompute, pinned
    * within the [[graft.operators.SimilarityOps.ImpactRefreshFloor]]
    * (`frozen_floor_ok` — the calibration honored, bit-for-bit via
    * the frozen-stats chain). Finally a TAKEDOWN batch streams in and
    * the advisory's other branch fires unconditionally
    * (`total_recuts` pinned 1): the maintenance window folds the
    * tombstones into a physical rewrite and recuts si/tier over the
    * new generation, and the emitted ranking is that post-recut serve
    * — which the oracle replays as the survivor-rebuild chain (fresh
    * stats, fresh tier — shared verbatim with s34's rebuild
    * reference), with `n_deleted_results` pinned 0. 100 TB shape:
    * per-batch cost is two counters; the si+tier rewrite is paid only
    * past the calibrated floor or on takedown. */
  val streamTierMaintenanceQ: GraftQuery = GraftQuery(
    "st18_stream_tier_maintenance", {
      import graft.operators.DedupOps.{TombMod, TombRem}
      import graft.operators.SimilarityOps
      import SimilarityOps.{Bm25TopK, ImpactRefreshFloor, PostingBudget}
      s"""WITH ${SimilarityOps.bm25PrefixCtes},
        |${SimilarityOps.bm25CappedChainCtes(PostingBudget, "", "TRUE")},
        |${SimilarityOps.bm25FrozenSiCtes(s"doc_id % ${graft.operators.DedupOps.DocDeltaMod} <> ${graft.operators.DedupOps.DocDeltaRem}", "b")},
        |${SimilarityOps.bm25CappedChainCtes(PostingBudget, "fb", "TRUE",
           si = "sib")},
        |${SimilarityOps.bm25SurvivorChainCtes(TombMod, TombRem)},
        |fov AS (SELECT CAST(sum(h) AS BIGINT) AS th,
        |          CAST(sum(kf) AS BIGINT) AS tk,
        |          min(CAST(h AS DOUBLE) / kf) AS mino
        |        FROM (SELECT f.query_id, count(*) AS kf,
        |                sum(CASE WHEN c2.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS h
        |              FROM (SELECT query_id, doc_id FROM rkc
        |                    WHERE rank <= $Bm25TopK) f
        |              LEFT JOIN (SELECT query_id, doc_id FROM rkcfb
        |                         WHERE rank <= $Bm25TopK) c2
        |                ON c2.query_id = f.query_id AND c2.doc_id = f.doc_id
        |              GROUP BY f.query_id) pq)
        |SELECT r.query_id, CAST(r.rank AS BIGINT) AS rank, r.doc_id,
        |       r.score_scaled,
        |       CAST(fov.th AS DOUBLE) / fov.tk AS frozen_mean_overlap,
        |       fov.mino AS frozen_min_overlap,
        |       CAST(fov.th AS DOUBLE) / fov.tk >= $ImpactRefreshFloor
        |         AS frozen_floor_ok,
        |       CAST(0 AS BIGINT) AS mid_recuts,
        |       CAST(1 AS BIGINT) AS total_recuts,
        |       CAST(0 AS BIGINT) AS n_deleted_results
        |FROM (SELECT query_id, rank, doc_id, score_scaled FROM rkr
        |      WHERE rank <= $Bm25TopK) r, fov""".stripMargin
    }) { (spark, sf) =>
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.DedupOps.{TombMod, TombRem}
    import graft.operators.SimilarityOps
    import graft.sources.SignatureLake
    val docs = Tables.documents(spark, sf)
    val isDelta = col("doc_id") % graft.operators.DedupOps.DocDeltaMod === graft.operators.DedupOps.DocDeltaRem
    val table = s"graft_lake_st18terms_${sf.replaceAll("[^A-Za-z0-9]+", "_")}" +
      s"_p${ProcessHandle.current().pid()}_s${nameCounter.incrementAndGet()}"
    val tomb = s"${table}_tomb"
    val g2 = s"${table}_g2"
    val owned = Seq(table, s"${table}_si", s"${table}_tier", tomb,
      g2, s"${g2}_si", s"${g2}_tier")
    owned.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      SignatureLake.appendTermPostings(spark, table, docs.filter(!isDelta))
      // recut #0 — the maintenance window's serve-side materialization
      val termServe = SignatureLake.writeTermServeTables(spark, table)
      val baseDocs = docs.filter(!isDelta).count()
      val delta = docs.filter(isDelta).select("doc_id", "source", "text")
        .as[DocRow].collect().sortBy(_.doc_id).toSeq
      val chunks = delta.grouped(math.max(1, (delta.size + 2) / 3)).toSeq
      var appendedDocs = 0L
      var midRecuts = 0L
      // ---- append stream: the advisory is consulted PER BATCH and
      // must hold (two counters — the per-batch cost of this policy)
      val ckpt1 = scratchCkptDir("graft_st18")
      try {
        val source = MemoryStream[DocRow]
        val q = source.toDS().toDF("doc_id", "source", "text")
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            SignatureLake.appendTermPostings(spark, table, batch)
            appendedDocs += batch.count()
            if (SimilarityOps.shouldRecutTier(appendedDocs,
                baseDocs + appendedDocs, takedown = false))
              midRecuts += 1
          }
          .option("checkpointLocation", ckpt1.toString)
          .start()
        try {
          chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
        } finally q.stop()
      } finally rmScratch(ckpt1)
      // the pre-stream si/tier materialization read the posting table,
      // so THIS session holds a cached file listing for it — and the
      // micro-batch appends ran through the stream's cloned session,
      // which never invalidates the parent's cache. Refresh before any
      // post-stream read (the standard move whenever another writer
      // appended to a table you already scanned; without it the
      // recompute leg silently reads the base generation)
      spark.catalog.refreshTable(table)
      // ---- the frozen tier keeps serving between windows; price the
      // hold against a full recompute (the audit leg — s33's shape)
      val qtFull = SimilarityOps.bm25QueryTerms(docs, SimilarityOps.Bm25QueryMod)
      val frozen = SimilarityOps.bm25RankCappedFromTier(qtFull,
          termServe.impacts, termServe.tier, SimilarityOps.Bm25TopK,
          excludeSelf = false, budget = SimilarityOps.PostingBudget)
        .select(col("query_id").as("__cq"), col("doc_id").as("__cd"))
      val recomputed = SimilarityOps.bm25RankCapped(docs, spark.table(table))
      val fOverlap = col("th").cast("double") / col("tk")
      val frozenStats = recomputed.select(col("query_id"), col("doc_id"))
        .join(frozen,
          col("__cq") === col("query_id") && col("__cd") === col("doc_id"),
          "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("kf"),
          sum(when(col("__cd").isNotNull, 1L).otherwise(0L)).as("h"))
        .agg(sum(col("h")).as("th"), sum(col("kf")).as("tk"),
          min(col("h").cast("double") / col("kf")).as("frozen_min_overlap"))
        .select(fOverlap.as("frozen_mean_overlap"), col("frozen_min_overlap"),
          (fOverlap >= SimilarityOps.ImpactRefreshFloor).as("frozen_floor_ok"))
      // ---- takedown stream: tombstones per micro-batch; the
      // advisory's other branch fires unconditionally
      val deleted = docs.filter(col("doc_id") % TombMod === TombRem)
        .select(col("doc_id")).as[Long].collect().sorted.toSeq
      var totalRecuts = 0L
      val ckpt2 = scratchCkptDir("graft_st18")
      try {
        val source = MemoryStream[Long]
        val q = source.toDS().toDF("doc_id")
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            SignatureLake.appendTombstones(spark, table, batch, "doc_id"); ()
          }
          .option("checkpointLocation", ckpt2.toString)
          .start()
        try { source.addData(deleted: _*); q.processAllAvailable() }
        finally q.stop()
      } finally rmScratch(ckpt2)
      val survivors = docs.filter(col("doc_id") % TombMod =!= TombRem)
      val qts = SimilarityOps.bm25QueryTerms(survivors, SimilarityOps.Bm25QueryMod)
      // the advisory is consulted with the REAL counters (delta since
      // recut #0 = everything the stream appended) — takedown=true
      // short-circuits it today, but both arms are live: had the
      // policy not fired, the serve would stay on the FROZEN tier
      // with the tombstones masked (s34's shape), not on a g2 that
      // was never written
      val served =
        if (SimilarityOps.shouldRecutTier(appendedDocs,
            baseDocs + appendedDocs, takedown = true)) {
          // the maintenance window: fold tombstones into a new
          // generation, recut si/tier over it
          SignatureLake.rewriteWithoutTombstones(spark, table, tomb,
            "doc_id", Seq("term"))
          totalRecuts += 1
          val g2Serve = SignatureLake.writeTermServeTables(spark, g2)
          SimilarityOps.bm25RankCappedFromTier(qts,
            g2Serve.impacts, g2Serve.tier, SimilarityOps.Bm25TopK,
            excludeSelf = false, budget = SimilarityOps.PostingBudget)
        } else
          SimilarityOps.bm25RankCappedFromTierMasked(qts,
            termServe.impacts, termServe.tier, spark.table(tomb),
            SimilarityOps.Bm25TopK,
            excludeSelf = false, budget = SimilarityOps.PostingBudget)
      val out = served
        .crossJoin(broadcast(frozenStats))
        .withColumn("mid_recuts", lit(midRecuts))
        .withColumn("total_recuts", lit(totalRecuts))
        .crossJoin(broadcast(served.agg(
          coalesce(sum(when(col("doc_id") % TombMod === TombRem, 1L)
            .otherwise(0L)), lit(0L)).as("n_deleted_results"))))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally owned.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  val all: Seq[GraftQuery] = Seq(
    streamTransitionsQ, streamAttributionQ, streamGapsQ, streamSessionsQ,
    streamEwmaQ, streamAnomalyQ, streamHeavyHittersQ, streamDedupQ,
    streamContentDedupQ, streamNearDupDedupQ, streamWindowCountsQ,
    streamIndexAppendQ, streamTombstoneQ, streamUpsertQ,
    streamTermPostingsQ, streamChunkLakeQ, streamTermTombstoneQ,
    streamTierMaintenanceQ)
}
