package graft.pipeline

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.streaming.{HourlyClock, TweetIngest}

/** The hourly batch driver — replaces the reference's wall-clock sleep
  * loop (spark_app/main.py:93-111) with a single long-lived
  * SparkSession and an injectable clock. Each cycle:
  *
  *   previous-hour lake partition (partition-pruned read) →
  *   classifier enrichment → HourlyAggregate → sink.append
  *
  * Unlike the reference (functions.py:75-86, which sleeps an hour and
  * then reads the *current* hour), a missing/empty partition is handled
  * explicitly: the cycle is skipped and reported. Late data still lands
  * in its event-time partition; the optional watermarked streaming
  * aggregation in TweetIngest covers the late-data path.
  */
final class HourlyScheduler(
    spark: SparkSession,
    lakeRoot: String,
    sink: AggregateSink,
    sentiment: TextClassifier = LexiconSentimentClassifier,
    emotion: TextClassifier = KeywordEmotionClassifier,
    maxDriverRows: Int = HourlyScheduler.MaxDriverAggRows) {

  /** Enrich one hour of lake rows with both classifiers. */
  def enrich(hourRows: DataFrame): DataFrame =
    emotion.annotate(sentiment.annotate(hourRows, "text"), "text")
      .select(col("created_at"), col("text"), col("topic"),
        col("sentiment"), col("emotion"))

  /** Run one cycle for the hour preceding `now`.
    *
    * The enriched frame is persisted across the aggregate's two branch
    * reads and released before returning — a long-lived hourly loop
    * must not accumulate one cached DataFrame per cycle. The aggregate
    * (≤ |topics| rows by construction — the broadcast-join of two
    * per-topic relations) is materialized ONCE with a single action and
    * appended as a local relation: the row count is free, a failed
    * append can be retried without recomputation, and no Observation
    * listener is left registered when the sink throws (Spark offers no
    * public unregister for an un-fired Observation).
    *
    * @return number of aggregate rows appended (0 = empty partition) */
  def runOnce(now: LocalDateTime): Long = {
    val (date, hour) = HourlyClock.previousHour(now)
    val rows = TweetIngest.readHour(spark, lakeRoot, date, hour)
    if (rows.isEmpty) 0L
    else {
      val enriched = enrich(rows).persist(StorageLevel.MEMORY_AND_DISK)
      val (batch, n) =
        try {
          val agg = HourlyAggregate.aggregate(enriched, stampTime = true)
          // bounded-grain contract, ENFORCED (the replaceHours rule —
          // no implicit driver materialization): collect through a
          // limit one past the bound, so a contract violation costs
          // one extra row, never an unbounded driver heap, and fails
          // with the diagnosis instead of an OOM.
          val collected = agg.limit(maxDriverRows + 1).collect()
          require(collected.length <= maxDriverRows,
            s"HourlyScheduler.runOnce: hourly aggregate for $date $hour:00 " +
              s"exceeds the per-(topic, hour) driver bound of $maxDriverRows " +
              s"rows — the aggregate grain is per-topic, so this means " +
              s"either a grain regression in HourlyAggregate or a topic " +
              s"cardinality this deployment must raise maxDriverRows for")
          (spark.createDataFrame(
            java.util.Arrays.asList(collected: _*), agg.schema),
            collected.length.toLong)
        } finally {
          enriched.unpersist()
        }
      sink.append(batch)
      n
    }
  }

  /** Fire once per wall-clock hour change (reference main.py:96-111),
    * bounded by `cycles` for testability.
    *
    * @param failFast propagate a cycle failure (reference parity: its
    *        loop dies on any error). With false, a failed hour is
    *        reported as -1 and the loop keeps running — a transient
    *        sink outage shouldn't cost every subsequent hour; the
    *        at-least-once sink contract means the hour can be replayed. */
  def loop(
      clock: () => LocalDateTime, cycles: Int, pollMs: Long = 1000,
      failFast: Boolean = true): Seq[Long] = {
    var lastHour = -1
    val results = Seq.newBuilder[Long]
    var remaining = cycles
    while (remaining > 0) {
      val now = clock()
      if (now.getHour != lastHour) {
        lastHour = now.getHour
        results += (try runOnce(now) catch {
          case e: Exception if !failFast =>
            System.err.println(s"[scheduler] cycle for $now failed: ${e.getMessage}")
            -1L
        })
        remaining -= 1
      } else Thread.sleep(pollMs)
    }
    results.result()
  }
}

object HourlyScheduler {
  /** Driver-side bound on one cycle's aggregate (rows per hour = rows
    * per topic by construction — HourlyAggregate joins two per-topic
    * relations). The collect at [[HourlyScheduler.runOnce]] is sized by
    * this, and a cycle whose aggregate exceeds it FAILS with the
    * diagnosis instead of growing the driver heap: at a few hundred
    * bytes per aggregate row, 10k rows is ~MBs — far under any driver
    * budget — while any true grain regression (e.g. an accidental
    * per-tweet aggregate) blows past it immediately. */
  val MaxDriverAggRows = 10000
}
