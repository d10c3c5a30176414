package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.pipeline.AggregateSink

/** Stream-stream joins and the streaming→serving bridge — the two
  * Structured Streaming surfaces the ingest tier (TweetIngest) and the
  * stateful tier (StatefulOps) don't exercise.
  *
  * The interval join is the streaming analogue of the batch as-of join
  * (operators.TemporalOps): both sides carry watermarks and the join
  * condition bounds event-time distance, which is exactly what lets
  * Spark evict buffered state — an unbounded-condition stream-stream
  * join would hold both streams forever. State per side is
  * O(rate × (lateness + window)), independent of stream length.
  */
object StreamJoins {

  /** Click→purchase attribution: every (purchase, click) pair for the
    * same user where the click happened within `attributionWindow`
    * BEFORE the purchase (inclusive start, strict end: a click at the
    * purchase instant does not attribute — same strictness as the
    * batch as-of join).
    *
    * Inner interval join: Spark derives state cleanup for both sides
    * from the watermarks plus the time-range condition. Inputs are
    * (event_id, user_id, ts) frames; `lateness` is the out-of-order
    * bound for BOTH streams. */
  def clickAttribution(
      clicks: DataFrame, purchases: DataFrame,
      attributionWindow: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      .withWatermark("ts", lateness)
    p.join(c,
      col("click_user") === col("user_id") &&
        col("click_ts") >= col("ts") - expr(s"INTERVAL $attributionWindow") &&
        col("click_ts") < col("ts"))
      .select(col("purchase_id"), col("user_id"), col("ts"),
        col("click_id"), col("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** Streaming→serving bridge: drive the windowed hourly aggregation
    * into an [[AggregateSink]] via foreachBatch — the single-job
    * streaming alternative to the reference's two-tier
    * ingest-then-hourly-batch design (SURVEY.md §2.9 "Execution
    * model"). Append output mode: a window's row is emitted once its
    * watermark closes, so the sink sees each (hour, topic) exactly
    * once per stream run — and the sink's own serving-side dedup
    * (keep-first / latestWins) absorbs re-emission across restarts,
    * because foreachBatch is at-least-once: a batch replayed after a
    * crash-before-checkpoint appends twice. Same contract the
    * reference's Mongo append has, handled the same way. */
  def servingBridge(
      windowedCounts: DataFrame, sink: AggregateSink,
      checkpoint: String): DataStreamWriter[Row] =
    windowedCounts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist before the two actions: foreachBatch recomputes the
        // batch plan per action, so a bare isEmpty guard would run it
        // twice — while no guard at all would land one empty part
        // file per idle trigger, bloating the sink's file listing
        // between compactions (windows close ~hourly; triggers fire
        // far more often)
        batch.persist()
        try { if (!batch.isEmpty) sink.append(batch) }
        finally { batch.unpersist(); () }
      }

  def startServingBridge(
      windowedCounts: DataFrame, sink: AggregateSink,
      checkpoint: String): StreamingQuery =
    servingBridge(windowedCounts, sink, checkpoint)
      .trigger(Trigger.AvailableNow()).start()
}
