package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

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
