package graft.streaming

import graft.SparkSpec

/** The st* gate rows' one load-bearing property the oracle cannot see:
  * the replay harness itself is DETERMINISTIC — the schedule (sort,
  * slice, reverse, sentinels) and the watermark sequence it induces
  * produce the exact same finalized relation on every run, so a gate
  * hash is a statement about the operator, never about scheduling
  * luck. */
class StreamReplaySpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("two replays of the same slice produce identical relations (st01/st04)") {
    val t1 = canon(StreamReplay.streamTransitionsQ.run(spark, sf001))
    val t2 = canon(StreamReplay.streamTransitionsQ.run(spark, sf001))
    assert(t1.nonEmpty && t1 === t2, "transition replay must be run-invariant")
    val s1 = canon(StreamReplay.streamSessionsQ.run(spark, sf001))
    val s2 = canon(StreamReplay.streamSessionsQ.run(spark, sf001))
    assert(s1.nonEmpty && s1 === s2, "session replay must be run-invariant")
  }

  test("replay restores the session's shuffle-partition conf") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    StreamReplay.streamGapsQ.run(spark, sf001).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }

  test("st02 stream credits equal the batch q45 relation on the replay slice") {
    import org.apache.spark.sql.functions.col
    val slice = graft.Tables.events(spark, sf001)
      .filter(col("user_id") % StreamReplay.UserMod === 0)
    val batch = canon(graft.operators.TemporalOps.attribution(slice))
    val stream = canon(StreamReplay.streamAttributionQ.run(spark, sf001))
    assert(stream === batch,
      "stream-computed credits must equal the batch twin in-engine, not only vs DuckDB")
  }

  test("st08 stream dedup equals the undeduplicated batch aggregate on the slice") {
    import org.apache.spark.sql.functions._
    // the gate claim restated in-engine: duplicates injected into the
    // stream are invisible — the sink aggregate equals the PLAIN batch
    // aggregate of the slice, which never saw a duplicate at all
    val slice = graft.Tables.events(spark, sf001)
      .filter(col("user_id") % StreamReplay.UserMod === 0)
    val batch = canon(slice.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum")))
    val stream = canon(StreamReplay.streamDedupQ.run(spark, sf001))
    assert(stream === batch,
      "injected duplicates must vanish at the sink")
  }
}
