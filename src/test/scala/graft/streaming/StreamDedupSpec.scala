package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Content-level streaming dedup contracts: exact replays and lightly
  * edited near-dups drop across micro-batches; distinct, short, and
  * malformed payloads survive; state is watermark-bounded (measured
  * from the query's state-operator metrics, not asserted in prose).
  */
class StreamDedupSpec extends SparkSpec {

  private def msg(id: Int, topic: String, createdAt: String, text: String): KafkaMsg =
    KafkaMsg(
      key = s"K$id".getBytes("UTF-8"),
      value =
        (if (text == null) s"""{"broken": $id"""
         else s"""{"data": {"id": "$id", "created_at": "$createdAt", "text": "$text"}}""")
          .getBytes("UTF-8"),
      topic = topic)

  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearDup = base.split(" ").updated(20, "EDITED").mkString(" ")
  private val unrelated = (1 to 40).map(i => s"zzz$i").mkString(" ")

  private def texts(q: StreamingQuery, table: String): Seq[String] = {
    q.processAllAvailable()
    spark.table(table).select("text").collect().map(r => Option(r.getString(0)).orNull).toSeq
  }

  test("exact content dedup: same text under a new key/topic drops; distinct content survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KafkaMsg]
    val q = TweetIngest.contentDedupedParse(source.toDF())
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      source.addData(
        msg(1, "alpha", "2022-03-01T10:00:00Z", base),
        msg(2, "beta", "2022-03-01T10:05:00Z", "  " + base.toUpperCase + "  "), // normalized replay
        msg(3, "alpha", "2022-03-01T10:10:00Z", unrelated),
        msg(4, "alpha", "2022-03-01T10:15:00Z", null), // malformed a
        msg(5, "alpha", "2022-03-01T10:16:00Z", null)) // malformed b ≠ a
      val out = texts(q, "content_dedup")
      assert(out.count(_ == base) === 1, "exact content replay must drop")
      assert(out.contains(unrelated))
      // two DIFFERENT malformed payloads both survive (raw-bytes fallback)
      assert(out.count(_ == null) === 2)
    } finally q.stop()
  }

  test("near-dup dedup: a one-token edit drops, unrelated and short docs survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KafkaMsg]
    val q = TweetIngest.nearDupDedupedParse(source.toDF())
      .writeStream.format("memory").queryName("near_dedup")
      .outputMode("append").start()
    try {
      source.addData(
        msg(1, "alpha", "2022-03-01T10:00:00Z", base),
        msg(2, "beta", "2022-03-01T10:05:00Z", nearDup),   // 1/40 tokens edited
        msg(3, "alpha", "2022-03-01T10:10:00Z", unrelated),
        msg(4, "alpha", "2022-03-01T10:15:00Z", "hi"),     // < 3 tokens: raw fallback
        msg(5, "alpha", "2022-03-01T10:16:00Z", "yo"),     // different short doc: kept
        msg(6, "alpha", "2022-03-01T10:17:00Z", base))     // exact replay: dropped
      val out = texts(q, "near_dedup")
      assert(out.contains(base))
      assert(!out.contains(nearDup), "near-dup (J≈0.85) must share a band and drop")
      assert(out.contains(unrelated))
      assert(out.contains("hi") && out.contains("yo"))
      assert(out.count(_ == base) === 1)
    } finally q.stop()
  }

  test("near-dup dedup survives a checkpoint restart: state restores, replays still drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lake = java.nio.file.Files.createTempDirectory("nd_lake").toString
    val ckpt = java.nio.file.Files.createTempDirectory("nd_ckpt").toString
    def start(src: MemoryStream[KafkaMsg]) =
      TweetIngest.nearDupDedupedParse(src.toDF())
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", lake)
        .start()

    val source = MemoryStream[KafkaMsg]
    source.addData(msg(1, "a", "2022-03-01T10:00:00Z", base))
    val q = start(source)
    q.processAllAvailable(); q.stop()

    // restart from the same checkpoint (8 chained dedup state stores
    // must all restore); a near-dup of the pre-restart doc arrives
    source.addData(
      msg(2, "b", "2022-03-01T10:05:00Z", nearDup),
      msg(3, "a", "2022-03-01T10:06:00Z", unrelated))
    val q2 = start(source)
    q2.processAllAvailable(); q2.stop()

    val texts = spark.read.parquet(lake).select("text")
      .collect().map(_.getString(0)).toSeq
    assert(texts.contains(base) && texts.contains(unrelated))
    assert(!texts.contains(nearDup),
      "near-dup of a PRE-RESTART doc must drop against restored state")
    assert(texts.size === 2)
  }

  test("near-dup state is watermark-bounded: old band keys evict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KafkaMsg]
    val q = TweetIngest.nearDupDedupedParse(source.toDF())
      .writeStream.format("memory").queryName("near_dedup_state")
      .outputMode("append").start()
    try {
      source.addData(
        msg(1, "a", "2022-03-01T10:00:00Z", base),
        msg(2, "a", "2022-03-01T10:01:00Z", unrelated))
      q.processAllAvailable()
      val full = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(full > 0L, "dedup state must exist after the first batch")
      // 6 hours later (watermark 2h): batch-1 keys are beyond the
      // watermark — the next batches must evict them
      source.addData(msg(3, "a", "2022-03-01T16:00:00Z", "fresh words only here"))
      q.processAllAvailable()
      source.addData(msg(4, "a", "2022-03-01T16:01:00Z", "another new doc arrives"))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after < full + 16,
        s"state grew unbounded: $full -> $after (eviction never happened)")
      // a replay of batch-1 content AFTER eviction is admitted again —
      // watermark semantics, the documented trade
      source.addData(msg(5, "b", "2022-03-01T16:02:00Z", base))
      val out = texts(q, "near_dedup_state")
      assert(out.count(_ == base) === 2)
    } finally q.stop()
  }
}
