package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Kafka-shaped message fixture row (the ingest tests' and bench's
  * stand-in for the Kafka source schema — S6 harness plumbing; a real
  * broker feeds the same columns). */
case class KafkaMsg(key: Array[Byte], value: Array[Byte], topic: String)

/** Streaming ingest throughput: drive [[TweetIngest.dedupedParse]] +
  * the checkpointed partitioned lake sink over a MemoryStream fixture
  * and report end-to-end rows/second. §2.9 had correctness specs but
  * no perf line — this gives the round-over-round bench a number that
  * catches ingest-path regressions (extra shuffles, state blowup,
  * parse slowdowns).
  *
  * Every 10th message is an exact redelivery (same key), so the
  * watermark dedup state is genuinely exercised — the written count
  * must come back 10% short of the fed count. */
object IngestBench {

  // 30k default: the dedup state store dominates (~4-5 s/micro-batch
  // vs ~1 s stateless), which is exactly the cost this line watches —
  // but the bench's wall-clock budget caps how much of it we buy.
  def run(spark: SparkSession, nRows: Int = 30000, batches: Int = 3): (Long, Double) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lake = Files.createTempDirectory("bench_lake").toString
    val ckpt = Files.createTempDirectory("bench_ckpt").toString
    val source = MemoryStream[KafkaMsg]
    val q = TweetIngest.startLake(
      TweetIngest.dedupedParse(source.toDF()), lake, ckpt)
    val perBatch = nRows / batches
    // event time advances monotonically with the id: a watermark-bound
    // stateful op DROPS input older than (max event time - lateness),
    // so cycling timestamps would silently shrink the output and turn
    // the throughput line into a correctness bug
    val epoch = java.time.Instant.parse("2022-03-01T10:00:00Z")
    val t0 = System.nanoTime()
    var b = 0
    while (b < batches) {
      val msgs = (0 until perBatch).map { i =>
        val raw = b * perBatch + i
        val id = if (raw % 10 == 9) raw - 1 else raw // 10% exact replays
        val ts = epoch.plusSeconds(id.toLong).toString
        KafkaMsg(
          s"K$id".getBytes("UTF-8"),
          s"""{"data": {"id": "$id", "created_at": "$ts", "text": "bench tweet $id with a few more tokens"}}"""
            .getBytes("UTF-8"),
          s"topic${id % 8}")
      }
      source.addData(msgs: _*)
      q.processAllAvailable()
      b += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val written = spark.read.parquet(lake).count()
    // all actions are done — reclaim the fixture (reps would otherwise
    // leak a lake+checkpoint pair per run)
    Seq(lake, ckpt).foreach { d =>
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try
        walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      catch {
        case e: java.io.IOException =>
          System.err.println(s"[ingest-bench] could not reclaim $d: ${e.getMessage}")
      } finally walk.close()
    }
    (written, sec)
  }
}
