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
      // base, its near-dup (J≈0.85, shares a band), and an exact replay
      // arrive in ONE batch: the cluster must collapse to a single row.
      // WHICH variant survives is intra-batch arrival order — not a
      // streaming guarantee (the chained band shuffles reorder rows) —
      // so assert the cluster size, not the winner.
      assert(out.count(t => t == base || t == nearDup) === 1,
        "the {base, near-dup, exact-replay} cluster must collapse to one row")
      assert(out.contains(unrelated))
      assert(out.contains("hi") && out.contains("yo"))
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

  test("per-band OR false-drop bound: mid-similarity docs drop at the banded envelope, high-sim always drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val nPairs = 300
    def tokens(p: Int, side: String) = (0 until 20).map(i => s"p$p$side$i")
    // mid-similarity pair BELOW the 0.6 band-geometry contract: B keeps
    // the first 10 of A's 20 tokens → 8 of 28 distinct 3-shingles
    // shared, J = 2/7 ≈ 0.286 → per-doc drop probability under the
    // 8×4 OR path is 1-(1-J⁴)⁸ ≈ 0.052 (the documented trade: no
    // exact-verify stage in the stream).
    val midA = (0 until nPairs).map(p => tokens(p, "a").mkString(" "))
    val midB = (0 until nPairs).map(p =>
      (tokens(p, "a").take(10) ++ tokens(p, "b").drop(10)).mkString(" "))
    // high-similarity pair ABOVE the contract (st10's trailing-tracker
    // mutation, J = 18/19): miss probability ≈ 2·10⁻⁶ per doc.
    val hiA = (0 until nPairs).map(p => tokens(p, "h").mkString(" "))
    val hiB = (0 until nPairs).map(p => (tokens(p, "h") :+ s"trk$p").mkString(" "))
    val source = MemoryStream[KafkaMsg]
    val q = TweetIngest.nearDupDedupedParse(source.toDF())
      .writeStream.format("memory").queryName("or_falsedrop")
      .outputMode("append").start()
    try {
      source.addData((midA ++ hiA).zipWithIndex.map { case (t, i) =>
        msg(i, "alpha", "2022-03-01T10:00:00Z", t) }: _*)
      q.processAllAvailable()
      source.addData((midB ++ hiB).zipWithIndex.map { case (t, i) =>
        msg(10000 + i, "beta", "2022-03-01T10:30:00Z", t) }: _*)
      val out = texts(q, "or_falsedrop").toSet
      val midDropped = midB.count(!out.contains(_))
      val hiDropped = hiB.count(!out.contains(_))
      val rate = midDropped.toDouble / nPairs
      info(f"measured mid-similarity (J=0.286) false-drop rate: $rate%.3f " +
        f"($midDropped/$nPairs; analytic envelope 1-(1-J^4)^8 = 0.052)")
      assert(hiDropped === nPairs,
        s"J=18/19 near-dups must all drop (got $hiDropped/$nPairs; miss prob ~2e-6)")
      assert(rate <= 0.12, f"false-drop rate $rate%.3f beyond the banded envelope")
      assert(midDropped > 0,
        "the OR path's false-drop trade must be visible at J≈0.29 across 300 pairs")
      assert(midA.forall(out.contains) && hiA.forall(out.contains),
        "originals must never drop (disjoint-token construction)")
    } finally q.stop()
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
