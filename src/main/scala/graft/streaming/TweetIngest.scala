package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Streaming ingest — the reference's continuous dataflow
  * (SURVEY.md §2.1 S1/S2, §2.2 P1-P6; spark_app/functions/functions.py:20-54):
  * Kafka-shaped messages → JSON parse → typed projection → event-time
  * partition columns → checkpointed partitioned parquet lake.
  *
  * Differences from the reference, per SURVEY.md §4:
  *  - `from_json` runs ONCE into a struct column (the reference parses
  *    the value twice, functions.py:37-40);
  *  - partition columns stay event-time derived strings (parity with
  *    functions.py:42-43) so lake paths are byte-compatible.
  *
  * The transform is a pure DataFrame→DataFrame function, so the same
  * code serves the streaming ingest (Kafka / MemoryStream / file
  * source) and batch backfills. Map-only — no shuffle; parallelism
  * follows the source partitioning (Kafka partitions at scale).
  */
object TweetIngest {

  /** Kafka value schema — Twitter API v2 envelope subset
    * (SURVEY.md §1.3-1; tweepy_ingestion/utilities/functions.py:41-46). */
  val tweetSchema: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("id", StringType),
      StructField("created_at", TimestampType),
      StructField("text", StringType))))))

  /** Lake row schema (SURVEY.md §1.3-2). */
  val lakeSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("created_at", TimestampType),
    StructField("text", StringType),
    StructField("topic", StringType),
    StructField("date", StringType),
    StructField("hour", StringType)))

  /** Kafka-shaped input (key/value binary + topic) → lake rows.
    * Works on both streaming and batch frames. */
  def parse(kafkaShaped: DataFrame): DataFrame = parseKeeping(kafkaShaped, Nil)

  private def parseKeeping(kafkaShaped: DataFrame, extra: Seq[Column]): DataFrame = {
    // from_json lands in its OWN projection: CollapseProject keeps a
    // non-cheap expression referenced by two extractions un-inlined,
    // so the document really is parsed once per row — extracting both
    // fields from an inline from_json in one select would duplicate
    // the parse in the physical plan (the reference's double-parse,
    // re-created by the optimizer).
    kafkaShaped
      .withColumn("_parsed", from_json(col("value").cast("string"), tweetSchema))
      .select(Seq(
        col("key").cast("string").as("key"),
        col("_parsed").getField("data").getField("created_at").as("created_at"),
        col("_parsed").getField("data").getField("text").as("text"),
        col("topic")) ++ extra: _*)
      .withColumn("hour", date_format(col("created_at"), "HH"))
      .withColumn("date", date_format(col("created_at"), "yyyy-MM-dd"))
  }

  /** Kafka streaming source (reference functions.py:28-35). Not used in
    * tests (no broker in the harness) but the production entry point. */
  def readKafkaStream(spark: SparkSession, bootstrapServers: String, topics: Seq[String]): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
      .load()

  /** Replay-safe variant of the parse stage: drops Kafka redeliveries
    * by message key within the watermark. The reference has NO dedup on
    * its analytics path (SURVEY.md §2.9 — an at-least-once producer
    * retry lands twice in the lake and inflates every downstream
    * count); this bounds that with watermark-evicted per-key state, so
    * state size follows the key arrival rate, not the stream length. */
  def dedupedParse(kafkaShaped: DataFrame, lateness: String = "2 hours"): DataFrame =
    // null keys must NOT collapse into one row (an unkeyed producer
    // would lose every distinct tweet but one); identity falls back to
    // a fingerprint of the RAW value bytes — parsed fields won't do, as
    // two different malformed payloads both parse to all-null fields
    // (and xxhash64 skips null inputs, degenerating to hash(topic))
    parseKeeping(
      kafkaShaped.withColumn("_dedup_key",
        coalesce(col("key").cast("string"),
          hex(xxhash64(col("topic"), col("value").cast("string"))))),
      Seq(col("_dedup_key")))
      .withWatermark("created_at", lateness)
      .dropDuplicatesWithinWatermark("_dedup_key")
      .drop("_dedup_key")

  /** Exact CONTENT-level dedup across micro-batches: drops a replay
    * whose normalized text (lowercase, whitespace collapsed) was
    * already ingested within the watermark — regardless of message key
    * or topic, which [[dedupedParse]] (key replays) cannot catch.
    * State is one fingerprint per distinct content within the
    * watermark: bounded by arrival rate × lateness, evicted by the
    * watermark like every stateful streaming op here. Null/malformed
    * payloads fall back to the raw-bytes fingerprint (two DIFFERENT
    * malformed payloads must not collapse; xxhash64 skips null
    * children, so hashing parsed fields would degenerate). Caveat,
    * platform-pinned since round 2: a malformed payload also has a
    * null created_at, and null-event-time rows pass through watermark
    * dedup WITHOUT being retained in state — so a REPLAY of the same
    * malformed payload is not dropped; only well-formed content is
    * dedup-guaranteed. */
  def contentDedupedParse(kafkaShaped: DataFrame, lateness: String = "2 hours"): DataFrame = {
    val raw = hex(xxhash64(col("topic"), col("value").cast("string")))
    parseKeeping(kafkaShaped, Seq(raw.as("_raw_fp")))
      .withColumn("_content_fp",
        when(col("text").isNotNull,
          hex(xxhash64(trim(lower(regexp_replace(col("text"), "\\s+", " "))))))
          .otherwise(concat(lit("raw:"), col("_raw_fp"))))
      .withWatermark("created_at", lateness)
      .dropDuplicatesWithinWatermark("_content_fp")
      .drop("_raw_fp", "_content_fp")
  }

  /** NEAR-dup content dedup across micro-batches — the streaming tier
    * of d03: a replayed document that was lightly edited (boilerplate
    * re-crawl, trailing tracker, one-token mutation) still drops.
    *
    * Same LSH geometry as the batch MinHash path (8 bands × 4 rows —
    * the 0.6-Jaccard S-curve midpoint), but computed ROW-LOCALLY
    * (shingle → minhash → band keys as array expressions; the batch
    * explode/groupBy shape cannot run per-row in a stream), then OR-
    * amplified with one `dropDuplicatesWithinWatermark` PER BAND: a
    * document sharing ANY band key with prior state within the
    * watermark is dropped at that band's stage. Chained per-band dedup
    * state is how OR-semantics express under Spark's
    * multiple-stateful-operator support; state is bands × (distinct
    * keys that reached each stage within the watermark) —
    * arrival-rate-bounded, watermark-evicted.
    *
    * Streaming trades, stated plainly (the batch d03 path has neither):
    * there is NO exact-verify stage — a single 4-row band collision
    * drops a document unverified (collision probability for unrelated
    * docs is hash-negligible, but mid-similarity docs below the 0.6
    * contract can drop: P ≈ 1-(1-J⁴)⁸); and a document dropped at
    * stage b has already registered its band keys at stages < b, so a
    * later document can be dropped against state left by a
    * non-surviving near-dup — dedup decisions chain transitively, the
    * same closure batch d07 computes explicitly. Precision knob:
    * rowsPerBand (tighter bands drop only nearer dups).
    *
    * Documents without 3-shingles (null/short text) fall back to the
    * exact raw-payload fingerprint per band (dedup-by-identity), since
    * their empty shingle set would minhash every row to one key. */
  def nearDupDedupedParse(kafkaShaped: DataFrame, lateness: String = "2 hours",
      bands: Int = graft.operators.DedupOps.Bands,
      rowsPerBand: Int = graft.operators.DedupOps.RowsPerBand): DataFrame = {
    val raw = hex(xxhash64(col("topic"), col("value").cast("string")))
    val parsed = parseKeeping(kafkaShaped, Seq(raw.as("_raw_fp")))
    // tokenize → 3-shingle → minhash → band keys in ONE native kernel
    // call per row ([[graft.functions.MinHashBandKeys]]). The
    // higher-order-function formulation was 34 interpreted lambda
    // evaluations per row — and its `element_at(split(text), i)` calls
    // re-split the text once per shingle position (~54 splits/row in
    // the physical plan) — dominating the stream's parse stage. _bk
    // stays its own projection: CollapseProject keeps multi-referenced
    // non-cheap expressions un-inlined, so the kernel runs once per
    // row, not once per band column.
    val withBk = parsed.withColumn("_bk",
      call_function("graft_minhash_bands", col("text"), lit(bands), lit(rowsPerBand)))
    val bandCols = (0 until bands).map { b =>
      when(col("_bk").isNotNull, element_at(col("_bk"), b + 1))
        .otherwise(concat(lit(s"raw$b:"), col("_raw_fp")))
        .as(s"_band$b")
    }
    // project the scaffolding (shingle array, band array, raw fp) OUT
    // before the stateful chain: every one of the `bands` dedup stages
    // is a shuffle, and carrying ~1 KB/row of dead columns through all
    // of them is pure shuffle-volume waste — at stream scale the band
    // keys and the lake row are all the chain needs.
    val lakeCols = Seq("key", "created_at", "text", "topic", "hour", "date").map(col)
    val banded = withBk.select(lakeCols ++ bandCols: _*)
      .withWatermark("created_at", lateness)
    val deduped = (0 until bands).foldLeft(banded)(
      (df, b) => df.dropDuplicatesWithinWatermark(s"_band$b"))
    deduped.drop((0 until bands).map(b => s"_band$b"): _*)
  }

  /** Production ingest assembly from typed config (reference
    * run_job, functions.py:121-126): Kafka source → single-parse
    * projection → checkpointed partitioned lake sink. Plan-building
    * only — call .start() to run. */
  def fromConfig(spark: SparkSession, cfg: graft.GraftConfig): DataStreamWriter[Row] =
    lakeWriter(parse(readKafkaStream(spark, cfg.kafkaServers, cfg.topics)),
      cfg.lakePath, cfg.checkpointPath)

  /** Checkpointed append-mode partitioned parquet lake sink
    * (reference functions.py:47-54). */
  def lakeWriter(lakeRows: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    lakeRows.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .option("path", path)
      .partitionBy("date", "hour")

  def startLake(lakeRows: DataFrame, path: String, checkpoint: String): StreamingQuery =
    lakeWriter(lakeRows, path, checkpoint).start()

  /** Idiomatic streaming alternative to the hourly batch tier
    * (SURVEY.md §2.9 "Windows"): event-time tumbling window with a
    * watermark, so late rows within the watermark still aggregate —
    * the batch path silently drops them (reference functions.py:63-76).
    * State is bounded: the watermark lets Spark evict closed windows. */
  def windowedTopicCounts(lakeRows: DataFrame, lateness: String = "2 hours"): DataFrame =
    lakeRows
      .withWatermark("created_at", lateness)
      .groupBy(window(col("created_at"), "1 hour"), col("topic"))
      .agg(count(lit(1)).as("counts"))
      .select(col("window.start").as("hour_start"), col("topic"), col("counts"))

  /** Read one event-hour from the lake root with partition-column
    * filters — Catalyst prunes to the single date=/hour= directory
    * (replaces the reference's manual path construction,
    * functions.py:63-76, with the same effective scan). */
  def readHour(spark: SparkSession, lakeRoot: String, date: String, hour: String): DataFrame =
    spark.read.schema(lakeSchema).parquet(lakeRoot)
      .filter(col("date") === date && col("hour") === hour)
}

/** The hourly scheduler's clock math (reference spark_app/main.py:93-111
  * + functions.py:63-73) as a pure function of an injected clock —
  * including the midnight rollover the reference special-cases. */
object HourlyClock {
  import java.time.LocalDateTime
  import java.time.format.DateTimeFormatter

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val hourFmt = DateTimeFormatter.ofPattern("HH")

  /** (date, hour) partition of the hour preceding `now`. */
  def previousHour(now: LocalDateTime): (String, String) = {
    val prev = now.minusHours(1)
    (prev.format(dateFmt), prev.format(hourFmt))
  }
}
