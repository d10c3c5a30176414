package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness-provided parquet tables (see TESTDATA.md).
  *
  * Every query in the engine reads through here so that the physical
  * source can be swapped (parquet lake today; at cluster scale the same
  * names would resolve to catalog tables with the same schemas).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts normalizes to a microsecond TimestampType column
    * whatever the parquet physical type is — the harness has shipped
    * both TIMESTAMP(NANOS) (rounds ≤7) and timestamp[us] (round 8+):
    *
    *  - NANOS: Spark's vectorized reader rejects it; the `nanosAsLong`
    *    conf (set once at session construction, GraftSession — not
    *    mutated per-read here, which would leak into unrelated reads
    *    and race under concurrency) surfaces it as a long that is
    *    floor-divided to micros. Second-level derivations then match
    *    nanosecond-native readers (DuckDB) exactly.
    *  - timestamp[us] without timezone: Spark 4 infers TIMESTAMP_NTZ;
    *    cast to TimestampType is value-preserving under the session's
    *    pinned UTC timezone (GraftSession), and DuckDB's
    *    `epoch_ns(ts) // 1000` in the oracle texts yields the same
    *    micros either way. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "build the session via GraftSession.builder (sets nanosAsLong for events.ts)")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
