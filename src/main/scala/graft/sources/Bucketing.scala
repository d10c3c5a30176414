package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the ingest-time shuffle-elimination tool.
  *
  * At 100 TB the expensive part of an equi-join or keyed aggregation
  * is the exchange, not the compute: a fact table bucketed (and
  * sorted) by its join key at WRITE time gives every subsequent
  * co-keyed join/aggregation a scan that already satisfies the
  * required hash distribution, so Catalyst's EnsureRequirements
  * inserts no Exchange at all — the shuffle is paid once at ingest
  * instead of once per query. Two tables bucketed on their respective
  * join keys with the same bucket count co-locate: the join plan is
  * scan → sort-merge (or scan → merge when sortBy matches) with zero
  * network movement. BucketingSpec asserts exactly that on the
  * physical plan.
  *
  * Bucket-count sizing at scale follows file-size math, not task
  * math: buckets ≈ table_bytes / target_file_bytes (128-512 MB), and
  * joins across different bucket counts still avoid one side's
  * shuffle when one count divides the other
  * (spark.sql.bucketing.coalesceBucketsInJoin.enabled). */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table at `path`,
    * registered as `table` in the session catalog (external — dropping
    * the table keeps the files). */
  /** The input is repartitioned by the bucket key into exactly
    * `buckets` partitions first (same hash family as the bucket
    * spec): Spark's bucketed write otherwise emits one file per
    * (input task × bucket) — a small-files explosion on wide inputs
    * and a serialized single-task sort+write on AQE-coalesced ones
    * (SignatureLake.writeFamily's r16 measurement). One exchange at
    * write time is the ingest-time-shuffle trade this module already
    * documents. */
  def writeBucketed(
      df: DataFrame, table: String, path: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df.col(key))
      .write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
