package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** Single place every entry point (Bench / Verify / Plans / tests)
  * builds its SparkSession from, so engine extensions and the confs the
  * engine's tables rely on are applied uniformly:
  *
  *  - `graft_dot` native expression (GraftExtensions);
  *  - shuffle partitions sized to the local core count (never the 200
  *    default — on a real cluster this comes from AQE + cluster conf);
  *  - `nanosAsLong`: events.parquet carries TIMESTAMP(NANOS), which the
  *    vectorized reader rejects; set once at session construction
  *    instead of as a side effect of every `Tables.events` load.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(GraftExtensions.install)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
