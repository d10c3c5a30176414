package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Destination for hourly aggregate rows — the reference's MongoDB
  * append sink (SURVEY.md §2.1 S4/S5; functions.py:117,
  * streamlit/main.py:34-39) behind a trait.
  *
  * Default implementation appends to parquet: same append-only,
  * re-readable contract, no external service. A MongoDB implementation
  * would wire `mongo-spark-connector` behind the same two methods;
  * the serving layer is source-agnostic (it reads whatever
  * `readBack` returns and dedups re-appended batches itself, exactly
  * like the reference dashboard does).
  */
trait AggregateSink {
  /** Append one batch of aggregate rows (at-least-once allowed —
    * the serving layer dedups). */
  def append(df: DataFrame): Unit
  /** Read the full aggregate history back for serving. */
  def readBack(spark: SparkSession): DataFrame
}

final class ParquetAggregateSink(path: String) extends AggregateSink {
  override def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)
  override def readBack(spark: SparkSession): DataFrame =
    spark.read.parquet(path)
}
