package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format batch source/sink behind the [[graft.Tables]] parquet
  * lake — the CSV/JSON ingestion path every production lake needs at
  * its edges (vendor drops, API exports, legacy feeds), expressed the
  * way it must run at scale:
  *
  *  - reads take an EXPLICIT schema (the parquet table's), never
  *    inference — schema inference is a full extra pass over text data
  *    and a silent-typing hazard; at 100 TB the schema comes from the
  *    catalog, full stop;
  *  - timestamps round-trip at full microsecond precision via a fixed
  *    pattern (text formats default to second precision and would
  *    silently truncate event time — the q23/q38 exact-micros
  *    contracts would corrupt);
  *  - CSV quotes/escapes and JSON string escaping are the writers'
  *    defaults, which round-trip embedded quotes (the events `props`
  *    JSON strings) exactly.
  *
  * The q55 registry row proves the claim the code comments cannot: a
  * full write→read round trip through each text format is ROW-EXACT
  * against the parquet scan, longs, doubles, micros timestamps and
  * JSON-in-string columns included. */
object MultiFormat {

  /** Microsecond-precision timestamp pattern for text formats. */
  val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val Formats: Seq[String] = Seq("csv", "json")

  def write(df: DataFrame, path: String, format: String): Unit = format match {
    case "csv" =>
      df.write.mode("overwrite")
        .option("header", "true").option("timestampFormat", TsFmt)
        .csv(path)
    case "json" =>
      df.write.mode("overwrite").option("timestampFormat", TsFmt).json(path)
    case other =>
      throw new IllegalArgumentException(s"unsupported text format: $other")
  }

  def read(spark: SparkSession, path: String, format: String,
      schema: StructType): DataFrame = format match {
    case "csv" =>
      spark.read.schema(schema)
        .option("header", "true").option("timestampFormat", TsFmt)
        .csv(path)
    case "json" =>
      spark.read.schema(schema).option("timestampFormat", TsFmt).json(path)
    case other =>
      throw new IllegalArgumentException(s"unsupported text format: $other")
  }

  /** Multiset round-trip parity in ONE aggregation pass: sign `base`
    * rows +1 and `back` rows −1, group on every column, and look for
    * any nonzero residue — empty residue ⟺ both `exceptAll`
    * directions empty (a surplus on either side survives with a
    * nonzero count sum), but one shuffle and one action instead of
    * two anti-except plans plus a count (the r16 q55 shape). Returns
    * (rows read back, exact?); the read-back row count rides the same
    * pass as the −1-side sum. */
  def roundTripStats(base: DataFrame, back: DataFrame): (Long, Boolean) = {
    import org.apache.spark.sql.functions._
    val cols = base.columns.toSeq
    // a user column named like a temp column would be silently
    // REPLACED by withColumn (becoming a constant grouping key) and
    // quietly weaken the multiset comparison — fail loudly instead
    // (r17, advisor)
    require(!cols.exists(Set("__s", "__d", "__nb")),
      s"roundTripStats: input schema collides with temp columns: " +
        cols.filter(Set("__s", "__d", "__nb")).mkString(", "))
    val residue = base.select(cols.map(col): _*).withColumn("__s", lit(1L))
      .unionByName(back.select(cols.map(col): _*).withColumn("__s", lit(-1L)))
      .groupBy(cols.map(col): _*).agg(
        sum(col("__s")).as("__d"),
        sum(when(col("__s") === -1L, 1L).otherwise(0L)).as("__nb"))
    val agg = residue.agg(
      coalesce(sum(when(col("__d") =!= 0L, 1L).otherwise(0L)), lit(0L)).as("bad"),
      coalesce(sum(col("__nb")), lit(0L)).as("n_back")).head()
    (agg.getLong(1), agg.getLong(0) == 0L)
  }
}
