package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

import graft.{GraftQuery, Tables}

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns plus a typed metadata struct, with the
  * decode / feature-extract step running batched per partition.
  *
  * The container has no codec libraries, so the *decode* itself is a
  * clearly-marked deterministic stub (`fakeDecode`) — everything Spark-
  * side (schema, binary column handling, partition-preserving batched
  * mapPartitions, output feature schema) is real and tested. On a
  * cluster the stub body is where libjpeg/ffmpeg-style decoding slots
  * in, one batch per partition, no driver involvement.
  */
object MultimodalOps {

  /** Output schema of the feature extractor: doc_id + fixed-width
    * feature vector + payload metadata. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB decode: a real deployment replaces this with an image/audio
    * decoder. Deterministic fake: 16-bin byte-value histogram,
    * L1-normalized — stands in for "decode + embed" and keeps tests
    * reproducible. */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xFF) % 16) += 1.0)
    val total = math.max(payload.length.toDouble, 1.0)
    hist.map(_ / total)
  }

  /** Batched per-partition feature extraction over a binary column —
    * the Scala analogue of a Pandas-UDF `mapInPandas` stage: rows
    * stream through an iterator per partition, partitioning preserved,
    * nothing collects to the driver. */
  def extractFeatures(payloads: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    payloads.select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("doc_id"), payload.length.toLong,
            r.getAs[String]("format"), fakeDecode(payload))
        }
      }(enc)
  }

  /** Documents as a multimodal table: text bytes standing in for an
    * opaque media payload + typed metadata struct. */
  def asMultimodal(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("txt").as("format"),
        col("lang").as("lang"),
        col("n_chars").as("n_chars"),
        col("source").as("source")).as("meta"))

  /** Metadata projection over the binary payload — oracle-checked
    * (byte length + hex prefix are engine-agnostic). */
  val binaryMetaQ: GraftQuery = GraftQuery(
    "m01_binary_meta",
    """SELECT doc_id,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       upper(hex(CAST(substring(text, 1, 8) AS BLOB))) AS head_hex
      |FROM documents""".stripMargin) { (spark, sf) =>
    asMultimodal(spark, sf).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      upper(hex(substring(col("payload"), 1, 8))).as("head_hex"))
  }

  /** Feature extraction end-to-end: binary payload → per-partition
    * batched decode stub → fixed-width feature vector. Summarized to a
    * stable scalar per row for the rows-only gate; the array shape is
    * asserted in ScalaTest. */
  val featuresQ: GraftQuery = GraftQuery.noOracle("m02_features") { (spark, sf) =>
    val feats = extractFeatures(asMultimodal(spark, sf))
    feats.select(
      col("doc_id"), col("n_bytes"), col("format"),
      size(col("features")).cast("long").as("dim"),
      round(aggregate(col("features"), lit(0.0), (acc, x) => acc + x), 6).as("feature_sum"))
  }

  val all: Seq[GraftQuery] = Seq(binaryMetaQ, featuresQ)
}
