package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Two paths:
  *  - brute-force cosine top-k for a small query set: the query side is
  *    broadcast, so the scan over the corpus is map-only + one window
  *    per query partition — the exactness baseline;
  *  - sign-LSH bucketed top-k for all vectors: candidates restricted to
  *    the query's bucket (equality join), the 100 TB-scale path — no
  *    cross product anywhere.
  */
object SimilarityOps {

  private val K = 5

  /** Brute-force exact top-k neighbors for query vectors vec_id < 8. */
  val knnBruteQ: GraftQuery = GraftQuery.noOracle("s01_knn_brute") { (spark, sf) =>
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val queries = broadcast(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    emb.join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** LSH-bucketed approximate top-k for every vector (the scale path:
    * bucket equality join replaces the cross product; recall traded for
    * a ~n²/buckets candidate count). */
  val knnLshQ: GraftQuery = GraftQuery.noOracle("s02_knn_lsh") { (spark, sf) =>
    val planes = hyperplanes(nPlanes = 6, dim = 64)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v")))
    val a = emb.select(col("bucket"), col("vec_id"), col("v"), col("nrm"))
    val b = emb.select(col("bucket"), col("vec_id").as("neighbor_id"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("v"), col("v_b")) / (col("nrm") * col("nrm_b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  val all: Seq[GraftQuery] = Seq(knnBruteQ, knnLshQ)
}
