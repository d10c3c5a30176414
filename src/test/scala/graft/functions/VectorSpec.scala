package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorSpec extends SparkSpec {

  test("dot / norm / cosine match hand computation") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))
    ).toDF("id", "a", "b")
      .select(
        dot(toDouble(col("a")), toDouble(col("b"))).as("dot"),
        norm(toDouble(col("a"))).as("na"),
        cosine(toDouble(col("a")), toDouble(col("b"))).as("cos"))
    val r = df.collect().head
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getDouble(2) - expected) < 1e-12)
  }

  test("identical vectors share an LSH bucket; cosine=1") {
    import spark.implicits._
    val v = Seq.fill(64)(scala.util.Random.nextFloat())
    val planes = hyperplanes(6, 64)
    val df = Seq((1L, v), (2L, v)).toDF("id", "emb")
      .select(col("id"), lshBucket(toDouble(col("emb")), planes).as("bucket"))
    val buckets = df.select("bucket").as[Long].collect()
    assert(buckets(0) === buckets(1))
  }

  test("brute-force knn returns the planted nearest neighbor first") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = Array.fill(8)(1.0f)
    val close = base.clone(); close(0) = 0.9f // high cosine to base
    val far = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val emb = Seq(
      (0L, base.toSeq), (1L, close.toSeq), (2L, far.toSeq)
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val ranked = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .orderBy("rank")
      .select("vec_id").collect().map(_.getLong(0))
    assert(ranked === Array(1L, 2L))
  }

  test("knn queries on harness data: k results per query, cos in [-1,1]") {
    val knn = graft.operators.SimilarityOps.knnBruteQ.run(spark, sf001)
    val counts = knn.groupBy("query_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet === Set(5L))
    assert(knn.filter(col("cos_sim") > 1.0 || col("cos_sim") < -1.0).count() === 0)
  }
}
