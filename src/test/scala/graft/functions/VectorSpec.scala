package graft.functions

import org.apache.spark.sql.Column
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

  test("graft_gram: hand-computed triangle, merge-invariant under repartition, nulls skipped (v14)") {
    import spark.implicits._
    // three 3-dim snapped vectors; hand Gram:
    // n=3; sums = (6, 12, 3); sii: d0=14, d1=56, d2=5;
    // s01 = 2+8+18 = 28, s02 = 0+2+6 = 8, s12 = 0+4+12 = 16
    val rows: Seq[Option[Seq[Long]]] = Seq(
      Some(Seq(1L, 2L, 0L)), Some(Seq(2L, 4L, 1L)), Some(Seq(3L, 6L, 2L)), None)
    val df = rows.toDF("xs")
    def gram(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(call_function("graft_gram", col("xs"), lit(3)).as("g"))
        .head().getSeq[Long](0)
    val g = gram(df)
    assert(g === Seq(3L, 6L, 12L, 3L, 14L, 28L, 8L, 56L, 16L, 5L))
    // mergeability: any partitioning folds to the identical state
    assert(gram(df.repartition(7)) === g)

    // corr off the relation: dim0 and dim1 are exactly proportional
    // (corr 1); dim2 is an affine shift of dim0 (corr 1 too); replace
    // to get an anti-correlated and a constant dim
    val emb = Seq(
      (1L, Seq(0.1, -0.1, 0.5)), (2L, Seq(0.2, -0.2, 0.5)),
      (3L, Seq(0.3, -0.3, 0.5)))
      .toDF("vec_id", "v")
    val out = graft.operators.VectorOps.dimCorrelation(emb, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out((0L, 1L)).getAs[Double]("corr") === -1.0)
    assert(out((0L, 2L)).isNullAt(out((0L, 2L)).fieldIndex("corr")),
      "constant dim must emit NULL corr")
    assert(out.size === 3)
  }

  test("dot of mismatched-length arrays is null, not a prefix product") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f)))
      .toDF("id", "a", "b")
      .select(dot(col("a"), col("b")).as("d"))
    assert(df.collect().head.isNullAt(0),
      "a truncated embedding must surface as null (zip_with parity)")
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

  test("planesForCorpus scales bucket count with corpus size") {
    assert(planesForCorpus(500) === 4)                 // floor at 2^4 buckets/table
    assert(planesForCorpus(1000000) === 15)            // 1M/32 = 2^15
    assert(planesForCorpus(1000000000L) === 25)        // 1B/32 ~ 2^25
    assert(planesForCorpus(Long.MaxValue) === 30)      // capped
    // monotone: more data never means fewer buckets
    val seq = Seq(1L, 100L, 10000L, 1000000L, 100000000L).map(planesForCorpus(_))
    assert(seq === seq.sorted)
  }

  test("banded multi-table LSH: identical vectors collide in every table") {
    import spark.implicits._
    val v = Seq.fill(64)(scala.util.Random.nextFloat())
    val df = Seq((1L, v), (2L, v)).toDF("id", "emb")
      .select(col("id"), lshBandBuckets(toDouble(col("emb")), 4, 8, 64).as("buckets"))
    val rows = df.select("buckets").as[Seq[Long]].collect()
    assert(rows(0) === rows(1))
    assert(rows(0).length === 4)
    assert(rows(0).distinct.length > 1, "tables must hash independently")
  }

  test("banded LSH candidates recover a planted high-cosine duplicate") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextGaussian())
    val near = base.clone(); near(0) += 0.05 // cos ~ 0.999
    val others = (2L until 40L).map(i => i -> Array.fill(64)(rnd.nextGaussian()))
    val emb = ((0L -> base) +: (1L -> near) +: others)
      .map { case (id, a) => (id, a.toSeq) }
      .toDF("vec_id", "v")
    val cand = graft.operators.SimilarityOps.cosineCandidates(emb, 4, 4)
    val found = cand.filter(col("vec_id") === 0L && col("neighbor_id") === 1L)
    assert(found.count() === 1, "planted near-dup must be a candidate")
    assert(found.select("cos_sim").collect().head.getDouble(0) > 0.99)
  }

  test("graft_cell_probes: ordering, tie-break, nulls, dim mismatch, float input") {
    import spark.implicits._
    // orthogonal unit codebook: scores are just v's components
    val cb = Array(
      Array(1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val id = CodebookRegistry.register(spark.sparkContext.broadcast(cb))
    def probes(v: Column, p: Int): Column =
      call_function("graft_cell_probes", v, lit(id), lit(p))

    val ordered = Seq(Seq(0.5, 2.0, 1.0)).toDF("v")
      .select(probes(col("v"), 3).as("p")).as[Seq[Int]].collect().head
    assert(ordered === Seq(1, 2, 0), "cells ordered by score desc")

    val tied = Seq(Seq(1.0, 1.0, 0.0)).toDF("v")
      .select(probes(col("v"), 2).as("p")).as[Seq[Int]].collect().head
    assert(tied === Seq(1, 0), "score ties break toward the higher cell id")

    val overP = Seq(Seq(1.0, 0.5, 0.0)).toDF("v")
      .select(probes(col("v"), 9).as("p")).as[Seq[Int]].collect().head
    assert(overP.length === 3, "probes beyond k truncate to k cells")

    val floatIn = Seq(Seq(0.5f, 2.0f, 1.0f)).toDF("v")
      .select(probes(col("v"), 1).as("p")).as[Seq[Int]].collect().head
    assert(floatIn === Seq(1), "array<float> input widens per element")

    val mismatch = Seq(Seq(1.0, 2.0)).toDF("v").select(probes(col("v"), 1).as("p"))
    assert(mismatch.collect().head.isNullAt(0), "dim mismatch yields null")

    val withNull = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 0.0))).toDF("v")
      .select(probes(col("v"), 1).as("p"))
    assert(withNull.collect().head.isNullAt(0), "null element yields null")
  }

  test("IVF knn recovers a planted near-duplicate via multi-probe") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextGaussian())
    val near = base.clone(); near(1) += 0.05
    val others = (2L until 60L).map(i => i -> Array.fill(64)(rnd.nextGaussian()))
    val emb = ((0L -> base) +: (1L -> near) +: others)
      .map { case (id, a) => (id, a.toSeq) }.toDF("vec_id", "v")
    val knn = graft.operators.SimilarityOps.knnIvf(emb, k = 3, probes = 4)
    val best = knn.filter(col("vec_id") === 0L && col("rank") === 1).collect()
    assert(best.length === 1)
    assert(best.head.getAs[Long]("neighbor_id") === 1L)
    assert(best.head.getAs[Double]("cos_sim") > 0.99)
  }

  test("s03 IVF knn on harness data: ranks bounded, cosine sane") {
    val knn = graft.operators.SimilarityOps.knnIvfQ.run(spark, sf001)
    assert(knn.count() > 0)
    assert(knn.filter(col("rank") > 3).count() === 0)
    assert(knn.filter(col("cos_sim") > 1.0 || col("cos_sim") < -1.0).count() === 0)
    assert(knn.groupBy("vec_id", "rank").count().filter(col("count") > 1).count() === 0)
  }

  test("s02 LSH knn on harness data: ranks bounded, cosine sane") {
    val knn = graft.operators.SimilarityOps.knnLsh(
      graft.Tables.embeddings(spark, sf001)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")))
    assert(knn.count() > 0)
    assert(knn.filter(col("rank") > 3).count() === 0)
    assert(knn.filter(col("cos_sim") > 1.0 || col("cos_sim") < -1.0).count() === 0)
    // per (vec, rank) uniqueness: window ranks are deterministic + dense
    assert(knn.groupBy("vec_id", "rank").count().filter(col("count") > 1).count() === 0)
  }
}
