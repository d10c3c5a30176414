package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions._

class SimilaritySpec extends SparkSpec {

  private def emb: DataFrame = Tables.embeddings(spark, sf001)
    .select(col("vec_id"), toDouble(col("embedding")).as("v"))

  /** Exact top-3 per vector over the full corpus — the ground truth
    * (the sf0.001 corpus is small enough to afford the cross join the
    * engine itself must never do). */
  private lazy val truth: Set[(Long, Long)] = {
    val n = emb.withColumn("nrm", norm(col("v")))
    val a = n.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
    a.join(b, col("a") =!= col("b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def recallAt3(knn: DataFrame): Double = {
    val got = knn.select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(truth).size.toDouble / truth.size
  }

  test("trained k-means codebook: recall@3 improves over first-k, cells balanced") {
    val k = SimilarityOps.cellsForCorpus(emb.count())
    val firstK = recallAt3(SimilarityOps.knnIvf(emb, k = 3, probes = 4))
    val trained = recallAt3(SimilarityOps.knnIvf(emb, k = 3, probes = 4,
      codebook = df => SimilarityOps.kmeansCentroids(df, k)))
    info(f"recall@3 first-k=$firstK%.4f trained=$trained%.4f (k=$k)")
    // >= not >: the s04 contract is at-or-above (a tie at a recall
    // ceiling is not a regression); the absolute floor pins the
    // improvement observed on this fixed corpus (0.43 -> 0.56)
    assert(trained >= firstK,
      f"trained codebook must not lose to first-k ($trained%.4f vs $firstK%.4f)")
    assert(trained >= 0.5,
      f"trained recall@3 must clear the 0.5 floor measured on this corpus ($trained%.4f)")

    // the scale property: no degenerate mega-cell — probe cost per
    // query is bounded by the largest posting list. (Trained cells can
    // legitimately be LESS flat than arbitrary first-k centroids when
    // the corpus has real cluster structure — dense clusters get dense
    // cells — so the pin is an absolute skew bound, not a comparison.)
    val id = graft.functions.CodebookRegistry.register(
      spark.sparkContext.broadcast(SimilarityOps.kmeansCentroids(emb, k)))
    val occ = emb.select(element_at(
        call_function("graft_cell_probes", col("v"), lit(id), lit(1)), 1).as("cell"))
      .groupBy("cell").count()
    val maxOcc = occ.agg(max("count")).collect().head.getLong(0)
    val n = emb.count()
    info(s"max cell occupancy: $maxOcc of $n across ${occ.count()} cells (k=$k)")
    assert(maxOcc < 5L * (n / k + 1),
      s"largest trained cell ($maxOcc) must stay within 5x the mean posting list")
  }

  test("kmeansCentroids is deterministic for a fixed seed and unit-norm") {
    val k = 8
    val a = SimilarityOps.kmeansCentroids(emb, k, seed = 7L)
    val b = SimilarityOps.kmeansCentroids(emb, k, seed = 7L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "same seed, same codebook")
    a.foreach { c =>
      val nrm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"centroid must be unit-norm, got $nrm")
    }
  }

  test("s04 kernel: ranks bounded, cosine sane, per-rank unique; gate contract row green") {
    val knn = SimilarityOps.knnIvfKmeans(emb)
    assert(knn.count() > 0)
    assert(knn.filter(col("rank") > 3).count() === 0)
    assert(knn.filter(col("cos_sim") > 1.0 || col("cos_sim") < -1.0).count() === 0)
    assert(knn.groupBy("vec_id", "rank").count().filter(col("count") > 1).count() === 0)
    // the registry row is the recall contract over the probe sample
    val c = SimilarityOps.knnIvfKmeansQ.run(spark, sf001).collect()
    assert(c.length === 1)
    assert(c.head.getAs[Boolean]("within_floor"),
      s"s04 contract must clear its floor: ${c.head}")
    assert(c.head.getAs[Long]("k_exact") ===
      c.head.getAs[Long]("n_probes") * SimilarityOps.PortableKnnK)
  }

  test("s05 filtered ANN: every neighbor shares the query's label, ranks fill within the slice") {
    val labels = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("label"))
    val out = SimilarityOps.knnFilteredQ.run(spark, sf001)
    // neighbor labels all equal the query's own label
    val mismatched = out
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "expected"), "query_id")
      .filter(col("label") =!= col("expected")).count()
    assert(mismatched === 0L)
    // the predicate applies BEFORE ranking: rank-1 within a label can
    // differ from the unfiltered rank-1 (post-filtering would leave
    // holes); every query still gets a full top-5 because each label
    // slice at sf0.001 has > 5 members
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    val unfiltered = SimilarityOps.knnBruteQ.run(spark, sf001)
      .filter(col("rank") === 1).select(col("query_id"), col("neighbor_id").as("u1"))
    val filtered1 = out.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("f1"))
    val diverging = filtered1.join(unfiltered, "query_id")
      .filter(col("f1") =!= col("u1")).count()
    info(s"filtered rank-1 differs from unfiltered for $diverging of 8 queries")
  }

  test("s06 ADC: exact when the corpus IS the codebook; self excluded; shape 8xK") {
    import spark.implicits._
    // 16 vectors = exactly the first-16 codebook → every vector
    // quantizes to itself with zero error, so ADC distance equals the
    // EXACT squared L2 distance between query and neighbor
    val pts = (0 until 16).map(i =>
      (i.toLong, Seq(math.sin(i * 2.3) * 5, math.cos(i * 1.7) * 5)))
    val emb16 = pts.toDF("vec_id", "v")
    val out = SimilarityOps.knnPq(emb16, k = 3, blocks = 1, codes = 16, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size === 8 * 3, "8 queries x top-3")
    assert(!out.keys.exists { case (q, n) => q == n }, "self never ranks")
    val exact = for {
      (q, qv) <- pts.take(8); (n, nv) <- pts if n != q
    } yield (q, n) -> qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum
    val exactMap = exact.toMap
    out.foreach { case ((q, n), (_, adc)) =>
      assert(math.abs(adc - exactMap((q, n))) < 1e-9,
        s"ADC must be exact for codebook members: ($q,$n) $adc vs ${exactMap((q, n))}")
    }
    // ranks follow ascending exact distance
    (0L until 8L).foreach { q =>
      val mine = out.collect { case ((`q`, n), (rank, _)) => (rank, n) }.toSeq.sortBy(_._1)
      val best = exactMap.collect { case ((`q`, n), d) => (d, n) }.toSeq
        .sortBy(identity).take(3).map(_._2)
      assert(mine.map(_._2) === best, s"query $q ranked ${mine.map(_._2)}, exact $best")
    }
  }

  test("s06 on the harness corpus: full shape, non-negative ADC, recall logged") {
    val out = SimilarityOps.knnPqQ.run(spark, sf001)
    out.persist()
    try {
      assert(out.count() === 8L * 5)
      assert(out.filter(col("adc") < -1e-9).count() === 0L, "squared distances stay >= 0")
      // PQ with 16 first-k codes is a coarse quantizer — log recall@3
      // against the exact cosine truth rather than pinning a floor the
      // codebook quality doesn't promise
      val pq3 = out.filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // denominator restricted to the 8 query vectors s06 ranks
      val queryTruth = truth.filter(_._1 < 8L)
      info(f"s06 ADC recall@3 vs exact cosine: ${pq3.intersect(queryTruth).size / queryTruth.size.toDouble}%.2f")
    } finally out.unpersist()
  }

  test("s15 IVFPQ: equals flat PQ when every cell is probed; ADC exact for codebook members") {
    import spark.implicits._
    // 16 vectors = the full first-16 codebook (the s06 device) AND
    // cells = ceil(sqrt(16)) = 4 <= probes → the cell routing prunes
    // NOTHING, so the composite must equal flat PQ row-for-row: same
    // neighbors, same ranks, identical ADC doubles (both sides run
    // the same fixed-block-order IEEE chain)
    val pts = (0 until 16).map(i =>
      (i.toLong, Seq(math.sin(i * 2.3) * 5, math.cos(i * 1.7) * 5)))
    val emb16 = pts.toDF("vec_id", "v")
    def keyed(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val flat = keyed(SimilarityOps.knnPq(emb16, k = 3, blocks = 1, codes = 16, dim = 2))
    val ivfpq = keyed(SimilarityOps.knnIvfPq(emb16, k = 3, probes = 4,
      blocks = 1, codes = 16, dim = 2))
    assert(ivfpq === flat,
      "probing all cells must reduce IVFPQ to flat PQ exactly")
  }

  test("s15 IVFPQ on the harness corpus: neighbors come only from probed cells") {
    // independently re-derive the coarse routing on the driver (the
    // corpus is audit-sized) and check EVERY emitted neighbor sits in
    // one of its query's probed cells — the invariant that makes the
    // candidate bound probes·n/cells real, and the one a broken
    // cell join would silently violate
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val k = SimilarityOps.cellsForCorpus(vecs.size.toLong)
    val cb = vecs.toSeq.sortBy(_._1).take(k).map(_._2).map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / (if (n == 0.0) 1.0 else n))
    }
    def scores(v: Array[Double]): Seq[(Double, Int)] =
      cb.zipWithIndex.map { case (c, i) => (v.zip(c).map { case (a, b) => a * b }.sum, i) }
    // ties: higher cell id first — the engine's struct-max semantics
    def topCells(v: Array[Double], p: Int): Set[Int] =
      scores(v).sortBy { case (s, i) => (-s, -i) }.take(p).map(_._2).toSet
    val assignOf = vecs.map { case (id, v) => id -> topCells(v, 1).head }
    val out = SimilarityOps.knnIvfPq(emb, k = 5, probes = 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getLong(0); val n = r.getLong(1)
      assert(q != n, "self never ranks")
      assert(topCells(vecs(q), 4).contains(assignOf(n)),
        s"neighbor $n (cell ${assignOf(n)}) outside query $q's probed cells")
    }
  }

  test("s16 residual IVFPQ: exact when residuals ARE the codebook; recall vs s15 logged") {
    import spark.implicits._
    // 16 vectors = the full residual codebook and probes >= cells:
    // every residual quantizes to itself with zero error, and the ADC
    // computed with the CANDIDATE-CELL query residual telescopes to
    // ||(q-c) - (v-c)||^2 = the squared L2 — equal to flat PQ's exact
    // value up to IEEE rearrangement (subtract-then-square is a
    // different float sequence), so ranks must MATCH EXACTLY and the
    // distances agree to ulp tolerance
    val pts = (0 until 16).map(i =>
      (i.toLong, Seq(math.sin(i * 2.3) * 5, math.cos(i * 1.7) * 5)))
    val emb16 = pts.toDF("vec_id", "v")
    def keyed(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val flat = keyed(SimilarityOps.knnPq(emb16, k = 3, blocks = 1, codes = 16, dim = 2))
    val resid = keyed(SimilarityOps.knnIvfPqResidual(emb16, k = 3, probes = 4,
      blocks = 1, codes = 16, dim = 2))
    assert(resid.keySet === flat.keySet,
      "zero-residual-error + all cells probed must keep the same neighbor set")
    resid.foreach { case (key, (rank, adc)) =>
      val (fRank, fAdc) = flat(key)
      assert(rank === fRank, s"$key rank $rank vs flat $fRank")
      assert(math.abs(adc - fAdc) < 1e-9, s"$key adc $adc vs flat $fAdc")
    }
    // harness corpus: same shape as s15 (8 queries x top-5), recall
    // relative to the exact cosine truth logged for both coders — the
    // residual coder's advantage grows with codebook quality, so it
    // is reported, not pinned, at the first-k audit codebook
    val r15 = SimilarityOps.knnIvfPq(emb, k = 3)
    val r16 = SimilarityOps.knnIvfPqResidual(emb, k = 3)
    def top3(df: DataFrame) = df.filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val queryTruth = truth.filter(_._1 < 8L)
    info(f"s15 direct-PQ recall@3:   ${top3(r15).intersect(queryTruth).size / queryTruth.size.toDouble}%.2f")
    info(f"s16 residual-PQ recall@3: ${top3(r16).intersect(queryTruth).size / queryTruth.size.toDouble}%.2f")
    assert(r16.count() > 0)
  }

  test("s07 range search equals an independent HOF-cosine threshold scan") {
    // independent formulation: interpreted zip_with+aggregate fold
    // (same left-to-right sum, different evaluation path than the
    // codegen'd graft_dot the operator uses)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val n = emb.withColumn("nrm", sqrt(hofDot(col("v"), col("v"))))
    val q = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val expected = n.crossJoin(q).filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", hofDot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .filter(col("cos") >= SimilarityOps.RangeTau)
      .select(col("qid"), col("vec_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = SimilarityOps.rangeSearchQ.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "threshold must not empty the fixture corpus")
  }

  test("s09 MMR: exact dup demoted below the orthogonal candidate; ties to smaller id") {
    import spark.implicits._
    val fixture = Seq(
      (0L, Seq(1.0, 0.0)),   // the query (vec_id < QueryVecs)
      (10L, Seq(4.0, 3.0)),  // rel = 4/5 = 0.8 exactly
      (11L, Seq(4.0, 3.0)),  // exact duplicate of 10
      (12L, Seq(3.0, -4.0))) // rel = 0.6, orthogonal to 10/11
      .toDF("vec_id", "v")
    val out = SimilarityOps.mmrRerank(fixture).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.size == 3, "pool smaller than k emits the whole pool")
    // rank 1: rel tie 10 vs 11 -> smaller id; mmr_score is the raw rel
    assert(out(1L) == ((10L, 0.8, 0.8)))
    // rank 2: the dup scores 0.7*0.8 - 0.3*1.0, the orthogonal 0.42 -> diversity wins
    assert(out(2L) == ((12L, 0.6, 0.7 * 0.6 - 0.3 * 0.0)))
    // rank 3: the dup finally lands, its penalty pinned at cosine 1
    assert(out(3L) == ((11L, 0.8, 0.7 * 0.8 - 0.3 * 1.0)))
  }

  test("s09 on the harness corpus: 8 queries x 5 unique ranks, selected set is diverse-consistent") {
    val rows = SimilarityOps.mmrRerankQ.run(spark, sf001).collect()
    assert(rows.length == 8 * 5)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(rs.map(_.getLong(2)).distinct.length == 5, "no neighbor repeats")
      // rank 1 must be the pure-relevance argmax of the emitted set
      val r1 = rs.find(_.getLong(1) == 1L).get
      assert(rs.forall(r => r.getDouble(3) <= r1.getDouble(3)))
    }
  }

  test("s10 exact kernel: probe sampling, rank order, mutual flag, zero-norm pin") {
    import spark.implicits._
    // probes (ids % 5 == 0): 0, 5, 10; non-probes: 1, 2
    val fixture = Seq(
      (0L, Seq(1.0, 0.0)),
      (5L, Seq(1.0, 0.1)),   // closest to 0 (and vice versa) -> mutual
      (10L, Seq(0.0, 1.0)),  // orthogonal to 0
      (1L, Seq(1.0, 0.4)),   // non-probe: can never be mutual
      (2L, Seq(0.0, 0.0)))   // zero vector: cosine pinned to 0.0
      .toDF("vec_id", "v")
    val out = SimilarityOps.knnGraphExact(fixture, mod = 5, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out.size == 3 * 4, "each probe ranks the full remaining corpus")
    // probe 0's ranking: 5 (cos ~.995) > 1 (cos ~.928) > 2 (0.0 pin) > 10 (0.0)
    // cosine ties at 0.0 break to the smaller vec_id
    assert(out((0L, 5L))._1 == 1L && out((0L, 1L))._1 == 2L)
    assert(out((0L, 2L)) == ((3L, 0.0, false)))
    assert(out((0L, 10L))._1 == 4L)
    // mutuality: 0 and 5 list each other; 0->1 can't be (1 not a probe);
    // 10 lists 0 but 0 lists 10 back (k covers the whole corpus) -> mutual
    assert(out((0L, 5L))._3 && out((5L, 0L))._3)
    assert(!out((0L, 1L))._3)
    assert(out((10L, 0L))._3 && out((0L, 10L))._3)
    // the zero vector never NaNs a rank anywhere
    assert(out.values.forall(v => !v._2.isNaN))
  }

  test("s10 LSH graph: probe-only sources, bucket-blind pairs absent, mutual needs both probes") {
    import spark.implicits._
    val a = Seq.tabulate(64)(i => math.sin(i + 1.0))
    // probes: 0, 5, 10; non-probe: 3. 0/5 share a's direction (same
    // sign pattern in every table -> guaranteed candidates); 10/3 are
    // the sign flip — they collide with each other, never with a
    val fixture = Seq(
      (0L, a), (5L, a.map(_ * 0.5)), (10L, a.map(-_)), (3L, a.map(x => -x * 2.0)))
      .toDF("vec_id", "v")
    val out = SimilarityOps.knnGraphLsh(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // only probe sources emit edges; the sign flip shares no bucket
    // with a's direction, so 0/5 never reach 10/3
    assert(out.keySet == Set((0L, 5L), (5L, 0L), (10L, 3L)))
    assert(out((0L, 5L)) == ((1L, 1.0, true)))
    assert(out((5L, 0L)) == ((1L, 1.0, true)))
    // 3 lists nothing back (not a probe) -> the surviving direction is
    // not mutual
    assert(out((10L, 3L))._1 == 1L && !out((10L, 3L))._3)
  }

  test("s13 graph recall: a bucket-missed exact edge costs recall and demotes mutuality") {
    import spark.implicits._
    val a = Seq.tabulate(64)(i => math.sin(i + 1.0))
    // probes 0 and 5; 10 is ALSO a probe but sign-flipped: exact graph
    // has 0<->5 mutual plus edges to/from 10; the LSH graph only finds
    // 0<->5, so each probe's recall is hits/k_exact and 10 recovers
    // nothing
    val fixture = Seq((0L, a), (5L, a.map(_ * 0.5)), (10L, a.map(-_)))
      .toDF("vec_id", "v")
    val out = SimilarityOps.graphRecall(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    // exact: each probe ranks both others (k_exact = 2); every exact
    // edge is mutual (3 probes, full graph at k=5)
    // approx: 0 and 5 recover each other (1 hit, still mutual); 10
    // recovers nothing
    assert(out(0L) == ((2L, 1L, 0.5, 2L, 1L)))
    assert(out(5L) == ((2L, 1L, 0.5, 2L, 1L)))
    assert(out(10L) == ((2L, 0L, 0.0, 2L, 0L)))
  }

  test("s11 portable knn: identical directions collide, sign-flipped never do, ranks dense") {
    import spark.implicits._
    // 64-dim fixture: b is a positive scaling of a (same sign pattern
    // in EVERY table -> guaranteed candidate, cos exactly 1); c is the
    // sign flip of a (every bucket bit flips -> no shared bucket)
    val a = Seq.tabulate(64)(i => math.sin(i + 1.0))
    val fixture = Seq(
      (1L, a), (2L, a.map(_ * 0.5)), (3L, a.map(-_)))
      .toDF("vec_id", "v")
    val out = SimilarityOps.portableKnn(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L), "the sign-flipped vector shares no bucket")
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
  }

  test("s12 ann recall: missed-bucket neighbor costs exactly its recall share") {
    import spark.implicits._
    val a = Seq.tabulate(64)(i => math.sin(i + 1.0))
    // probes 0 and 5; vector 3 is the sign flip -> never an LSH
    // candidate, but IS every probe's exact 2nd neighbor
    val fixture = Seq(
      (0L, a), (5L, a.map(_ * 0.5)), (3L, a.map(-_)))
      .toDF("vec_id", "v")
    val out = SimilarityOps.annRecall(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      0L -> ((2L, 1L, 0.5)),
      5L -> ((2L, 1L, 0.5))))
  }

  test("s12 on the harness corpus: recall in [0,1], k_exact full, one row per probe") {
    val rows = SimilarityOps.annRecallQ.run(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) == SimilarityOps.PortableKnnK)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("s14 rbo: recovered top rank earns the dyadic weights; missed edges cap the score") {
    import spark.implicits._
    val a = Seq.tabulate(64)(i => math.sin(i + 1.0))
    // probes 0 and 5; 3 is the sign flip: exact lists are [other, 3],
    // the LSH list is [other] only -> prefix overlaps (1, 1, 1) and
    // rbo = 0.5*1/1 + 0.25*1/2 + 0.125*1/3 exactly
    val fixture = Seq((0L, a), (5L, a.map(_ * 0.5)), (3L, a.map(-_)))
      .toDF("vec_id", "v")
    val expected = 0.5 * 1 / 1.0 + 0.25 * 1 / 2.0 + 0.125 * 1 / 3.0
    val out = SimilarityOps.rboEval(fixture).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set(0L, 5L))
    assert(out(0L) === ((1L, 1L, 1L, expected)))
    assert(out(5L) === ((1L, 1L, 1L, expected)))
  }

  test("s14 on the harness corpus: prefix overlaps monotone, rbo within the truncated bound") {
    val rows = SimilarityOps.rboEvalQ.run(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o1, o2, o3, rbo) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(o1 <= o2 && o2 <= o3, s"prefix overlaps must be non-decreasing: $r")
      assert(o1 <= 1 && o2 <= 2 && o3 <= 3)
      assert(rbo >= 0.0 && rbo <= 0.875 + 1e-12, s"truncated RBO bound: $r")
    }
  }

  test("s11 on the harness corpus: dense per-vector ranks, cosine bounded and monotone") {
    val rows = SimilarityOps.knnLshPortableQ.run(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (vid, rs) =>
      val byRank = rs.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to rs.length).toSeq,
        s"vec $vid ranks not dense")
      val coss = byRank.map(_.getDouble(3))
      assert(coss.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
      assert(coss.zip(coss.tail).forall { case (x, y) => x >= y },
        s"vec $vid cosine not monotone in rank")
    }
  }

  /** Symmetric edge table from undirected pairs. */
  private def symEdges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src_id", "dst_id")
  }

  private def peelMap(edges: DataFrame, coreK: Int)
      : Map[Long, (Boolean, Option[Long], Option[Long])] =
    SimilarityOps.kCorePeel(edges, coreK, 20).collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    }.toMap

  test("s17 peel: triangle survives, pendant drops round 1, starved hub falls with its leaves") {
    // triangle 1-2-3 with pendant 4 on 3; disjoint star 20-(21,22)
    val out = peelMap(
      symEdges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (20L, 21L), (20L, 22L)),
      coreK = 2)
    // the 2-core is exactly the triangle, each member with degree 2
    Seq(1L, 2L, 3L).foreach(v => assert(out(v) == ((true, Some(2L), None))))
    assert(out(4L) == ((false, None, Some(1L))))
    // hub 20 has degree 2 >= coreK, but both its edges touch degree-1
    // leaves — the simultaneous edge filter starves it in the SAME
    // round its leaves fall (the documented edge-based semantics)
    Seq(20L, 21L, 22L).foreach(v => assert(out(v) == ((false, None, Some(1L)))))
  }

  test("s17 peel: a path peels from the ends inward, one layer per round") {
    val out = peelMap(
      symEdges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), coreK = 2)
    assert(out.values.forall(v => !v._1 && v._2.isEmpty))
    assert(out(1L)._3 == Some(1L) && out(6L)._3 == Some(1L))
    assert(out(2L)._3 == Some(2L) && out(5L)._3 == Some(2L))
    assert(out(3L)._3 == Some(3L) && out(4L)._3 == Some(3L))
  }

  test("s18 probe curve: recall monotone in probes, candidates strictly growing, arithmetic ties out") {
    val rows = SimilarityOps.ivfProbeCurveQ.run(spark, sf001).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == SimilarityOps.IvfCurveProbes.map(_.toLong))
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * SimilarityOps.PortableKnnK,
        "k_exact = queries x k (full exact graph per query)")
      assert(r.getDouble(4) == r.getLong(3).toDouble / r.getLong(2),
        "recall is the one division it claims to be")
    }
    val recalls = rows.map(_.getDouble(4))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      "more probes can only add candidates — recall is monotone")
    val cands = rows.map(_.getLong(5))
    assert(cands.zip(cands.tail).forall { case (a, b) => b > a },
      "every extra probe scans strictly more cells on this corpus")
  }

  test("s17 report on the harness corpus: one row per probe, flags partition cleanly") {
    val rows = SimilarityOps.kCoreQ.run(spark, sf001).collect()
    val probes = Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % SimilarityOps.GraphSampleMod === 0).count()
    assert(rows.length == probes)
    rows.foreach { r =>
      val (inCore, deg, round) =
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)))
      if (inCore) {
        assert(round.isEmpty, "core nodes carry no peel round")
        assert(deg.exists(_.asInstanceOf[Long] >= SimilarityOps.KCoreK),
          "core degree honors the threshold")
      } else {
        assert(deg.isEmpty, "removed nodes carry no core degree")
        assert(round.exists(_.asInstanceOf[Long] >= 1L))
      }
    }
    assert(rows.exists(_.getBoolean(1)) && rows.exists(!_.getBoolean(1)),
      "the harness graph has both a core and a peeled fringe")
  }

  test("s26 SQ8: per-edge quantization error bounded, recall matches float IVF") {
    val out = SimilarityOps.knnSq8(emb).persist()
    try {
      // int8 symmetric quantization on unit-norm 64-dim vectors: the
      // per-edge cosine error stays well under 0.02 (measured max
      // ~0.006 on this corpus — the bound has 3x margin)
      val maxErr = out.agg(max(abs(col("cos_sim") - col("cos_sq8"))))
        .head.getDouble(0)
      assert(maxErr < 0.02, s"SQ8 cosine error $maxErr exceeds bound")
      // the rescored top-k must not lose recall vs the same-geometry
      // float IVF beyond the shortlist-boundary wiggle
      val floatIvf = recallAt3(SimilarityOps.knnIvf(emb, k = 3, probes = 4))
      val sq8 = recallAt3(out)
      info(f"recall@3 float=$floatIvf%.4f sq8=$sq8%.4f")
      assert(sq8 >= floatIvf - 0.02,
        s"SQ8 recall $sq8 fell more than 0.02 below float IVF $floatIvf")
    } finally { out.unpersist(); () }
  }

  test("s26 SQ8: a planted exact duplicate is the rank-1 match under quantization") {
    import spark.implicits._
    // 40 deterministic vectors + one exact copy of vec 7 as id 1000
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 8 + d + 1).toDouble))
    }
    val docs = (base :+ (1000L, base(7)._2)).toDF("vec_id", "v")
    val out = SimilarityOps.knnSq8(docs).collect()
      .filter(r => r.getLong(2) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1000L) === 7L && out(7L) === 1000L,
      "exact copies must be each other's rank-1 under SQ8")
  }

  test("s27 BM25: self-hit first, rare term outranks common at equal tf/dl") {
    import spark.implicits._
    val common = Seq.fill(6)("common").mkString(" ")
    val docs = Seq(
      (0L, "apple banana zq1 zq2 zq3"), // the query doc (0 % 100 == 0)
      (1L, "apple apple apple apple common common common"),
      (2L, s"apple $common"),  // one apple, dl 7
      (3L, s"banana $common"), // one banana, dl 7 — same tf/dl as doc 2
      (4L, s"apple $common"),
      (5L, s"apple $common"),
      (6L, common), (7L, common), (8L, common), (9L, common)
    ).toDF("doc_id", "text")
    val out = SimilarityOps.bm25TopK(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getLong(3)))
      .toMap
    assert(out.keys.forall(_._1 == 0L), "only doc 0 poses a query")
    assert(out((0L, 0L))._1 === 1L,
      "the query doc itself carries every query term and must rank first")
    // banana df=2 vs apple df=5: idf favors the rare term; tf and dl
    // are identical, so doc 3 must outrank docs 2/4/5
    assert(out((0L, 3L))._1 < out((0L, 2L))._1,
      s"rare-term hit must outrank common-term hit: ${out.toSeq.sortBy(_._2._1)}")
    // ranking is strictly ordered by the snapped score
    val byRank = out.toSeq.map { case ((_, d), (r, s)) => (r, s, d) }.sortBy(_._1)
    assert(byRank.sliding(2).forall {
      case Seq((_, s1, d1), (_, s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    }, s"rank order must follow (score desc, doc_id): $byRank")
  }

  test("s28 RRF: a doc in BOTH rankers' lists outranks single-list docs") {
    import spark.implicits._
    val common = Seq.fill(6)("common").mkString(" ")
    val docs = Seq(
      (0L, "apple banana zq1 zq2 zq3"),
      (1L, s"apple $common"),         // weaker on both rankers
      (2L, s"banana banana $common"), // top lexical hit AND planted vector neighbor
      (3L, common), (4L, common), (5L, common)
    ).toDF("doc_id", "text")
    // vec 2 nearly parallel to the query vec 0; others near-orthogonal
    def v(main: Int, eps: Double) =
      (0 until 8).map(d => if (d == main) 1.0 else eps)
    val emb = Seq(
      (0L, v(0, 0.01)), (1L, v(3, 0.02)), (2L, v(0, 0.03)),
      (3L, v(5, 0.01)), (4L, v(6, 0.01)), (5L, v(7, 0.01))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.hybridRrfTopK(docs, emb).collect()
      .map(r => r.getLong(2) -> (r.getLong(1), r.isNullAt(4), r.isNullAt(5)))
      .toMap
    assert(!out.contains(0L), "the query doc is excluded from both rankers")
    val (rank2, lexNull2, vecNull2) = out(2L)
    assert(!lexNull2 && !vecNull2, "doc 2 must appear in BOTH rankers' lists")
    assert(rank2 === 1L,
      s"top rank on both rankers must fuse to rank 1: $out")
    val (rank1, _, _) = out(1L)
    assert(rank1 > rank2, "strictly worse ranks on both legs fuse strictly behind")
    // pure-filler docs never earn a lexical rank
    Seq(3L, 4L, 5L).foreach(d => assert(out(d)._2, s"doc $d must have NULL lex_rank"))
  }

  test("s30 capped serve: floor holds, champion tier enforces the budget, wide budget = exact") {
    val docs = Tables.documents(spark, sf001)
    // acceptance: every probe clears the pinned overlap floor, and on
    // this corpus (no term's champion list truncates a top-k
    // contributor at sf0.001) overlap is exactly 1.0
    val rows = SimilarityOps.cappedServeQ.run(spark, sf001).collect()
    assert(rows.nonEmpty, "s30 must produce probe rows")
    rows.foreach { r =>
      val (q, ov, ok) = (r.getLong(0), r.getDouble(3), r.getBoolean(4))
      assert(ok, s"query $q overlap $ov under floor ${SimilarityOps.Bm25OverlapFloor}")
      assert(ov === 1.0, s"query $q: sf0.001 measured overlap is exactly 1.0, got $ov")
    }
    // the budget is ENFORCED: per-term champion list size == min(df, budget)
    val si = SimilarityOps.bm25Impacts(SimilarityOps.bm25Postings(docs))
    val sizes = SimilarityOps.bm25ChampionTier(si)
      .groupBy(col("term")).agg(count(lit(1)).as("kept"))
      .join(si.groupBy(col("term")).agg(count(lit(1)).as("df")), "term")
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      val (term, kept, df) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(kept === math.min(df, SimilarityOps.PostingBudget),
        s"term $term kept $kept of df=$df under budget ${SimilarityOps.PostingBudget}")
    }
    // self-consistency: a budget no term exceeds makes the two-tier
    // serve EXACTLY the uncapped ranking (rescore is exact, so the
    // only divergence channel is champion-list truncation)
    val wide = SimilarityOps.bm25RankCapped(docs, SimilarityOps.bm25Postings(docs),
        budget = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exact = SimilarityOps.bm25Rank(docs, SimilarityOps.bm25Postings(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(wide === exact, "uncapped-budget two-tier serve must equal the exact ranking")
    // a MATERIALIZED tier, by contrast, rejects a budget past its
    // ceiling instead of silently serving a truncated champion list
    val qt = SimilarityOps.bm25QueryTerms(docs, SimilarityOps.Bm25QueryMod)
    val si2 = SimilarityOps.bm25Impacts(SimilarityOps.bm25Postings(docs))
    intercept[IllegalArgumentException] {
      SimilarityOps.bm25RankCappedFromTier(qt, si2,
        SimilarityOps.bm25ImpactRanked(si2), SimilarityOps.Bm25TopK,
        excludeSelf = false, budget = SimilarityOps.TierMaxBudget + 1)
    }
  }

  test("s33 impact staleness: both advisory branches fire correctly and acted-on serve is exact") {
    val rows = SimilarityOps.impactStalenessQ.run(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === SimilarityOps.StaleDeltaMods.map(_.toLong).toSet)
    val routine = rows(20L) // 1/20 delta: the control branch — holds
    assert(!routine.getAs[Boolean]("advise_refresh"),
      s"routine ingest must not trigger a refresh: $routine")
    assert(routine.getAs[Double]("overlap_after") ===
      routine.getAs[Double]("mean_overlap"),
      "un-refreshed serve keeps its measured overlap")
    assert(routine.getAs[Double]("mean_overlap") >=
      SimilarityOps.ImpactRefreshFloor)
    val heavy = rows(3L) // 1/3 delta: staleness past the floor — fires
    assert(heavy.getAs[Boolean]("advise_refresh"),
      s"a third of the corpus unseen must trigger a refresh: $heavy")
    assert(heavy.getAs[Double]("overlap_after") === 1.0,
      "acted-on refresh serves the recomputed ranking exactly")
    assert(heavy.getAs[Double]("mean_overlap") <
      SimilarityOps.ImpactRefreshFloor)
    // monotone staleness: more unseen delta, less overlap
    assert(heavy.getAs[Double]("mean_overlap") <
      routine.getAs[Double]("mean_overlap"))
  }

  test("d37 compaction crossover: routine takedowns keep masking, a bulk purge compacts") {
    val rows = SimilarityOps.compactionCrossoverQ.run(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === SimilarityOps.CompactDeleteMods.map(_.toLong).toSet)
    val routine = rows(50L)
    assert(!routine.getAs[Boolean]("advise_compact"),
      s"a 2% delete must not trigger a rewrite: $routine")
    assert(routine.getAs[Double]("amp_after") ===
      routine.getAs[Double]("read_amp"))
    val purge = rows(3L)
    assert(purge.getAs[Boolean]("advise_compact"),
      s"a 1/3 purge must trigger the rewrite: $purge")
    assert(purge.getAs[Double]("amp_after") === 1.0,
      "acted-on compaction serves at amplification 1.0")
    // conservation: tomb rows + live rows == index rows, both legs
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_tomb_rows") + r.getAs[Long]("n_live") ===
        r.getAs[Long]("n_index"))
      assert(r.getAs[Double]("read_amp") >= 1.0)
    }
  }

  test("s35 impact quantization: overlap monotone in mantissa width, exactly one width chosen") {
    val rows = SimilarityOps.impactQuantQ.run(spark, sf001).collect()
    assert(rows.length === SimilarityOps.ImpactQuantBits.length)
    val byBits = rows.map(r => r.getAs[Long]("bits") -> r).toMap
    val overlaps = SimilarityOps.ImpactQuantBits
      .map(b => byBits(b.toLong).getAs[Double]("mean_overlap"))
    assert(overlaps === overlaps.sorted,
      s"overlap must not decrease with more mantissa bits: $overlaps")
    // the advisory must pick exactly one width, and it must meet the floor
    val chosen = rows.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length === 1, s"exactly one width chosen, got ${chosen.length}")
    assert(chosen.head.getAs[Boolean]("meets_floor"))
    // every candidate the quantized serve returns comes from the same
    // tier-bounded candidate set, so k never exceeds the exact serve's
    rows.foreach(r => assert(r.getAs[Long]("total_hits") <= r.getAs[Long]("total_k")))
  }

  test("st18 recut policy: holds under the calibrated fraction, fires past it, always fires on takedown") {
    import SimilarityOps.shouldRecutTier
    // st18's operating point: a 10% delta must HOLD (the s33
    // calibration says 5% serves at >= 0.90 overlap; 15% is the
    // threshold between the two measured points)
    assert(!shouldRecutTier(10, 100, takedown = false))
    // past the threshold the frozen tier is outside its calibration
    assert(shouldRecutTier(20, 100, takedown = false))
    // s33's own bulk operating point (1/3 delta) must fire
    assert(shouldRecutTier(34, 102, takedown = false))
    // a takedown is a correctness event — fires regardless of drift
    assert(shouldRecutTier(0, 100, takedown = true))
    // empty-lake bootstrap: no total, no drift-based fire, no crash
    assert(!shouldRecutTier(0, 0, takedown = false))
    assert(shouldRecutTier(0, 0, takedown = true))
  }
}
