package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-stress proof for the dedup/ANN/curation families: the repo's
  * central 100 TB claims — candidate volume stays O(n·bucket) because
  * every generator is bucketed with a hot-key cap, and adaptive sizing
  * (LSH planes, IVF cells) keeps occupancy flat as n grows — measured
  * on an ADVERSARIAL corpus at two sizes (10× apart, the larger ~10×
  * sf0.1's documents table) instead of asserted in scaladoc.
  *
  * Adversarial ingredients, per the shapes a crawl corpus actually
  * has: one boilerplate template family at 5% of rows (members differ
  * by one token — true near-dups that all collide in LSH space), 1%
  * null-text rows, one dominant source, and (embeddings) one
  * same-direction vector cluster at 5%.
  *
  * The spec asserts the MODEL, not absolute times (the box is
  * multi-tenant): conservation of banded rows, the per-bucket cap
  * bound on proposed pair volume, guard engagement exactly when a
  * family outgrows its cap, and a sub-quadratic measured scaling
  * exponent log(c₂/c₁)/log(n₂/n₁) for every surviving candidate
  * volume. Measured values are logged as `SCALE |` lines — SCALE.md
  * carries the table from a reference run.
  */
class ScaleStressSpec extends SparkSpec {

  private val N1 = 2000
  private val N2 = 20000

  /** Deterministic adversarial corpus: everything derives from doc_id
    * arithmetic so the two sizes are directly comparable (no RNG
    * state). 5% template family (one token mutated per member), 1%
    * null text, hot source on 60% of rows. */
  private def stressDocs(n: Int): DataFrame = {
    import spark.implicits._
    val template = (0 until 40).map(i => s"boiler$i").toIndexedSeq
    (0L until n.toLong).map { id =>
      val text =
        if (id % 100 == 99) null
        else if (id % 20 == 0) // template family, 1-token mutation
          template.updated((id / 20 % 40).toInt, s"mut$id").mkString(" ")
        else
          (0 until 40).map(i => s"w${(id * 40 + i) * 2654435761L % 50000}")
            .mkString(" ")
      val source = if (id % 10 < 6) "mega_source" else s"src${id % 7}"
      (id, text, source)
    }.toDF("doc_id", "text", "source")
  }

  /** Deterministic embeddings: pseudo-random directions, plus (when
    * withHotCluster) a 5% same-direction cluster — the embedding-space
    * boilerplate analogue. */
  private def stressEmb(n: Int, withHotCluster: Boolean): DataFrame = {
    import spark.implicits._
    val clusterSize = if (withHotCluster) n / 20 else 0
    (0 until n).map { i =>
      val v =
        if (i < clusterSize)
          Array.tabulate(64)(j => math.cos(j * 0.7) + 1e-4 * math.sin(i * 13 + j))
        else // hash-scrambled argument: independent-ish components, so
             // bucket occupancy is the designed n/2^planes (a sinusoid
             // in j would collapse every vector onto a 1-D manifold)
          Array.tabulate(64)(j => math.sin(((i * 2654435761L + j * 40503L) % 10007L).toDouble))
      (i.toLong, v)
    }.toDF("vec_id", "v")
  }

  private def report(docs: DataFrame, emb: DataFrame): Map[String, Long] =
    DedupOps.coverageReport(docs, emb)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def expo(c1: Long, c2: Long): Double =
    math.log(c2.toDouble / c1.toDouble) / math.log(N2.toDouble / N1)

  private def logScale(stage: String, c1: Long, c2: Long): Unit =
    info(f"SCALE | $stage%-28s | n1=$c1%10d | n2=$c2%10d | exponent=${expo(c1, c2)}%6.2f")

  test("d03 minhash: conservation, cap-bounded pair volume, guard engages at 10x") {
    val (d1, d2) = (stressDocs(N1), stressDocs(N2))
    val (r1, r2) = (report(d1, stressEmb(N1, withHotCluster = false)),
      report(d2, stressEmb(N2, withHotCluster = true)))

    // conservation against an independently computed banded-row count
    // (null-text rows produce no bands; the report must account for
    // exactly the rows that exist, no more)
    val banded1 = DedupOps.bandKeys(DedupOps.minhashSignatures(d1)).count()
    val banded2 = DedupOps.bandKeys(DedupOps.minhashSignatures(d2)).count()
    assert(r1("minhash_rows_kept") + r1("minhash_rows_dropped") === banded1)
    assert(r2("minhash_rows_kept") + r2("minhash_rows_dropped") === banded2)

    // the O(n·bucket) model: a kept bucket holds ≤ cap members, so the
    // proposed pair volume is bounded by kept_rows · cap / 2
    assert(r1("minhash_pairs_proposed")
      <= r1("minhash_rows_kept") * DedupOps.MaxBandBucket / 2)
    assert(r2("minhash_pairs_proposed")
      <= r2("minhash_rows_kept") * DedupOps.MaxBandBucket / 2)

    // guard engagement is exactly the family-vs-cap relation:
    // family(N1)=100 ≤ 256 ⇒ nothing dropped; family(N2)=1000 > 256 ⇒
    // the family's band rows are dropped and surfaced
    assert(r1("minhash_rows_dropped") === 0L)
    assert(r2("minhash_rows_dropped") > 0L)
    assert(r2("minhash_hot_buckets") > 0L)

    // What "no quadratic blowup" means here, precisely: the banded
    // volume feeding the generator is LINEAR in n (exponent ~1), and
    // proposed pairs sit under the kept_rows·cap/2 envelope (asserted
    // above) at BOTH sizes. Proposed pairs themselves may grow faster
    // than n under the cap — a template family's true-duplicate
    // density IS quadratic in family size (measured exponent ~1.85
    // here), and those are real near-dups the operator must surface;
    // the cap's job is bounding the per-bucket (and so per-task) cost,
    // not denying true pairs.
    logScale("minhash_pairs_proposed",
      r1("minhash_pairs_proposed"), r2("minhash_pairs_proposed"))
    logScale("minhash_rows_dropped",
      r1("minhash_rows_dropped") max 1L, r2("minhash_rows_dropped"))
    logScale("minhash_rows_kept", r1("minhash_rows_kept"), r2("minhash_rows_kept"))
    logScale("minhash_hot_buckets",
      r1("minhash_hot_buckets") max 1L, r2("minhash_hot_buckets"))
    val eKept = expo(r1("minhash_rows_kept"), r2("minhash_rows_kept"))
    assert(eKept < 1.1, s"banded-volume exponent $eKept is superlinear")
    val envelope2 = r2("minhash_rows_kept") * DedupOps.MaxBandBucket / 2
    assert(r2("minhash_pairs_proposed") <= envelope2,
      "proposed pairs escaped the O(n·bucket) envelope")

    // simhash conservation from the same reports (13 blocks per
    // non-null doc at the radius-12 contract)
    val nonNull1 = d1.filter(col("text").isNotNull).count()
    val nonNull2 = d2.filter(col("text").isNotNull).count()
    val blocks = DedupOps.SimhashMaxHamming + 1
    assert(r1("simhash_rows_kept") + r1("simhash_rows_dropped")
      === nonNull1 * blocks)
    assert(r2("simhash_rows_kept") + r2("simhash_rows_dropped")
      === nonNull2 * blocks)

    // ANN: adaptive plane count holds occupancy, and the planted
    // same-direction cluster (1000 > 512 cap, ×4 tables) is dropped
    // and accounted
    assert(r1("ann_rows_kept") + r1("ann_rows_dropped") === N1.toLong * SimilarityOps.LshTables)
    assert(r2("ann_rows_kept") + r2("ann_rows_dropped") === N2.toLong * SimilarityOps.LshTables)
    assert(r1("ann_rows_dropped") === 0L)
    assert(r2("ann_rows_dropped") >= (N2 / 20).toLong * SimilarityOps.LshTables)
    logScale("ann_rows_dropped", r1("ann_rows_dropped") max 1L, r2("ann_rows_dropped"))
  }

  test("d04 simhash: sub-cap family generates its true pairs; super-cap family drops, accounted") {
    // sub-cap: the N1 family (100 members, 1-token mutations) must
    // surface as near-dup pairs — the guard is not engaged
    val pairs = DedupOps.simhashPairsMulti(
      DedupOps.simhashFingerprints(
        stressDocs(N1).filter(col("text").isNotNull)),
      DedupOps.simhashLaneCols(DedupOps.SimhashLanes),
      DedupOps.SimhashMaxHamming)
    val familyPairs = pairs
      .filter(col("doc_a") % 20 === 0 && col("doc_b") % 20 === 0).count()
    assert(familyPairs > 0L, "sub-cap template family must produce near-dup pairs")

    // super-cap: 5000 identical docs blow the 4096 block cap — all 13
    // block buckets drop, the drop volume is exact, and no family pair
    // survives (recall erosion is VISIBLE, not silent)
    import spark.implicits._
    val identical = (0L until 5000L)
      .map(id => (100000L + id, "the exact same boilerplate page body", "mega"))
      .toDF("doc_id", "text", "source")
    val docs = stressDocs(N1).unionByName(identical)
    val rep = report(docs, stressEmb(100, withHotCluster = false))
    val blocks = DedupOps.SimhashMaxHamming + 1
    // ≥ the family's full block volume; the slack is background docs
    // whose 9-10-bit block value collides into the now-hot buckets
    // (~n/2^10 per band — they drop too, and are accounted)
    assert(rep("simhash_rows_dropped") >= 5000L * blocks)
    assert(rep("simhash_rows_dropped") <= 5000L * blocks + 200L)
    assert(rep("simhash_hot_buckets") === blocks.toLong)
  }

  test("s02 ANN: corpus-adaptive planes keep candidate volume sub-quadratic at 10x") {
    val e1 = stressEmb(N1, withHotCluster = false)
    val e2 = stressEmb(N2, withHotCluster = true)
    val c1 = SimilarityOps.cosineCandidates(
      e1, SimilarityOps.LshTables,
      graft.functions.VectorFunctions.planesForCorpus(N1)).count()
    val c2 = SimilarityOps.cosineCandidates(
      e2, SimilarityOps.LshTables,
      graft.functions.VectorFunctions.planesForCorpus(N2)).count()
    val e = expo(c1, c2)
    assert(e < 1.4, s"ANN candidate exponent $e looks quadratic")
    logScale("ann_candidates", c1, c2)
  }

  test("s03 IVF: sqrt cell sizing and complete results at 10x") {
    assert(SimilarityOps.cellsForCorpus(N1) === math.ceil(math.sqrt(N1)).toInt)
    assert(SimilarityOps.cellsForCorpus(N2) === math.ceil(math.sqrt(N2)).toInt)
    // cells grow ~sqrt(10): probe cost per query stays O(probes·sqrt n)
    val ratio = SimilarityOps.cellsForCorpus(N2).toDouble /
      SimilarityOps.cellsForCorpus(N1)
    assert(ratio > 2.5 && ratio < 4.0)
    val out = SimilarityOps.knnIvf(stressEmb(N2, withHotCluster = false), 3, 4)
    assert(out.count() === N2.toLong * 3)
  }

  test("t09/t10 text curation holds shape at 10x with a hot source") {
    val docs = stressDocs(N2).filter(col("text").isNotNull)
    val n = docs.count()
    val rep = CurationOps.repetitionSignals(docs)
    assert(rep.count() === n, "repetition signals must stay per-document")
  }

  test("d13 segment dedup at 10x: segment conservation, boilerplate collapses linearly") {
    val docs = stressDocs(N2)
    val out = DedupOps.segmentDedup(docs)
    out.persist()
    try {
      val w = DedupOps.SegmentTokens
      val segs = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), ceil(size(split(col("text"), " ")) / lit(w.toDouble)).cast("int") - 1),
          i => concat_ws(" ", slice(split(col("text"), " "), i * w + 1, lit(w))))))
      // exactly one survivor per distinct segment value — keep-first
      // dedup conserves the distinct-segment count, nothing else
      val kept = out.agg(sum(col("kept_segs"))).head.getLong(0)
      assert(kept === segs.select(col("col")).distinct().count(),
        "sum(kept_segs) must equal the corpus's distinct segment count")
      val total = out.agg(sum(col("n_segs"))).head.getLong(0)
      assert(total === segs.count(), "n_segs must account for every segment")
      // the 5% template family shares 2 of its 3 chunks with family
      // peers at 10x → its kept volume is far below its raw volume
      // template members are doc_id % 20 == 0, which never intersects
      // the null-text ids (% 100 == 99)
      val family = out.filter(col("doc_id") % 20 === 0)
      val famTotal = family.agg(sum(col("n_segs")), sum(col("kept_segs"))).head
      assert(famTotal.getLong(1).toDouble / famTotal.getLong(0) < 0.5,
        s"boilerplate family must collapse: kept ${famTotal.getLong(1)} of ${famTotal.getLong(0)}")
      assert(out.count() === docs.count(), "every document keeps a row, null text included")
    } finally out.unpersist()
  }

  test("pk01 packing at 10x: every bin within budget, oversized docs isolated") {
    val docs = stressDocs(N2).filter(col("text").isNotNull)
    val budget = 512L
    val packed = CurationOps.packed(docs, shards = 32, budget = budget)
    packed.persist()
    try {
      val bins = packed.groupBy(col("shard"), col("bin"))
        .agg(sum(col("n_tokens")).as("total"), count(lit(1)).as("n_docs"))
      val bad = bins.filter(col("total") > budget && col("n_docs") > 1).count()
      assert(bad === 0L, "multi-doc bin over budget")
      assert(packed.count() === docs.count(), "every doc must be packed")
    } finally packed.unpersist()
  }

  test("t21 token budget at 10x: the 60% source is capped, small sources keep all") {
    val docs = stressDocs(N2)
    val out = CurationOps.tokenBudgetSample(docs).persist()
    try {
      assert(out.count() === docs.count(), "decision report covers every doc")
      val rates = out.groupBy(col("source")).agg(
        max(col("rate_bp")).as("bp"), sum(col("n_tokens")).as("t_s")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // mega_source holds ~60% of token mass against an equal share of
      // 1/8 of 95% of the budget -> hard-capped; the small sources sit
      // under their share -> rate 10000
      assert(rates("mega_source")._1 < 2500L,
        s"hot source must be capped, got ${rates("mega_source")._1}")
      rates.filterNot(_._1 == "mega_source").foreach { case (s, (bp, _)) =>
        assert(bp === 10000L, s"$s under its share must keep all (got $bp)")
      }
    } finally out.unpersist()
  }

  test("q41 key skew at 10x: a 99%-hot key dominates max_share, counts conserve") {
    import spark.implicits._
    val n = 20000
    val ev = (0 until n).map { i =>
      ("hot_type", if (i % 100 < 99) 7L else i.toLong)
    }.toDF("event_type", "user_id")
    val r = CoreQueries.keySkewReport(ev).collect().head
    assert(r.getLong(1) === n.toLong)
    assert(r.getLong(3) === (n * 99L / 100), "hot key row count")
    assert(r.getDouble(5) === (n * 99L / 100).toDouble / n, "max_share exact ratio")
    assert(r.getDouble(6) >= r.getDouble(5), "top10 covers the hot key")
  }

  test("t22 mixture at 10x: weights normalize and the 60% source is dampened toward sqrt") {
    val out = CurationOps.mixtureWeights(stressDocs(N2)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val wSum = out.values.map(_._2).sum
    assert(math.abs(wSum - 1.0) < 1e-9, s"weights must normalize, got $wSum")
    val (hotShare, hotW, hotEpochs) = out("mega_source")
    // temperature 1/2: the hot source's weight sits strictly between
    // its raw share and uniform - dampened but not flattened
    assert(hotW < hotShare, "hot source must be dampened below its share")
    assert(hotW > 1.0 / out.size, "but stays above uniform")
    // under-share sources are UPsampled past one epoch of the budget
    out.filterNot(_._1 == "mega_source").foreach { case (s, (share, w, ep)) =>
      assert(w > share, s"$s below-average share must be upweighted")
      assert(ep > hotEpochs, s"$s must see more epochs than the hot source")
    }
  }

  test("m06 manifest at 10x: shard totals conserve rows, bytes, and id-sum") {
    val docs = stressDocs(N2)
    val payloads = docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"), lit("en").as("lang"))
    val m = MultimodalOps.shardManifest(payloads).collect()
    assert(m.map(_.getLong(1)).sum === docs.count())
    val expectBytes = docs.agg(
      sum(length(col("text").cast("binary")).cast("long"))).head.getLong(0)
    assert(m.map(_.getLong(2)).sum === expectBytes, "byte totals conserve")
    val expectIds = docs.agg(sum(col("doc_id"))).head.getLong(0)
    assert(m.map(_.getLong(3)).sum === expectIds, "id checksum conserves")
  }

  test("s10 LSH graph at 10x: adaptive geometry keeps probe candidates ~linear; graph bounded, mutual symmetric") {
    import graft.functions.VectorFunctions.planesForCorpus
    val e1 = stressEmb(N1, withHotCluster = false)
    val e2 = stressEmb(N2, withHotCluster = true)
    // the production geometry (planes follow the corpus, the s02
    // sizing): the probe-filtered candidate volume feeding the graph
    // must stay ~linear in n — this is the claim that replaced the
    // r8 corpus-fraction broadcast
    val probeFilter = col("a.vec_id") % SimilarityOps.GraphSampleMod === 0
    val c1 = SimilarityOps.cosPairs(e1, SimilarityOps.LshTables,
      planesForCorpus(N1), "s10_stress_1", probeFilter).count()
    val c2 = SimilarityOps.cosPairs(e2, SimilarityOps.LshTables,
      planesForCorpus(N2), "s10_stress_2", probeFilter).count()
    val ex = expo(c1, c2)
    assert(ex < 1.4, s"graph candidate exponent $ex looks quadratic")
    logScale("graph_candidates", c1, c2)

    // the portable/gate geometry at 10x (hot cluster engaged): LSH
    // out-degree is AT MOST k (a bucket miss shrinks a neighborhood,
    // never inflates it) and the mutual flag stays symmetric
    val g2 = SimilarityOps.knnGraphLsh(e2).persist()
    try {
      assert(g2.count() <=
        (N2 / SimilarityOps.GraphSampleMod).toLong * SimilarityOps.GraphK)
      assert(g2.groupBy(col("src_id")).count()
        .agg(max(col("count"))).head.getLong(0) <= SimilarityOps.GraphK)
      val mut = g2.filter(col("mutual"))
        .select(col("src_id"), col("dst_id"))
      val asym = mut.join(
        mut.select(col("dst_id").as("src_id"), col("src_id").as("dst_id")),
        Seq("src_id", "dst_id"), "left_anti").count()
      assert(asym === 0L, "mutual flag must be symmetric")
    } finally g2.unpersist()
  }

  test("d20 at 10x: the delta×lake filter rides the pair expansion — candidate volume is the slice product, never the full pair volume") {
    import graft.functions.VectorFunctions.planesForCorpus
    val e2 = stressEmb(N2, withHotCluster = true)
    // the production geometry (adaptive planes) at the larger size:
    // unfiltered directed candidates vs d20's delta→lake slice. With
    // delta = 1/10 of ids, the slice holds ~(1/10)·(9/10) = 9% of the
    // directed pairs — the filter must prune INSIDE the expansion, so
    // the measured ratio sits at the slice product, nowhere near 1
    val full = SimilarityOps.cosPairs(e2, SimilarityOps.LshTables,
      planesForCorpus(N2), "d20_stress_full").count()
    val slice = SimilarityOps.cosPairs(e2, SimilarityOps.LshTables,
      planesForCorpus(N2), "d20_stress_slice",
      srcFilter = col("a.vec_id") % DedupOps.IncEmbMod === 0
        && col("b.vec_id") % DedupOps.IncEmbMod =!= 0).count()
    val ratio = slice.toDouble / full
    info(f"d20 slice ratio: $slice of $full = $ratio%.4f (expected ~0.09)")
    assert(ratio > 0.03 && ratio < 0.18,
      f"delta×lake volume must be the ~9%% slice of the directed pairs, got $ratio%.4f")
    // verdict coverage holds at 10x: one row per delta vector
    val out = DedupOps.incrementalEmbedding(e2)
    assert(out.count() === e2.filter(col("vec_id") % DedupOps.IncEmbMod === 0).count())
  }

  test("t24 bigram model at 10x: instance conservation, sub-quadratic model table") {
    val (d1, d2) = (stressDocs(N1), stressDocs(N2))
    def modelRows(d: DataFrame): Long = {
      val toks = split(col("text"), " ")
      d.filter(col("text").isNotNull)
        .select(col("doc_id"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("bg.w1"), col("bg.w2")).distinct().count()
    }
    val (c1, c2) = (modelRows(d1), modelRows(d2))
    val e = expo(c1, c2)
    assert(e < 1.2, s"bigram model table exponent $e looks super-linear")
    logScale("bigram_model_rows", c1, c2)
    // conservation: every doc keeps a row and n_bigrams sums to the
    // independently computed max(len-1, 0) total
    val out = TextOps.bigramNll(d2).persist()
    try {
      assert(out.count() === d2.count(), "every doc keeps a row, null text included")
      val expect = d2.filter(col("text").isNotNull)
        .agg(sum(greatest(size(split(col("text"), " ")) - 1, lit(0)).cast("long")))
        .head.getLong(0)
      assert(out.agg(sum(col("n_bigrams"))).head.getLong(0) === expect,
        "bigram instances must conserve")
    } finally out.unpersist()
  }

  test("t25 growth curve at 10x: ten buckets, token and vocab totals conserve") {
    val docs = stressDocs(N2).filter(col("text").isNotNull)
    val out = TextOps.vocabGrowth(docs).collect().sortBy(_.getLong(0))
    assert(out.length === TextOps.GrowthBuckets)
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
    assert(out.map(_.getLong(2)).sum === toks.count(), "token totals conserve")
    assert(out.last.getLong(5) === toks.distinct().count(),
      "final cumulative vocab equals the corpus vocabulary")
    assert(out.map(_.getLong(3)).sum === out.last.getLong(5),
      "new-token counts partition the vocabulary")
  }

  test("d22 containment at 10x: hot sampled-shingle buckets capped; a planted excerpt still surfaces") {
    import spark.implicits._
    val (d1, d2) = (stressDocs(N1).filter(col("text").isNotNull).select("doc_id", "text"),
      stressDocs(N2).filter(col("text").isNotNull).select("doc_id", "text"))
    def sampledBuckets(docs: DataFrame): DataFrame =
      DedupOps.shingles(docs)
        .filter(substring(md5(col("shingle")), 1, 1) < "8")
        .groupBy(col("shingle")).agg(count(lit(1)).as("bn"))
    def guard(docs: DataFrame): (Long, Long) = {
      val r = sampledBuckets(docs).agg(
        coalesce(sum(when(col("bn") > DedupOps.MaxBandBucket, col("bn"))
          .otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("bn") <= DedupOps.MaxBandBucket, col("bn"))
          .otherwise(0L)), lit(0L))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // N1: the 100-member template family sits under the 256 cap — its
    // shared shingles index, and the family's containment pairs surface
    val (drop1, kept1) = guard(d1)
    assert(drop1 === 0L, "no bucket over cap at N1")
    val p1 = DedupOps.containmentPairs(d1).count()
    assert(p1 > 0L, "sub-cap template family must surface containment pairs")
    // N2: the 1000-member family blows the cap on every shared sampled
    // shingle — dropped and accounted, so pair volume stays under the
    // kept·cap/2 envelope instead of going quadratic in family size
    // (identical-boilerplate collapse is d01's job upstream, as d03)
    val (drop2, kept2) = guard(d2)
    assert(drop2 > 0L, "template family must engage the cap at N2")
    val p2 = DedupOps.containmentPairs(d2).count()
    assert(p2 <= kept2 * DedupOps.MaxBandBucket / 2,
      "containment candidates escaped the O(n·bucket) envelope")
    info(f"SCALE | d22_kept_rows               | n1=$kept1%10d | n2=$kept2%10d | exponent=${math.log(kept2.toDouble / kept1) / math.log(N2.toDouble / N1)}%6.2f")
    // a planted excerpt OUTSIDE the hot family survives at N2: its
    // unique shingles index normally, the hot family's drops don't
    // take innocent pairs with them
    val art = (0 until 60).map(i => s"uniq${i}tok").mkString(" ")
    val exc = (0 until 60).map(i => s"uniq${i}tok").slice(20, 35).mkString(" ")
    val extra = Seq((900001L, art), (900002L, exc)).toDF("doc_id", "text")
    val withExcerpt = DedupOps.containmentPairs(d2.union(extra))
      .filter(col("doc_a") === 900001L && col("doc_b") === 900002L)
      .collect()
    assert(withExcerpt.length === 1 && withExcerpt.head.getString(3) === "excerpt",
      "planted excerpt must survive the hot-family drops")
  }

  test("s15 IVFPQ at 10x: cell routing prunes the corpus; top-k complete at both sizes") {
    import graft.functions.CodebookRegistry
    Seq(N1, N2).foreach { n =>
      val e = stressEmb(n, withHotCluster = false)
      assert(SimilarityOps.knnIvfPq(e, k = 3).count() === 8L * 3,
        s"complete top-3 for all 8 queries at n=$n")
    }
    // the candidate bound that makes IVFPQ an index: probed candidates
    // per query are a vanishing corpus fraction (probes·cells-worth of
    // rows, cells ~ sqrt n), independently re-derived via the same
    // codebook plumbing the operator uses
    val e2 = stressEmb(N2, withHotCluster = false)
    val cb = SimilarityOps.centroids(e2, SimilarityOps.cellsForCorpus(N2.toLong))
    val cbId = CodebookRegistry.register(spark.sparkContext.broadcast(cb))
    val cand = try {
      val assign = e2.withColumn("cell",
        element_at(call_function("graft_cell_probes", col("v"), lit(cbId), lit(1)), 1))
        .select(col("vec_id"), col("cell"))
      val probes = e2.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          explode(call_function("graft_cell_probes", col("v"), lit(cbId), lit(4)))
            .as("cell"))
      probes.join(assign, Seq("cell"))
        .filter(col("vec_id") =!= col("query_id")).count()
    } finally CodebookRegistry.unregister(cbId)
    assert(cand < 8L * N2 / 2,
      s"cell routing must prune (candidates=$cand vs brute=${8L * N2})")
    info(f"SCALE | s15_probe_candidates         | n2=$cand%10d | corpus_fraction=${cand.toDouble / (8L * N2)}%6.3f")
  }

  test("q54 sketch: per-group state stays O(cap) while input cardinality grows 10x") {
    import spark.implicits._
    // ~n/8 distinct users per group — far over capacity at both sizes,
    // so every group's summary saturates at exactly HhBatchCap counters
    def counterTotal(n: Int): Long = {
      val df = (0 until n)
        .map(i => (s"g${i % 4}", (i * 2654435761L % (n / 2)).toLong, 1L))
        .toDF("g", "user_id", "w")
      val sizes = df.groupBy(col("g"))
        .agg(call_function("graft_space_saving", col("user_id"), col("w"),
          lit(TemporalOps.HhBatchCap)).as("sk"))
        .select(size(col("sk")).as("s")).collect().map(_.getInt(0))
      assert(sizes.max <= TemporalOps.HhBatchCap,
        s"sketch exceeded its cap at n=$n")
      sizes.map(_.toLong).sum
    }
    val (c1, c2) = (counterTotal(N1), counterTotal(N2))
    logScale("q54_sketch_counters", c1, c2)
    assert(expo(c1, c2) < 0.05,
      s"sketch state must not scale with input cardinality ($c1 -> $c2)")
  }

  test("d24 KMV sketch: per-source state hard-capped at k regardless of corpus size") {
    def sketchTotal(n: Int): Long = {
      val out = DedupOps.kmvVocab(stressDocs(n)).collect()
      out.foreach { r =>
        val nSketch = r.getAs[Long]("n_sketch")
        assert(nSketch <= DedupOps.KmvK, s"sketch exceeded k at n=$n")
        assert(r.getAs[Boolean]("under_cap_exact"),
          s"under-capacity sketch must be exact at n=$n")
      }
      out.map(_.getAs[Long]("n_sketch")).sum
    }
    val (c1, c2) = (sketchTotal(N1), sketchTotal(N2))
    logScale("d24_kmv_state", c1, c2)
    // every source outgrows k at both sizes -> state is |sources|*k flat
    assert(expo(c1, c2) < 0.05,
      s"KMV state must not scale with corpus cardinality ($c1 -> $c2)")
  }

  test("m10 entropy screen: one row-local pass, zero exchange, rows exactly linear at 10x") {
    def run(n: Int): Long = {
      val mm = stressDocs(n).filter(col("text").isNotNull)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          struct(lit("txt").as("format")).as("meta"))
      val out = MultimodalOps.entropyScreen(mm)
      val cnt = out.count()
      // the screen is a projection over the decode scan — any Exchange
      // here means someone added corpus-scale structure to a per-row op
      assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
        "m10 must stay a row-local pass")
      assert(cnt === mm.count(), "one verdict per payload, none dropped")
      cnt
    }
    val (c1, c2) = (run(N1), run(N2))
    logScale("m10_entropy_rows", c1, c2)
    assert(math.abs(expo(c1, c2) - 1.0) < 0.01,
      "output must be exactly one row per payload")
  }

  test("v13 label purity: edge volume conserved at probes*k; output O(|labels|) at 10x") {
    def run(n: Int): (Long, Long) = {
      val emb = stressEmb(n, withHotCluster = false)
        .withColumn("label", (col("vec_id") % 10).cast("string"))
      val rows = VectorOps.knnLabelPurity(emb).collect()
      val probes = emb.filter(col("vec_id") % SimilarityOps.GraphSampleMod === 0).count()
      // conservation: the probe-sample kernel emits exactly k edges per
      // probe (corpus ≫ k), and the purity report accounts every one
      assert(rows.map(_.getAs[Long]("n_edges")).sum
        === probes * SimilarityOps.GraphK, s"edge volume must be probes*k at n=$n")
      assert(rows.map(_.getAs[Long]("n_probes")).sum === probes)
      (rows.length.toLong, probes * SimilarityOps.GraphK)
    }
    val ((o1, e1), (o2, e2)) = (run(N1), run(N2))
    logScale("v13_purity_out_rows", o1, o2)
    logScale("v13_exact_edges", e1, e2)
    assert(o1 <= 10 && o2 <= 10, "output is one row per label, never per vector")
    assert(expo(o1, o2) < 0.05, "report cardinality must not scale with the corpus")
  }

  test("s17 k-core peel at 10x: node conservation, rounds set by structure not size") {
    import spark.implicits._
    def run(n: Int): Long = {
      // ring of n nodes (degree 2, IS the 2-core) + a pendant on every
      // 10th ring node: the pendants fall in round 1 whatever n is —
      // peel depth tracks graph STRUCTURE, so a 10x corpus pays 10x
      // per-round edge volume but not 10x rounds
      val ring = (0L until n.toLong).map(i => (i, (i + 1) % n))
      val pend = (0L until n.toLong by 10).map(i => (i, n + i))
      val pairs = ring ++ pend
      val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
        .toDF("src_id", "dst_id")
      val rep = SimilarityOps.kCorePeel(edges, coreK = 2, maxRounds = 5)
      val core = rep.filter(col("in_core")).count()
      val dropped = rep.filter(!col("in_core")).count()
      assert(core === n.toLong, s"the ring survives whole at n=$n")
      assert(dropped === n.toLong / 10, s"every pendant falls, nothing else, at n=$n")
      core + dropped
    }
    val (c1, c2) = (run(N1), run(N2))
    logScale("s17_report_rows", c1, c2)
    assert(math.abs(expo(c1, c2) - 1.0) < 0.02,
      "the peel report is node-level — exactly linear")
  }

  test("q59 AMS sketch at 10x: report O(|types|), exact F2 conserved, estimate in envelope") {
    import spark.implicits._
    def run(n: Int): Long = {
      // 4 types, n/8 users per type, every (type, user) seen exactly
      // twice -> per type: n_keys = n/8, F2 = 4·(n/8) = n/2
      val ev = (0 until n).map(i => (s"t${i % 4}", ((i / 4) % (n / 8)).toLong))
        .toDF("event_type", "user_id")
      val rows = CoreQueries.f2Report(ev).collect()
      assert(rows.length == 4, s"one report row per type at n=$n")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_keys") == n / 8, s"keys at n=$n")
        assert(r.getAs[Long]("f2_exact") == n / 2, s"exact F2 at n=$n")
        assert(math.abs(r.getAs[Double]("rel_err")) < 0.5,
          s"64-lane estimate within its deterministic envelope at n=$n")
      }
      rows.length.toLong
    }
    val (c1, c2) = (run(N1), run(N2))
    logScale("q59_report_rows", c1, c2)
    assert(expo(c1, c2) == 0.0, "sketch report must not scale with keys or rows")
  }

  test("s18 probe curve at 10x: candidates PER QUERY grow ~sqrt(n) — the IVF pruning claim") {
    def run(n: Int): Long = {
      val emb = stressEmb(n, withHotCluster = false)
      val rows = SimilarityOps.ivfProbeCurve(emb).collect()
        .map(r => r.getLong(0) -> r).toMap
      // per-query scan cost at the largest sweep point: cells size
      // ~n/sqrt(n) = sqrt(n), probes fixed -> sqrt(n) candidates/query
      val p = SimilarityOps.IvfCurveProbes.max.toLong
      rows(p).getAs[Long]("n_candidates") / rows(p).getAs[Long]("n_queries")
    }
    val (c1, c2) = (run(N1), run(N2))
    logScale("s18_cand_per_query", c1, c2)
    assert(expo(c1, c2) < 0.65,
      "IVF must prune: per-query candidates ~sqrt(n), never ~n")
  }

  /** d27-specific corpus: a 20-token boilerplate header on every 20th
    * doc, all other tokens globally unique (doc-id-salted). The
    * repeated volume is EXACTLY header × family size, so the covered
    * totals below are equalities, not envelopes. stressDocs is
    * unsuitable here: its filler tokens alias every 1250 ids
    * ((id·40+i)·K mod 50000 repeats when id shifts by 1250), which is
    * adversarial gold for the pair-based families but makes exact
    * substring-coverage accounting unreadable. */
  private def substringDocs(n: Int): DataFrame = {
    import spark.implicits._
    val boiler = (0 until 20).map(i => s"hdr$i")
    (0L until n.toLong).map { id =>
      val text =
        if (id % 100 == 99) null
        else if (id % 20 == 0)
          (boiler ++ (0 until 20).map(i => s"u${id}x$i")).mkString(" ")
        else (0 until 40).map(i => s"u${id}x$i").mkString(" ")
      (id, text)
    }.toDF("doc_id", "text")
  }

  test("d27 exact-substring at 10x: covered volume LINEAR in duplicated text, never pair-quadratic") {
    def stats(n: Int): (Long, Long, Long) = {
      val out = DedupOps.exactSubstringDedup(substringDocs(n))
      val r = out.agg(sum("n_covered"),
        sum(when(col("n_dup_spans") > 0, 1L).otherwise(0L)),
        max("n_dup_spans")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (c1, docs1, maxSpans1) = stats(N1)
    val (c2, docs2, maxSpans2) = stats(N2)
    // exact accounting: the header family is the only repeated ≥L
    // content, every 20th doc carries it once — covered ≡ 20·(n/20)
    // = n tokens, one span per member. THIS is the ExactSubstr scale
    // story: cover volume is linear in the duplicated text (the
    // L-gram cover-union never enumerates member PAIRS, whose count
    // is quadratic in family size — 100 vs 1000² at N2).
    assert(docs1 === (N1 / 20).toLong && docs2 === (N2 / 20).toLong,
      s"exactly the header family is covered: $docs1/$docs2")
    assert(c1 === N1.toLong && c2 === N2.toLong,
      s"covered tokens must equal header×family exactly: $c1/$c2")
    assert(maxSpans1 === 1L && maxSpans2 === 1L,
      "each member carries exactly one merged span")
    logScale("d27_covered_tokens", c1, c2)
    assert(expo(c1, c2) <= 1.01, "cover volume must be linear in dup text")
  }

  test("m13 CDC at 10x: chunk volume linear, bytes conserve, template family dedups") {
    def payloads(d: DataFrame): DataFrame = d
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val (d1, d2) = (stressDocs(N1), stressDocs(N2))
    def stats(d: DataFrame): (Long, Long, Long) = {
      val r = MultimodalOps.cdcChunkDedup(payloads(d))
        .agg(sum(col("n_chunks")), sum(col("n_bytes")), sum(col("dup_bytes")))
        .head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val ((ch1, by1, dup1), (ch2, by2, dup2)) = (stats(d1), stats(d2))
    // conservation: chunk bytes reassemble the corpus exactly
    def chars(d: DataFrame): Long = d.filter(col("text").isNotNull)
      .agg(sum(length(col("text")).cast("long"))).head.getLong(0)
    assert(by1 === chars(d1) && by2 === chars(d2), "chunk bytes must conserve")
    logScale("m13_chunks", ch1, ch2)
    assert(expo(ch1, ch2) <= 1.05,
      "content-defined boundaries fire at a fixed per-byte rate — chunk volume is linear")
    // the 5% template family (one token mutated per member) shares
    // most chunks across members: dup volume grows with the family,
    // never quadratically (chunks dedup by digest, not by pair).
    // Family-scoped on purpose: the w-hash filler corpus ALSO has
    // structural whole-doc clones (ids 1250 apart share the token
    // progression) whose population grows super-linearly between
    // these two sizes — true duplicated text, correctly billed, but
    // not the family claim under test
    assert(dup1 > 0L && dup2 > dup1, s"corpus must dedup: $dup1/$dup2")
    def famDup(d: DataFrame): Long =
      MultimodalOps.cdcChunkDedup(payloads(d))
        .filter(col("doc_id") % 20 === 0)
        .agg(coalesce(sum(col("dup_bytes")), lit(0L))).head.getLong(0)
    val (f1, f2) = (famDup(d1), famDup(d2))
    logScale("m13_family_dup_bytes", f1, f2)
    assert(expo(f1, f2) <= 1.05,
      "family dup volume is linear in family size — digest groups, not member pairs")
  }

  test("s27 BM25 at 10x: candidate volume IS query-term df mass; a df ceiling restores linearity") {
    val (d1, d2) = (stressDocs(N1).filter(col("text").isNotNull),
      stressDocs(N2).filter(col("text").isNotNull))
    def volumes(d: DataFrame): (Long, Long, Long, Long) = {
      val post = SimilarityOps.bm25Postings(d)
      val qt = d.filter(col("doc_id") % SimilarityOps.Bm25QueryMod === 0)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(slice(split(col("text"), " "), 1, 5))).as("term"))
      val dft = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = qt.join(post, "term").count()
      val dfMass = qt.join(dft, "term").agg(coalesce(sum(col("df")), lit(0L)))
        .head.getLong(0)
      // the production mitigation for corpus-wide common terms: an
      // ABSOLUTE posting ceiling per term at index time (the WAND /
      // stopword device — a posting-block budget, like MaxBandBucket,
      // never corpus-relative)
      val capped = qt.join(post, "term").join(dft, "term")
        .filter(col("df") <= DfCeiling).count()
      val nQueries = qt.select(col("query_id")).distinct().count()
      (scored, dfMass, capped, nQueries)
    }
    val ((s1, m1, c1, q1), (s2, m2, c2, q2)) = (volumes(d1), volumes(d2))
    // the model, exactly: scored rows == sum of df over query terms
    assert(s1 === m1 && s2 === m2,
      s"BM25 candidate volume must equal query-term df mass: $s1/$m1, $s2/$m2")
    // this adversarial corpus makes every query a template doc whose
    // terms hit the whole 5% family — the df-driven worst case; log
    // it rather than hide it (exponent ~2 between these sizes), and
    // prove the ceiling ENGAGES exactly when a term outgrows it
    // (d03's guard-engagement shape): under the cap at N1 (family
    // df 100 ≤ 256 — nothing dropped), over it at N2 (df 1000)
    logScale("s27_scored_raw", s1, s2)
    logScale("s27_scored_df_capped", c1, c2)
    assert(c1 === s1, "no term over the ceiling at N1 — cap must not engage")
    assert(c2 < s2, "family terms outgrow the ceiling at N2 — cap must engage")
    assert(c1 <= q1 * 5 * DfCeiling && c2 <= q2 * 5 * DfCeiling,
      "capped candidate volume is bounded by queries x terms x ceiling")
  }

  /** Absolute per-term posting ceiling for the s27 scale test — the
    * posting-block budget a WAND-style index enforces. */
  private val DfCeiling = 256L

  test("d31/d33 SemDeDup at 10x: in-cell pair volume is the designed n^1.5, codebook stays sqrt-bounded") {
    def volumes(d: DataFrame): (Long, Long, Long, Long) = {
      val v = DedupOps.semDedupEmbed(d)
      val cb = DedupOps.semDedupCodebook(v, v.count())
      val sizes = DedupOps.semDedupAssign(v, cb).groupBy(col("cell")).count()
      (sizes.agg(coalesce(sum(col("count") * col("count")), lit(0L))).head.getLong(0),
        sizes.agg(coalesce(max(col("count")), lit(0L))).head.getLong(0),
        cb.length.toLong, v.count())
    }
    val ((p1, m1, k1, n1), (p2, m2, k2, n2)) =
      (volumes(stressDocs(N1)), volumes(stressDocs(N2)))
    logScale("d31_cell_pair_volume", p1, p2)
    logScale("d31_max_cell", m1, m2)
    // the SemDeDup trade, stated: ceil(sqrt(n)) cells make the
    // in-cell pair pass Θ(n^1.5) on a near-uniform corpus (measured
    // 1.53 between these sizes — the 5% template family does NOT
    // collapse into one cell, max cell stays ~2% of the corpus).
    // 1.7 would mean a mega-cell forming (the d03 hot-bucket class);
    // production trades differently by passing a k-means codebook
    // sized for a TARGET cell size through the same semDedupAssign.
    assert(expo(p1, p2) <= 1.7,
      s"in-cell pair volume exponent ${expo(p1, p2)} suggests a mega-cell")
    // the identity the plan relies on: pair volume is exactly the sum
    // of squared cell sizes (no cross-cell pairs exist anywhere)
    assert(p1 >= n1 && p2 >= n2 && m1 * m1 <= p1 && m2 * m2 <= p2)
    // bounded driver state: the codebook never exceeds ceil(sqrt(n))
    assert(k1 <= math.ceil(math.sqrt(n1.toDouble)).toLong + 1 &&
      k2 <= math.ceil(math.sqrt(n2.toDouble)).toLong + 1,
      s"codebook must stay sqrt-bounded: $k1/$n1, $k2/$n2")
  }

  test("s30 capped serve at 10x: two-tier candidate mass tracks query count, not df mass") {
    val (d1, d2) = (stressDocs(N1).filter(col("text").isNotNull),
      stressDocs(N2).filter(col("text").isNotNull))
    // the s27 test above measures the UNCAPPED serve's exponent (~2 on
    // this adversarial corpus); this one runs the actual production
    // path (bm25ChampionTier + exact rescore) and pins that both of
    // its join volumes are budget-bounded per query — so total mass
    // grows with the query count (linear in n), independent of df
    def volumes(d: DataFrame): (Long, Long, Long, Long) = {
      val si = SimilarityOps.bm25Impacts(SimilarityOps.bm25Postings(d))
      val qt = SimilarityOps.bm25QueryTerms(d, SimilarityOps.Bm25QueryMod)
      val champ = SimilarityOps.bm25ChampionTier(si, DfCeiling)
      val candGen = qt.join(champ, "term")
      val cand = candGen.select(col("query_id"), col("doc_id")).distinct()
      val rescore = cand.join(qt, "query_id").join(si, Seq("term", "doc_id"))
      (candGen.count(), rescore.count(),
        qt.select(col("query_id")).distinct().count(),
        qt.join(si, "term").count()) // the uncapped serve's mass
    }
    val ((g1, r1, q1, u1), (g2, r2, q2, u2)) = (volumes(d1), volumes(d2))
    logScale("s30_champion_cand", g1, g2)
    logScale("s30_rescore_rows", r1, r2)
    logScale("s30_uncapped_mass", u1, u2)
    // N1 sits under the budget (family df 100), N2 over it (df 1000),
    // so an exponent between the two points mixes regimes — the pins
    // are the guard-engagement shape (d03's device) + absolute bounds:
    // untruncated below the budget, strictly cheaper above it, and
    // per-query cost bounded by budget x terms REGARDLESS of df
    assert(g1 === u1, "no term over the budget at N1 — champion tier must not truncate")
    assert(g2 < u2, s"family terms outgrow the budget at N2 — cap must engage ($g2 vs $u2)")
    assert(g1 <= q1 * 5 * DfCeiling && g2 <= q2 * 5 * DfCeiling,
      "candidate generation is bounded by queries x terms x budget")
    assert(r1 <= q1 * 25 * DfCeiling && r2 <= q2 * 25 * DfCeiling,
      "rescore volume is bounded by queries x terms^2 x budget")
  }

  test("tombstone mask at 10x: removed volume exact, the mask is a broadcast anti-join") {
    // the delete legs' scale claim (d34/st17 and every *_tomb serve):
    // between takedown and the maintenance window, the serve masks the
    // index with an anti-join whose BUILD side is the tombstone set —
    // KBs against a 100 TB index — so the index side never reshuffles
    // and the masked volume is EXACTLY built − deleted at any size
    val (d1, d2) = (stressDocs(N1).filter(col("text").isNotNull),
      stressDocs(N2).filter(col("text").isNotNull))
    def stats(d: DataFrame): (Long, Long, Long, String) = {
      val post = SimilarityOps.bm25Postings(d)
      val tomb = d.filter(col("doc_id") % DedupOps.TombMod === DedupOps.TombRem)
        .select("doc_id")
      val masked = graft.sources.SignatureLake.maskTombstones(post, tomb, "doc_id")
      val deletedRows = post
        .filter(col("doc_id") % DedupOps.TombMod === DedupOps.TombRem).count()
      masked.collect()
      (post.count(), masked.count(), deletedRows,
        masked.queryExecution.executedPlan.toString)
    }
    val ((b1, m1, x1, p1), (b2, m2, x2, p2)) = (stats(d1), stats(d2))
    assert(m1 === b1 - x1 && m2 === b2 - x2,
      s"masked volume must be exactly built − deleted: $m1/$b1-$x1, $m2/$b2-$x2")
    logScale("tomb_masked_rows", m1, m2)
    assert(expo(m1, m2) <= 1.05, "masked index volume stays linear")
    Seq(p1, p2).foreach { p =>
      assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
        s"the tombstone mask must broadcast the delete set:\n${p.take(1500)}")
    }
  }

  test("masked-tier serve at 10x: deleted rows exactly absent, candidate volume stays budget-linear") {
    // s34/st17's production shape under scale: the champion tier is
    // masked by an anti-join (rows removed EXACTLY the deleted docs'
    // tier rows) and candidate generation stays bounded by
    // queries × terms × budget — the mask must not change the serve's
    // complexity class, only subtract rows
    import DedupOps.{TombMod, TombRem}
    val (d1, d2) = (stressDocs(N1).filter(col("text").isNotNull),
      stressDocs(N2).filter(col("text").isNotNull))
    def stats(d: DataFrame): (Long, Long, Long, Long, Long) = {
      val si = SimilarityOps.bm25Impacts(SimilarityOps.bm25Postings(d))
      val tier = SimilarityOps.bm25ImpactRanked(si)
        .filter(col("pr") <= SimilarityOps.PostingBudget)
      val tomb = d.filter(col("doc_id") % TombMod === TombRem).select("doc_id")
      val maskedTier = graft.sources.SignatureLake.maskTombstones(tier, tomb, "doc_id")
      val qt = SimilarityOps.bm25QueryTerms(
        d.filter(col("doc_id") % TombMod =!= TombRem), SimilarityOps.Bm25QueryMod)
      val cand = qt.join(maskedTier, "term")
        .select(col("query_id"), col("doc_id")).distinct().count()
      val masked = SimilarityOps.bm25RankCappedFromTierMasked(qt, si,
        SimilarityOps.bm25ImpactRanked(si), tomb, SimilarityOps.Bm25TopK,
        excludeSelf = false, budget = SimilarityOps.PostingBudget,
        tierCeiling = Long.MaxValue)
      val leaked = masked.filter(col("doc_id") % TombMod === TombRem).count()
      val tierRemoved = tier.count() - maskedTier.count()
      val tierDeleted = tier.filter(col("doc_id") % TombMod === TombRem).count()
      assert(tierRemoved === tierDeleted,
        s"mask must remove exactly the deleted tier rows: $tierRemoved vs $tierDeleted")
      (cand, masked.count(), leaked, tierDeleted,
        qt.select(col("query_id")).distinct().count())
    }
    val ((c1, r1, l1, x1, q1), (c2, r2, l2, x2, q2)) = (stats(d1), stats(d2))
    assert(l1 === 0L && l2 === 0L, "a deleted doc leaked through the masked tier")
    assert(x1 > 0L && x2 > 0L, "fixture must tombstone retrievable tier rows (non-vacuous)")
    logScale("masked_tier_cand", c1, c2)
    logScale("masked_tier_results", r1, r2)
    // N1 sits under the budget and N2 over it (the s30 regime-mixing
    // caveat), so the exponent between the two points is not the pin;
    // the complexity-class claims are the ABSOLUTE bound (candidates
    // ≤ queries × 5 terms × budget at any df — the mask only
    // subtracts) and the linear result volume
    assert(c1 <= q1 * 5 * SimilarityOps.PostingBudget &&
      c2 <= q2 * 5 * SimilarityOps.PostingBudget,
      "masked-tier candidate volume must stay bounded by queries x terms x budget")
    assert(expo(r1, r2) <= 1.05,
      s"masked-tier result volume must stay linear, got ${expo(r1, r2)}")
  }

  test("pk06 concat-cut at 10x: output linear, token stream tiles exactly, crossings bounded") {
    val (d1, d2) = (stressDocs(N1), stressDocs(N2))
    def stats(d: DataFrame): (Long, Long, Long, Long) = {
      val out = CurationOps.concatCut(d)
      val agg = out.agg(count(lit(1)), sum(col("n_tokens")),
        max(col("tok_start") + col("n_tokens")),
        sum(when(col("crosses_cut"), 1L).otherwise(0L))).head
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    }
    val ((n1, t1, e1, c1), (n2, t2, e2, c2)) = (stats(d1), stats(d2))
    // the two-tier prefix sum must tile [0, total_tokens) exactly:
    // max(end) == sum(tokens) means no gap, overlap, or lost shard
    // offset at either size
    assert(e1 === t1 && e2 === t2, s"token stream must tile exactly: $e1/$t1, $e2/$t2")
    logScale("pk06_docs", n1, n2)
    assert(expo(n1, n2) <= 1.01, "per-doc output is linear")
    // a doc crosses at most once per CutLen tokens it spans; with mean
    // doc length ≪ CutLen the crossing count is bounded by the number
    // of cuts ⌈total/CutLen⌉ (each cut splits at most one doc)
    assert(c1 <= t1 / CurationOps.CutLen + 1 && c2 <= t2 / CurationOps.CutLen + 1,
      s"each cut splits at most one doc: $c1 vs ${t1 / CurationOps.CutLen}")
  }
}
