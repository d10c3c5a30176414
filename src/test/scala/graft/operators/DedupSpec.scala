package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  /** Fixture corpus with one planted exact-dup pair, one near-dup pair
    * (one token changed out of 40), and unrelated docs. */
  private def corpus: DataFrame = {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok${i % 13}w").mkString(" ")
    val near = base.split(" ").updated(5, "MUTATED").mkString(" ")
    val other = (1 to 40).map(i => s"zzz${i * 7 % 17}q").mkString(" ")
    Seq(
      (0L, base),
      (1L, base),          // exact dup of 0
      (2L, near),          // near dup of 0/1
      (3L, other),
      (4L, "tiny doc here plus four more words now")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val sig = corpus.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
    val groups = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(0L) === 2) // docs 0+1 collapse
    assert(groups(2L) === 1)
    assert(groups(3L) === 1)
  }

  test("minhash signatures identical for identical docs, near-equal for near-dups") {
    val sigs = DedupOps.minhashSignatures(corpus)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) === sigs(1L))
    val matching = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(matching >= DedupOps.NumHashes / 2,
      s"near-dup should share most minhashes, got $matching/${DedupOps.NumHashes}")
    val unrelated = sigs(0L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(unrelated <= DedupOps.NumHashes / 4,
      s"unrelated docs should share few minhashes, got $unrelated")
  }

  test("LSH candidate pairs surface the planted dups without a cross product") {
    val pairs = DedupOps.candidatePairs(corpus)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L },
      "unrelated doc must not be a candidate")
  }

  test("simhash: identical docs equal, near-dups within small hamming distance") {
    val sh = DedupOps.simhash(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) === sh(1L))
    val hamming = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(hamming <= 12, s"near-dup hamming was $hamming")
    val far = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(far > 12, s"unrelated hamming was $far")
  }

  test("simhash blocking finds pairs up to the advertised Hamming threshold") {
    import spark.implicits._
    // Plant a pair at Hamming 10 with differing bits spread across ALL
    // four 16-bit quarters (3+3+2+2) — the old 4-block scheme had no
    // clean block and could never surface it; the pigeonhole blocking
    // (maxHamming+1 = 13 blocks) guarantees a clean block exists.
    val base = 0x5A5A5A5A5A5A5A5AL
    val mask = (1L << 1) | (1L << 3) | (1L << 5) |   // quarter 0
      (1L << 17) | (1L << 19) | (1L << 21) |         // quarter 1
      (1L << 33) | (1L << 35) |                      // quarter 2
      (1L << 49) | (1L << 51)                        // quarter 3
    assert(java.lang.Long.bitCount(mask) === 10)
    val sh = Seq((0L, base), (1L, base ^ mask), (2L, ~base)).toDF("doc_id", "simhash")
    val pairs = DedupOps.simhashPairs(sh, DedupOps.SimhashMaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 10L)))
  }

  test("simhash maxHamming=0 is exact-duplicate mode (width-64 mask regression)") {
    import spark.implicits._
    // (1L << 64) wraps to 1 on the JVM; the unguarded mask zeroed every
    // band value and collapsed all docs into one bucket
    val sh = Seq((0L, 0x12345678L), (1L, 0x12345678L), (2L, 0x12345679L))
      .toDF("doc_id", "simhash")
    val pairs = DedupOps.simhashPairs(sh, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 0L)), "only the exact pair, via a real band key")
  }

  test("simhash end-to-end surfaces the planted text near-dup") {
    val pairs = DedupOps.simhashPairs(
      DedupOps.simhash(corpus), DedupOps.SimhashMaxHamming)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "identical pair must be found")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "near-dup pair must be found")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must not match")
  }

  test("d15 portable simhash surfaces the planted dups; pair set matches d04's family on the fixture") {
    def pairSet(fp: DataFrame) = DedupOps.simhashPairsMulti(
        fp, DedupOps.simhashLaneCols(DedupOps.SimhashLanes), DedupOps.SimhashMaxHamming)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val portable = pairSet(DedupOps.portableSimhashFingerprints(corpus))
    assert(portable.contains((0L, 1L)), "identical pair must be found")
    assert(portable.contains((0L, 2L)) && portable.contains((1L, 2L)),
      "near-dup pair must be found (0 and 1 share a fingerprint)")
    assert(!portable.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must not match")
    // clear-margin corpus: the two hash families must agree exactly
    // (borderline REAL corpora may disagree on Hamming-12/13 knife
    // edges — that is the family trade, not a defect)
    assert(portable === pairSet(DedupOps.simhashFingerprints(corpus)))
  }

  // every scale the driver's gate (sf0.01) or the builder's extra gate
  // (sf0.1) hash-compares d15 at needs the license asserted AT THAT
  // scale — bucket occupancy grows with the corpus
  for (sf <- Seq("sf0.001" -> "/root/testdata/sf0.001",
                 "sf0.01" -> "/root/testdata/sf0.01",
                 "sf0.1" -> "/root/testdata/sf0.1"))
  test(s"d15 blocking = all-pairs Hamming with cap headroom at ${sf._1} (oracle license)") {
    val fp = DedupOps.portableSimhashFingerprints(
      graft.Tables.documents(spark, sf._2))
    val blocked = DedupOps.simhashPairsMulti(
        fp, DedupOps.simhashLaneCols(DedupOps.SimhashLanes), DedupOps.SimhashMaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lanes = fp.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val brute = (for {
      i <- lanes.indices; j <- (i + 1) until lanes.length
      h = java.lang.Long.bitCount(lanes(i)._2 ^ lanes(j)._2) +
        java.lang.Long.bitCount(lanes(i)._3 ^ lanes(j)._3)
      if h <= DedupOps.SimhashMaxHamming
    } yield (lanes(i)._1, lanes(j)._1, h.toLong)).toSet
    assert(blocked === brute,
      "pigeonhole blocking must be recall-exact at the radius when no bucket caps")
    // no band bucket reaches the cap → the guard never drops at THIS
    // scale, so the all-pairs SQL oracle sees the same pairs. The
    // margin is cap/2, not cap: the corpus's template family puts
    // ~27% of sf0.1 docs on one block value (1363 of 5000), so the
    // license is genuinely per-scale — at sf1 that family would cap
    // and d15's oracle row would need the d04 no_oracle treatment.
    val maxBucket = fp
      .select(col("doc_id"), posexplode(array(DedupOps.pigeonholeBandVals(
        DedupOps.simhashLaneCols(DedupOps.SimhashLanes),
        DedupOps.SimhashMaxHamming): _*)).as(Seq("band", "band_val")))
      .groupBy("band", "band_val").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxBucket <= DedupOps.MaxSimhashBucket / 2,
      s"hot band bucket $maxBucket too close to cap ${DedupOps.MaxSimhashBucket}")
  }

  test("d04 band keys are >= 9 bits wide at the radius-12 contract") {
    val widths = DedupOps.pigeonholeWidths(
      64 * DedupOps.SimhashLanes, DedupOps.SimhashMaxHamming + 1)
    assert(widths.sum === 128, "blocks must cover the fingerprint exactly")
    assert(widths.size === 13)
    assert(widths.min >= 9,
      s"band-key width must scale (got ${widths.min}); expected occupancy n/2^9+")
  }

  test("2-lane fingerprints: identical docs equal in both lanes, lanes independent") {
    val fp = DedupOps.simhashFingerprints(corpus)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(0L) === fp(1L))
    assert(fp(0L)._1 !== fp(0L)._2, "seeded lanes must differ")
    // lane 0 of the 2-lane fingerprint is the single-lane simhash
    val single = DedupOps.simhash(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L)._1 === single(0L))
  }

  test("128-bit blocking finds planted pairs up to Hamming 12, rejects 13") {
    import spark.implicits._
    // 12 differing bits spread across both lanes and 12 distinct blocks
    val baseLo = 0x5A5A5A5A5A5A5A5AL
    val baseHi = 0xA5A5A5A5A5A5A5A5L
    val maskLo = (1L << 1) | (1L << 13) | (1L << 25) | (1L << 37) |
      (1L << 49) | (1L << 58) // blocks [0,10),[10,20),[20,30),[30,40),[40,50),[50,60)
    val maskHi = (1L << 8) | (1L << 18) | (1L << 28) | (1L << 38) |
      (1L << 48) | (1L << 58) // bits 72,82,92,102,112,122 of the fingerprint
    assert(java.lang.Long.bitCount(maskLo) + java.lang.Long.bitCount(maskHi) === 12)
    val sh = Seq(
      (0L, baseLo, baseHi),
      (1L, baseLo ^ maskLo, baseHi ^ maskHi),     // hamming 12
      (2L, baseLo ^ maskLo ^ (1L << 62), baseHi ^ maskHi), // hamming 13 vs doc 0
      (3L, ~baseLo, ~baseHi)
    ).toDF("doc_id", "sh0", "sh1")
    val pairs = DedupOps.simhashPairsMulti(sh, Seq("sh0", "sh1"), 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((0L, 1L, 12L)), "Hamming-12 pair must be found")
    assert(!pairs.exists { case (a, b, _) => (a, b) == ((0L, 2L)) },
      "Hamming-13 pair must be rejected")
  }

  test("lane-straddling block [60,70) is extracted correctly") {
    import spark.implicits._
    // 12 differing bits, one per block EXCEPT the straddler [60,70):
    // the straddle block is the ONLY guaranteed clean block, so the
    // pair is surfaced iff the cross-lane stitch produces equal keys.
    val bitsUsed = Seq(5, 15, 25, 35, 45, 55, // blocks 0-5 (widths 10)
      75, 85, 95, 105, // blocks 7-10
      112 + 3, 121 + 3) // the two 9-bit blocks [110,119),[119,128)
    val maskLo = bitsUsed.filter(_ < 64).map(1L << _).reduce(_ | _)
    val maskHi = bitsUsed.filter(_ >= 64).map(b => 1L << (b - 64)).reduce(_ | _)
    assert(java.lang.Long.bitCount(maskLo) + java.lang.Long.bitCount(maskHi) === 12)
    val baseLo = 0x123456789ABCDEF0L
    val baseHi = 0x0FEDCBA987654321L
    val sh = Seq((0L, baseLo, baseHi), (1L, baseLo ^ maskLo, baseHi ^ maskHi))
      .toDF("doc_id", "sh0", "sh1")
    val pairs = DedupOps.simhashPairsMulti(sh, Seq("sh0", "sh1"), 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 12L)))
  }

  test("d04 end-to-end: exact pair found at radius 12; near-dup at its true radius") {
    val fp = DedupOps.simhashFingerprints(corpus)
    val rows = fp.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val trueHamming = java.lang.Long.bitCount(rows(0L)._1 ^ rows(2L)._1) +
      java.lang.Long.bitCount(rows(0L)._2 ^ rows(2L)._2)
    val lanes = DedupOps.simhashLaneCols(DedupOps.SimhashLanes)
    val at12 = DedupOps.simhashPairsMulti(fp, lanes, DedupOps.SimhashMaxHamming)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at12.contains((0L, 1L)), "identical pair must be found at radius 12")
    assert(!at12.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must not match")
    // recall guarantee holds at whatever radius the text pair truly sits
    val atTrue = DedupOps.simhashPairsMulti(fp, lanes, trueHamming)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atTrue.contains((0L, 2L)),
      s"near-dup (128-bit hamming $trueHamming) must be found at its radius")
  }

  test("hot-band guard keeps a boilerplate corpus from going quadratic") {
    import spark.implicits._
    // 500 distinct near-identical docs: every band untouched by the
    // per-doc mutation is shared by all 500 -> bucket_n = 500 > cap.
    val base = (1 to 40).map(i => s"tok${i % 13}w").mkString(" ").split(" ")
    val boiler = (0 until 500)
      .map(i => (i.toLong, base.updated(i % 40, s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dropped = DedupOps.hotBandReport(boiler)
    assert(dropped.count() > 0, "boilerplate bands must be reported as hot")
    val nPairs = DedupOps.rawCandidatePairs(boiler).count()
    // uncapped, the shared bands alone would emit ~16 x 500^2/2 rows
    assert(nPairs < 50000, s"hot buckets must be excluded, got $nPairs pairs")
  }

  test("exact n-gram jaccard on candidates matches direct set math") {
    val sets = DedupOps.shingles(corpus)
      .groupBy("doc_id").agg(collect_set("shingle").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expected = sets(0L).intersect(sets(2L)).size.toDouble /
      sets(0L).union(sets(2L)).size
    val got = DedupOps.ngramJaccardPairs(corpus, 0.0)
      .filter(col("doc_a") === 0L && col("doc_b") === 2L)
      .select("jaccard").collect()
    assert(got.nonEmpty, "pair (0,2) must be an LSH candidate")
    // raw quotient since r7 — bit-equal to the direct set math
    assert(got.head.getDouble(0) === expected)
  }

  test("d22 containment: a planted excerpt is found and labeled, unrelated docs are not") {
    import spark.implicits._
    // article = 60 distinct-ish tokens; excerpt = a contiguous 15-token
    // slice → containment 1.0 but Jaccard ≈ 13/58 << 0.6 ('excerpt');
    // a near-dup of the article (1 token changed) must label 'near_dup'
    val articleToks = (1 to 60).map(i => s"w${i}x")
    val article = articleToks.mkString(" ")
    val excerpt = articleToks.slice(20, 35).mkString(" ")
    val nearDup = articleToks.updated(7, "CHANGED").mkString(" ")
    val other = (1 to 60).map(i => s"q${i * 3}z").mkString(" ")
    val docs = Seq(
      (10L, article), (11L, excerpt), (12L, nearDup), (13L, other)
    ).toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(3))).toMap
    assert(got.get((10L, 11L)).contains("excerpt"),
      s"excerpt pair must surface as 'excerpt': $got")
    assert(got.get((10L, 12L)).contains("near_dup"),
      s"near-dup pair must surface as 'near_dup': $got")
    assert(!got.keySet.exists { case (a, b) => a == 13L || b == 13L },
      s"unrelated doc must not pair: $got")
    // the excerpt's containment is exactly 1.0 (every shingle shared)
    val cont = DedupOps.containmentPairs(docs)
      .filter(col("doc_a") === 10L && col("doc_b") === 11L)
      .select("containment").collect().head.getDouble(0)
    assert(cont === 1.0)
  }

  test("v12 binary recall: sign-identical vectors rank first; hits bounded by k") {
    import spark.implicits._
    // query 0 and vector 9 share the exact sign pattern (scaled copy)
    // → Hamming 0 → rank_bin 1; full-precision also ranks 9 first
    // (cosine 1.0) → a guaranteed hit at any k
    val dim = graft.functions.VectorFunctions.Dim
    val v0 = Array.tabulate(dim)(i => if (i % 3 == 0) 1.0 else -0.5)
    val v9 = v0.map(_ * 2.0)
    val noise = (1L to 8L).map(id =>
      (id, Array.tabulate(dim)(i => math.sin(id * 31.0 + i * 7.0))))
    val emb = ((0L, v0) +: noise :+ (9L, v9)).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val r = VectorOps.binaryRecall(emb, k = 3)
      .filter(col("query_id") === 0L).collect().head
    assert(r.getAs[Long]("hits") >= 1L && r.getAs[Long]("hits") <= 3L)
    assert(r.getAs[Double]("recall") === r.getAs[Long]("hits").toDouble / 3)
  }

  test("planted near-dups in the harness corpus are found end-to-end") {
    val found = DedupOps.minhashDupPairs(graft.Tables.documents(spark, sf001))
    assert(found.count() > 0, "sf0.001 documents contain planted near-dups")
    // every reported pair estimates high jaccard
    assert(found.filter(col("est_jaccard") < 0.5).count() === 0)
  }

  test("connected components: transitivity over a path graph + singleton") {
    import spark.implicits._
    // path 1-2-3-4-5 (diameter 4 forces several propagation rounds)
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L), s"chain must collapse to min label, got $cc")
    assert(cc(6L) === 6L, "singleton keeps its own label")
  }

  test("connected components: no persisted blocks survive the call (r17 lifecycle)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(nodes, pairs)
    assert(cc.count() === 6L) // consume the read-back
    // the probe's persisted rounds AND the result's materialization
    // must both be released when the call returns: the r16 shape
    // (eager localCheckpoint) left blocks in the block manager until
    // the returned Dataset was GC'd, which accumulated across dozens
    // of CC calls in one long-lived JVM (the driver's r16 test run
    // died mid-suite). The parquet-artifact shape holds ZERO blocks.
    // Attribute leaks by creation site: sbt runs suites CONCURRENTLY
    // in this JVM, and another suite's legitimate persist landing
    // between the two snapshots must not flake this test.
    // RDD.toString embeds the creation site ("... at count at
    // DedupOps.scala:NNN"), which is the public way to attribute it.
    // Dataset.unpersist is non-blocking, so poll briefly — a REAL
    // GC-lifetime leak (the r16 localCheckpoint shape) cannot clear
    // while `cc` holds a strong reference, so the retry keeps the
    // test deterministic without weakening what it guards.
    def leakedNow() = (spark.sparkContext.getPersistentRDDs -- before)
      .values.map(_.toString).filter(_.contains("DedupOps"))
    var leaked = leakedNow()
    var tries = 0
    while (leaked.nonEmpty && tries < 20) {
      Thread.sleep(250); leaked = leakedNow(); tries += 1
    }
    assert(leaked.isEmpty,
      s"connectedComponents leaked persisted RDDs: ${leaked.mkString(", ")}")
  }

  test("d07 clusters: planted A~B~C collapse transitively on the fixture corpus") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok${i % 13}w").mkString(" ")
    val mid = base.split(" ").updated(5, "MUT1").mkString(" ")
    // far: two mutations — similar to mid (1 token apart) but the
    // extra distance from base keeps the chain honest via transitivity
    val far = mid.split(" ").updated(20, "MUT2").mkString(" ")
    val other = (1 to 40).map(i => s"zzz${i * 7 % 17}q").mkString(" ")
    val docs = Seq((0L, base), (1L, mid), (2L, far), (3L, other))
      .toDF("doc_id", "text")
    val pairs = DedupOps.ngramJaccardPairs(docs, 0.6).select(col("doc_a"), col("doc_b"))
    val cc = DedupOps.connectedComponents(docs.select(col("doc_id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(0L) === 0L && cc(1L) === 0L && cc(2L) === 0L,
      s"near-dup chain must share one cluster, got $cc")
    assert(cc(3L) === 3L)
  }

  test("d10 representatives: highest quality wins, ties to min doc_id, singleton keeps itself") {
    import spark.implicits._
    // full-quality text: 11 tokens, avg len in [3,10], 3/11 stopwords
    val rich = "the market and council of state report covers policy outcome today"
    val docs = Seq(
      (1L, rich),                 // quality 1.0
      (2L, "tiny doc"),           // < 10 tokens, no stopwords -> 0.3
      (3L, rich + " extra"),      // also 1.0 -> ties with doc 1, larger id
      (4L, "solo")).toDF("doc_id", "text")
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 40L))
      .toDF("doc_id", "cluster_id")
    val out = DedupOps.clusterRepresentatives(docs, clusters)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)))
    assert(out(3L) == ((1L, false))) // quality tie broken toward doc 1
    assert(out(4L) == ((4L, true)))
  }

  test("decontamination flags benchmark n-gram overlap, keeps clean docs") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "padding words then the quick brown fox jumps in too"), // shares a 5-gram
      (2L, "totally unrelated training text with enough tokens here"),
      (3L, "short doc") // under the gram size -> 0 grams, kept as clean
    ).toDF("doc_id", "text")
    val out = DedupOps.decontaminate(train, bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L)._2 && out(1L)._1 >= 1, "overlapping doc must be flagged")
    assert(out(2L) === ((0L, false)))
    assert(out(3L) === ((0L, false)), "sub-gram-size docs are clean, not dropped")
    assert(out.size === 3, "every training doc appears in the report")
  }

  test("dedup is idempotent: re-deduping keeps row count") {
    val once = DedupOps.exactQ.run(spark, sf001)
    assert(once.count() === once.dropDuplicates("doc_id").count())
  }

  test("d12 incremental dedup: verdict precedence on planted fixtures") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok${i % 13}w").mkString(" ")
    val near = base.split(" ").updated(5, "MUTATED").mkString(" ")
    val fresh = (1 to 40).map(i => s"new${i * 3 % 11}x").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, "completely unrelated corpus text body here okay")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (10L, base),   // exact copy of corpus doc 1      -> exact_corpus
      (11L, near),   // 1-token edit of corpus doc 1    -> near_corpus
      (12L, fresh),  // first occurrence in batch        -> new
      (13L, fresh),  // exact copy of delta doc 12       -> exact_batch
      (14L, fresh.split(" ").updated(7, "EDIT").mkString(" ")), // near 12 -> near_batch
      (15L, "nothing like anything else at all truly")  // -> new
    ).toDF("doc_id", "text")
    val out = DedupOps.incrementalDedup(delta, corpus)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      10L -> "exact_corpus", 11L -> "near_corpus", 12L -> "new",
      13L -> "exact_batch", 14L -> "near_batch", 15L -> "new"))
  }

  test("d12 precedence: an exact corpus copy outranks its batch near-dups") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"pqr${i % 17}z").mkString(" ")
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    // 20 is an exact corpus copy AND near-dups 21; 21 is near both —
    // corpus tier must win for both (exact for 20, near_corpus for 21,
    // never near_batch)
    val delta = Seq(
      (20L, base),
      (21L, base.split(" ").updated(3, "X").mkString(" "))
    ).toDF("doc_id", "text")
    val out = DedupOps.incrementalDedup(delta, corpus)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(20L -> "exact_corpus", 21L -> "near_corpus"))
  }

  private def embFixture(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 31 + j) + 0.01))
    }.toDF("vec_id", "v")
  }

  private def report(docs: DataFrame, emb: DataFrame): Map[String, Long] =
    DedupOps.coverageReport(docs, emb)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("d11 coverage: conservation, monotonic funnel, exact pair accounting") {
    val rep = report(corpus, embFixture(10))
    // conservation: every banded row is either kept or dropped
    assert(rep("minhash_rows_kept") + rep("minhash_rows_dropped")
      === 5L * DedupOps.Bands)
    assert(rep("minhash_rows_dropped") === 0L)
    assert(rep("simhash_rows_kept") + rep("simhash_rows_dropped")
      === 5L * (DedupOps.SimhashMaxHamming + 1))
    assert(rep("ann_rows_kept") + rep("ann_rows_dropped")
      === 10L * SimilarityOps.LshTables)
    // funnel is monotone and the histogram-derived pair volume equals
    // the materialized candidate count
    assert(rep("minhash_pairs_proposed") >= rep("minhash_pairs_distinct"))
    assert(rep("minhash_pairs_distinct") >= rep("minhash_pairs_verified"))
    assert(rep("minhash_pairs_proposed")
      === DedupOps.rawCandidatePairs(corpus).count())
    assert(rep("minhash_pairs_distinct")
      === DedupOps.candidatePairs(corpus).count())
    assert(rep("minhash_pairs_verified")
      === DedupOps.ngramJaccardPairs(corpus, 0.6).count())
  }

  test("d11 coverage: degenerate corpus (no banded rows) reports exact zeros, not nulls") {
    import spark.implicits._
    val shorties = Seq((1L, "too short"), (2L, (null: String)))
      .toDF("doc_id", "text") // no 3-shingles anywhere
    val rep = DedupOps.coverageReport(shorties, embFixture(0))
      .collect().map(r => (r.getString(0), r.isNullAt(1), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rep.forall(!_._2), s"null counter in $rep")
    assert(rep.collect { case (s, _, n) if s.startsWith("minhash") => n }.forall(_ == 0L))
  }

  test("d11 coverage: a boilerplate family's dropped volume is accounted exactly") {
    import spark.implicits._
    val boiler = (100L until 400L).map(i =>
      (i, "the same boilerplate sentence repeated verbatim in every copy"))
      .toDF("doc_id", "text")
    val docs = corpus.unionByName(boiler)
    val rep = report(docs, embFixture(5))
    // 300 identical docs share every band key: all 8 family buckets are
    // over the 256 cap, and their full row volume shows up as dropped
    assert(rep("minhash_hot_buckets") === DedupOps.Bands.toLong)
    assert(rep("minhash_rows_dropped") === 300L * DedupOps.Bands)
    assert(rep("minhash_rows_kept") + rep("minhash_rows_dropped")
      === 305L * DedupOps.Bands)
    // the dropped family never reaches the pair stages
    assert(rep("minhash_pairs_proposed")
      === DedupOps.rawCandidatePairs(docs).count())
  }

  test("d13 segment dedup: cross-doc and intra-doc repeats drop, first occurrence wins") {
    import spark.implicits._
    val w = DedupOps.SegmentTokens
    val chunkA = (1 to w).map(i => s"a$i").mkString(" ")
    val chunkB = (1 to w).map(i => s"b$i").mkString(" ")
    val chunkC = (1 to w).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (0L, s"$chunkA $chunkB"),   // both chunks novel → all kept
      (1L, s"$chunkA $chunkC"),   // first chunk seen in doc 0 → drops
      (2L, s"$chunkC $chunkC"),   // intra-doc repeat → second drops;
                                  // first already owned by doc 1
      (3L, null.asInstanceOf[String]),
      (4L, s"$chunkA $chunkB")    // exact copy of doc 0 → nothing left
    ).toDF("doc_id", "text")
    val out = DedupOps.segmentDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(out(0L) === ((2L, 2L, s"$chunkA $chunkB")))
    assert(out(1L) === ((2L, 1L, chunkC)))
    assert(out(2L) === ((2L, 0L, "")))
    assert(out(3L) === ((0L, 0L, null)))
    assert(out(4L) === ((2L, 0L, "")))
  }

  test("d13 segment dedup: a partial tail chunk is its own unit, not merged") {
    import spark.implicits._
    val w = DedupOps.SegmentTokens
    val chunk = (1 to w).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (0L, s"$chunk tail words"),  // 1 full chunk + 2-token tail
      (1L, "tail words")           // equals doc 0's TAIL chunk → drops
    ).toDF("doc_id", "text")
    val out = DedupOps.segmentDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) === ((2L, 2L, s"$chunk tail words")))
    assert(out(1L) === ((1L, 0L, "")))
  }

  test("d14 portable minhash: identical sigs for identical docs, fixed-width hex") {
    val sigs = DedupOps.portableSignatures(corpus)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs.values.flatten.forall(h => h.length == 8 && h.matches("[0-9a-f]+")),
      "portable minima must be fixed-width lowercase hex lanes (lexicographic = numeric order)")
    val matching = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(matching >= DedupOps.NumHashes / 2,
      s"near-dup should share most portable minhashes, got $matching")
  }

  test("r17 kernels: native portable minhash/simhash == relational md5 formulation (sf0.001)") {
    // the r17 native kernels (PortableMinHashSig / PortableSimhashFp)
    // replaced the explode + md5-expression + aggregate formulation;
    // this pins BIT-equality against that reference on the real
    // corpus, row for row (the d14/d15 oracle rows gate the same
    // thing end-to-end at the driver)
    val docs = graft.Tables.documents(spark, sf001)
    // reference: the pre-r17 relational signature derivation
    val nDigests = DedupOps.NumHashes / DedupOps.PortableLanes
    val withH = DedupOps.tokenShingles(docs, 3).select(
      col("doc_id") +: (0 until nDigests).map(i =>
        org.apache.spark.sql.functions.md5(
          concat_ws(":", lit(i), col("shingle"))).as(s"h$i")): _*)
    val refSigs = withH.groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.array((0 until DedupOps.NumHashes).map { p =>
        org.apache.spark.sql.functions.min(substring(col(s"h${p / DedupOps.PortableLanes}"),
          (p % DedupOps.PortableLanes) * 8 + 1, 8))
      }: _*).as("sig"))
    val sigDiff = DedupOps.portableSignatures(docs).exceptAll(refSigs).count() +
      refSigs.exceptAll(DedupOps.portableSignatures(docs)).count()
    assert(sigDiff === 0L, s"native minhash kernel drifted from the md5 reference")
    // reference: the pre-r17 relational fingerprint derivation
    val hx = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"),
        org.apache.spark.sql.functions.md5(col("token")).as("h"))
    val nib = hx.select(col("doc_id") +: col("cnt") +: (1 to 32).map(j =>
      conv(substring(col("h"), j, 1), 16, 10).cast("int").as(s"n$j")): _*)
    val bitSums = for { l <- 0 until DedupOps.SimhashLanes; w <- 0 until 64 } yield {
      val j = l * 16 + w / 4 + 1
      val b = w % 4
      sum(when(shiftright(col(s"n$j"), b).bitwiseAND(lit(1)) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"s${l}_$w")
    }
    val laneVals = (0 until DedupOps.SimhashLanes).map { l =>
      (0 until 64).map(w =>
        when(col(s"s${l}_$w") > 0, shiftleft(lit(1L), w)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as(s"sh$l")
    }
    val refFp = nib.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id") +: laneVals: _*)
    val got = DedupOps.portableSimhashFingerprints(docs)
    val fpDiff = got.exceptAll(refFp).count() + refFp.exceptAll(got).count()
    assert(fpDiff === 0L, s"native simhash kernel drifted from the md5 reference")
  }

  test("t17 leakage-safe split: constant within every cluster, covers every doc") {
    val out = DedupOps.leakageSafeSplitQ.run(spark, sf001)
    out.persist()
    try {
      val mixed = out.groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("k"))
        .filter(col("k") > 1).count()
      assert(mixed === 0L, "a near-dup cluster must never straddle a split boundary")
      assert(out.count() === graft.Tables.documents(spark, sf001).count(),
        "every document gets a split")
      val splits = out.select(col("split")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(splits.subsetOf(Set("train", "val", "test")))
      // the planted near-dup clusters exist (cluster with >1 member),
      // so the invariant is exercised, not vacuous
      assert(out.groupBy(col("cluster_id")).count().filter(col("count") > 1).count() > 0,
        "fixture corpus must contain multi-member clusters")
    } finally out.unpersist()
  }

  test("d14 end-to-end: planted pairs found; agrees with d05 on the harness corpus") {
    val planted = DedupOps.portableMinhashQ.run(spark, sf001) // signature check only
    assert(planted.columns.toSeq === Seq("doc_a", "doc_b", "jaccard"))
    val fixture = DedupOps.jaccardVerify(corpus,
      DedupOps.portableCandidatePairs(corpus), 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixture.contains((0L, 1L)), "exact pair must survive the 0.6 gate")
    // On the harness corpus every qualifying pair has J ≥ 0.9, where
    // both hash families' banding recall is ≥ 0.9998 — the portable
    // pipeline and d03+d05 must surface the SAME verified pair set.
    val d14 = planted.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val d05 = DedupOps.ngramJaccardPairs(
      graft.Tables.documents(spark, sf001), 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(d14 === d05, s"portable and xxhash64 pipelines diverged: ${d14.diff(d05)} / ${d05.diff(d14)}")
  }

  test("d17 calibration: exact dup scores 32/32 with zero error; err column is consistent") {
    val out = DedupOps.minhashCalibration(corpus).collect()
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val dup = byPair((0L, 1L))
    assert(dup.getLong(2) == 32L, "identical docs agree on every lane")
    assert(dup.getDouble(6) == 1.0 && dup.getDouble(7) == 0.0)
    // the planted near pair reaches the candidate stage (banding
    // recall at J≈0.92 over 8 bands is effectively 1)
    assert(byPair.contains((0L, 2L)) && byPair.contains((1L, 2L)))
    val near = byPair((0L, 2L))
    assert(near.getDouble(6) < 1.0 && near.getDouble(6) > 0.6)
    out.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 32)
      assert(r.getDouble(5) == r.getLong(2).toDouble / 32)
      assert(r.getDouble(6) == r.getLong(3).toDouble / r.getLong(4))
      assert(r.getDouble(7) == math.abs(r.getDouble(5) - r.getDouble(6)))
    }
  }

  // d05 (and d18, which aggregates d05's pair set) carry all-pairs
  // DuckDB oracles while the engine proposes banded candidates — the
  // same engine-narrower-than-oracle shape as d15, so it gets the same
  // per-scale license. The binding fact is DETERMINISTIC pair-set
  // equality (the hash family is fixed, so for a fixed corpus
  // candidacy is not probabilistic), asserted against an independent
  // all-pairs truth at the scales where all-pairs is affordable in a
  // test; the supporting margins (no capped buckets; how close the
  // corpus comes to the J≈0.6 region where 8×4 banding legitimately
  // under-proposes) are asserted at every scale. Measured floors:
  // J=0.889 (sf0.001), 0.900 (sf0.01), 0.800 (sf0.1) — at 0.8 the
  // per-pair band-collision odds are ~0.985, and the sf0.1 gate's
  // hash match certifies the actual outcome there.
  for (sf <- Seq("sf0.001" -> "/root/testdata/sf0.001",
                 "sf0.01" -> "/root/testdata/sf0.01"))
  test(s"d05/d18 banding = all-pairs verified set at ${sf._1} (oracle license)") {
    val docs = graft.Tables.documents(spark, sf._2)
    val engine = DedupOps.ngramJaccardPairs(docs, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = DedupOps.shingles(docs).groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("s"))
    val truthRows = sets.select(col("doc_id").as("da"), col("s").as("sa"))
      .crossJoin(sets.select(col("doc_id").as("db"), col("s").as("sb")))
      .filter(col("da") < col("db"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("j") >= 0.6)
      .select("da", "db", "j").collect()
    assert(engine === truthRows.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "banded+verified pairs must equal the all-pairs truth at gate scales")
    val minJ = truthRows.map(_.getDouble(2)).min
    info(f"all-pairs qualifying-J floor at ${sf._1}: $minJ%.3f")
    assert(minJ >= 0.75,
      f"qualifying pair at J=$minJ%.3f approaches the 0.6 boundary where " +
        "banding under-proposes — d05/d18 oracles would need the d04 " +
        "no_oracle treatment")
    assert(DedupOps.hotBandReport(docs).isEmpty,
      "a capped band bucket would drop candidates the oracle keeps")
  }

  test("d05/d18 license margins hold at sf0.1: J floor and cap headroom") {
    // all-pairs truth (12.5M set intersects) is beyond a unit test at
    // this scale; equality is certified by the sf0.1 gate hash match,
    // and this pins the supporting margins so corpus drift is flagged
    val docs = graft.Tables.documents(spark, sf1)
    val engineMinJ = DedupOps.ngramJaccardPairs(docs, 0.6)
      .agg(min(col("jaccard"))).collect().head.getDouble(0)
    info(f"engine-verified J floor at sf0.1: $engineMinJ%.3f")
    assert(engineMinJ >= 0.75,
      f"verified pair at J=$engineMinJ%.3f approaches the under-proposal region")
    assert(DedupOps.hotBandReport(docs).isEmpty)
  }

  test("d18 source overlap: pairs land in unordered source cells") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok${i % 13}w").mkString(" ")
    val near = base.split(" ").updated(5, "MUTATED").mkString(" ")
    val other = (1 to 40).map(i => s"zzz${i * 7 % 17}q").mkString(" ")
    val d = Seq(
      (0L, base, "s1"), (1L, base, "s2"), // exact pair across sources
      (2L, near, "s1"),                   // near dup of both, same source as 0
      (3L, other, "s3"))                  // unrelated
      .toDF("doc_id", "text", "source")
    val out = DedupOps.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: (0,1) s1-s2, (0,2) s1-s1, (1,2) s1-s2
    assert(out == Map(("s1", "s1") -> 1L, ("s1", "s2") -> 2L))
  }

  test("d06p: planted duplicate found; pairs are a subset of brute-force truth") {
    import spark.implicits._
    import graft.functions.VectorFunctions.{dot, norm, toDouble}
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // plant an exact copy of vec 0: same direction -> same bucket in
    // EVERY table -> must surface as a candidate and verify at cos 1
    val v0 = emb.filter(col("vec_id") === 0L).select(col("v"))
      .collect().head.getSeq[Double](0)
    val planted = emb.unionByName(
      Seq((999999L, v0)).toDF("vec_id", "v"))
    val pairs = DedupOps.portableEmbeddingPairs(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val dup = pairs.find(p => p._1 == 0L && p._2 == 999999L)
    assert(dup.isDefined, "planted exact duplicate must surface")
    assert(dup.get._4, "exact duplicate must carry is_dup")
    assert(math.abs(dup.get._3 - 1.0) < 1e-12)
    // verdict consistency + subset-of-truth: banding may MISS pairs,
    // never invent them
    pairs.foreach { case (a, b, cos, isDup) =>
      assert(cos >= DedupOps.PortableEmbAuditFloor - 1e-12)
      assert(isDup === (cos >= 0.95))
    }
    val byId = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    pairs.foreach { case (a, b, cos, _) =>
      val (va, vb) = (byId(a), byId(b))
      val d = va.zip(vb).map { case (x, y) => x * y }.sum
      val truth = d / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(truth - cos) < 1e-9, s"pair ($a,$b) cosine disagrees with truth")
    }
  }

  test("d19 threshold curve matches a driver-side all-pairs reference on the fixture") {
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val ref = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = sh(texts(a)); sb = sh(texts(b))
      j = (sa & sb).size.toDouble / (sa | sb).size
    } yield (a, b, j)).toSeq
    val out = DedupOps.thresholdCurve(corpus).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == DedupOps.ThresholdCurve.toSet)
    DedupOps.ThresholdCurve.foreach { t =>
      val expect = ref.filter(_._3 >= t)
      assert(out(t)._1 == expect.size.toLong,
        s"threshold $t: pairs ${out(t)._1} vs reference ${expect.size}")
      assert(out(t)._2 ==
        expect.flatMap(p => Seq(p._1, p._2)).toSet.size.toLong,
        s"threshold $t: affected docs disagree")
    }
    // the curve is monotone non-increasing by construction
    val curve = DedupOps.ThresholdCurve.map(out(_)._1)
    assert(curve.zip(curve.tail).forall { case (a, b) => a >= b })
  }

  test("d20: same-direction lake match -> dup; sign-flipped delta with no lake partner -> new") {
    import spark.implicits._
    val a = Seq.tabulate(64)(i => math.sin(i + 1.0))
    // delta slice = vec_id % 10 == 0: ids 0, 10, 20; lake: id 1 (= a)
    val fixture = Seq(
      (0L, a.map(_ * 0.5)), // dup of lake 1 (cos exactly 1)
      (20L, a),             // dup of lake 1 too
      (10L, a.map(-_)),     // sign flip: its buckets hold no lake vector
      (1L, a))
      .toDF("vec_id", "v")
    val out = DedupOps.incrementalEmbedding(fixture).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getString(3))))
      .toMap
    assert(out.keySet === Set(0L, 10L, 20L), "one verdict per delta vec, lake never emits")
    assert(out(0L) === ((Some(1L), "dup")))
    assert(out(20L) === ((Some(1L), "dup")))
    assert(out(10L) === ((None, "new")))
  }

  test("d21: every verified lexical pair is scored once; verdict matches the cosine bar") {
    val pairs = DedupOps.portableMinhashQ.run(spark, sf001).count()
    val out = DedupOps.textEmbeddingConsistencyQ.run(spark, sf001).persist()
    try {
      assert(out.count() === pairs, "one consistency row per verified near-dup pair")
      assert(out.filter(col("jaccard") < 0.6).count() === 0,
        "only verified pairs enter the audit")
      assert(out.filter(col("cos_sim") > 1.0 + 1e-9
        || col("cos_sim") < -1.0 - 1e-9).count() === 0)
      assert(out.filter(col("embedding_agrees") =!=
        (col("cos_sim") >= DedupOps.EmbAgreeTau)).count() === 0,
        "the verdict is exactly the cosine bar")
    } finally out.unpersist()
  }

  test("d20 on the harness corpus: one row per delta vec, verdict tiers consistent") {
    val out = DedupOps.incrementalEmbeddingQ.run(spark, sf001).persist()
    try {
      val nDelta = graft.Tables.embeddings(spark, sf001)
        .filter(col("vec_id") % DedupOps.IncEmbMod === 0).count()
      assert(out.count() === nDelta, "exactly one verdict per delta vector")
      assert(out.filter(col("verdict") === "dup"
        && col("cos_sim") < DedupOps.EmbDupTau).count() === 0)
      assert(out.filter(col("verdict") === "new"
        && col("best_match").isNotNull).count() === 0)
      assert(out.filter(col("verdict") === "candidate"
        && (col("cos_sim").isNull || col("cos_sim") >= DedupOps.EmbDupTau))
        .count() === 0)
    } finally out.unpersist()
  }

  test("d27 exact-substring: planted shared spans removed at span granularity, remove-all convention") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val L = DedupOps.MinSpanTokens
    val docLen = 120
    val span = (0 until 60).map(i => s"shared$i").toVector
    val short = (0 until L - 5).map(i => s"tiny$i").toVector // < L: untouchable
    def filler(d: Int, n: Int, tag: String = "f"): Vector[String] =
      (0 until n).map(i => s"u${d}$tag$i").toVector

    // the 60-token span planted at a RANDOM offset in three docs; the
    // rest are globally-unique filler, so covered == planted, exactly
    val offsets = Seq(0, 2, 5).map(d => d -> rng.nextInt(docLen - 60)).toMap
    val planted = (0 until 8).map { d =>
      val toks = offsets.get(d) match {
        case Some(o) =>
          val f = filler(d, docLen - 60); f.take(o) ++ span ++ f.drop(o)
        case None => filler(d, docLen)
      }
      (d.toLong, toks.mkString(" "))
    }
    // a shared span SHORTER than L must be untouched
    val shortDocs = Seq(8, 9).map { d =>
      val f = filler(d, 40)
      (d.toLong, (f.take(20) ++ short ++ f.drop(20)).mkString(" "))
    }
    // a WITHIN-doc repeat: Lee et al.'s remove-all drops BOTH copies
    val rep = (0 until 20).map(i => s"rep$i").toVector
    val d10toks =
      filler(10, 30) ++ rep ++ filler(10, 30, "g") ++ rep ++ filler(10, 30, "h")
    val corpus = planted ++ shortDocs :+ (10L -> d10toks.mkString(" "))
    val out = DedupOps.exactSubstringDedup(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

    offsets.foreach { case (d, o) =>
      val r = out(d.toLong)
      assert(r.getAs[Long]("n_dup_spans") === 1L, s"doc $d (offset $o)")
      assert(r.getAs[Long]("n_covered") === 60L, s"doc $d (offset $o)")
      assert(r.getAs[String]("dedup_text") === filler(d, docLen - 60).mkString(" "),
        s"doc $d (offset $o): exactly the planted span must be removed")
    }
    Seq(1L, 3L, 4L, 6L, 7L, 8L, 9L).foreach { d =>
      assert(out(d).getAs[Long]("n_covered") === 0L, s"doc $d must be untouched")
      assert(out(d).getAs[String]("dedup_text")
        === corpus.find(_._1 == d).get._2, s"doc $d text must survive intact")
    }
    val r10 = out(10L)
    assert(r10.getAs[Long]("n_dup_spans") === 2L)
    assert(r10.getAs[Long]("n_covered") === 40L)
    assert(r10.getAs[String]("dedup_text") ===
      (filler(10, 30) ++ filler(10, 30, "g") ++ filler(10, 30, "h")).mkString(" "),
      "both copies of a within-doc repeated span are removed")
  }

  test("d30 substring decontamination: eval spans removed from train only; train-train repeats untouched") {
    import spark.implicits._
    val L = DedupOps.MinSpanTokens
    def filler(d: Int, n: Int): Vector[String] =
      (0 until n).map(i => s"v${d}f$i").toVector
    val evalSpan = (0 until 30).map(i => s"ev$i").toVector
    val trainDup = (0 until 30).map(i => s"tt$i").toVector

    val benchmark = Seq(
      (100L, (filler(100, 20) ++ evalSpan ++ filler(101, 20)).mkString(" ")))
      .toDF("doc_id", "text")
    val train = Seq(
      // carries the eval span at offset 25 → exactly it is removed
      0L -> (filler(0, 25) ++ evalSpan ++ filler(1, 25)),
      // two train docs sharing a 30-token span: NOT d30's business
      1L -> (filler(2, 20) ++ trainDup ++ filler(3, 20)),
      2L -> (filler(4, 20) ++ trainDup ++ filler(5, 20)),
      // clean doc
      3L -> filler(6, 60)
    ).map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")

    val out = DedupOps.substringDecontaminate(train, benchmark)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L),
      "report covers exactly the train docs — the eval set is read-only truth")
    assert(out(0L).getAs[Long]("n_contam_spans") === 1L)
    assert(out(0L).getAs[Long]("n_contam_tokens") === 30L)
    assert(out(0L).getAs[String]("clean_text")
      === (filler(0, 25) ++ filler(1, 25)).mkString(" "),
      "exactly the eval span is removed from the train doc")
    Seq(1L, 2L, 3L).foreach { d =>
      assert(out(d).getAs[Long]("n_contam_tokens") === 0L,
        s"doc $d: a train-train repeat is d27's business, not decontamination's")
    }
    assert(L <= 30, "fixture spans must be at least one gram long")
  }

  test("d27 property: engine ≡ driver-side reference on random segment-pool corpora") {
    import spark.implicits._
    val L = 5
    val rng = new scala.util.Random(20260815L)
    // driver-side reference: brute-force gram counts, cover marking,
    // maximal covered runs — the spec of the relational reduction
    def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
      val gramCount = scala.collection.mutable.Map[Seq[String], Int]()
      toks.foreach { case (_, tk) =>
        if (tk.size >= L)
          tk.sliding(L).filter(_.size == L)
            .foreach(g => gramCount(g) = gramCount.getOrElse(g, 0) + 1)
      }
      toks.map { case (id, tk) =>
        val covered = Array.fill(tk.size)(false)
        if (tk.size >= L)
          for (i <- 0 to tk.size - L; if gramCount(tk.slice(i, i + L)) >= 2;
               j <- i until i + L) covered(j) = true
        val nCov = covered.count(identity).toLong
        val spans = covered.zipWithIndex.count {
          case (c, i) => c && (i == 0 || !covered(i - 1))
        }.toLong
        val kept = tk.zipWithIndex.collect {
          case (t, i) if !covered(i) => t
        }.mkString(" ")
        id -> ((spans, nCov, kept))
      }.toMap
    }
    (1 to 8).foreach { round =>
      // shared segment pool: repeats of varying length arise naturally
      // across docs; per-doc unique filler breaks up the seams
      val pool = (0 until 8).map(s =>
        (0 until (3 + rng.nextInt(6))).map(i => s"seg${s}t$i").toVector)
      val docs = (0L until (8 + rng.nextInt(8)).toLong).map { id =>
        val parts = (0 until (2 + rng.nextInt(6))).flatMap { _ =>
          if (rng.nextInt(4) == 0)
            Vector(s"u${round}d${id}f${rng.nextInt(1000)}")
          else pool(rng.nextInt(pool.size))
        }
        (id, parts.mkString(" "))
      }
      val expect = reference(docs)
      val got = DedupOps.exactSubstringDedup(docs.toDF("doc_id", "text"), L)
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_covered"),
            r.getAs[String]("dedup_text")))).toMap
      assert(got === expect, s"round $round diverged from the reference")
    }
  }

  test("p04 funnel: monotone token accounting, final_text consistent with the arithmetic") {
    val out = DedupOps.spanFunnelQ.run(spark, sf001).persist()
    try {
      assert(out.filter(col("n_after_dedup") > col("n_tokens")
        || col("n_after_decontam") > col("n_after_dedup")
        || col("n_after_decontam") < 0).count() === 0,
        "token counts must shrink monotonically through the stages")
      // re-splitting final_text reproduces the arithmetic count (the
      // one legitimate divergence is '' vs 0 — split('') is [''])
      assert(out.filter(col("final_text").isNotNull && col("final_text") =!= ""
        && size(split(col("final_text"), " ")) =!= col("n_after_decontam"))
        .count() === 0, "final_text must hold exactly n_after_decontam tokens")
      assert(out.filter(col("final_text") === ""
        && col("n_after_decontam") =!= 0).count() === 0)
      // both rewriting stages do real work on the harness corpus
      assert(out.agg(sum(col("n_tokens") - col("n_after_dedup")))
        .head.getLong(0) > 0, "stage 1 must remove repeated spans")
      assert(out.agg(sum(col("n_after_dedup") - col("n_after_decontam")))
        .head.getLong(0) > 0, "stage 2 must remove eval-shared spans")
    } finally { out.unpersist(); () }
  }

  test("d31 semdedup: dup component keeps exactly the most-outlying copy") {
    import spark.implicits._
    // docs 0-3 are the first-4 codebook (k = max(4, ceil(sqrt(8)))).
    // 4/5 are exact copies of 0, 6 a one-token near-dup — all land in
    // doc 0's cell with cent_sim 1.0 / 1.0 / 1.0 / ~0.99, so the
    // paper's keep-low-centroid-sim rule must keep ONLY doc 6.
    val base = (1 to 40).map(i => s"tok${i % 13}w").mkString(" ")
    val near = base.split(" ").updated(5, "MUTATED").mkString(" ")
    def vocab(p: String) = (1 to 40).map(i => s"$p${i * 7 % 17}q").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, vocab("aa")), (2L, vocab("bb")), (3L, vocab("cc")),
      (4L, base), (5L, base), (6L, near), (7L, vocab("dd"))
    ).toDF("doc_id", "text")
    val out = DedupOps.semDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out.size === 8)
    // the dup component {0,4,5,6}: exact copies removed, outlier kept
    assert(out(0L)._3 && out(4L)._3 && out(5L)._3,
      "near-centroid copies must be removed")
    assert(!out(6L)._3, "the most-outlying copy must survive")
    assert(Set(0L, 4L, 5L, 6L).map(out(_)._1).size === 1,
      "the whole dup component must share one cell")
    assert(out(6L)._2 < out(0L)._2, "keep rule keys on centroid cosine")
    // unrelated docs untouched
    Seq(1L, 2L, 3L, 7L).foreach(id => assert(!out(id)._3, s"doc $id kept"))
  }

  test("d31 semdedup: exact-copy tie breaks to the smallest doc_id") {
    import spark.implicits._
    // 5 anchors (codebook k=4 is docs 0-3), then two identical copies
    // 8/9 of a NON-codebook text: equal cent_sim, id tie -> 8 survives
    def vocab(p: String) = (1 to 40).map(i => s"$p${i * 3 % 11}x").mkString(" ")
    val dup = vocab("zz")
    val docs = (0L to 3L).map(i => (i, vocab(s"a$i"))) ++
      Seq((8L, dup), (9L, dup))
    val out = DedupOps.semDedup(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!out(8L) && out(9L), "tie must keep the smaller id")
  }

  test("d32 edit-distance verify keeps near-dups and drops a banded far pair") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok${i % 13}w").mkString(" ")
    val near = base.split(" ").updated(5, "MUTATED").mkString(" ")
    // one token swapped for a 30-char token: still ~0.85 shingle
    // Jaccard (the fixed md5 banding proposes it — asserted below),
    // but ~30 character edits, beyond the 24-edit cap
    val far = base.split(" ").updated(5, "a" * 30).mkString(" ")
    val docs = Seq(
      (0L, base), (1L, base), (2L, near), (3L, far),
      (4L, (1 to 40).map(i => s"zzz${i * 7 % 17}q").mkString(" "))
    ).toDF("doc_id", "text")

    val cand = DedupOps.portableCandidatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 3L)),
      "fixture must band the far pair, or the distance-cap assertion is vacuous")

    val out = DedupOps.editDistancePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 1L)) === 0L, "exact dup at distance 0")
    val nearDist = out((0L, 2L))
    assert(nearDist > 0L && nearDist <= DedupOps.MaxEditDist,
      s"near dup within the cap, got $nearDist")
    assert(!out.contains((0L, 3L)) && !out.contains((1L, 3L)),
      "banded candidate beyond the cap must be dropped by the thresholded verify")
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc never verified")
  }

  test("d33: frozen-codebook append equals from-scratch assignment; delta docs prune cross-slice") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf001)
    val isDelta = col("doc_id") % 10 === 7
    val lake = graft.sources.SignatureLake.incrementalSemCells(
      spark, sf001, docs.filter(!isDelta), docs.filter(isDelta))
    // conservation (the s20 device on the semantic family): base
    // build + frozen-codebook append == one-shot assignment of the
    // FULL corpus under the same base-trained codebook
    val baseV = DedupOps.semDedupEmbed(docs.filter(!isDelta))
    val cb = DedupOps.semDedupCodebook(baseV, baseV.count())
    val full = DedupOps.semDedupAssign(DedupOps.semDedupEmbed(docs), cb)
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select(col("doc_id"), col("cell"), col("cent_sim")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(canon(lake) === canon(full),
      "appended semantic cells must equal the from-scratch frozen-codebook assignment")
    // the point of the index: a delta doc landing in an old doc's
    // cell participates in dominance — some delta docs are pruned
    // (3 at this sf, measured; >= 1 keeps the pin shift-tolerant)
    val served = DedupOps.semDedupPrune(lake)
    assert(served.filter(isDelta && col("removed")).count() >= 1L,
      "at least one delta near-dup must be pruned against the base")
    // and the dominance rule never empties a cell's dup component
    val cells = served.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("r")).collect()
    cells.foreach(c => assert(c.getLong(1) > c.getLong(2),
      s"cell ${c.getLong(0)}: every member removed"))
  }

  test("d35: deleting a dominance keeper PROMOTES the doc it was suppressing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.sources.SignatureLake.invalidate(spark)
    // docs 0-3 are the first-4 frozen codebook; 8/9 are identical
    // copies of a non-codebook text, so pre-delete the id tie keeps 8
    // and prunes 9 (the d31 tie rule). The takedown removes doc 8 —
    // the KEEPER — and the masked prune must PROMOTE doc 9: its only
    // dominance witness is gone.
    def vocab(p: String) = (1 to 40).map(i => s"$p${i * 3 % 11}x").mkString(" ")
    val dup = vocab("zz")
    val fixture = ((0L to 3L).map(i => (i, vocab(s"a$i"))) ++
      Seq((8L, dup), (9L, dup))).toDF("doc_id", "text")
    // pre-delete baseline (non-vacuous): 9 is suppressed by 8
    val pre = DedupOps.semDedup(fixture).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!pre(8L) && pre(9L), "fixture must suppress 9 under keeper 8")
    val lake = graft.sources.SignatureLake.tombstonedSemCells(spark, "spec_d35",
      base = fixture.filter(col("doc_id") =!= 9L),
      delta = fixture.filter(col("doc_id") === 9L),
      deleted = Seq(8L).toDF("doc_id"))
    val post = DedupOps.semDedupPrune(lake.served).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!post.contains(8L), "the deleted keeper is gone from the serve")
    assert(post(9L) === false,
      "the suppressed copy must be PROMOTED once its keeper is deleted")
    // the physically rewritten generation serves the same promotion
    val postC = DedupOps.semDedupPrune(lake.compacted).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!postC.contains(8L) && postC(9L) === false)
    graft.sources.SignatureLake.invalidate(spark)
  }
}
