package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-query invariants on the harness corpus (property-style checks
  * per SURVEY.md §5-2). */
class QueryInvariantsSpec extends SparkSpec {

  test("per-day shares sum to 1 (q06)") {
    val shares = CoreQueries.windowShare.run(spark, sf001)
      .groupBy("day").agg(sum("share").as("s"))
      .filter(abs(col("s") - 1.0) > 0.001)
    assert(shares.count() === 0)
  }

  test("grand-total pct sums to 100 (q07)") {
    val total = CoreQueries.shareOfTotal.run(spark, sf001)
      .agg(sum("pct")).collect().head.getDouble(0)
    assert(math.abs(total - 100.0) < 0.01)
  }

  test("unpivot(pivot(x)) preserves totals (q02/q10)") {
    val wideTotal = CoreQueries.pivotCounts.run(spark, sf001)
      .select(Seq("click", "error", "purchase", "signup", "view").map(c => sum(col(c))).reduce(_ + _))
      .collect().head.getLong(0)
    val longTotal = CoreQueries.unpivotCounts.run(spark, sf001)
      .agg(sum("counts")).collect().head.getLong(0)
    val raw = graft.Tables.events(spark, sf001).count()
    assert(wideTotal === raw)
    assert(longTotal === raw)
  }

  test("positivity rates within [0,1]; quantiles ordered (q01/q09)") {
    assert(CoreQueries.positivity.run(spark, sf001)
      .filter(col("positivity_rate") < 0 || col("positivity_rate") > 1).count() === 0)
    assert(CoreQueries.quantiles.run(spark, sf001)
      .filter(!(col("lo") <= col("q1") && col("q1") <= col("median") &&
        col("median") <= col("q3") && col("q3") <= col("hi"))).count() === 0)
  }

  test("dedup-first keeps exactly one row per key (q12)") {
    val out = CoreQueries.dedupFirst.run(spark, sf001)
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("rollup grand total equals table count (q20)") {
    val grand = CoreQueries.rollupCounts.run(spark, sf001)
      .filter(col("event_type").isNull && col("day").isNull)
      .select("counts").collect()
    assert(grand.length === 1)
    assert(grand.head.getLong(0) === graft.Tables.events(spark, sf001).count())
  }

  test("hash split partitions the corpus near 80/10/10, deterministically (t08)") {
    val out = graft.operators.TextOps.hashSplitQ.run(spark, sf001)
    val n = out.count()
    val bySplit = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.filter(col("split").isNull || col("bucket").isNull).count() === 0,
      "every document gets a non-null bucket and split")
    assert(bySplit.keySet === Set("train", "val", "test"))
    // md5 buckets are uniform; at n=500 the 80% split lands well inside ±10pp
    assert(math.abs(bySplit("train").toDouble / n - 0.8) < 0.1, bySplit.toString)
    // determinism: re-running assignment never moves a document
    val again = graft.operators.TextOps.hashSplitQ.run(spark, sf001)
    assert(out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() === 0)
  }

  test("approx quantiles within tolerance of exact (q09/q24)") {
    // q24 emits its GK rank-window verdicts directly (r7)
    CoreQueries.approxQuantiles.run(spark, sf001).collect().foreach { r =>
      assert(r.getAs[Boolean]("q1_within") && r.getAs[Boolean]("median_within")
        && r.getAs[Boolean]("q3_within"),
        s"${r.getString(0)}: GK sketch outside its rank window")
    }
  }

  test("approx distinct within the configured error of exact (q21/q22)") {
    val exact = CoreQueries.distinctCounts.run(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val out = CoreQueries.approxDistinct.run(spark, sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_users_exact"), r.getAs[Boolean]("within_bound")))).toMap
    assert(out.keySet === exact.keySet)
    out.foreach { case (et, (ne, wb)) =>
      assert(ne == exact(et), s"$et exact-count mismatch vs q21")
      assert(wb, s"$et HLL out of its 3-sigma bound")
    }
  }

  test("the 2dp fixed-point premise holds on every money/value column, all scales") {
    // the scaled-100 exact-arithmetic discipline (q04/q05/q09/q17/q20/
    // q25/q31/q32/q35/c08...) rests on round(x*100) recovering an exact
    // integer; if the driver ever regenerates data off-grid this must
    // fail loudly, not corrupt hash parity downstream
    for (sf <- Seq(sf001, sf01, sf1)) {
      def maxDev(df: org.apache.spark.sql.DataFrame, c: String): Double =
        df.agg(max(abs(col(c) * 100 - round(col(c) * 100, 0)))).head.getDouble(0)
      assert(maxDev(graft.Tables.events(spark, sf), "value") < 1e-6, s"events.value @ $sf")
      val li = graft.Tables.lineitem(spark, sf)
      assert(maxDev(li, "l_extendedprice") < 1e-6, s"l_extendedprice @ $sf")
      assert(maxDev(li, "l_discount") < 1e-6, s"l_discount @ $sf")
      assert(maxDev(graft.Tables.orders(spark, sf), "o_totalprice") < 1e-6, s"o_totalprice @ $sf")
    }
  }

  test("q59 F2 sketch: single-key type is lane-exact; two-key estimate stays in its envelope") {
    import spark.implicits._
    // one key with c events: S_l = ±c in EVERY lane, so est == exact == c²
    val ev = ((1 to 5).map(_ => ("solo", 7L)) ++
      Seq.fill(3)(("duo", 1L)) ++ Seq.fill(4)(("duo", 2L)))
      .toDF("event_type", "user_id")
    val out = CoreQueries.f2Report(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val solo = out("solo")
    assert(solo.getAs[Long]("n_rows") == 5L && solo.getAs[Long]("n_keys") == 1L)
    assert(solo.getAs[Long]("f2_exact") == 25L)
    assert(solo.getAs[Double]("f2_est") == 25.0)
    assert(solo.getAs[Double]("rel_err") == 0.0)
    val duo = out("duo")
    assert(duo.getAs[Long]("f2_exact") == 25L) // 3² + 4²
    // est_l = (±3 ±4)² ∈ {1, 49}; the lane mean is 25 + 24·avg(s₁s₂),
    // pinned to the envelope whatever the md5 signs drew
    val est = duo.getAs[Double]("f2_est")
    assert(est >= 1.0 && est <= 49.0)
    // the telescoping identity: the production ONE-PASS lane sums
    // (f2LaneSums, no per-key table) square-mean to bit-exactly the
    // audit row's key-table estimate — algebra, not approximation.
    // Checked on the planted fixture and on real sf0.001 events.
    def estFromOnePass(events: org.apache.spark.sql.DataFrame) =
      CoreQueries.f2LaneSums(events).collect()
        .groupBy(_.getString(0))
        .map { case (t, rs) =>
          t -> rs.map(r => { val s = r.getLong(2); s * s }).sum.toDouble /
            CoreQueries.F2Lanes }
    estFromOnePass(ev).foreach { case (t, e) =>
      assert(e == out(t).getAs[Double]("f2_est"), s"telescoping broke at $t") }
    val real = graft.Tables.events(spark, sf001)
    val realReport = CoreQueries.f2Report(real).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("f2_est")).toMap
    estFromOnePass(real).foreach { case (t, e) =>
      assert(e == realReport(t), s"telescoping broke on real data at $t") }
  }

  test("q60 advisory fires on a planted hot key, stays quiet on uniform keys, sketch agrees with exact") {
    import spark.implicits._
    // hot: one key owns 512 of 1024 rows over 513 keys ->
    // F2 = 512² + 512 = 262656, skew = F2·K/N² ≈ 128.5 >> 4
    val hot = (Seq.fill(512)(("hot", 0L)) ++
      (1 to 512).map(u => ("hot", u.toLong))).toDF("event_type", "user_id")
    // uniform: 512 keys × 2 rows -> F2 = 2048, skew = 2048·512/1024² = 1
    val uni = (0 until 1024).map(i => ("uni", (i % 512).toLong))
      .toDF("event_type", "user_id")
    val out = CoreQueries.skewAdvisoryReport(hot.unionByName(uni)).collect()
      .map(r => r.getString(0) -> r).toMap
    val h = out("hot")
    assert(h.getAs[Double]("skew_exact") > 100.0)
    assert(h.getAs[Boolean]("needs_salt_exact"), "exact advisory must fire on the hot key")
    assert(h.getAs[Boolean]("needs_salt_est"),
      "the one-pass sketch must reach the same salt decision as the exact moment")
    assert(h.getAs[Double]("max_share") === 0.5)
    val u = out("uni")
    assert(u.getAs[Double]("skew_exact") === 1.0)
    assert(!u.getAs[Boolean]("needs_salt_exact") && !u.getAs[Boolean]("needs_salt_est"),
      "uniform keys must not be salted")
    assert(h.getAs[Boolean]("advisory_agrees") && u.getAs[Boolean]("advisory_agrees"))
    // cross-check with q41's report on the same frame: the hottest-key
    // share the old decision path read matches the advisory's column
    val q41 = CoreQueries.keySkewReport(hot).head()
    assert(q41.getAs[Double]("max_share") === h.getAs[Double]("max_share"))
  }

  test("q41 skew report: hand-computed shares, top10 caps at 10 keys") {
    import spark.implicits._
    val ev = (Seq.fill(5)(("a", 1L)) ++ Seq.fill(3)(("a", 2L)) ++ Seq(("a", 3L)) ++
      Seq.fill(3)(("b", 1L)) ++ (2L to 12L).map(("b", _)))
      .toDF("event_type", "user_id")
    val out = CoreQueries.keySkewReport(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a") // counts 5,3,1
    assert(a.getLong(1) == 9L && a.getLong(2) == 3L && a.getLong(3) == 5L)
    assert(a.getLong(4) == 9L && a.getDouble(5) == 5.0 / 9 && a.getDouble(6) == 1.0)
    val b = out("b") // counts 3,1x11 -> 12 keys, top10 = 3 + 9
    assert(b.getLong(1) == 14L && b.getLong(2) == 12L && b.getLong(3) == 3L)
    assert(b.getLong(4) == 12L && b.getDouble(5) == 3.0 / 14 && b.getDouble(6) == 12.0 / 14)
  }

  test("t21 token budget: under-budget source keeps all, over-budget capped in bps") {
    import spark.implicits._
    // srcA 30 tokens, srcB 2 tokens; total 32, ns 2, frac 0.95 ->
    // rate_bp(A) = (9500*32) div (2*30) = 5066; rate_bp(B) = 10000
    val docs = Seq(
      (1L, "srcA", Seq.fill(10)("w").mkString(" ")),
      (2L, "srcA", Seq.fill(10)("w").mkString(" ")),
      (3L, "srcA", Seq.fill(10)("w").mkString(" ")),
      (4L, "srcB", "w w")).toDF("doc_id", "source", "text")
    val out = CurationOps.tokenBudgetSample(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L)._1 == 5066L && out(2L)._1 == 5066L && out(3L)._1 == 5066L)
    assert(out(4L)._1 == 10000L && out(4L)._2, "rate 10000 keeps every bucket")
  }

  test("s08 hard negatives: no neighbor shares the query label, ranks dense") {
    val out = SimilarityOps.hardNegativesQ.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    val qLabels = graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") < SimilarityOps.QueryVecs)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    out.foreach { case (q, lbl, _, cos) =>
      assert(lbl != qLabels(q), s"query $q got a same-label negative")
      assert(cos >= -1.0001 && cos <= 1.0001)
    }
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.size).toSeq,
        s"query $q ranks not dense")
    }
  }

  test("v07 quant recall bounded; m06 manifest conserves rows, bytes, and id-sum") {
    VectorOps.quantRecall(graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")))
      .collect().foreach { r =>
        val h = r.getLong(1)
        assert(h >= 0 && h <= VectorOps.RecallK)
        assert(r.getDouble(2) == h.toDouble / VectorOps.RecallK)
      }
    val docs = graft.Tables.documents(spark, sf001)
    val m = MultimodalOps.shardManifest(
      MultimodalOps.asMultimodal(spark, sf001)
        .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))).collect()
    assert(m.map(_.getLong(0)).distinct.length == m.length)
    assert(m.map(_.getLong(1)).sum == docs.count())
    val expectIdSum = docs.agg(sum(col("doc_id"))).head.getLong(0)
    assert(m.map(_.getLong(3)).sum == expectIdSum, "doc_id checksum must conserve")
  }

  test("m07 quarantine: planted corrupt byte and lying metadata are detected; clean passes") {
    import spark.implicits._
    val payloads = Seq(
      (1L, "clean text", "s1", 10L),      // clean
      (2L, "bad\u0001byte", "s1", 8L),    // control byte -> corrupt
      (3L, "short", "s2", 99L))           // metadata length lies
      .toDF("doc_id", "text", "source", "n_chars")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(lit("txt").as("format"), lit("en").as("lang"),
          col("n_chars").as("n_chars"), col("source").as("source")).as("meta"))
    val v = MultimodalOps.validatePayloads(payloads).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(v(("s1", 10L)) == ((0L, true)))
    assert(v(("s1", 8L)) == ((1L, true)))
    assert(v(("s2", 5L)) == ((0L, false)))
    // the harness corpus is fully clean: every doc lands in n_clean
    val report = MultimodalOps.quarantineQ.run(spark, sf001).collect()
    report.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"corpus doc flagged: $r")
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
      assert(r.getDouble(5) == 1.0)
    }
  }

  test("m08 histogram drift: planted skew source flags, symmetric gap, clean bins quiet") {
    import spark.implicits._
    val payloads = Seq(
      // '0' = 48 -> bin 0 gets the whole mass
      (1L, "0000", "skew"),
      // 'a' = 97 -> bin 1, 'b' = 98 -> bin 2, half each
      (2L, "ab", "flat"))
      .toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(lit("txt").as("format"), lit("en").as("lang"),
          length(col("text")).cast("long").as("n_chars"),
          col("source").as("source")).as("meta"))
    val out = MultimodalOps.sourceHistogramDrift(payloads).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out(("skew", 0)) == ((1.0, 0.5, 0.5, true)))
    assert(out(("flat", 0)) == ((0.0, 0.5, 0.5, true)))
    assert(out(("skew", 1)) == ((0.0, 0.25, 0.25, true)))
    assert(out(("flat", 1)) == ((0.5, 0.25, 0.25, true)))
    // a bin neither source touches is exactly zero everywhere
    assert(out(("skew", 5)) == ((0.0, 0.0, 0.0, false)))
    assert(out(("flat", 5)) == ((0.0, 0.0, 0.0, false)))
  }

  test("m11 payload dedup: planted byte-identical copies collapse, savings exact") {
    import spark.implicits._
    val payloads = Seq(
      (1L, "same bytes"), (2L, "same bytes"), (7L, "same bytes"),
      (3L, "unique")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = MultimodalOps.payloadDedup(payloads).collect()
      .map(r => r.getAs[Long]("keep_id") -> r).toMap
    assert(out.size === 2)
    val dup = out(1L)
    assert(dup.getAs[Long]("n_copies") === 3L)
    assert(dup.getAs[Long]("n_bytes") === 10L)
    assert(dup.getAs[Long]("bytes_saved") === 20L)
    val uniq = out(3L)
    assert(uniq.getAs[Long]("n_copies") === 1L
      && uniq.getAs[Long]("bytes_saved") === 0L)
  }

  test("m12 payload takedown: a blocked digest removes EVERY carrier, survivors conserve") {
    import spark.implicits._
    val payloads = Seq(
      (1L, "blocked bytes"), (2L, "blocked bytes"), (9L, "blocked bytes"),
      (3L, "kept alpha"), (4L, "kept beta")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    // the takedown list names ONE digest, carried by doc 1 — docs 2
    // and 9 carry byte-identical copies under other ids and must go too
    val blocklist = payloads.filter(col("doc_id") === 1L)
      .select(md5(col("payload")).as("digest"))
    val out = MultimodalOps.payloadTakedown(payloads, blocklist).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_copies_removed") === 3L,
      "every byte-identical carrier is removed, not just the listed doc")
    assert(r.getAs[Long]("bytes_removed") === 3L * "blocked bytes".length)
    assert(r.getAs[Long]("first_doc") === 1L)
    assert(r.getAs[Long]("n_surviving_docs") === 2L,
      "survivors + removed must conserve the corpus")
  }

  test("m13 CDC chunking survives an offset shift that breaks fixed blocks") {
    import spark.implicits._
    // doc 2 = doc 1 with bytes INSERTED at the head: every byte offset
    // shifts, so fixed-size blocks would share nothing — content-
    // defined boundaries re-align after the edit and the tail chunks
    // dedup. Body long enough (~600 bytes) to expect ~9 boundary hits
    // at the 1/64 rate.
    val body = (1 to 120).map(i => s"tok$i").mkString(" ") // aperiodic: no within-doc dups
    val payloads = Seq(
      (1L, body),
      (2L, "INSERTED-PREFIX-SHIFTS-EVERY-OFFSET " + body),
      (3L, "short")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = MultimodalOps.cdcChunkDedup(payloads).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_chunks") > 1L,
      "fixture body must actually produce content-defined boundaries")
    assert(out(2L).getAs[Long]("dup_bytes") > 0L,
      "chunks after the insertion must re-align and dedup against doc 1")
    assert(out(1L).getAs[Long]("n_dup_chunks") === 0L,
      "keep-first: doc 1 holds every first copy")
    val short = out(3L)
    assert(short.getAs[Long]("n_chunks") === 1L &&
      short.getAs[Long]("n_bytes") === 5L,
      "a payload shorter than the window is one whole chunk")
    // conservation: chunk bytes reassemble each payload exactly
    assert(out(1L).getAs[Long]("n_bytes") === body.length.toLong)
    assert(out(2L).getAs[Long]("n_bytes") === body.length.toLong + 36L)

    // the comparison MEASURED, not asserted in prose: fixed 64-byte
    // blocking on the same pair shares zero blocks — the insertion
    // shifts every offset and no block boundary re-aligns
    val fixedDup = payloads
      .select(col("doc_id"), col("payload").cast("string").as("t"))
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, CAST(ceil(length(t)/64.0) AS INT) - 1), " +
          "i -> substring(t, i * 64 + 1, 64))")).as("c"))
      .select(col("doc_id"), md5(col("c")).as("dg"), length(col("c")).as("nb"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("dg")).orderBy(col("doc_id"))))
      .filter(col("__rn") > 1)
      .agg(coalesce(sum(col("nb")), lit(0L))).head.getLong(0)
    assert(fixedDup === 0L,
      s"fixed blocks must share nothing across the shifted pair, got $fixedDup dup bytes")
  }

  test("d36: deleting the first-copy holder promotes the next copy's chunks") {
    import spark.implicits._
    graft.sources.SignatureLake.invalidate(spark)
    val body = (1 to 120).map(i => s"tok$i").mkString(" ")
    val payloads = Seq((1L, body), (2L, body), (3L, "unrelated short"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    // pre-delete: doc 1 holds every first copy, doc 2 is all dups
    val pre = MultimodalOps.cdcChunkDedup(payloads).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_bytes")).toMap
    assert(pre(1L) === 0L && pre(2L) > 0L, s"fixture must dedup 2 against 1: $pre")
    val lake = graft.sources.SignatureLake.tombstonedChunkDigests(spark, "spec_d36",
      base = payloads.filter(col("doc_id") =!= 2L),
      delta = payloads.filter(col("doc_id") === 2L),
      deleted = Seq(1L).toDF("doc_id"))
    Seq("served" -> lake.served, "compacted" -> lake.compacted).foreach {
      case (tier, chunks) =>
        val post = MultimodalOps.cdcReport(chunks).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_bytes")).toMap
        assert(!post.contains(1L), s"$tier: deleted doc gone")
        assert(post(2L) === 0L,
          s"$tier: doc 2 must be PROMOTED to first-copy holder, got ${post(2L)} dup bytes")
    }
    graft.sources.SignatureLake.invalidate(spark)
  }

  test("multimodal features: 16-dim, L1-normalized (m02)") {
    val f = MultimodalOps.featuresQ.run(spark, sf001)
    assert(f.filter(col("dim") =!= 16).count() === 0)
    assert(f.filter(abs(col("feature_sum") - 1.0) > 0.001).count() === 0)
  }

  test("frame sampler geometry on hand-built payloads (m03)") {
    import spark.implicits._
    // 1000 bytes -> 4 frames (256,256,256,232); stride 4 samples frame 0
    // 1300 bytes -> 6 frames; samples frames 0 and 4
    val docs = Seq(
      (1L, "x" * 1000), (2L, "y" * 1300), (3L, "z"), (4L, "w" * 1024)
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = MultimodalOps.sampleFrames(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out(1L) === ((4L, 1L, 256L, "78" * 8, "")))
    assert(out(2L) === ((6L, 2L, 256L + 256L, "79" * 8, "79" * 8)))
    assert(out(3L) === ((1L, 1L, 1L, "7A", "")))
    // exactly 4 frames of 256: frame index 4 does not exist
    assert(out(4L)._1 === 4L)
    assert(out(4L)._5 === "")
  }

  test("winnowing guarantee: shared substring >= w+k-1 chars => shared fingerprint (t05)") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different lead-in $shared other tail"),
      (3L, "nothing in common with those two documents at all here")
    ).toDF("doc_id", "text")
    val sel = TextOps.winnowSelections(docs)
      .select(col("doc_id"), array_distinct(col("sel")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert((sel(1L) & sel(2L)).nonEmpty, "docs sharing a long substring must share fingerprints")
    assert((sel(1L) & sel(3L)).isEmpty, "unrelated docs must not collide")
    // density: winnowing keeps far fewer than all grams
    assert(sel(1L).size < docs.filter(col("doc_id") === 1L)
      .select(length(col("text"))).collect().head.getInt(0))
  }

  test("perceptual hash finds aligned in-place edits, rejects unrelated (m05)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val base = Array.fill(2000)(rnd.nextInt(256).toByte)
    val near = base.clone() // image-like edit: values change, offsets don't
    (0 until 40).foreach(k => near(k * 50) = ((near(k * 50) + 10) & 0xFF).toByte)
    val far = Array.fill(2000)(rnd.nextInt(256).toByte)
    val tiny = Array.fill(10)(1.toByte) // under the 64-byte floor -> excluded
    val payloads = Seq(
      (0L, base), (1L, base), (2L, near), (3L, far), (4L, tiny))
      .toDF("doc_id", "payload")
    val ph = graft.operators.MultimodalOps.perceptualHashes(payloads)
    assert(ph.count() === 4, "sub-64-byte payloads are excluded")
    val pairs = graft.operators.DedupOps.simhashPairsMulti(
      ph.withColumnRenamed("phash", "sh0"), Seq("sh0"),
      graft.operators.MultimodalOps.PhashMaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((0L, 1L)) === Some(0L), "identical payloads at Hamming 0")
    assert(byPair.contains((0L, 2L)), "aligned in-place edit must be a near-dup")
    assert(byPair((0L, 2L)) <= 6L)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated payload excluded")
  }

  test("m09 phash clusters: transitive chain collapses to one group, unrelated stays singleton") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val base = Array.fill(2000)(rnd.nextInt(256).toByte)
    def edit(src: Array[Byte], offset: Int): Array[Byte] = {
      val out = src.clone()
      (0 until 30).foreach(k => out(offset + k * 60) =
        ((out(offset + k * 60) + 9) & 0xFF).toByte)
      out
    }
    // A(0) ~ B(1) ~ C(2): B edits A, C edits B FURTHER — A and C may
    // sit past the pair radius; the component must still unite them
    val b = edit(base, 0)
    val c = edit(b, 30)
    val far = Array.fill(2000)(rnd.nextInt(256).toByte)
    val payloads = Seq((0L, base), (1L, b), (2L, c), (3L, far))
      .toDF("doc_id", "payload")
    val ph = MultimodalOps.perceptualHashes(payloads)
    val pairs = DedupOps.simhashPairsMulti(
      ph.withColumnRenamed("phash", "sh0"), Seq("sh0"),
      MultimodalOps.PhashMaxHamming)
    val cc = DedupOps.connectedComponents(
      ph.select(col("doc_id")), pairs.select(col("doc_a"), col("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(0L) === 0L && cc(1L) === 0L && cc(2L) === 0L,
      s"chain must collapse to the min-id cluster: $cc")
    assert(cc(3L) === 3L, "unrelated payload keeps its own cluster")
  }

  test("resize keeps every 4th byte with a stable digest (m04)") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "abc"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = MultimodalOps.resizePayloads(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // "abcdefghij" -> bytes at 0,4,8 = "aei"
    val aei = java.security.MessageDigest.getInstance("MD5")
      .digest("aei".getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString
    assert(out(1L) === ((10L, 3L, aei)))
    assert(out(2L)._2 === 0L) // empty payload -> empty resize
    assert(out(3L)._2 === 1L) // "abc" -> "a"
  }

  test("t29 chunking geometry: coverage, stride, overlap, short docs") {
    import spark.implicits._
    // 3 tokens (single short chunk), exactly size, size+1 (two chunks),
    // and 100 tokens (4 chunks, short tail)
    val mk = (k: Int) => (0 until k).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, mk(3)), (2L, mk(32)), (3L, mk(33)), (4L, mk(100)))
      .toDF("doc_id", "text")
    val out = TextOps.chunkOverlap(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap

    assert(out.keys.count(_._1 == 1L) === 1 && out((1L, 0L))._2 === 3L)
    assert(out.keys.count(_._1 == 2L) === 1 && out((2L, 0L))._2 === 32L)
    // 33 tokens: chunks at 0 (full) and 24 (9 tokens) — the straddling
    // token 32 appears in both (overlap), never split without a whole copy
    assert(out.keys.count(_._1 == 3L) === 2)
    assert(out((3L, 1L)) === ((24L, 9L, (24 until 33).map(i => s"w$i").mkString(" "))))
    // 100 tokens: 1 + ceil(68/24) = 4 chunks; starts 0,24,48,72; full
    // coverage (last covers to token 99) and every non-final chunk full
    val d4 = out.filter(_._1._1 == 4L).toSeq.sortBy(_._1._2)
    assert(d4.map(_._2._1) === Seq(0L, 24L, 48L, 72L))
    assert(d4.map(_._2._2) === Seq(32L, 32L, 32L, 28L))
    assert(d4.last._2._1 + d4.last._2._2 === 100L)
    // positional ids distinct; content fp equal for identical windows
    val all = TextOps.chunkOverlap(docs).select("chunk_id").collect()
    assert(all.map(_.getString(0)).distinct.length === all.length)
  }

  test("entry point returns rows (driver smoke)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("registry integrity: oracle keys subset of queries; no silent drops") {
    val qs = graft.SparkEntry.queries.keySet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(qs))
    // a refactor that drops registry entries must fail loudly, not
    // silently shrink CORRECTNESS coverage (54 queries / 49 oracles as
    // of round 2 — only grow these)
    assert(qs.size >= 70, s"registry shrank to ${qs.size}")
    assert(graft.SparkEntry.oracleSql.size >= 63,
      s"oracle coverage shrank to ${graft.SparkEntry.oracleSql.size}")
  }
}
