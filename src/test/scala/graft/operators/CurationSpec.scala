package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-fixture coverage for the curation operators: the oracle
  * proves corpus parity; these prove the semantics the synthetic
  * corpus cannot exercise (PII positives, rule-by-rule gate failures,
  * pack edge cases).
  */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("t23 df drift: within-doc repeats collapse, add-one ratios, noise floor holds") {
    // even doc_ids are half A, odd are half B
    val fixture = docs(
      (0L, "up up up common"), (2L, "common"), (4L, "common"),
      (1L, "down common"), (3L, "down common"), (5L, "down common"),
      (7L, "rare"))
    val out = TextOps.dfDrift(fixture, minDf = 3, topN = 10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    // 'rare' (df 1) and 'up' (df 1 after within-doc collapse) miss the floor
    assert(out.keySet == Set("common", "down"))
    // down: df_a 0, df_b 3 -> drift 4/1, divergence 4; common: 3 vs 3 -> 1
    assert(out("down") == ((0L, 3L, 4.0, 4.0, 1L)))
    assert(out("common") == ((3L, 3L, 1.0, 1.0, 2L)))
  }

  test("t09 repetition signals match hand-computed gram fractions") {
    // "a b a b a b": 2-grams (a b)x3 (b a)x2 -> top2 3/5;
    //                3-grams (a b a)x2 (b a b)x2 -> dup3 4/4
    val out = CurationOps.repetitionSignals(docs(
      1L -> "a b a b a b",
      2L -> "all tokens here are unique words",
      3L -> "x")).collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == (0.6, 1.0))
    assert(out(2L)._1 == 0.2) // 5 distinct 2-grams, max count 1
    assert(out(2L)._2 == 0.0)
    assert(out(3L) == (0.0, 0.0)) // too short for any gram
  }

  test("t10 gate fails exactly the planted rule per document") {
    val enBase = "the market and the council of the state " // en-scored, stopword-rich
    val cases = docs(
      // 23 tokens, every adjacent 2-gram distinct (top2 = 1/22 < 0.08)
      1L -> "the market and council of state report covers a policy outcome rather than procedure while staff remain careful about detail everyone watches closely",
      2L -> (enBase + "short tail"),                       // < 20 tokens -> len
      3L -> "le la et le la et le la et le la et le la et le la et le la et le la et", // fr -> lang (+shape/stop)
      4L -> (enBase + Seq.fill(16)("of the").mkString(" ")))  // dominant 2-gram -> rep
    val out = CurationOps.qualityVerdict(cases)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == ("keep", ""))
    assert(out(2L)._1 == "drop" && out(2L)._2.contains("len"))
    assert(out(3L)._1 == "drop" && out(3L)._2.contains("lang"))
    assert(out(4L)._1 == "drop" && out(4L)._2.contains("rep"))
  }

  test("t16 boilerplate coverage: overlapping frequent grams cover distinct positions once") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "w x y a b"),      // "w x y"(0) + "x y a"(1): union {0,1,2,3} -> 4/5
      (2L, "p w x y a x"),    // starts 1,2: union {1,2,3,4} -> 4/6
      (3L, "w x y y"),        // "w x y"(0) only -> 3/4
      (4L, "all words here are fresh ones"), // no frequent gram -> 0
      (5L, "a b"),            // too short for any gram -> 0
      (6L, null.asInstanceOf[String]))       // null text -> 0 tokens, NULL frac
      .toDF("doc_id", "text")
    val out = TextOps.boilerplateCoverage(fixture, minDocFreq = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(1L) == ((5L, 4L, Some(0.8))))
    assert(out(2L) == ((6L, 4L, Some(4.0 / 6.0))))
    assert(out(3L) == ((4L, 3L, Some(0.75))))
    assert(out(4L) == ((6L, 0L, Some(0.0))))
    assert(out(5L) == ((2L, 0L, Some(0.0))))
    assert(out(6L) == ((0L, 0L, None)))
  }

  test("t11 detects and redacts planted PII, leaves clean text alone") {
    val (emails, ips, phones, redacted) = CurationOps.piiCols(col("text"))
    val out = docs(
      1L -> "contact john.doe@example.com or +12345678901 at host 10.0.0.12 now",
      2L -> "no personal data in this row at all",
      3L -> "escalate to John.Doe@Example.COM today")
      .select(col("doc_id"), emails.as("e"), ips.as("i"), phones.as("p"), redacted.as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    assert(out(1L)._1 == ((1L, 1L, 1L)))
    assert(out(1L)._2 == "contact <EMAIL> or <PHONE> at host <IP> now")
    assert(out(2L)._1 == ((0L, 0L, 0L)))
    assert(out(2L)._2 == "no personal data in this row at all")
    // mixed-case address: email matching is (?i), so detection + redaction hold
    assert(out(3L)._1 == ((1L, 0L, 0L)))
    assert(out(3L)._2 == "escalate to <EMAIL> today")
  }

  test("pk01 greedy packing: bins close on overflow, oversized doc isolated") {
    // Single shard (mod 1): order by doc_id, budget 10:
    // 4+5=9 fits, +3 overflows -> bin1: 3+7=10 fits, 12 oversized -> bin2 alone,
    // then 2 -> bin3
    val fixture = docs(
      1L -> Seq.fill(4)("w").mkString(" "),
      2L -> Seq.fill(5)("w").mkString(" "),
      3L -> Seq.fill(3)("w").mkString(" "),
      4L -> Seq.fill(7)("w").mkString(" "),
      5L -> Seq.fill(12)("w").mkString(" "),
      6L -> Seq.fill(2)("w").mkString(" "))
    val out = CurationOps.packed(fixture, shards = 1, budget = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      1L -> (0L, 0L), 2L -> (0L, 4L), 3L -> (1L, 0L), 4L -> (1L, 3L),
      5L -> (2L, 0L), 6L -> (3L, 0L)))
  }

  test("pk01 matches a driver-side greedy reference on a multi-shard corpus") {
    import spark.implicits._
    val n = 300
    val fixture = docs((0 until n).map(i =>
      i.toLong -> Seq.fill(1 + (i * 7) % 23)("w").mkString(" ")): _*)
    val budget = 40L
    val out = CurationOps.packed(fixture, shards = 4, budget)
      .as[PackOut].collect().map(p => p.doc_id -> p).toMap
    // independent reference: group by the emitted shard, replay greedy
    val expected = out.values.groupBy(_.shard).flatMap { case (_, rows) =>
      var fill = 0L; var bin = -1L
      rows.toSeq.sortBy(_.doc_id).map { r =>
        if (bin < 0 || fill + r.n_tokens > budget) { bin += 1; fill = 0L }
        val off = fill; fill += r.n_tokens
        r.doc_id -> (bin, off)
      }
    }.toMap
    assert(out.view.mapValues(p => (p.bin, p.tok_offset)).toMap == expected)
    assert(out.size == n)
  }

  test("pk06 concat-cut: spans tile the token stream in doc order; crossing accounting exact") {
    val n = 240
    val fixture = docs((0 until n).map(i =>
      i.toLong -> Seq.fill(1 + (i * 11) % 37)("w").mkString(" ")): _*)
    val out = CurationOps.concatCut(fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1)
    assert(out.length === n)
    // the two-tier prefix sum must equal the sequential concatenation:
    // doc i starts exactly where doc i-1 ended, from offset 0
    var expectStart = 0L
    out.foreach { case (id, ntok, start, first, last, nseq, crosses) =>
      assert(start === expectStart, s"doc $id: gap or overlap in the token stream")
      expectStart += ntok
      assert(first === start / CurationOps.CutLen)
      assert(last === (start + ntok - 1) / CurationOps.CutLen)
      assert(nseq === last - first + 1)
      assert(crosses === (first != last), s"doc $id crossing flag")
    }
    // total tokens conserve, and SOME docs cross cuts (token counts up
    // to 37 against 256-token windows -> the fixture is non-vacuous)
    assert(expectStart === out.map(_._2).sum)
    assert(out.exists(_._7), "fixture must produce boundary-crossing docs")
    assert(out.exists(!_._7), "and docs fully inside one window")
  }

  test("pk06 plan: prefix-sum windows partition by shard; the only unpartitioned window is O(shards)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val fixture = docs((0 until 100).map(i =>
      i.toLong -> Seq.fill(1 + i % 7)("w").mkString(" ")): _*)
    val df = CurationOps.concatCut(fixture)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size === 2, s"expected within-shard + shard-offset windows, got ${wins.size}")
    wins.foreach { w =>
      val partitioned = w.partitionSpec.nonEmpty
      // an unpartitioned window is allowed ONLY above the per-shard
      // aggregate (the O(shards) offset relation), never the corpus
      if (!partitioned)
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"corpus-wide unpartitioned window:\n$w")
      else
        assert(w.partitionSpec.map(_.toString).exists(_.contains("shard")),
          s"within-shard window must partition by shard:\n$w")
    }
  }

  test("pk05 manifest conserves docs, tokens, and id-sum; budget invariant visible in the artifact") {
    val fixture = docs((0 until 200).map(i =>
      i.toLong -> Seq.fill(1 + (i * 7) % 23)("w").mkString(" ")): _*)
    val budget = 40L
    val man = CurationOps.packManifest(fixture, shards = 4, budget = budget)
      .collect()
    assert(man.length <= 4 && man.nonEmpty)
    assert(man.map(_.getAs[Long]("n_docs")).sum === 200L)
    val expTokens = (0 until 200).map(i => (1 + (i * 7) % 23).toLong).sum
    assert(man.map(_.getAs[Long]("n_tokens")).sum === expTokens,
      "manifest token total must equal the corpus token total")
    assert(man.map(_.getAs[Long]("id_checksum")).sum === (0L until 200L).sum)
    man.foreach { r =>
      assert(r.getAs[Long]("max_bin_tokens") <= budget,
        "no oversized doc in this fixture, so every bin obeys the budget")
      assert(!r.getAs[Boolean]("has_overflow"))
      val fr = r.getAs[Double]("fill_rate")
      assert(fr > 0.0 && fr <= 1.0)
      // the bin count IS what fill_rate prices: tokens / (bins*budget)
      assert(fr === r.getAs[Long]("n_tokens").toDouble
        / (r.getAs[Long]("n_bins") * budget))
    }
    // an oversized doc flips the overflow flag in the artifact
    val over = CurationOps.packManifest(
      docs(1L -> Seq.fill(50)("w").mkString(" ")), shards = 1, budget = budget)
      .head()
    assert(over.getAs[Boolean]("has_overflow")
      && over.getAs[Long]("max_bin_tokens") === 50L)
  }

  test("p03 funnel: stages shrink monotonically and agree with the stage kernels") {
    val docs = graft.Tables.documents(spark, sf001)
    val rows = CurationOps.curationFunnel(docs).collect()
      .sortBy(_.getAs[Long]("stage_idx"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("raw", "quality", "exact_dedup", "decontaminate", "token_budget"))
    val counts = rows.map(_.getAs[Long]("docs"))
    val tokens = rows.map(_.getAs[Long]("tokens"))
    assert(counts.head === docs.count())
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"stages must shrink: ${counts.mkString(",")}")
    assert(tokens.zip(tokens.tail).forall { case (a, b) => b <= a })
    assert(counts.last > 0, "the pipeline must not empty the corpus")
    // hand-off consistency: stage 1 equals the t10 kernel's own count
    val q = CurationOps.qualityVerdict(docs)
      .filter(col("verdict") === "keep").count()
    assert(counts(1) === q)
  }

  test("t14 reweight: uniform-mixture rates via integer division, capped at 10000") {
    import spark.implicits._
    // 8 docs from A, 2 from B: total 10, k=2, target 5 each ->
    // rate_A = 10000*10 div (2*8) = 6250, rate_B capped at 10000
    val fixture = ((1L to 8L).map(i => (i, "A")) ++ Seq((9L, "B"), (10L, "B")))
      .toDF("doc_id", "source")
    val out = CurationOps.sourceReweight(fixture)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 10)
    assert(out.forall { case (_, s, rate, _) => rate == (if (s == "A") 6250L else 10000L) })
    // independent bucket recompute (java md5, not the SQL fold)
    def bucketOf(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w:$id".getBytes("UTF-8"))
      d.take(2).foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff)) % 10000
    }
    assert(out.forall { case (id, _, rate, kept) => kept == (bucketOf(id) < rate) })
    // every B doc is kept (rate 10000 covers the whole bucket space)
    assert(out.filter(_._2 == "B").forall(_._4))
  }

  test("t12 stratified sample is deterministic and honors per-lang rates") {
    val a = CurationOps.stratifiedSampleQ.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = CurationOps.stratifiedSampleQ.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
    // independent reference: recompute the salted-md5 bucket driver-side
    // (java MessageDigest, not the query's SQL fold) and replay the
    // per-language rate rule over the SOURCE table — exact set equality
    // proves both the bucket hash and the rate CASE, and that no kept
    // row is missing (a constant-zero bucket would fail here)
    def bucketOf(id: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8"))
      md5.take(2).foldLeft(0L)((acc, byt) => acc * 256 + (byt & 0xff)) % 100
    }
    val rates = CurationOps.SampleRates.toMap
    val expected = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .collect { case (id, lang) if bucketOf(id) < rates.getOrElse(lang, CurationOps.DefaultRate) =>
        (id, lang, bucketOf(id))
      }.toSet
    assert(a == expected)
  }

  test("t18 quantile ranks: valid range, floor semantics, and rank = strictly-below fraction") {
    val out = CurationOps.sourceQualityNorm(graft.Tables.documents(spark, sf001))
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, _, rk, _) => rk >= 0.0 && rk < 1.0 })
    assert(out.forall { case (_, _, rk, keep) =>
      keep == (rk >= CurationOps.SourceQualityFloor) })
    // each source's lowest quality tier sits at rank 0 (nothing below it)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val minQ = rows.map(_._2).min
      assert(rows.filter(_._2 == minQ).forall(_._3 == 0.0), s"source $src")
      // rank equals the exact strictly-below fraction, independently recomputed
      val n = rows.length.toDouble
      rows.foreach { case (_, q, rk, _) =>
        assert(rk === rows.count(_._2 < q) / n, s"source $src quality $q")
      }
    }
  }

  test("t20 source vocab: hand-computed TTR and hapax share; null text ignored") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a b", "s1"),
      (2L, null.asInstanceOf[String], "s1"), // must not contribute tokens
      (3L, "c", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.sourceVocab(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out == Map(
      "s1" -> ((3L, 2L, 1L, 2.0 / 3, 0.5)), // tokens a,a,b; types a,b; hapax b
      "s2" -> ((1L, 1L, 1L, 1.0, 1.0))))
  }

  test("t24 bigram NLL: hand-computed add-one probabilities, prefix counts, short docs keep a NULL row") {
    val out = TextOps.bigramNll(docs(
      (1L, "a b a b"), // bigrams (a,b)x2 (b,a)x1
      (2L, "a b"),     // bigram  (a,b)x1
      (3L, "x")))      // no bigram at all
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    // vocab {a,b,x} V=3; prefix counts c(a)=3 c(b)=1;
    // p(b|a) = (3+1)/(3+3) = 2/3, p(a|b) = (1+1)/(1+3) = 1/2
    val pBA = math.log(4.0 / 6.0)
    val pAB = math.log(2.0 / 4.0)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2.get - (-(2 * pBA + pAB) / 3)) < 1e-8)
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._2.get - (-pBA)) < 1e-8)
    assert(out(3L) == ((0L, None)), "tokenless-of-bigrams doc keeps a row")
  }

  test("t25 vocab growth: first-seen buckets, cumulative totals, value-range bucketing") {
    // 10 docs with ids 0..9 -> one per bucket
    val fixture = docs(
      (0L, "a b"), (1L, "a c"), (2L, "b c"), (3L, "a"), (4L, "d"),
      (5L, "a b c d"), (6L, "e e"), (7L, "a"), (8L, "b"), (9L, "f"))
    val out = TextOps.vocabGrowth(fixture).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.size == 10)
    // bucket 0 introduces {a,b}; 1 {c}; 4 {d}; 6 {e}; 9 {f}
    assert(out(0L) == ((1L, 2L, 2L, 2L, 2L)))
    assert(out(1L) == ((1L, 2L, 1L, 4L, 3L)))
    assert(out(2L) == ((1L, 2L, 0L, 6L, 3L)))
    assert(out(4L) == ((1L, 1L, 1L, 8L, 4L)))
    assert(out(6L) == ((1L, 2L, 1L, 14L, 5L)))
    // grand totals: 17 tokens, 6 distinct
    assert(out(9L) == ((1L, 1L, 1L, 17L, 6L)))
  }

  test("t26 lang confusion: planted disagreements land in the right cells with exact shares") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog of it", "en"),   // en detected, en declared
      (2L, "le chat et la mer", "en"),           // fr detected, en declared
      (3L, "der hund und die katze", "de"),      // de/de
      (4L, "zzz qqq", "zh"))                     // no marker -> 'und'
      .toDF("doc_id", "text", "lang")
    val out = TextOps.langConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out == Map(
      ("en", "en") -> ((1L, 2L, 0.5, true)),
      ("en", "fr") -> ((1L, 2L, 0.5, false)),
      ("de", "de") -> ((1L, 1L, 1.0, true)),
      ("zh", "und") -> ((1L, 1L, 1.0, false))))
  }

  test("pk02 pack stats: fill rates, bin closure, oversized-doc overflow flag") {
    val out = CurationOps.packStats(docs(
      (1L, "a a a"),                        // bin 0, fill 3
      (2L, "b b b"),                        // 3+3 > 5 -> bin 1
      (3L, "c"),                            // bin 1, fill 4
      (4L, "x x x x x x x")),               // 7 > 5: bin 2 alone, overflow
      shards = 1, budget = 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out == Map(
      (0L, 0L) -> ((1L, 3L, 0.6, false)),
      (0L, 1L) -> ((2L, 4L, 0.8, false)),
      (0L, 2L) -> ((1L, 7L, 1.4, true))))
  }

  test("t25 sparse ids: value-range buckets stay exact when ids are not contiguous") {
    // ids 0 and 99 with 10 buckets: ranges [0..9]->0, [90..99]->9
    val out = TextOps.vocabGrowth(docs((0L, "a"), (99L, "a b"))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set(0L, 9L))
    assert(out(0L) == ((1L, 1L, 1L)))
    assert(out(9L) == ((1L, 3L, 2L)))
  }

  test("pk04 mixture order: sqrt-proportional prefixes, dense ranks, keyed windows only") {
    import spark.implicits._
    // A has 16 docs, B has 4: sqrt weights 4 : 2, so every prefix cut
    // of the position axis holds A and B in ratio 2 : 1 — positions
    // depend only on (rank, n_src), not on which doc drew which rank
    val docs = ((0L until 16L).map(i => (i, "A")) ++
      (100L until 104L).map(i => (i, "B"))).toDF("doc_id", "source")
    val out = CurationOps.mixtureOrder(docs)
    assert(!out.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "pk04 must never run a corpus-wide window")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 20)
    // per-source ranks dense, positions strictly increasing in rank
    Seq(("A", 16L), ("B", 4L)).foreach { case (s, n) =>
      val rs = rows.filter(_._2 == s).sortBy(_._3)
      assert(rs.map(_._3).toSeq == (1L to n).toSeq)
      assert(rs.forall(_._4 == n))
      assert(rs.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
      // the closed form: position_i = (i - 0.5) / sqrt(n)
      rs.foreach { case (_, _, i, _, pos) =>
        assert(pos == (i - 0.5) / math.sqrt(n.toDouble)) }
    }
    // first 6 docs in training order: 4 of A, 2 of B (the 2:1 cut)
    val firstSix = rows.sortBy(t => (t._5, t._2, t._1)).take(6)
    assert(firstSix.count(_._2 == "A") == 4 && firstSix.count(_._2 == "B") == 2)
  }
}
