package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.pipeline.{HourlyAggregate, KeywordEmotionClassifier, LexiconSentimentClassifier}
import graft.streaming.HourlyClock

/** Property-based invariants (SURVEY.md §5-2): relational laws the
  * operators must hold for ANY input, not just the fixtures. Inputs are
  * ScalaCheck generators sampled from a fixed seed (deterministic CI);
  * Spark-facing properties use a bounded sample count since every check
  * is a full local job, pure functions get hundreds. */
class PropertySpec extends SparkSpec {

  /** Deterministic generator sampling. */
  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val sentimentGen: Gen[String] =
    Gen.oneOf("positive", "negative", "neutral-ish", "")
  private val emotionGen: Gen[String] = Gen.oneOf(KeywordEmotionClassifier.labels)
  private val topicGen: Gen[String] = Gen.oneOf("alpha", "beta", "gamma")

  private val enrichedRowsGen: Gen[List[(String, String, String)]] =
    Gen.nonEmptyListOf(Gen.zip(topicGen, sentimentGen, emotionGen))

  test("positivity is a probability and counts partition the input (any labels)") {
    import spark.implicits._
    samples(enrichedRowsGen, 8).foreach { rows =>
      val df = rows.toDF("topic", "sentiment", "emotion")
      val agg = HourlyAggregate.aggregate(df).collect()
      agg.foreach { r =>
        val p = r.getAs[Double]("positivity_rate")
        assert(p >= 0.0 && p <= 1.0, s"positivity out of range for $rows")
      }
      // per-topic counts partition the rows, and the emotion histogram
      // row-sums equal the same counts (pivot loses nothing)
      assert(agg.map(_.getAs[Long]("counts")).sum === rows.length)
      agg.foreach { r =>
        val emoSum = KeywordEmotionClassifier.labels.map(r.getAs[Long](_)).sum
        assert(emoSum === r.getAs[Long]("counts"))
      }
    }
  }

  test("classifier labels always in-vocabulary (any text)") {
    import spark.implicits._
    val textGen = Gen.listOfN(30,
      Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("spark", "slow", "love", "dup", " ", "")))
      .map(_.mkString(" "))
    samples(Gen.nonEmptyListOf(textGen), 8).foreach { texts =>
      val df = KeywordEmotionClassifier.annotate(
        LexiconSentimentClassifier.annotate(texts.toDF("text"), "text"), "text")
      df.select("sentiment", "emotion").collect().foreach { r =>
        assert(LexiconSentimentClassifier.labels.contains(r.getString(0)))
        assert(KeywordEmotionClassifier.labels.contains(r.getString(1)))
      }
    }
  }

  test("previousHour is total and matches minusHours formatting (any timestamp)") {
    val dtGen = for {
      y <- Gen.choose(1970, 2100); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); min <- Gen.choose(0, 59)
    } yield LocalDateTime.of(y, m, d, h, min)
    samples(dtGen, 500).foreach { now =>
      val (date, hour) = HourlyClock.previousHour(now)
      val prev = now.minusHours(1)
      assert(date === f"${prev.getYear}%04d-${prev.getMonthValue}%02d-${prev.getDayOfMonth}%02d")
      assert(hour === f"${prev.getHour}%02d")
    }
  }

  test("minhash: a planted exact duplicate is always a candidate with estimate 1 (any corpus)") {
    import spark.implicits._
    // distinct-ish docs of >= 5 tokens (shingling needs 3; near-identical
    // generated docs may legitimately also reach estimate 1.0)
    val docGen = Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd", "tok", "xy"))
      .map(_.mkString(" "))
    samples(Gen.nonEmptyListOf(docGen), 5).foreach { texts =>
      // plant an exact duplicate of the first doc at the end
      val corpus = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val dupId = texts.length.toLong
      val pairs = graft.operators.DedupOps.rawCandidatePairs(corpus)
      val matches = aggregate(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x)
      val ests = pairs
        .withColumn("e", matches.cast("double") / graft.operators.DedupOps.NumHashes)
        .select("doc_a", "doc_b", "e").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // the planted pair MUST surface (identical sigs share every band)
      // with estimate exactly 1.0 — a broken hash family / band join /
      // signature ordering fails this
      assert(ests.contains((0L, dupId)), s"planted dup missing from ${ests.keySet}")
      assert(ests((0L, dupId)) === 1.0)
      ests.values.foreach(e => assert(e >= 0.0 && e <= 1.0))
      // exact dedup groups the planted dup with its original
      val groups = corpus.groupBy(col("text"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      assert(groups.filter(col("rep") === 0L).collect().head.getAs[Long]("n") >= 2)
    }
  }

  test("config round-trip: every generated valid config parses to its fields") {
    val pathGen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
      .map(ps => "/" + ps.mkString("/"))
    val cfgGen = for {
      servers <- Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
        .map(_.map(_ + ":9092").mkString(","))
      topics <- Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))
      ckpt <- pathGen; lake <- pathGen; agg <- pathGen
    } yield (servers, topics.distinct, ckpt, lake, agg)
    samples(cfgGen, 200).foreach { case (servers, topics, ckpt, lake, agg) =>
      val json =
        s"""{"kafka_servers": "$servers", "topic_list": "${topics.mkString(",")}",
           | "checkpoint_path": "$ckpt", "lake_path": "$lake",
           | "aggregates_path": "$agg"}""".stripMargin
      val cfg = GraftConfig.fromJson(json)
      assert(cfg.kafkaServers === servers)
      assert(cfg.topics === topics)
      assert(cfg.lakePath === lake)
    }
  }

  test("pigeonhole widths cover the fingerprint exactly for every radius (any lanes)") {
    for (lanes <- 1 to 4; totalBits = 64 * lanes;
         r <- Seq(0, 1, 3, 7, 12, 24, totalBits - 1)) {
      val widths = operators.DedupOps.pigeonholeWidths(totalBits, r + 1)
      assert(widths.sum === totalBits, s"lanes=$lanes r=$r must tile the fingerprint")
      assert(widths.size === r + 1)
      assert(widths.min >= totalBits / (r + 1), s"lanes=$lanes r=$r floor width")
      assert(widths.max - widths.min <= 1, "widths differ by at most one bit")
    }
  }

  test("graft_eq_count agrees with the HOF fold on random signatures (any arrays)") {
    import spark.implicits._
    val sigGen = Gen.listOfN(8, Gen.chooseNum(0L, 3L)) // small domain forces matches
    val pairGen = Gen.zip(sigGen, sigGen)
    val pairs = samples(pairGen, 200)
    val df = pairs.toDF("a", "b")
    val both = df.select(
        call_function("graft_eq_count", col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).as("hof"))
      .collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // and against plain Scala
    pairs.zip(both).foreach { case ((a, b), r) =>
      assert(r.getInt(0) === a.zip(b).count { case (x, y) => x == y })
    }
  }

  /** Driver-side reference for the kernel's interpolated quantile —
    * Spark `percentile`'s rank arithmetic over the sorted multiset. */
  private def refCont(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val (lower, higher) = (math.floor(pos), math.ceil(pos))
    if (lower == higher) sorted(lower.toInt)
    else sorted(lower.toInt) * (higher - pos) + sorted(higher.toInt) * (pos - lower)
  }

  /** Reference for the discrete quantile — ⌈p·n⌉ 1-based rank. */
  private def refDisc(sorted: IndexedSeq[Double], p: Double): Double =
    sorted((math.ceil(p * sorted.length).toLong.max(1L) - 1).toInt)

  test("quantile kernel matches the sorted-multiset reference (any values, ties, negatives)") {
    import spark.implicits._
    val valuesGen: Gen[List[Double]] = Gen.nonEmptyListOf(
      Gen.oneOf(
        Gen.chooseNum(-100, 100).map(_.toDouble / 4), // ties + negatives
        Gen.chooseNum(-1e6, 1e6).map(_ / 1e3)))
    val probs = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    samples(valuesGen, 6).foreach { vs =>
      val df = vs.map(("g", _)).toDF("k", "v")
      val hist = graft.operators.QuantileKernel.cumulativeHistogram(df, "k", "v")
      val cont = graft.operators.QuantileKernel.contQuantiles(hist, "k", "v", probs)
        .collect().head
      val disc = graft.operators.QuantileKernel.discQuantiles(hist, "k", "v", probs)
        .collect().head
      val sorted = vs.sorted.toIndexedSeq
      probs.foreach { case (tag, p) =>
        assert(cont.getAs[Double](tag) === refCont(sorted, p),
          s"cont $tag over $vs")
        assert(disc.getAs[Double](tag) === refDisc(sorted, p),
          s"disc $tag over $vs")
      }
      assert(cont.getAs[Double]("__min") === sorted.head)
      assert(cont.getAs[Double]("__max") === sorted.last)
    }
  }

  test("interpolated boxplot matches the type-7 reference on any 4dp rate multiset (c20)") {
    import spark.implicits._
    // 4dp rates in [0,1] with ties — the serving domain
    val ratesGen: Gen[List[Int]] =
      Gen.nonEmptyListOf(Gen.chooseNum(0, 10000))
    samples(ratesGen, 6).foreach { scaled =>
      val processed = scaled.map(s => ("t", s.toDouble / 10000.0))
        .toDF("topic", "positivity_rate")
      val row = graft.serving.ChartQueries
        .positivityBoxplot(processed, interpolated = true).collect().head
      val sorted = scaled.sorted.map(_.toDouble).toIndexedSeq
      def q(p: Double) = refCont(sorted, p)
      val (q1s, q2s, q3s) = (q(0.25), q(0.5), q(0.75))
      assert(row.getAs[Double]("q1") === q1s / 10000.0, s"q1 over $scaled")
      assert(row.getAs[Double]("median") === q2s / 10000.0)
      assert(row.getAs[Double]("q3") === q3s / 10000.0)
      assert(row.getAs[Double]("lo") === sorted.head / 10000.0)
      assert(row.getAs[Double]("hi") === sorted.last / 10000.0)
      assert(row.getAs[Double]("iqr") === (q3s - q1s) / 10000.0)
      assert(row.getAs[Double]("whisker_lo")
        === math.max(sorted.head, q1s - 1.5 * (q3s - q1s)) / 10000.0)
      assert(row.getAs[Double]("whisker_hi")
        === math.min(sorted.last, q3s + 1.5 * (q3s - q1s)) / 10000.0)
    }
  }

  test("skew advisory invariants on any key multiset (q60)") {
    import spark.implicits._
    val eventsGen: Gen[List[Long]] =
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 30L))
    samples(eventsGen, 6).foreach { users =>
      val ev = users.map(u => ("t", u)).toDF("event_type", "user_id")
      val r = graft.operators.CoreQueries.skewAdvisoryReport(ev).collect().head
      val counts = users.groupBy(identity).values.map(_.size.toLong).toSeq
      val n = counts.sum; val k = counts.size.toLong
      val f2 = counts.map(c => c * c).sum
      assert(r.getAs[Long]("n_rows") === n && r.getAs[Long]("n_keys") === k)
      val skewExact = r.getAs[Double]("skew_exact")
      // Cauchy-Schwarz: F2*K >= N^2, so the ratio is >= 1 (two exact
      // integer products, one IEEE division — allow an ulp)
      assert(skewExact >= 1.0 - 1e-12, s"skew $skewExact over $users")
      assert(skewExact === f2.toDouble * k / (n * n))
      assert(r.getAs[Double]("max_share") === counts.max.toDouble / n)
      assert(r.getAs[Boolean]("needs_salt_exact") === (skewExact >= 4.0))
      assert(r.getAs[Boolean]("advisory_agrees") ===
        (r.getAs[Boolean]("needs_salt_exact") === r.getAs[Boolean]("needs_salt_est")))
    }
  }

  test("sessionize mergeChain equals reference gap grouping for any point set") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.OpenSession
    val gapMs = 10L
    // reference: sort the raw points, cut where the inter-point gap
    // reaches gapMs, summarize each run
    def reference(points: Seq[Long]): List[(Long, Long, Long)] = {
      val sorted = points.sorted
      if (sorted.isEmpty) Nil
      else sorted.tail.foldLeft(List((sorted.head, sorted.head, 1L))) {
        case ((s, e, n) :: done, t) =>
          if (t - e < gapMs) (s, math.max(e, t), n + 1) :: done
          else (t, t, 1L) :: (s, e, n) :: done
        case (Nil, t) => List((t, t, 1L))
      }.reverse
    }
    val pointsGen = Gen.listOf(Gen.chooseNum(0L, 200L))
    samples(pointsGen, 300).foreach { pts =>
      val got = StatefulOps
        .mergeChain(pts.map(t => OpenSession(t, t, 1L)), gapMs)
        .map(s => (s.startUs, s.lastUs, s.n))
      assert(got === reference(pts), s"diverged on $pts")
      // re-merging a merged list is a fixpoint (what each micro-batch
      // relies on when it folds state sessions with new points)
      val again = StatefulOps
        .mergeChain(got.map { case (s, e, n) => OpenSession(s, e, n) }, gapMs)
        .map(s => (s.startUs, s.lastUs, s.n))
      assert(again === got, s"not idempotent on $pts")
    }
  }

  test("mergeChain on mixed intervals+points equals the transitive-closure grouping") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.OpenSession
    val gapMs = 10L
    // independent reference: connect pieces whose distance is < gap
    // (overlap/containment = distance 0), take connected components —
    // for start-sorted intervals this closure is what the linear fold
    // claims to compute
    def closure(pieces: Seq[OpenSession]): List[(Long, Long, Long)] = {
      val ps = pieces.toIndexedSeq
      val parent = Array.tabulate(ps.size)(identity)
      def find(i: Int): Int = if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
      for (i <- ps.indices; j <- ps.indices if i < j) {
        val d = math.max(0L, math.max(ps(i).startUs, ps(j).startUs)
          - math.min(ps(i).lastUs, ps(j).lastUs))
        if (d < gapMs) parent(find(i)) = find(j)
      }
      ps.indices.groupBy(find).values.map { idx =>
        (idx.map(ps(_).startUs).min, idx.map(ps(_).lastUs).max,
          idx.map(ps(_).n).sum)
      }.toList.sortBy(t => (t._1, t._2))
    }
    val intervalGen = for {
      s <- Gen.chooseNum(0L, 200L)
      len <- Gen.chooseNum(0L, 40L)
      n <- Gen.chooseNum(1L, 5L)
    } yield OpenSession(s, s + len, n)
    val mixedGen = Gen.listOf(Gen.oneOf(intervalGen,
      Gen.chooseNum(0L, 200L).map(t => OpenSession(t, t, 1L))))
    samples(mixedGen, 300).foreach { pieces =>
      val got = StatefulOps.mergeChain(pieces, gapMs)
        .map(s => (s.startUs, s.lastUs, s.n))
      assert(got === closure(pieces), s"diverged on $pieces")
    }
  }

  test("transition chainStep equals the batch chain for any split + watermark schedule") {
    import java.sql.Timestamp
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.TypedEvent
    // events with possibly-tied timestamps; arrival order is a random
    // permutation; watermark after each batch is random but admissible
    // (never passes an event that has not arrived yet) and nondecreasing
    val eventsGen: Gen[List[TypedEvent]] = Gen.listOf(
      Gen.zip(Gen.chooseNum(0L, 50L), Gen.oneOf("A", "B", "C")))
      .map(_.zipWithIndex.map { case ((t, tp), i) =>
        TypedEvent(i.toLong, 1L, tp, new Timestamp(t))
      })
    val gen = for {
      evs <- eventsGen
      arrival <- Gen.const(evs).flatMap(e =>
        Gen.choose(0L, Long.MaxValue).map(s => new scala.util.Random(s).shuffle(e)))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, math.max(arrival.size, 1)))
    } yield (evs, arrival, cuts.sorted)
    samples(gen, 300).foreach { case (evs, arrival, cuts) =>
      val batches = // split the arrival order at the cut points
        (0 +: cuts :+ arrival.size).sliding(2)
          .map { case Seq(a, b) => arrival.slice(a, b) }.toList
      var wm = Long.MinValue
      var anchor: Option[TypedEvent] = None
      var pending: List[TypedEvent] = Nil
      var seen = 0
      val out = List.newBuilder[(Long, Long)]
      for (batch <- batches) {
        seen += batch.size
        // admissible watermark: at most min ts of the not-yet-arrived
        val future = arrival.drop(seen)
        val bound = if (future.isEmpty) 100L else future.map(_.ts.getTime).min
        wm = math.max(wm, bound - (bound % 7)) // an arbitrary lagging schedule
        val (pairs, a2, rest) = StatefulOps.chainStep(anchor, pending, batch, wm)
        out ++= pairs.map(p => (p._1.event_id, p._2.event_id))
        anchor = a2; pending = rest
      }
      // final flush: watermark passes everything (stream drains)
      val (lastPairs, _, rest) = StatefulOps.chainStep(anchor, pending, Nil, 1000L)
      assert(rest.isEmpty, "a drained stream must buffer nothing")
      out ++= lastPairs.map(p => (p._1.event_id, p._2.event_id))
      // reference: the batch twin's ordering over the full event list
      val ordered = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val expected = ordered.zip(ordered.drop(1))
        .map { case (f, t) => (f.event_id, t.event_id) }
      assert(out.result() === expected,
        s"diverged on arrival=${arrival.map(_.event_id)} cuts=$cuts")
    }
  }

  test("anomaly step equals the batch daily fold for any split + watermark schedule") {
    import java.sql.Timestamp
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{DayCount, TypedEvent}
    val DayMs = 86400000L
    val eventsGen: Gen[List[TypedEvent]] = Gen.listOf(
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 86399999L)))
      .map(_.zipWithIndex.map { case ((d, off), i) =>
        TypedEvent(i.toLong, 1L, "a", new Timestamp(d * DayMs + off))
      })
    val gen = for {
      evs <- eventsGen
      arrival <- Gen.choose(0L, Long.MaxValue)
        .map(s => new scala.util.Random(s).shuffle(evs))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, math.max(arrival.size, 1)))
    } yield (evs, arrival, cuts.sorted)
    samples(gen, 300).foreach { case (evs, arrival, cuts) =>
      val batches = (0 +: cuts :+ arrival.size).sliding(2)
        .map { case Seq(a, b) => arrival.slice(a, b) }.toList
      var wm = Long.MinValue
      var pending: List[DayCount] = Nil
      var hist: List[DayCount] = Nil
      var seen = 0
      val out = List.newBuilder[(String, Long, Long, Option[Double])]
      for (batch <- batches) {
        seen += batch.size
        // admissible watermark: at most the min ts of the not-yet-arrived
        val future = arrival.drop(seen)
        val bound = if (future.isEmpty) 20L * DayMs else future.map(_.ts.getTime).min
        wm = math.max(wm, bound - (bound % 777)) // arbitrary lagging schedule
        val days = batch.map(e => Math.floorDiv(e.ts.getTime, DayMs))
        val (rows, h2, rest) = StatefulOps.anomalyStep("a", pending, hist, days, wm)
        out ++= rows.map(r => (r.day, r.n, r.base_days, r.z))
        hist = h2; pending = rest
      }
      val (lastRows, _, rest) = StatefulOps.anomalyStep("a", pending, hist, Nil, 30L * DayMs)
      assert(rest.isEmpty, "a drained stream must buffer nothing")
      out ++= lastRows.map(r => (r.day, r.n, r.base_days, r.z))
      // independent reference: the batch fold over full per-day counts
      val ordered = evs.groupBy(e => Math.floorDiv(e.ts.getTime, DayMs))
        .map { case (d, es) => (d, es.size.toLong) }.toList.sortBy(_._1)
      var ref = List.empty[(Long, Long)]
      val expected = ordered.map { case (d, n) =>
        val base = ref.takeRight(7)
        val m = base.size.toLong
        val s1 = base.map(_._2).sum
        val s2 = base.map(c => c._2 * c._2).sum
        val z = if (m >= 2 && m * s2 > s1 * s1)
          Some((m * n - s1).toDouble / math.sqrt((m * s2 - s1 * s1).toDouble))
        else None
        ref = (ref :+ ((d, n))).takeRight(7)
        (java.time.LocalDate.ofEpochDay(d).toString, n, m, z)
      }
      assert(out.result() === expected, s"diverged on cuts=$cuts")
    }
  }

  test("space-saving merge: capacity, bounds, and >n/cap membership (any adds)") {
    import graft.streaming.StatefulOps
    val addsGen: Gen[List[Long]] =
      Gen.listOf(Gen.chooseNum(0L, 19L)) // user ids; heavy repeats likely
    samples(addsGen, 300).foreach { users =>
      val truth = users.groupBy(identity).map { case (u, xs) => u -> xs.size.toLong }
      val adds = truth.toSeq
      val cap = 6
      val sk = StatefulOps.spaceSavingMerge(Nil, adds, cap)
      assert(sk.size <= cap)
      assert(sk.map(_.user).distinct.size == sk.size, "one counter per user")
      sk.foreach { c =>
        val t = truth(c.user)
        assert(c.est - c.err <= t && t <= c.est,
          s"user ${c.user}: true $t outside [${c.est - c.err}, ${c.est}]")
      }
      // the Metwally guarantee: any user above n/cap holds a counter
      val n = users.size.toLong
      truth.filter(_._2 > n / cap).keys.foreach { u =>
        assert(sk.exists(_.user == u), s"heavy user $u evicted (n=$n)")
      }
    }
  }

  test("heavy-hitter step: exactly-once, bounds, guarantees for any split + schedule") {
    import java.sql.Timestamp
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{SsCounter, TypedEvent}
    val DayMs = 86400000L
    val cap = 6
    val k = 3
    val eventsGen: Gen[List[TypedEvent]] = Gen.listOf(
      Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 86399999L),
        Gen.chooseNum(0L, 19L)))
      .map(_.zipWithIndex.map { case ((d, off, u), i) =>
        TypedEvent(i.toLong, u, "a", new Timestamp(d * DayMs + off))
      })
    val gen = for {
      evs <- eventsGen
      arrival <- Gen.choose(0L, Long.MaxValue)
        .map(s => new scala.util.Random(s).shuffle(evs))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, math.max(arrival.size, 1)))
    } yield (evs, arrival, cuts.sorted)
    samples(gen, 300).foreach { case (evs, arrival, cuts) =>
      val batches = (0 +: cuts :+ arrival.size).sliding(2)
        .map { case Seq(a, b) => arrival.slice(a, b) }.toList
      var wm = Long.MinValue
      var pending = Map.empty[Long, List[SsCounter]]
      var seen = 0
      val out = List.newBuilder[StatefulOps.HeavyHitter]
      for (batch <- batches) {
        seen += batch.size
        val future = arrival.drop(seen)
        val bound = if (future.isEmpty) 10L * DayMs else future.map(_.ts.getTime).min
        wm = math.max(wm, bound - (bound % 777))
        val days = batch.map(e => (Math.floorDiv(e.ts.getTime, DayMs), e.user_id))
        val (rows, rest) = StatefulOps.hhStep("a", pending, days, wm, cap, k)
        out ++= rows
        pending = rest
      }
      val (lastRows, rest) = StatefulOps.hhStep("a", pending, Nil, 30L * DayMs, cap, k)
      assert(rest.isEmpty, "a drained stream must buffer nothing")
      out ++= lastRows
      val got = out.result()
      // exactly one emission per observed day, ranks 1..|rows|
      val truthByDay = evs.groupBy(e => Math.floorDiv(e.ts.getTime, DayMs))
        .map { case (d, es) =>
          java.time.LocalDate.ofEpochDay(d).toString ->
            es.groupBy(_.user_id).map { case (u, xs) => u -> xs.size.toLong } }
      assert(got.map(_.day).distinct.sorted === truthByDay.keys.toSeq.sorted)
      got.groupBy(_.day).foreach { case (day, rows) =>
        val truth = truthByDay(day)
        assert(rows.map(_.rank).sorted === (1 to rows.size).map(_.toLong))
        assert(rows.size == math.min(k, truth.size))
        rows.foreach { h =>
          val t = truth(h.user_id)
          assert(h.est - h.err <= t && t <= h.est,
            s"$day user ${h.user_id}: true $t outside [${h.est - h.err}, ${h.est}]")
          if (h.guaranteed)
            assert(truth.values.count(_ > t) < k,
              s"$day guaranteed user ${h.user_id} not in the true top-$k")
        }
        // a day under capacity is exact: the reference top-k verbatim
        if (truth.size <= cap) {
          val exact = truth.toSeq.sortBy { case (u, n) => (-n, u) }.take(k)
          assert(rows.sortBy(_.rank).map(h => (h.user_id, h.est)) === exact)
          assert(rows.forall(_.err == 0L))
        }
      }
    }
  }

  test("attribution step equals the batch session credits for any split + watermark schedule") {
    import java.sql.Timestamp
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{AttrEvent, SessAcc}
    val gapUs = 10000L // 10 ms sessions in the generator's ms domain
    val conv = "P"
    val eventsGen: Gen[List[AttrEvent]] = Gen.listOf(
      Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("A", "B", conv)))
      .map(_.zipWithIndex.map { case ((t, tp), i) =>
        AttrEvent(i.toLong, 1L, tp, new Timestamp(t))
      })
    val gen = for {
      evs <- eventsGen
      arrival <- Gen.const(evs).flatMap(e =>
        Gen.choose(0L, Long.MaxValue).map(s => new scala.util.Random(s).shuffle(e)))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, math.max(arrival.size, 1)))
    } yield (evs, arrival, cuts.sorted)
    def credits(closed: Seq[SessAcc]): Seq[(Long, String, String)] =
      closed.filter(_.convDone).flatMap(s => Seq(
        (s.startUs, "first_touch", s.first.get),
        (s.startUs, "last_touch", s.lastBefore.getOrElse("(direct)"))))
    samples(gen, 300).foreach { case (evs, arrival, cuts) =>
      val batches = (0 +: cuts :+ arrival.size).sliding(2)
        .map { case Seq(a, b) => arrival.slice(a, b) }.toList
      var wm = Long.MinValue
      var open: List[SessAcc] = Nil
      var pending: List[AttrEvent] = Nil
      var seen = 0
      val out = List.newBuilder[(Long, String, String)]
      for (batch <- batches) {
        seen += batch.size
        val future = arrival.drop(seen)
        val bound = if (future.isEmpty) 200L else future.map(_.ts.getTime).min
        wm = math.max(wm, bound - (bound % 7))
        val (closed, o2, rest) =
          StatefulOps.attrStep(open, pending, batch, wm, gapUs, conv)
        out ++= credits(closed)
        open = o2; pending = rest
      }
      val (lastClosed, o9, rest) =
        StatefulOps.attrStep(open, pending, Nil, 10000L, gapUs, conv)
      assert(rest.isEmpty && o9.isEmpty, "a drained stream must hold no state")
      out ++= credits(lastClosed)
      // reference: batch gaps-and-islands credits over the true order
      val ordered = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = ordered.foldLeft(List.empty[List[AttrEvent]]) {
        case (cur :: done, e)
          if e.ts.getTime * 1000L - cur.head.ts.getTime * 1000L < gapUs =>
          (e :: cur) :: done
        case (acc, e) => List(e) :: acc
      }.map(_.reverse).reverse
      val expected = sessions.flatMap { s =>
        val prn = s.indexWhere(_.event_type == conv)
        if (prn < 0) Nil
        else {
          val startUs = s.head.ts.getTime * 1000L
          val last = if (prn == 0) "(direct)" else s(prn - 1).event_type
          Seq((startUs, "first_touch", s.head.event_type),
            (startUs, "last_touch", last))
        }
      }
      assert(out.result().sortBy(c => (c._1, c._2)) ===
        expected.sortBy(c => (c._1, c._2)),
        s"diverged on arrival=${arrival.map(_.event_id)} cuts=$cuts")
    }
  }

  /** Single-machine reference k-core: node-at-a-time removal to the
    * same fixpoint (the k-core is the unique maximal subgraph with
    * min degree >= k, so membership is formulation-independent even
    * though round schedules differ). */
  private def refCore(pairs: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    var changed = true
    while (changed) {
      changed = false
      adj.keys.toSeq.foreach { v =>
        if (adj.contains(v) && adj(v).size < k) {
          adj(v).foreach(u => adj(u) -= v)
          adj -= v
          changed = true
        }
      }
    }
    adj.map { case (v, ns) => v -> ns.size }.toMap
  }

  private val graphGen: Gen[Set[(Long, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
      .map(_.filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet)

  test("s17 kCorePeel matches the node-at-a-time reference core on random graphs (any edges)") {
    import spark.implicits._
    samples(graphGen, 6).foreach { pairs =>
      val edges = (pairs.toSeq ++ pairs.toSeq.map(p => (p._2, p._1)))
        .toDF("src_id", "dst_id")
      Seq(2, 3).foreach { k =>
        val expect = refCore(pairs, k)
        val got = graft.operators.SimilarityOps.kCorePeel(edges, k, 20)
          .filter(col("in_core")).collect()
          .map(r => r.getLong(0) -> r.getLong(2).toInt).toMap
        assert(got === expect,
          s"k-core diverged at k=$k on $pairs: got $got expected $expect")
      }
    }
  }
}
