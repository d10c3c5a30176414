package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-fixture semantics for the temporal and vector operators —
  * the edge cases the synthetic corpus never produces (same-instant
  * as-of candidates, clickless users, tie-broken clicks, oversized
  * quantization inputs).
  */
class TemporalVectorSpec extends SparkSpec {

  private def events(rows: (Long, Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  test("as-of join is strict, picks the latest click, null when none") {
    val out = TemporalOps.asOfClickBeforePurchase(events(
      (1L, 7L, "click", 1000L),
      (2L, 7L, "click", 2000L),
      (3L, 7L, "purchase", 2000L),  // same instant as click 2 -> must take click 1
      (4L, 7L, "purchase", 2500L),  // latest prior is click 2
      (5L, 7L, "purchase", 500L),   // before any click -> null
      (6L, 8L, "purchase", 9000L),  // clickless user -> null
      (7L, 9L, "click", 1000L),
      (8L, 9L, "click", 1000L),     // same-instant clicks: max event_id wins
      (9L, 9L, "purchase", 1500L)))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(
      3L -> Some(1L), 4L -> Some(2L), 5L -> None, 6L -> None, 9L -> Some(8L)))
  }

  test("as-of gap is the exact microsecond difference") {
    val row = TemporalOps.asOfClickBeforePurchase(events(
      (1L, 1L, "click", 1000L), (2L, 1L, "purchase", 3500L)))
      .collect().head
    assert(row.getLong(4) == 1000L && row.getLong(5) == 2500L)
  }

  test("j02 windowed as-of: too-old clicks null out, they do not fall through") {
    val out = TemporalOps.asOfWithin(events(
      (1L, 1L, "click", 1000L),
      (2L, 1L, "click", 5000L),
      (3L, 1L, "purchase", 5500L),   // gap 500 <= 1000: matched to click 2
      (4L, 1L, "purchase", 9000L),   // latest click gap 4000 > 1000: null,
                                     // NOT the even-older click 1
      (5L, 2L, "purchase", 100L)),   // no click at all: null
      maxGapUs = 1000L)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(5))))).toMap
    assert(out == Map(3L -> Some((2L, 500L)), 4L -> None, 5L -> None))
  }

  test("j06 nearest as-of: min |gap| either side, exact tie prefers backward") {
    val out = TemporalOps.asOfNearestClick(events(
      (1L, 1L, "click", 1000L),
      (2L, 1L, "click", 4000L),
      (3L, 1L, "purchase", 1200L),  // back gap 200 < fwd gap 2800 -> click 1
      (4L, 1L, "purchase", 3900L),  // fwd gap 100 < back gap 2900 -> click 2
      (5L, 2L, "click", 1000L),
      (6L, 2L, "click", 3000L),
      (7L, 2L, "purchase", 2000L),  // exact tie 1000/1000 -> backward click 5
      (8L, 3L, "click", 500L),
      (9L, 3L, "purchase", 500L),   // same instant -> gap 0, backward
      (10L, 4L, "purchase", 42L)))  // clickless user -> null row kept
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(5), r.getString(6))))).toMap
    assert(out == Map(
      3L -> Some((1L, -200L, "back")),
      4L -> Some((2L, 100L, "fwd")),
      7L -> Some((5L, -1000L, "back")),
      9L -> Some((8L, 0L, "back")),
      10L -> None))
  }

  test("j06 nearest as-of: same-instant clicks reduce to max click_id first") {
    val out = TemporalOps.asOfNearestClick(events(
      (1L, 1L, "click", 1000L),
      (2L, 1L, "click", 1000L),     // same instant: id 2 wins the pre-reduce
      (3L, 1L, "purchase", 900L)))  // forward match across the reduce
      .collect().head
    assert(out.getLong(3) == 2L && out.getLong(5) == 100L
      && out.getString(6) == "fwd")
  }

  test("q34 session funnel: steps only count within one session") {
    val gap = 600000000L // 10 min
    val out = TemporalOps.sessionFunnel(events(
      // user 1: view+click+purchase inside one session -> all 3 steps
      (1L, 1L, "view", 0L), (2L, 1L, "click", 1000L), (3L, 1L, "purchase", 2000L),
      // user 2: view, then click only in a LATER session -> view twice,
      // but no session converts past step 1
      (4L, 2L, "view", 0L), (5L, 2L, "click", gap + 1000L), (6L, 2L, "view", gap + 2000L),
      // user 3: click precedes the view in-session -> stuck at view
      (7L, 3L, "click", 0L), (8L, 3L, "view", 1000L)),
      gapUs = gap)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // sessions reaching view: u1 s1, u2 s1, u2 s2, u3 s1 = 4
    assert(out == Map("view" -> 4L, "click" -> 1L, "purchase" -> 1L))
  }

  test("hourly deltas: first hour null, then count differences") {
    val fixture = events(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 1L),
      (3L, 1L, "view", 3600L * 1000000L),
      (4L, 1L, "view", 3600L * 1000000L + 5L),
      (5L, 1L, "view", 3600L * 1000000L + 9L),
      (6L, 1L, "click", 1L))
    val h = TemporalOps.hourlyDeltas(fixture)
      .collect()
      .map(r => (r.getString(0), r.getString(1).substring(11, 13)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(h(("view", "00")) == ((2L, None)))
    assert(h(("view", "01")) == ((3L, Some(1L))))
    assert(h(("click", "00")) == ((1L, None)))
  }

  test("q35 winsorize: exact discrete boundaries clamp the tails; all-null groups drop") {
    import spark.implicits._
    val ev = ((1 to 10).map(i => ("a", Option(i.toDouble))) ++
      Seq(("a", None), ("b", None), ("b", None)))
      .toDF("event_type", "value")
    val out = TemporalOps.winsorizedMeans(ev).collect()
    assert(out.length == 1, "the all-null group must drop, as in the oracle")
    val r = out.head
    // quantile_disc(0.1) over 1..10 = rank ceil(0.1*10)=1 -> 1.0; 0.9 -> rank 9 -> 9.0
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 9.0)
    assert(r.getLong(3) == 0L && r.getLong(4) == 1L) // only the 10 clamps
    assert(r.getDouble(5) == 5.4)                    // (1+..+9 + 9)/10
    assert(r.getLong(6) == 10L)                      // the NULL never counts
  }

  test("j03 interval join: hour-grid equi-join matches inclusive daily spans") {
    val h = 3600L * 1000000L
    val out = TemporalOps.intervalActivity(events(
      // user 1 (3 events -> the single top user): day-1 span 01:30..03:10
      (1L, 1L, "view", h + 1800L * 1000000L),
      (2L, 1L, "view", 2 * h + 300L * 1000000L),
      (3L, 1L, "view", 3 * h + 600L * 1000000L),
      // user 2: one event inside the span, one far outside
      (4L, 2L, "view", 2 * h),
      (5L, 2L, "view", 5 * h),
      // user 3: exactly at the span end — inclusive, must count
      (6L, 3L, "view", 3 * h + 600L * 1000000L),
      // user 1 day 2: a second single-event span
      (7L, 1L, "view", 24 * h + 1800L * 1000000L)), topUsers = 1)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      (1L, "1970-01-01 01:30:00", "1970-01-01 03:10:00") -> ((5L, 3L)),
      (1L, "1970-01-02 00:30:00", "1970-01-02 00:30:00") -> ((1L, 1L))))
  }

  test("q28 funnel: steps require strictly-later events, per user") {
    val out = TemporalOps.funnel(events(
      (1L, 1L, "view", 1000L), (2L, 1L, "click", 2000L), (3L, 1L, "purchase", 3000L),
      (4L, 2L, "click", 1000L), (5L, 2L, "view", 2000L), (6L, 2L, "purchase", 3000L),
      (7L, 3L, "view", 1000L), (8L, 3L, "click", 1000L),   // same instant: not after
      (9L, 4L, "click", 1000L), (10L, 4L, "purchase", 2000L))) // never viewed
      .collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // user 1 completes; user 2 views but never clicks AFTER the view
    // (their purchase therefore cannot count); user 3's same-instant
    // click is not strictly later; user 4 never views
    assert(out("view") == ((3L, None)))
    assert(out("click") == ((1L, Some(1.0 / 3))))
    assert(out("purchase") == ((1L, Some(1.0))))
  }

  test("q30 retention: cohorts anchor at first-seen week, offsets count active weeks") {
    val wk = 604800L * 1000000L // one week in micros; epoch is a Thursday,
    val mon = 4L * 86400L * 1000000L // so Monday-align to avoid truncation surprises
    val out = TemporalOps.retention(events(
      (1L, 1L, "view", mon),              // user 1 cohort week 0
      (2L, 1L, "view", mon + wk),         //   active week 1
      (3L, 1L, "click", mon + wk + 5L),   //   same week: one distinct user
      (4L, 2L, "view", mon + wk),         // user 2 cohort week 1
      (5L, 2L, "view", mon + 2 * wk)))    //   active week 2
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("1970-01-05", 0L) -> 1L, ("1970-01-05", 1L) -> 1L,
      ("1970-01-12", 0L) -> 1L, ("1970-01-12", 1L) -> 1L))
  }

  test("v03 centroid outliers: the far vector is flagged, inliers are not") {
    import spark.implicits._
    val inliers = (0 until 5).map(i => (i.toLong, 0, Seq(0.0, 0.0))) ++
      (5 until 10).map(i => (i.toLong, 0, Seq(2.0, 2.0)))
    val far = Seq((99L, 0, Seq(100.0, 100.0)))
    val out = VectorOps.centroidOutliers(
      (inliers ++ far).toDF("vec_id", "label", "v"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(4))).toMap
    // centroid = (10, 10); far sits at 90*sqrt(2) with z ≈ 3
    assert(math.abs(out(99L)._1 - 90 * math.sqrt(2)) < 1e-9)
    assert(out(99L)._2)
    assert((0 until 10).forall(i => !out(i.toLong)._2))
    assert(out.size == 11)
  }

  test("int8 quantization: exact codes, checksum, and error bound") {
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0, -0.5, 0.25, 0.0)), (2L, Seq(0.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "v")
    val out = VectorOps.quantized(emb, dim = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    val s = 1.0 / 127
    // codes: 127, floor(-63.5+0.5)=-63, floor(31.75+0.5)=32, 0
    assert(out(1L)._2 == 127L - 63L + 32L)
    assert(out(1L)._1 == s)
    val mseRef = (Seq(1.0, -0.5, 0.25, 0.0) zip Seq(127.0, -63.0, 32.0, 0.0))
      .map { case (x, q) => val e = x - q * s; e * e }.sum / 4
    assert(math.abs(out(1L)._3 - mseRef) < 1e-15)
    assert(out(1L)._3 <= (s / 2) * (s / 2)) // max per-element error s/2
    assert(out(2L) == ((0.0, 0L, 0.0)))     // zero vector: zero codes, zero error
  }

  test("label centroids: componentwise means per label") {
    import spark.implicits._
    val emb = Seq(
      (0, Seq(1.0, 3.0)), (0, Seq(3.0, 5.0)), (1, Seq(10.0, 0.0)))
      .toDF("label", "v")
    val out = VectorOps.labelCentroids(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out == Map(
      (0, 0) -> ((2.0, 2L)), (0, 1) -> ((4.0, 2L)),
      (1, 0) -> ((10.0, 1L)), (1, 1) -> ((0.0, 1L))))
  }

  test("q37 SCD2: consecutive repeats collapse, spans chain, current state open") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val ev = Seq(
      (1L, 10L, t(100), "a"),
      (2L, 10L, t(200), "a"),  // repeat → collapses into the first run
      (3L, 10L, t(300), "b"),
      (4L, 10L, t(400), "a"),  // back to a: a NEW run, not merged
      (5L, 20L, t(150), "x"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = TemporalOps.scd2Intervals(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out === Set(
      (10L, "a", 100000000L, 300000000L),
      (10L, "b", 300000000L, 400000000L),
      (10L, "a", 400000000L, -1L),
      (20L, "x", 150000000L, -1L)))
  }

  test("q56 SCD2 merge: merge over a cutoff equals the from-scratch derivation") {
    val all = events(
      (1L, 10L, "a", 100L), (2L, 10L, "a", 200L), (3L, 10L, "b", 300L),
      (4L, 10L, "b", 500L),  // delta continues b → not a change
      (5L, 10L, "a", 600L),  // first delta change → closes the open b
      (6L, 20L, "x", 150L),  // dim-only user: open interval passes through
      (7L, 30L, "p", 450L),  // user new in the delta
      (8L, 30L, "q", 450L),  // same-instant change: event_id order holds
      (9L, 40L, "m", 100L),
      (10L, 40L, "m", 700L)) // delta all-equal → open m stays open
    val cut = 400L
    val dim = TemporalOps.scd2Intervals(all.filter(unix_micros(col("ts")) < cut))
    val merged = TemporalOps.scd2Merge(dim, all.filter(unix_micros(col("ts")) >= cut))
    def canon(df: DataFrame): Set[(Long, String, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val m = canon(merged)
    assert(m === canon(TemporalOps.scd2Intervals(all)))
    assert(m.contains((10L, "b", 300L, 600L)))  // closed at the FIRST delta change
    assert(m.contains((10L, "a", 600L, -1L)))
    assert(m.contains((20L, "x", 150L, -1L)))
    assert(m.contains((40L, "m", 100L, -1L)))   // continuation created no interval
    assert(m.contains((30L, "p", 450L, 450L)))  // tie pair: p run is zero-length
    assert(m.contains((30L, "q", 450L, -1L)))
    assert(m.size === 7)                        // 10:a[100,300) + the six above
  }

  test("j04 point-in-time: purchases resolve to the containing state interval") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val ev = Seq(
      (1L, 10L, t(100), "click"),     // state click from 100
      (2L, 10L, t(300), "view"),      // state view from 300
      (3L, 10L, t(50),  "purchase"),  // before any state → null
      (4L, 10L, t(200), "purchase"),  // inside click run
      (5L, 10L, t(300), "purchase"),  // boundary: belongs to the NEW state
      (6L, 10L, t(400), "purchase"))  // open view interval
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = TemporalOps.pointInTimeState(ev).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out === Map(
      3L -> ((null, -1L)),
      4L -> (("click", 100000000L)),
      5L -> (("view", 300000000L)),
      6L -> (("view", 300000000L))))
  }

  test("q36 EWMA: exact weighted means, series starts renormalize") {
    import spark.implicits._
    val h = Seq(
      ("click", "h1", 4L), ("click", "h2", 2L), ("click", "h3", 1L),
      ("view", "h1", 10L))
      .toDF("event_type", "date_hour", "n")
    val out = TemporalOps.ewmaOverCounts(h)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // β = 1/2, powers exact: hand-computed values are exact doubles
    assert(out(("click", "h1")) === 4.0)
    assert(out(("click", "h2")) === (2.0 + 0.5 * 4) / 1.5)
    assert(out(("click", "h3")) === (1.0 + 0.5 * 2 + 0.25 * 4) / 1.75)
    assert(out(("view", "h1")) === 10.0)
  }

  test("v04 PQ: codebook members self-assign at zero distance; shape is n×blocks") {
    import spark.implicits._
    // 4-dim vectors, 2 blocks of 2, 2 codes: codebook = vecs 0 and 1
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 5.0, 5.0)),
      (1L, Seq(0.0, 1.0, -5.0, -5.0)),
      (2L, Seq(0.9, 0.1, -4.0, -6.0))  // block0 → code 0, block1 → code 1
    ).toDF("vec_id", "v")
    val out = VectorOps.pqAssign(emb, blocks = 2, codes = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getDouble(3)))).toMap
    assert(out.size === 6, "one row per (vector, block)")
    // codebook vectors reconstruct themselves exactly
    assert(out((0L, 0)) === ((0, 0.0)))
    assert(out((0L, 1)) === ((0, 0.0)))
    assert(out((1L, 0)) === ((1, 0.0)))
    assert(out((1L, 1)) === ((1, 0.0)))
    // mixed vector picks the nearer sub-codebook entry per block
    assert(out((2L, 0))._1 === 0)
    assert(out((2L, 1))._1 === 1)
    assert(out((2L, 0))._2 > 0.0 && out((2L, 1))._2 > 0.0)
  }

  test("v04 PQ: equidistant blocks tie-break to the smaller code") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0, 1.0)),   // code 0
      (1L, Seq(-1.0, -1.0)), // code 1
      (2L, Seq(0.0, 0.0))    // exactly between both → code 0
    ).toDF("vec_id", "v")
    val out = VectorOps.pqAssign(emb, blocks = 1, codes = 2, dim = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(2L) === 0)
  }

  test("q38 transitions: tie-broken successors, per-from probabilities sum to 1") {
    val out = TemporalOps.transitionMatrix(events(
      (1L, 1L, "A", 1000L), (2L, 1L, "B", 2000L),
      (3L, 1L, "A", 3000L), (4L, 1L, "C", 4000L),
      (5L, 2L, "A", 1000L), (6L, 2L, "B", 2000L),
      // same-instant pair: event_id must order X before Y in both
      // engines, so (X,Y) is counted and (Y,X) is not
      (10L, 3L, "X", 1000L), (11L, 3L, "Y", 1000L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out == Map(
      ("A", "B") -> (2L, 2.0 / 3), ("A", "C") -> (1L, 1.0 / 3),
      ("B", "A") -> (1L, 1.0), ("X", "Y") -> (1L, 1.0)))
  }

  test("v06 centroid drift: hand-computed shift and cosine; single-batch labels drop") {
    import spark.implicits._
    val emb = Seq(
      (0L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(1.0, 0.0)), // even batch, centroid (1,0)
      (1L, 0, Seq(0.0, 1.0)), (3L, 0, Seq(0.0, 1.0)), // odd batch, centroid (0,1)
      (4L, 1, Seq(5.0, 5.0)))                         // label 1 has no odd batch
      .toDF("vec_id", "label", "v")
    val out = VectorOps.centroidDrift(emb).collect()
    assert(out.length == 1, "label without both batches must drop")
    val r = out.head
    assert(r.getInt(0) == 0 && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - math.sqrt(2)) < 1e-12) // orthogonal unit centroids
    assert(r.getDouble(4) == 0.0)
  }

  test("v05 trunc recall: zero-tail embeddings rank identically -> recall 1") {
    // planted fixture: tails zeroed, so the truncated cosine is
    // bitwise the full cosine (appending 0.0 product terms leaves the
    // fold-left sum unchanged) and both rankings agree exactly
    val embZ = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v0"))
      .withColumn("v", concat(slice(col("v0"), 1, VectorOps.TruncDims),
        array_repeat(lit(0.0d), VectorOps.TruncDims)))
      .select("vec_id", "v")
    val out = VectorOps.truncRecall(embZ).collect()
    assert(out.length == 8)
    assert(out.forall(r =>
      r.getLong(1) == VectorOps.RecallK && r.getDouble(2) == 1.0))
    // real corpus: hits bounded by k, recall = hits/k
    val real = VectorOps.truncRecall(graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")))
      .collect()
    assert(real.forall { r =>
      val h = r.getLong(1)
      h >= 0 && h <= VectorOps.RecallK &&
        r.getDouble(2) == h.toDouble / VectorOps.RecallK
    })
  }

  test("v08 matryoshka curve: zero-tail corpus is exact at every dim; bounds hold") {
    // only the first 8 dims are nonzero, so EVERY prefix >= 8 ranks
    // identically to full precision -> recall 1.0 across the curve
    val embZ = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v0"))
      .withColumn("v", concat(slice(col("v0"), 1, 8),
        array_repeat(lit(0.0d), graft.functions.VectorFunctions.Dim - 8)))
      .select("vec_id", "v")
    val out = VectorOps.matryoshkaRecall(embZ).collect()
    assert(out.length == 8 * VectorOps.MatryoshkaDims.size)
    assert(out.forall(r => r.getDouble(3) == 1.0 && r.getLong(2) == VectorOps.RecallK))

    // real corpus: one row per (query, dim), hits within [0, k]
    val real = VectorOps.matryoshkaRecallQ.run(spark, sf001).collect()
    assert(real.length == 8 * VectorOps.MatryoshkaDims.size)
    assert(real.forall { r =>
      val h = r.getLong(2)
      h >= 0 && h <= VectorOps.RecallK &&
        r.getDouble(3) == h.toDouble / VectorOps.RecallK
    })
  }

  /** Daily-count fixture for q39: `counts(d)` events of one type on
    * day d (epoch day d, one event per microsecond from midnight). */
  private def dailyEvents(eventType: String, counts: Seq[(Int, Int)]): DataFrame =
    events(counts.flatMap { case (day, k) =>
      (0 until k).map { i =>
        (day * 1000L + i, 1L, eventType, day * 86400000000L + i * 1000L)
      }
    }: _*)

  test("q39 anomaly: z exact from integer moments; m<2 and zero variance gate to NULL") {
    // type a: baseline 1,3,2 then a spike of 10
    //   day4: m=3, S1=6, S2=14 -> z = (3*10-6)/sqrt(3*14-36) = 24/sqrt(6)
    //   day3: m=2, S1=4, S2=10 -> z = (2*2-4)/sqrt(20-16) = 0
    val a = TemporalOps.dailyAnomaly(
      dailyEvents("a", Seq(1 -> 1, 2 -> 3, 3 -> 2, 4 -> 10)))
      .collect().map(r => r.getString(1) -> ((r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))).toMap
    assert(a("1970-01-02") == ((0L, None, false)))        // m=0: no baseline
    assert(a("1970-01-03") == ((1L, None, false)))        // m=1: gated
    assert(a("1970-01-04") == ((2L, Some(0.0), false)))
    assert(a("1970-01-05") == ((3L, Some(24.0 / math.sqrt(6.0)), true)))

    // type b: constant baseline -> m*S2 == S1^2 (zero variance) -> NULL
    // even for a 10x spike; decide-before-divide, never Inf/NaN
    val b = TemporalOps.dailyAnomaly(
      dailyEvents("b", Seq(1 -> 5, 2 -> 5, 3 -> 5, 4 -> 50)))
      .collect().map(r => r.getString(1) -> ((
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))).toMap
    assert(b("1970-01-04") == ((None, false)))
    assert(b("1970-01-05") == ((None, false)))
  }

  test("q39 anomaly: the +-3 sigma boundary is inclusive on both sides") {
    // baseline {4,6}: m=2, S1=10, sqrt(m*S2-S1^2) = sqrt(4) = 2 exactly,
    // so z = (2n-10)/2 = n-5 with NO float error at the boundary
    def zOf(spike: Int): (Option[Double], Boolean) = {
      val r = TemporalOps.dailyAnomaly(
        dailyEvents("c", Seq(1 -> 4, 2 -> 6, 3 -> spike)))
        .collect().find(_.getString(1) == "1970-01-04").get
      (if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5))
    }
    assert(zOf(8) == ((Some(3.0), true)))   // exactly +3 sigma -> anomaly
    assert(zOf(7) == ((Some(2.0), false)))  // just under
    assert(zOf(2) == ((Some(-3.0), true)))  // exactly -3 sigma -> anomaly
  }

  test("q43 change point: argmax split by exact means; equal shifts tie-break earlier") {
    // counts 2,2,10,10 over four days: split after day 2 maximizes
    //   k=1: |20/3 - 2| = 14/3;  k=2: |10 - 2| = 8;  k=3: |10 - 14/3| = 16/3
    val out = TemporalOps.changePoint(
      dailyEvents("a", Seq(1 -> 2, 2 -> 2, 3 -> 10, 4 -> 10)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(1) == "1970-01-03" && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 10.0 && r.getDouble(5) == 8.0)

    // counts 1,3,1: both splits shift by exactly 1 -> earlier day wins
    val tie = TemporalOps.changePoint(
      dailyEvents("b", Seq(1 -> 1, 2 -> 3, 3 -> 1)))
      .collect().head
    assert(tie.getString(1) == "1970-01-02" && tie.getDouble(5) == 1.0)
  }

  test("q40 lift: hand-computed baskets, absent pair emits no row, duplicates collapse") {
    val day = 86400000000L
    val rows = Seq(
      // basket (u1, d1): {a, b} — with a duplicate 'a' event that must
      // collapse into the basket, not inflate n_ab
      (1L, 1L, "a", day + 1000L), (2L, 1L, "a", day + 2000L),
      (3L, 1L, "b", day + 3000L),
      // basket (u2, d1): {a, b, c}
      (4L, 2L, "a", day + 1000L), (5L, 2L, "b", day + 2000L),
      (6L, 2L, "c", day + 3000L),
      // basket (u3, d1): {a}
      (7L, 3L, "a", day + 1000L),
      // basket (u3, d2): {d} — 'd' co-occurs with nothing
      (8L, 3L, "d", 2 * day + 1000L))
    val out = TemporalOps.cooccurrenceLift(events(rows: _*))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // n_baskets=4; singles a=3, b=2, c=1, d=1
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b")) == ((2L, 3L, 2L, 4L, 8.0 / 6.0)))
    assert(out(("a", "c")) == ((1L, 3L, 1L, 4L, 4.0 / 3.0)))
    assert(out(("b", "c")) == ((1L, 2L, 1L, 4L, 2.0)))
  }

  test("q45 attribution: first/last touch per converting session, direct and multi-session cases") {
    val gap = 600000000L // the 10-minute session gap
    val out = TemporalOps.attribution(events(
      // user 1, one session: view -> click -> purchase -> purchase
      // (second purchase must not double-count the session)
      (1L, 1L, "view", 0L), (2L, 1L, "click", 1000000L),
      (3L, 1L, "purchase", 2000000L), (4L, 1L, "purchase", 3000000L),
      // user 2: purchase OPENS the session -> last touch '(direct)'
      (5L, 2L, "purchase", 0L), (6L, 2L, "view", 1000L),
      // user 3: session 1 has no purchase; session 2 click -> purchase
      (7L, 3L, "view", 0L),
      (8L, 3L, "click", gap + 1000000L), (9L, 3L, "purchase", gap + 2000000L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("first_touch", "view") -> 1L, ("first_touch", "purchase") -> 1L,
      ("first_touch", "click") -> 1L,
      ("last_touch", "click") -> 2L, ("last_touch", "(direct)") -> 1L))
  }

  test("q46 autocorrelation: exact alternating series, zero-fill, degenerate gates") {
    // type a: counts 1,2,1,2,1,2,1,2 over 8 consecutive days
    //   lag 1: x/y perfectly anti-aligned -> r = -1 over 7 pairs
    //   lag 7: only one pair -> NULL (n_pairs < 2)
    val a = dailyEvents("a", (1 to 8).map(d => d -> (if (d % 2 == 1) 1 else 2)))
    // type b: days 1 and 3 with 2 events each, day 2 MISSING -> the
    // zero-fill makes the series 2,0,2 and lag-1 r = -1 over 2 pairs
    // (without the fill both pairs would be (2,2) -> zero variance)
    val b = dailyEvents("b", Seq(1 -> 2, 3 -> 2))
    // type c: constant series -> zero variance -> NULL
    val c = dailyEvents("c", Seq(1 -> 1, 2 -> 1, 3 -> 1))
    val out = TemporalOps.autocorrelation(a.unionByName(b).unionByName(c))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    // dx = dy = 12: sqrt(12)·sqrt(12) is 12+1ulp in IEEE, so compare
    // with tolerance; the type-b case below is exact (sqrt(4) = 2)
    assert(out(("a", 1L))._1 == 7L)
    assert(math.abs(out(("a", 1L))._2.get + 1.0) < 1e-12)
    assert(out(("a", 7L)) == ((1L, None)))
    assert(out(("b", 1L)) == ((2L, Some(-1.0))))
    assert(!out.contains(("b", 7L)), "3-day series has no lag-7 pairs at all")
    assert(out(("c", 1L)) == ((2L, None)))
  }

  test("q47 cohort matrix: weekly cohorts, mid-week activity truncates to Monday") {
    def us(date: String): Long =
      java.time.LocalDate.parse(date).toEpochDay * 86400000000L
    val out = TemporalOps.cohortRetention(events(
      // u1: first week 2024-01-01, active weeks 0, 1 (via Tuesday the 9th), 2
      (1L, 1L, "view", us("2024-01-01")),
      (2L, 1L, "view", us("2024-01-09")),
      (3L, 1L, "view", us("2024-01-15")),
      // u2: only week 0
      (4L, 2L, "view", us("2024-01-01") + 1000L),
      // u3: first seen week 1, active weeks 1 and 2
      (5L, 3L, "view", us("2024-01-08")),
      (6L, 3L, "view", us("2024-01-16"))))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 1.0)),
      ("2024-01-01", 1L) -> ((1L, 2L, 0.5)),
      ("2024-01-01", 2L) -> ((1L, 2L, 0.5)),
      ("2024-01-08", 0L) -> ((1L, 1L, 1.0)),
      ("2024-01-08", 1L) -> ((1L, 1L, 1.0))))
  }

  test("j05 forward as-of: strict, earliest later purchase, min-id tie, null when none") {
    val out = TemporalOps.asOfPurchaseAfterClick(events(
      (1L, 7L, "click", 1000L),
      (2L, 7L, "purchase", 1000L),  // same instant -> NOT strictly later
      (3L, 7L, "purchase", 2000L),  // earliest strictly later -> match
      (4L, 7L, "purchase", 3000L),  // later still -> ignored
      (5L, 7L, "click", 2500L),     // matches purchase 4
      (6L, 8L, "click", 9000L),     // no later purchase -> null
      (7L, 9L, "purchase", 500L),
      (8L, 9L, "click", 100L),
      (9L, 9L, "purchase", 500L)))  // same-instant purchases: min id 7 wins
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(out == Map(
      1L -> Some(3L), 5L -> Some(4L), 6L -> None, 8L -> Some(7L)))
  }

  test("j05 gap is the exact forward microsecond difference") {
    val row = TemporalOps.asOfPurchaseAfterClick(events(
      (1L, 1L, "click", 1000L), (2L, 1L, "purchase", 3500L)))
      .collect().head
    assert(row.getLong(4) == 3500L && row.getLong(5) == 2500L)
  }

  test("q49 inter-event gaps: band edges closed-open, later-event attribution, exact stats") {
    val s = 1000000L
    val out = TemporalOps.interEventGaps(events(
      // u1: A at 0, B at 0.5s (gap 0.5s -> 00), A at 2s (gap 1.5s -> 01),
      //     C at 20min (gap ~20min -> 03)
      (1L, 1L, "A", 0L), (2L, 1L, "B", 500000L), (3L, 1L, "A", 2 * s),
      (4L, 1L, "C", 1200 * s),
      // u2: single event -> no gap row at all
      (5L, 2L, "A", 0L),
      // u3: gap of exactly 1s lands in 01 (closed-open edge)
      (6L, 3L, "B", 0L), (7L, 3L, "B", s)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map(
      ("B", "00_lt_1s") -> ((1L, 500000.0, 500000L, 500000L)),
      ("A", "01_1s_1m") -> ((1L, 1500000.0, 1500000L, 1500000L)),
      ("B", "01_1s_1m") -> ((1L, 1000000.0, 1000000L, 1000000L)),
      ("C", "03_ge_10m") -> ((1L, 1198 * s.toDouble, 1198 * s, 1198 * s))))
  }

  test("v10 centroid separation: hand-computed L2 and cosine between label centroids") {
    import spark.implicits._
    val out = VectorOps.centroidSeparation(Seq(
      (0, Seq(1.0, 0.0)), (0, Seq(3.0, 0.0)), // centroid (2, 0)
      (1, Seq(0.0, 2.0)))                     // centroid (0, 2)
      .toDF("label", "v"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getInt(0) == 0 && r.getInt(1) == 1)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == math.sqrt(8.0))
    assert(r.getDouble(5) == 0.0)
  }

  test("q48 conversion latency: band edges, exact means, non-converting sessions drop") {
    val gap = 600000000L
    val m = 60000000L
    val out = TemporalOps.conversionLatency(events(
      // u1: purchase 30s after session start -> 00_lt_1m, lat 30s
      (1L, 1L, "view", 0L), (2L, 1L, "purchase", 30000000L),
      // u2: chained session, first purchase at 4m -> 01_1m_5m
      (3L, 2L, "view", 0L), (4L, 2L, "click", 2 * m),
      (5L, 2L, "purchase", 4 * m), (6L, 2L, "purchase", 5 * m),
      // u3: direct purchase -> lat 0 -> 00_lt_1m
      (7L, 3L, "purchase", 0L),
      // u4: never converts -> no row
      (8L, 4L, "view", 0L),
      // u1 second session, converts at exactly 1m -> band boundary
      // is closed-open: 60s lands in 01_1m_5m
      (9L, 1L, "view", gap + m), (10L, 1L, "purchase", gap + 2 * m)))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == Map(
      "00_lt_1m" -> ((2L, 15000000.0, 0L, 30000000L)),
      "01_1m_5m" -> ((2L, (4 * m + m) / 2.0, m, 4 * m))))
  }

  test("q50 new/returning: first-ever day counts as new, conservation, cumulative total") {
    val day = 86400000000L
    val out = TemporalOps.dailyNewReturning(events(
      // day 1: users 1, 2 both new
      (1L, 1L, "view", day), (2L, 2L, "view", day + 1000L),
      // duplicate same-day activity must not double-count user 1
      (3L, 1L, "click", day + 2000L),
      // day 2: user 1 returns, user 3 is new
      (4L, 1L, "view", 2 * day), (5L, 3L, "view", 2 * day + 1000L),
      // day 4 (day 3 empty): all three return, nobody new
      (6L, 1L, "view", 4 * day), (7L, 2L, "view", 4 * day + 1000L),
      (8L, 3L, "view", 4 * day + 2000L)))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == Map(
      "1970-01-02" -> ((2L, 2L, 0L, 2L)),
      "1970-01-03" -> ((2L, 1L, 1L, 3L)),
      "1970-01-05" -> ((3L, 0L, 3L, 3L))))
  }

  test("round-8 operators are total on empty inputs") {
    import spark.implicits._
    val noEvents = Seq.empty[(Long, Long, String, Long)]
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    assert(TemporalOps.attribution(noEvents).count() == 0)
    assert(TemporalOps.autocorrelation(noEvents).count() == 0)
    assert(TemporalOps.cohortRetention(noEvents).count() == 0)
    assert(TemporalOps.conversionLatency(noEvents).count() == 0)
    assert(TemporalOps.asOfPurchaseAfterClick(noEvents).count() == 0)
    assert(TemporalOps.interEventGaps(noEvents).count() == 0)
    assert(TemporalOps.dailyNewReturning(noEvents).count() == 0)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.bigramNll(noDocs).count() == 0)
    assert(TextOps.vocabGrowth(noDocs).count() == 0)
    assert(TextOps.langConfusion(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")).count() == 0)
    val noEmb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    assert(SimilarityOps.knnGraphExact(noEmb).count() == 0)
    assert(SimilarityOps.knnGraphLsh(noEmb).count() == 0)
    assert(SimilarityOps.portableKnn(noEmb).count() == 0)
    assert(SimilarityOps.annRecall(noEmb).count() == 0)
    assert(SimilarityOps.graphRecall(noEmb).count() == 0)
    assert(VectorOps.dimStats(noEmb.select(col("v"))).count() == 0)
    assert(VectorOps.centroidSeparation(
      Seq.empty[(Int, Seq[Double])].toDF("label", "v")).count() == 0)
    // the threshold axis always emits: a zero-pair corpus reads as an
    // all-zero curve, not an empty relation
    val curve = DedupOps.thresholdCurve(noDocs).collect()
    assert(curve.length == DedupOps.ThresholdCurve.size)
    assert(curve.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("q53 drift: hand-computed half means, midpoint event lands second, one-sided types labeled") {
    val ev = events(
      // span [1000, 5000] -> midpoint comparison: us*2 < 6000
      (1L, 1L, "a", 1000L), // first:  value below
      (2L, 1L, "a", 2000L), // first
      (3L, 1L, "a", 3000L), // exactly at midpoint -> SECOND half
      (4L, 1L, "a", 5000L), // second
      (5L, 1L, "b", 1500L)  // first only
    ).withColumn("value",
      when(col("event_id") === 1L, 1.25).when(col("event_id") === 2L, 2.75)
        .when(col("event_id") === 3L, 10.0).when(col("event_id") === 4L, 20.0)
        .otherwise(lit(null).cast("double")))
    val out = TemporalOps.valueDrift(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) === 2L && a.getLong(2) === 2L) // 2 first, 2 second
    assert(a.getString(3) === "both")
    assert(a.getDouble(4) === 2.0)   // (1.25+2.75)/2
    assert(a.getDouble(5) === 15.0)  // (10+20)/2
    assert(a.getDouble(6) === 13.0)
    val b = out("b")
    assert(b.getString(3) === "first_only")
    assert(b.isNullAt(4) && b.isNullAt(5) && b.isNullAt(6)) // b's value is NULL
  }

  test("pk03 truncation loss: over-budget docs lose exactly their tails") {
    import spark.implicits._
    val budget = CurationOps.PackBudget // 256
    val shortDoc = (1 to 10).map(i => s"t$i").mkString(" ")
    val longDoc = (1 to 300).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, shortDoc, "s1"), (2L, longDoc, "s1"), (3L, longDoc, "s2")
    ).toDF("doc_id", "text", "source")
    val out = CurationOps.truncationLoss(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getLong(1) === 2L && s1.getLong(2) === 1L) // one truncated
    assert(s1.getLong(3) === 10L + budget)               // kept
    assert(s1.getLong(4) === 300L - budget)              // lost
    assert(s1.getDouble(5) === (300.0 - budget) / 310.0)
    val s2 = out("s2")
    assert(s2.getLong(3) === budget && s2.getLong(4) === 300L - budget)
  }

  test("v13 label purity: separated clusters score 1.0; a planted cross-label neighbor costs its edge share") {
    import spark.implicits._
    val dim = graft.functions.VectorFunctions.Dim
    // two tight, well-separated clusters: label 0 around +e1, label 1
    // around +e2; probes are vec_id % 5 == 0
    def near(axis: Int, i: Int) = Seq.tabulate(dim)(j =>
      (if (j == axis) 10.0 else 0.0) + 0.01 * math.sin(i * 7.0 + j))
    val emb = ((0 until 10).map(i => (i.toLong, near(1, i), 0)) ++
      (10 until 20).map(i => (i.toLong, near(2, i), 1)))
      .toDF("vec_id", "v", "label")
    val out = VectorOps.knnLabelPurity(emb).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(0).getDouble(4) === 1.0 && out(1).getDouble(4) === 1.0)
    assert(out(0).getLong(1) === 2L, "probes 0 and 5 carry label 0")
    assert(out(0).getLong(2) === 2L * SimilarityOps.GraphK)
    // move one label-1 vector INTO cluster 0: every label-0 probe now
    // ranks it top-1, costing exactly 1/k of purity per probe
    val polluted = emb.withColumn("v",
      when(col("vec_id") === 19L,
        typedLit(Seq.tabulate(dim)(j => if (j == 1) 10.0 else 0.0)))
        .otherwise(col("v")))
    val p0 = VectorOps.knnLabelPurity(polluted).collect()
      .map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(math.abs(p0(0) - (1.0 - 1.0 / SimilarityOps.GraphK)) < 1e-12,
      s"each label-0 probe loses one of its k edges: $p0")
  }

  test("m10 entropy: constant payload reads 0.0/'low'; exact 16-residue cycle reads 4.0/'near_uniform'") {
    import spark.implicits._
    // 'A'*64 -> one bin -> entropy 0; chars '0'..'?' (ascii 48..63,
    // residues 0..15) cycled 4x -> uniform 16 bins -> entropy exactly
    // 4.0 bits (log2(1/16) = -4 is a power of two: no rounding at all)
    val docs = Seq(
      (1L, "A" * 64),
      (2L, (0 until 64).map(i => (48 + i % 16).toChar).mkString)
    ).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("meta", struct(lit("txt").as("format"), lit("en").as("lang"),
        length(col("text")).as("n_chars"), lit("s").as("source")))
    val feats = MultimodalOps.extractFeatures(
      docs.select(col("doc_id"), col("payload"), col("meta")))
    val term = (i: Int) => {
      val p = element_at(col("features"), i)
      when(p > 0, -p * log2(p)).otherwise(lit(0.0))
    }
    val ent = feats.select(col("doc_id"),
      round((1 to 16).map(term).reduce(_ + _), 4).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ent(1L) === 0.0)
    assert(ent(2L) === 4.0)
    assert(MultimodalOps.EntropyLowBar > 0.0 &&
      MultimodalOps.EntropyHighBar < 4.0, "bars band the two extremes")
  }

  test("round-9 operators are total on empty inputs") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noSourcedDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val noEvents = Seq.empty[(Long, Long, String, Long)]
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val noEmb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    val noPayloads = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(DedupOps.containmentPairs(noDocs).count() == 0)
    assert(DedupOps.minhashDupPairs(noDocs).count() == 0)
    assert(DedupOps.simhashDupPairs(noDocs).count() == 0)
    assert(DedupOps.embeddingBestMatch(noEmb).count() == 0)
    // the contract aggregations always emit ONE row, vacuously within
    // floor (the oracle's n_true/n_probes = 0 branch)
    val vac = DedupOps.pairRecallContract(
      noDocs.select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b")),
      noDocs.select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b")), 0.9)
      .collect()
    assert(vac.length == 1 && vac.head.getAs[Boolean]("within_floor"))
    val cov = DedupOps.coverageContract(noDocs, noEmb).collect()
    assert(cov.length == 1 && cov.head.getAs[Boolean]("monotonic_ok"))
    assert(SimilarityOps.knnIvfPq(noEmb).count() == 0)
    assert(SimilarityOps.knnIvfPqResidual(noEmb).count() == 0)
    assert(VectorOps.binaryRecall(noEmb).count() == 0)
    assert(TextOps.zipfSlope(noSourcedDocs).count() == 0)
    assert(TextOps.repetitionRules(noSourcedDocs).count() == 0)
    assert(TemporalOps.seasonalBacktest(noEvents).count() == 0)
    assert(MultimodalOps.perceptualHashes(noPayloads).count() == 0)
  }

  test("round-10 operators are total on empty inputs") {
    import spark.implicits._
    val noSourcedDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val noEvents = Seq.empty[(Long, Long, String, Long, Double)]
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val noDim = Seq.empty[(Long, String, Long, Option[Long])]
      .toDF("user_id", "event_type", "valid_from_us", "valid_to_us")
    assert(DedupOps.kmvVocab(noSourcedDocs).count() == 0)
    assert(DedupOps.kmvOverlap(noSourcedDocs).count() == 0)
    assert(TemporalOps.heavyHitterAudit(noEvents).count() == 0)
    assert(TemporalOps.scd2Merge(noDim, noEvents).count() == 0)
    // the audit's probe grid is a fixed relation: on an empty corpus
    // every (layout, probe) row survives and reports zero files hit
    val z = LayoutOps.zorderAudit(spark, noEvents).collect()
    assert(z.nonEmpty && z.forall(_.getAs[Long]("files_hit") == 0L))
    val noEdges = Seq.empty[(Long, Long)].toDF("src_id", "dst_id")
    assert(SimilarityOps.kCorePeel(noEdges, 2, 5).count() == 0)
    val noEmb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    assert(SimilarityOps.kCoreReport(noEmb).count() == 0)
    assert(CurationOps.mixtureOrder(noSourcedDocs).count() == 0)
  }

  test("v09 dim stats: exact means/variance/min-max, dead-dimension flag") {
    import spark.implicits._
    val out = VectorOps.dimStats(Seq(
      Seq(1.0, 2.0, 0.0), Seq(3.0, 2.0, 0.0), Seq(5.0, 2.0, 0.0))
      .toDF("v"))
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getBoolean(6))))
      .toMap
    assert(out(0) == ((3L, 3.0, 4.0, 1.0, 5.0, false)))
    assert(out(1) == ((3L, 2.0, 0.0, 2.0, 2.0, true)))
    assert(out(2) == ((3L, 0.0, 0.0, 0.0, 0.0, true)))
  }

  test("v09 single-row corpus: variance NULL, dead flag pinned false") {
    import spark.implicits._
    val r = VectorOps.dimStats(Seq(Seq(0.5)).toDF("v")).collect().head
    assert(r.getLong(1) == 1L && r.getDouble(2) == 0.5)
    assert(r.isNullAt(3), "n=1 gates variance to NULL before the division")
    assert(!r.getBoolean(6))
  }

  test("v11 pq distortion: a corpus that IS the codebook quantizes with zero distortion") {
    import spark.implicits._
    // 16 vectors = exactly the first-16 codebook (the s06 device):
    // every block assigns to itself, bdist numerically ~0
    val pts = (0 until 16).map(i =>
      (i.toLong, Seq(math.sin(i * 2.3) * 5, math.cos(i * 1.7) * 5)))
    val out = VectorOps.pqDistortion(pts.toDF("vec_id", "v"),
        blocks = 1, codes = 16, dim = 2)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 16L, "every vector quantizes")
    assert(math.abs(r.getDouble(2)) < 1e-9, s"mean distortion ~0, got ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3)) < 1e-9, s"max distortion ~0, got ${r.getDouble(3)}")
  }

  test("q51 burstiness: uniform series -> fano 0; bursty series with a zero day -> exact co-moments") {
    import spark.implicits._
    def t(day: Int, i: Int) = new java.sql.Timestamp(
      java.time.Instant.parse(f"2024-02-0${day}%dT0$i%d:00:00Z").toEpochMilli)
    val ev = (
      // uniform: 2 events on each of 3 days
      (for { d <- 1 to 3; i <- 0 until 2 } yield (100L + d * 10 + i, 1L, "uniform", t(d, i))) ++
      // bursty: 4 on day 1, 0 on day 2, 2 on day 3 -> m=3, S1=6, S2=20
      (for { i <- 0 until 4 } yield (200L + i, 2L, "bursty", t(1, i))) ++
      (for { i <- 0 until 2 } yield (210L + i, 2L, "bursty", t(3, i)))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = TemporalOps.burstiness(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // uniform: m=3, S1=6, S2=12 -> fano = (36-36)/18 = 0, cv = 0
    assert(out("uniform") === ((3L, 6L, 0.0, 0.0)))
    // bursty: fano = (3*20-36)/(3*6) = 24/18, cv = sqrt(24)/6
    val (m, tot, fano, cv) = out("bursty")
    assert((m, tot) === ((3L, 6L)))
    assert(fano === 24.0 / 18.0)
    assert(cv === math.sqrt(24.0) / 6.0)
  }

  test("q52 backtest: hand-computed MAEs; missing lag pairs drop; single-day type is NULL") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(
      java.time.Instant.parse(f"2024-03-$day%02dT12:00:00Z").toEpochMilli)
    // 'ramp': count(day d) = d for d = 1..9 → persistence |d-(d-1)| = 1
    // on 8 pairs (mae 1.0); seasonal |d-(d-7)| = 7 on 2 pairs (d=8,9)
    val ramp = for { d <- 1 to 9; i <- 0 until d } yield
      (1000L + d * 100 + i, 1L, "ramp", t(d))
    // 'single': one day only → no lagged pair at either horizon
    val ev = (ramp :+ ((9999L, 2L, "single", t(5))))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = TemporalOps.seasonalBacktest(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val rampRow = out("ramp")
    assert(rampRow.getLong(1) === 2L) // n_days_seasonal
    assert(rampRow.getDouble(2) === 7.0) // mae_seasonal
    assert(rampRow.getLong(3) === 8L) // n_days_persistence
    assert(rampRow.getDouble(4) === 1.0) // mae_persistence
    val singleRow = out("single")
    assert(singleRow.getLong(1) === 0L && singleRow.isNullAt(2))
    assert(singleRow.getLong(3) === 0L && singleRow.isNullAt(4))
  }

  test("t28 repetition: hand-computed pass panel; single-token doc exercises the nb=0 guard") {
    import spark.implicits._
    val docs = Seq(
      // A: maxc 5/10 fails top-word; dup-word 4/10 ≤ 3/5 passes;
      //    bigrams "a a"×4 + 5 distinct → dup 3/9 > 1/10 fails
      (1L, "a a a a a b c d e f", "s"),
      // B: all distinct → passes every rule
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "s"),
      // C: one token → top-word share 1 fails; nb=0 passes dup-bigram
      (3L, "solo", "s")
    ).toDF("doc_id", "text", "source")
    val r = TextOps.repetitionRules(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(1) === 3L)                  // n_docs
    assert(row.getLong(2) === 1L)                  // pass_top_word (B)
    assert(row.getLong(3) === 3L)                  // pass_dup_word
    assert(row.getLong(4) === 2L)                  // pass_dup_bigram (B, C)
    assert(row.getLong(5) === 1L)                  // pass_all (B)
    // mean dup-bigram: snap(1/3) = floor(2^30/3 + 0.5) = 357913941,
    // B and C contribute 0 → mean = 357913941 / (3 · 2^30)
    assert(row.getDouble(6) === 357913941.0 / (3.0 * 1073741824.0))
  }

  test("t27 zipf: two-point power-law source fits slope -1 exactly; flat source fits 0") {
    import spark.implicits._
    // 'zipfy': token a ×4, token b ×2 → points (ln1, ln4), (ln2, ln2)
    // → slope (ln2−ln4)/(ln2−ln1) = −1; 'flat': every token once → all
    // y = 0 → slope 0
    val docs = Seq(
      (1L, "a a a a b b", "zipfy"),
      (2L, "u v w x y z", "flat")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.zipfSlope(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("zipfy") === ((2L, -1.0)))
    assert(out("flat") === ((6L, 0.0)))
  }
}
