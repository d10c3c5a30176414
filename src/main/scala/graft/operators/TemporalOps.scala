package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}

/** Temporal operators over the events stream: the as-of join (the one
  * join shape the built-in operators don't provide) and windowed
  * hour-over-hour deltas.
  *
  * Timestamps are compared as integer microseconds on both engines —
  * the engine's event time is nanos truncated to micros (Tables.events)
  * and the oracle truncates the same way, so the strict "before"
  * comparison can never disagree in the sub-microsecond range only one
  * engine can see.
  */
object TemporalOps {

  /** As-of join: each purchase paired with the user's latest strictly
    * earlier click (null when none). Composed from built-ins the way a
    * scalable as-of join wants to run: tag and union the two sides,
    * shuffle ONCE on user_id, and let a running `last(ignoreNulls)`
    * window carry the most recent click forward — no per-row range
    * probe, no broadcast of either side, no skew beyond the natural
    * per-user event volume. Purchases sort before clicks at the same
    * instant (sortKind 0 < 1), which is exactly the strict `<`
    * semantics; among same-instant clicks the max click_id wins.
    *
    * The oracle is DuckDB's native ASOF LEFT JOIN — an independent
    * implementation of the same semantics, not a SQL transcription of
    * the window trick. ASOF leaves the pick among equal-timestamp
    * clicks unspecified, so the oracle first reduces clicks to one row
    * per (user, instant) keeping max click_id — the same tie-break the
    * window's (ts_us, sortKind, click_id) ordering gives — making both
    * engines deterministic even when nanos→micros truncation collides
    * two clicks onto one microsecond. */
  def asOfClickBeforePurchase(events: DataFrame): DataFrame = {
    val ev = events.withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click").select(
      col("user_id"), col("ts_us"), lit(1).as("sortKind"),
      col("event_id").as("click_id"), lit(null).cast("long").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts_us"), lit(0).as("sortKind"),
      lit(null).cast("long").as("click_id"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("sortKind"), coalesce(col("click_id"), lit(-1L)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .select(col("*"),
        last(col("click_id"), ignoreNulls = true).over(w).as("last_click_id"),
        last(when(col("sortKind") === 1, col("ts_us")), ignoreNulls = true).over(w)
          .as("last_click_ts"))
      .filter(col("sortKind") === 0)
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        col("last_click_id").as("click_id"),
        col("last_click_ts").as("click_ts_us"),
        (col("ts_us") - col("last_click_ts")).as("gap_us"))
  }

  val asOfJoinQ: GraftQuery = GraftQuery(
    "j01_asof_join",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             epoch_ns(ts) // 1000 AS ts_us
      |           FROM events),
      |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT max(event_id) AS click_id, user_id, ts_us AS click_ts_us
      |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us)
      |SELECT p.event_id, p.user_id, p.ts_us,
      |       c.click_id, c.click_ts_us,
      |       p.ts_us - c.click_ts_us AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts_us > c.click_ts_us""".stripMargin) {
    (spark, sf) => asOfClickBeforePurchase(Tables.events(spark, sf))
  }

  /** Windowed (tolerance-bounded) as-of join: j01's match is only
    * valid within a maximum lookback — the attribution-window shape
    * ("a click counts only if ≤ 10 min before the purchase"). Same
    * single-shuffle kernel; the tolerance is a row-local null-out of
    * the matched columns AFTER the as-of pick, which is the standard
    * windowed-as-of semantics (a too-old click does NOT fall through
    * to an even older one). Purchases with no in-window click keep
    * their row with null match columns, so the row count is exactly
    * j01's. */
  def asOfWithin(events: DataFrame, maxGapUs: Long): DataFrame = {
    val inWin = col("gap_us") <= maxGapUs
    asOfClickBeforePurchase(events).select(
      col("event_id"), col("user_id"), col("ts_us"),
      when(inWin, col("click_id")).as("click_id"),
      when(inWin, col("click_ts_us")).as("click_ts_us"),
      when(inWin, col("gap_us")).as("gap_us"))
  }

  val asOfWindowQ: GraftQuery = GraftQuery(
    "j02_asof_window",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             epoch_ns(ts) // 1000 AS ts_us
      |           FROM events),
      |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT max(event_id) AS click_id, user_id, ts_us AS click_ts_us
      |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us),
      |a AS (SELECT p.event_id, p.user_id, p.ts_us,
      |             c.click_id, c.click_ts_us,
      |             p.ts_us - c.click_ts_us AS gap_us
      |      FROM p ASOF LEFT JOIN c
      |        ON p.user_id = c.user_id AND p.ts_us > c.click_ts_us)
      |SELECT event_id, user_id, ts_us,
      |       CASE WHEN gap_us <= 600000000 THEN click_id END AS click_id,
      |       CASE WHEN gap_us <= 600000000 THEN click_ts_us END AS click_ts_us,
      |       CASE WHEN gap_us <= 600000000 THEN gap_us END AS gap_us
      |FROM a""".stripMargin) { (spark, sf) =>
    asOfWithin(Tables.events(spark, sf), 600000000L)
  }

  /** j05 — FORWARD as-of join: each click paired with the user's
    * earliest strictly LATER purchase (null when none) — the follow-up
    * question to j01's lookback ("what did this click lead to", the
    * label-joining shape behind conversion modeling). Same
    * single-shuffle union kernel as j01 run in reverse: both sides
    * shuffle ONCE on user_id, the window scans time DESCENDING, and a
    * running `last(ignoreNulls)` carries the nearest later purchase
    * backward onto each click. Clicks sort before purchases at the
    * same instant under the descending order (sortKind 0 < 1), which
    * is exactly the strict `>` semantics; among same-instant purchases
    * the MIN purchase_id wins (the forward mirror of j01's max-click
    * tie-break), pinned by pre-reducing purchases per (user, instant).
    *
    * The oracle is an independent LATERAL top-1 formulation, not a
    * transcription of the window trick. */
  def asOfPurchaseAfterClick(events: DataFrame): DataFrame = {
    val ev = events.withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(min(col("event_id")).as("purchase_id"))
      .select(col("user_id"), col("ts_us"), lit(1).as("sortKind"),
        col("purchase_id"), lit(null).cast("long").as("event_id"))
    val clicks = ev.filter(col("event_type") === "click").select(
      col("user_id"), col("ts_us"), lit(0).as("sortKind"),
      lit(null).cast("long").as("purchase_id"), col("event_id"))
    // no purchase_id ordering key: the pre-reduce leaves at most one
    // purchase row per (user, instant), so (ts_us, sortKind) is
    // already total within each tie group
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("sortKind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .select(col("*"),
        last(col("purchase_id"), ignoreNulls = true).over(w).as("next_purchase_id"),
        last(when(col("sortKind") === 1, col("ts_us")), ignoreNulls = true).over(w)
          .as("next_purchase_ts"))
      .filter(col("sortKind") === 0)
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        col("next_purchase_id").as("purchase_id"),
        col("next_purchase_ts").as("purchase_ts_us"),
        (col("next_purchase_ts") - col("ts_us")).as("gap_us"))
  }

  val asOfForwardQ: GraftQuery = GraftQuery(
    "j05_asof_forward",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             epoch_ns(ts) // 1000 AS ts_us
      |           FROM events),
      |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
      |p AS (SELECT min(event_id) AS purchase_id, user_id, ts_us
      |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us)
      |SELECT c.event_id, c.user_id, c.ts_us,
      |       n.purchase_id, n.ts_us AS purchase_ts_us,
      |       n.ts_us - c.ts_us AS gap_us
      |FROM c LEFT JOIN LATERAL (
      |  SELECT p.purchase_id, p.ts_us
      |  FROM p
      |  WHERE p.user_id = c.user_id AND p.ts_us > c.ts_us
      |  ORDER BY p.ts_us, p.purchase_id LIMIT 1) n ON true""".stripMargin) {
    (spark, sf) => asOfPurchaseAfterClick(Tables.events(spark, sf))
  }

  /** j06 — NEAREST as-of join: each purchase paired with the user's
    * click of minimum |time distance|, looking BOTH directions — the
    * sensor-alignment / feature-snapping shape ("attach the closest
    * reading, whichever side of the event it fell on") that completes
    * the as-of family: j01 backward, j05 forward, j06 nearest.
    *
    * Same single-shuffle union kernel run twice over ONE exchange:
    * clicks are pre-reduced to one row per (user, instant) keeping max
    * click_id (j01's tie-break), then an ascending scan carries the
    * latest click at-or-before each purchase and a descending scan
    * carries the earliest click strictly after it — both windows
    * partition on user_id, so Catalyst plans one shuffle and two
    * sorts, never a per-row range probe. The pick is then row-local:
    * smaller |gap| wins, an exact tie prefers the backward (earlier)
    * click — deterministic because the pre-reduce leaves at most one
    * click per instant. A same-instant click is the backward candidate
    * at gap 0 and always wins.
    *
    * `gap_us` is SIGNED (click_ts − purchase_ts: ≤0 backward, >0
    * forward) and `direction` names the winning side. The oracle is an
    * independent LATERAL nearest-1 formulation — order by (|gap|,
    * signed gap) — not a transcription of the two-scan trick. */
  def asOfNearestClick(events: DataFrame): DataFrame = {
    val ev = events.withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))

    // sortKind orders ties at one instant: ascending scan wants the
    // click visible to a same-instant purchase (<= semantics), the
    // descending scan wants it hidden (> semantics) — clicks sort
    // before purchases under BOTH orders with click=0 / purchase=1
    // ascending and purchase=0 / click=1 descending, encoded once as
    // a per-scan key below.
    val u = clicks
      .select(col("user_id"), col("ts_us"), col("click_id"),
        lit(null).cast("long").as("event_id"))
      .unionByName(purchases.select(col("user_id"), col("ts_us"),
        lit(null).cast("long").as("click_id"), col("event_id")))
      .withColumn("isClick", col("click_id").isNotNull)

    val back = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), when(col("isClick"), 0).otherwise(1))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, when(col("isClick"), 1).otherwise(0))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val picked = u
      .withColumn("back_id", last(col("click_id"), ignoreNulls = true).over(back))
      .withColumn("back_ts",
        last(when(col("isClick"), col("ts_us")), ignoreNulls = true).over(back))
      .withColumn("fwd_id", last(col("click_id"), ignoreNulls = true).over(fwd))
      .withColumn("fwd_ts",
        last(when(col("isClick"), col("ts_us")), ignoreNulls = true).over(fwd))
      .filter(!col("isClick"))

    val backGap = col("ts_us") - col("back_ts") // >= 0
    val fwdGap = col("fwd_ts") - col("ts_us") // > 0
    val takeBack = col("back_ts").isNotNull &&
      (col("fwd_ts").isNull || backGap <= fwdGap)
    val takeFwd = col("fwd_ts").isNotNull && !takeBack
    picked.select(
      col("event_id"), col("user_id"), col("ts_us"),
      when(takeBack, col("back_id")).when(takeFwd, col("fwd_id")).as("click_id"),
      when(takeBack, col("back_ts")).when(takeFwd, col("fwd_ts")).as("click_ts_us"),
      when(takeBack, -backGap).when(takeFwd, fwdGap).as("gap_us"),
      when(takeBack, lit("back")).when(takeFwd, lit("fwd")).as("direction"))
  }

  val asOfNearestQ: GraftQuery = GraftQuery(
    "j06_asof_nearest",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             epoch_ns(ts) // 1000 AS ts_us
      |           FROM events),
      |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT max(event_id) AS click_id, user_id, ts_us
      |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us)
      |SELECT p.event_id, p.user_id, p.ts_us,
      |       n.click_id, n.ts_us AS click_ts_us,
      |       n.ts_us - p.ts_us AS gap_us,
      |       CASE WHEN n.click_id IS NULL THEN NULL
      |            WHEN n.ts_us <= p.ts_us THEN 'back' ELSE 'fwd' END AS direction
      |FROM p LEFT JOIN LATERAL (
      |  SELECT c.click_id, c.ts_us
      |  FROM c
      |  WHERE c.user_id = p.user_id
      |  ORDER BY abs(c.ts_us - p.ts_us), c.ts_us - p.ts_us LIMIT 1) n ON true""".stripMargin) {
    (spark, sf) => asOfNearestClick(Tables.events(spark, sf))
  }

  /** Inter-arrival bands for q49 (closed-open, micros). */
  private val GapBands: Seq[(Long, String)] = Seq(
    1000000L -> "00_lt_1s", 60000000L -> "01_1s_1m", 600000000L -> "02_1m_10m")
  private val GapBandLast = "03_ge_10m"

  /** q49 — inter-event arrival gaps: the distribution of the time
    * between a user's consecutive events, attributed to the LATER
    * event's type and bucketed into operational bands — the
    * inter-arrival profile behind the q23 session-gap choice (the
    * 10-minute gap is defensible exactly when the 02/03 band boundary
    * shows a trough) and behind bot screening (sub-second bands
    * dominated by one type).
    *
    * Gaps are exact integer micros from one per-user lag window
    * ((ts, event_id) ordering, the q38 chain); per (type, band):
    * exact count, DECIMAL-sum mean (one terminal IEEE division), and
    * exact min/max. Closed-open edges pinned identically in both
    * texts.
    *
    * Scale shape: one user-keyed window (state = one user's events),
    * then a map-side-combined aggregation to ≤|types|·|bands| rows. */
  def interEventGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"), col("event_id"))
    gapBandTail(events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("__us"))
      .withColumn("gap_us", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("gap_us").isNotNull))
  }

  /** The q49 band-and-aggregate tail over (event_type, gap_us) rows —
    * shared with the streaming replay gate (st03), whose gap rows come
    * from the watermark-finalized gap stream instead of the lag
    * window. Closed-open band edges and the DECIMAL-sum mean are the
    * q49 contract. */
  private[graft] def gapBandTail(gaps: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val band = GapBands.foldRight(lit(GapBandLast): org.apache.spark.sql.Column) {
      case ((edge, name), rest) => when(col("gap_us") < edge, name).otherwise(rest)
    }
    gaps
      .groupBy(col("event_type"), band.as("band"))
      .agg(count(lit(1)).as("n"),
        sum(col("gap_us").cast(dec)).as("__sum"),
        min(col("gap_us")).as("min_us"),
        max(col("gap_us")).as("max_us"))
      .select(col("event_type"), col("band"), col("n"),
        (col("__sum").cast("double") / col("n")).as("mean_us"),
        col("min_us"), col("max_us"))
  }

  val interEventGapsQ: GraftQuery = GraftQuery(
    "q49_event_gaps",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_ns(ts) // 1000 AS us
      |  FROM events),
      |g AS (
      |  SELECT event_type,
      |         us - lag(us) OVER (PARTITION BY user_id
      |                            ORDER BY us, event_id) AS gap_us
      |  FROM e),
      |b AS (
      |  SELECT event_type, gap_us,
      |         CASE WHEN gap_us < 1000000 THEN '00_lt_1s'
      |              WHEN gap_us < 60000000 THEN '01_1s_1m'
      |              WHEN gap_us < 600000000 THEN '02_1m_10m'
      |              ELSE '03_ge_10m' END AS band
      |  FROM g WHERE gap_us IS NOT NULL)
      |SELECT event_type, band, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(gap_us AS HUGEINT)) AS DOUBLE) / count(*) AS mean_us,
      |       CAST(min(gap_us) AS BIGINT) AS min_us,
      |       CAST(max(gap_us) AS BIGINT) AS max_us
      |FROM b GROUP BY event_type, band""".stripMargin) { (spark, sf) =>
    interEventGaps(Tables.events(spark, sf))
  }

  /** Hour-over-hour event-volume deltas per event type: grouped counts
    * plus a lag window partitioned on event_type — the window key is
    * the low-cardinality dimension, but each partition is only
    * n_hours rows AFTER aggregation, so the plan is one agg shuffle
    * plus a bounded window (never a corpus-wide sort). */
  /** The hourly bucket label q26 and q36 share — one definition so
    * their oracles (strftime '%Y-%m-%d %H:00:00') can never
    * desynchronize from only one of the twins. */
  private def hourBucket(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(date_trunc("hour", ts), "yyyy-MM-dd HH:00:00")

  /** Per-type hourly counts — the shared base of q26/q36. */
  private def hourlyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), hourBucket(col("ts")).as("date_hour"))
      .agg(count(lit(1)).as("n"))

  def hourlyDeltas(events: DataFrame): DataFrame =
    hourlyCounts(events).withColumn("delta",
      col("n") - lag(col("n"), 1).over(
        Window.partitionBy(col("event_type")).orderBy(col("date_hour"))))

  val hourlyDeltasQ: GraftQuery = GraftQuery(
    "q26_hourly_deltas",
    """WITH h AS (
      |  SELECT event_type,
      |         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS date_hour,
      |         count(*) AS n
      |  FROM events GROUP BY event_type, date_hour)
      |SELECT event_type, date_hour, n,
      |       n - lag(n) OVER (PARTITION BY event_type ORDER BY date_hour) AS delta
      |FROM h""".stripMargin) { (spark, sf) =>
    hourlyDeltas(Tables.events(spark, sf))
  }

  /** Distribution ranks of event values within each event type: decile
    * bucket, percent_rank, cume_dist — the remaining ranking-window
    * family, with full per-row rank semantics (every row gets its own
    * position). Ordering is (value, event_id) so ranks are
    * deterministic under value ties; percent_rank and cume_dist are
    * ratios of integer positions (raw IEEE doubles, bit-identical
    * across engines). Per-row ranks inherently sort the corpus through
    * the 5 event-type partitions — this query IS that operator and is
    * gated to oracle scale; the scale-safe distribution-bucketing
    * member is `q33_decile_buckets`, which broadcasts exact decile
    * boundaries from [[QuantileKernel]]'s histogram and assigns
    * buckets row-locally with no corpus-wide window. */
  val valueRanksQ: GraftQuery = GraftQuery(
    "q27_value_ranks",
    """SELECT event_id, event_type, value,
      |       ntile(10) OVER w AS decile,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin) {
    (spark, sf) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      Tables.events(spark, sf).select(
        col("event_id"), col("event_type"), col("value"),
        ntile(10).over(w).as("decile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  /** Ordered funnel view → click → purchase: a user advances a step
    * only with an event STRICTLY after their first event of the
    * previous step. Three chained (filter → join → min-aggregate)
    * stages, every one keyed on user_id — the whole funnel is three
    * shuffles on the same key (co-partitioned after the first), no
    * window over raw events, no per-user state beyond one timestamp.
    * The step table is 3 rows, so the final lag window is
    * post-aggregation trivia. */
  def funnel(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    def firstAfter(step: String, prev: DataFrame, prevTs: String, out: String) =
      ev.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col(prevTs)), "user_id")
        .filter(col("ts_us") > col(prevTs))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as(out))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_ts"))
    val c = firstAfter("click", v, "v_ts", "c_ts")
    val p = firstAfter("purchase", c, "c_ts", "p_ts")
    def stepCount(df: DataFrame, step: Int, name: String) =
      df.agg(count(lit(1)).as("users"))
        .select(lit(step).as("step"), lit(name).as("name"), col("users"))
    val steps = stepCount(v, 1, "view")
      .unionByName(stepCount(c, 2, "click"))
      .unionByName(stepCount(p, 3, "purchase"))
    // prior-step count 0 ⇒ conversion NULL in both engines (0/0 is
    // NULL on Spark and DuckDB 1.0 but NaN under newer DuckDB's IEEE
    // default — decide before dividing, the q29/v03 contract)
    val prevUsers = lag(col("users"), 1).over(Window.orderBy(col("step")))
    steps.withColumn("conversion",
      when(prevUsers > 0, col("users").cast("double") / prevUsers))
  }

  val funnelQ: GraftQuery = GraftQuery(
    "q28_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
      |           FROM events),
      |v AS (SELECT user_id, min(ts_us) AS v_ts FROM e
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts_us) AS c_ts FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts_us > v_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts_us) AS p_ts FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts_us > c_ts GROUP BY e.user_id),
      |s AS (SELECT 1 AS step, 'view' AS name, count(*) AS users FROM v
      |      UNION ALL SELECT 2, 'click', count(*) FROM c
      |      UNION ALL SELECT 3, 'purchase', count(*) FROM p)
      |SELECT step, name, users,
      |       CASE WHEN lag(users) OVER (ORDER BY step) > 0
      |            THEN CAST(users AS DOUBLE) / lag(users) OVER (ORDER BY step)
      |       END AS conversion
      |FROM s""".stripMargin) { (spark, sf) =>
    funnel(Tables.events(spark, sf))
  }

  /** Weekly retention cohorts: users grouped by first-seen week, each
    * later active week counted at its offset — the engagement matrix
    * behind every retention curve. Week starts are compared as integer
    * microseconds of the Monday-aligned truncation (identical in both
    * engines; offsets are exact multiples of a week, taken with
    * integral division anyway). Two user_id-keyed stages (first-seen
    * aggregate, then join back — co-partitioned, no second wide
    * shuffle) into a cohort×offset aggregation of distinct users. */
  def retention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      unix_micros(date_trunc("week", col("ts"))).as("wk_us"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk_us")).as("cohort_us"))
    ev.join(first, "user_id")
      .groupBy(
        date_format(timestamp_micros(col("cohort_us")), "yyyy-MM-dd").as("cohort_week"),
        expr("(wk_us - cohort_us) div 604800000000").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("users"))
  }

  val retentionQ: GraftQuery = GraftQuery(
    "q30_retention",
    """WITH e AS (SELECT user_id, epoch_us(date_trunc('week', ts)) AS wk_us
      |           FROM events),
      |f AS (SELECT user_id, min(wk_us) AS cohort_us FROM e GROUP BY user_id)
      |SELECT strftime(make_timestamp(cohort_us), '%Y-%m-%d') AS cohort_week,
      |       (wk_us - cohort_us) // 604800000000 AS week_offset,
      |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
      |FROM e JOIN f USING (user_id)
      |GROUP BY cohort_week, week_offset""".stripMargin) { (spark, sf) =>
    retention(Tables.events(spark, sf))
  }

  /** Session-scoped funnel: q28's ordered view → click → purchase, but
    * a step only counts INSIDE one session (10-minute inactivity gap,
    * q23's definition) — "did the user convert in one sitting".
    * Sessionization is gaps-and-islands over a user_id window (the
    * same key every later stage shuffles on; partition size is one
    * user's events, never corpus-scale), then the funnel is q28's
    * chained filter → join → min-aggregate keyed on (user_id, sid) —
    * co-partitioned after the first shuffle. Tied timestamps can't
    * split a session: every tied row follows the one that opened it,
    * so sid assignment is order-independent (q23's argument).
    * Conversion is a ratio of integer counts — raw IEEE double. */
  def sessionFunnel(events: DataFrame, gapUs: Long): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val tagged = ev
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(ord) < gapUs, 0)
          .otherwise(1))
      .withColumn("sid", sum(col("new_s")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the three funnel stages as CASCADED full-frame session windows —
    // c_ts reads v_ts, p_ts reads c_ts, all constant within a session
    // and all riding the ONE user exchange ((user_id, sid) clustering
    // is satisfied by the user_id hash partitioning), so the corpus is
    // scanned once. The r8 shape instead joined each stage back to the
    // previous stage's aggregate — three derivations of the sessionized
    // scan in the plan (plan-pinned away). A session without the
    // previous step yields NULL (ts > NULL is NULL), exactly the rows
    // the old inner joins dropped.
    val wS = Window.partitionBy(col("user_id"), col("sid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = tagged
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts_us"))).over(wS))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" && col("ts_us") > col("v_ts"),
          col("ts_us"))).over(wS))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts_us") > col("c_ts"),
          col("ts_us"))).over(wS))
    val counts = staged
      .groupBy(col("user_id"), col("sid"))
      .agg(max(col("v_ts")).as("v_ts"), max(col("c_ts")).as("c_ts"),
        max(col("p_ts")).as("p_ts"))
      .agg(count(col("v_ts")).as("n_v"), count(col("c_ts")).as("n_c"),
        count(col("p_ts")).as("n_p"))
    counts
      .select(explode(array(
        struct(lit(1).as("step"), lit("view").as("name"), col("n_v").as("sessions")),
        struct(lit(2).as("step"), lit("click").as("name"), col("n_c").as("sessions")),
        struct(lit(3).as("step"), lit("purchase").as("name"), col("n_p").as("sessions"))))
        .as("s"))
      .select(col("s.step").as("step"), col("s.name").as("name"),
        col("s.sessions").as("sessions"))
      .withColumn("conversion",
        when(lag(col("sessions"), 1).over(Window.orderBy(col("step"))) > 0,
          col("sessions").cast("double") /
            lag(col("sessions"), 1).over(Window.orderBy(col("step")))))
  }

  val sessionFunnelQ: GraftQuery = GraftQuery(
    "q34_session_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
      |           FROM events),
      |d AS (SELECT user_id, event_type, ts_us,
      |        CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
      |               OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
      |                  >= 600000000
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |s AS (SELECT user_id, event_type, ts_us,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
      |                         ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM d),
      |v AS (SELECT user_id, sid, min(ts_us) AS v_ts FROM s
      |      WHERE event_type = 'view' GROUP BY user_id, sid),
      |c AS (SELECT s.user_id, s.sid, min(ts_us) AS c_ts
      |      FROM s JOIN v USING (user_id, sid)
      |      WHERE event_type = 'click' AND ts_us > v_ts
      |      GROUP BY s.user_id, s.sid),
      |p AS (SELECT s.user_id, s.sid, min(ts_us) AS p_ts
      |      FROM s JOIN c USING (user_id, sid)
      |      WHERE event_type = 'purchase' AND ts_us > c_ts
      |      GROUP BY s.user_id, s.sid),
      |st AS (SELECT 1 AS step, 'view' AS name, count(*) AS sessions FROM v
      |       UNION ALL SELECT 2, 'click', count(*) FROM c
      |       UNION ALL SELECT 3, 'purchase', count(*) FROM p)
      |SELECT step, name, sessions,
      |       CASE WHEN lag(sessions) OVER (ORDER BY step) > 0
      |            THEN CAST(sessions AS DOUBLE) / lag(sessions) OVER (ORDER BY step)
      |       END AS conversion
      |FROM st""".stripMargin) { (spark, sf) =>
    sessionFunnel(Tables.events(spark, sf), 600000000L)
  }

  /** Scale-safe decile bucketing — the 100 TB replacement for q27's
    * per-row rank window: exact decile boundaries per event type come
    * from [[QuantileKernel.discQuantiles]] (9 exact data members × 5
    * types — no interpolation, so zero float-parity risk), are
    * broadcast, and every row's bucket is 1 + the count of boundaries
    * strictly below its value — a row-local array scan inside the
    * probe stage. No corpus-wide window anywhere in the plan: the only
    * sort is over the bounded distinct-value histogram
    * (TemporalSpec pins Window-above-Aggregate; the boundary relation
    * is 5 rows). Ties sit in the lower bucket in both engines by the
    * shared strict-> comparison. */
  val decileBucketsQ: GraftQuery = GraftQuery(
    "q33_decile_buckets",
    s"""WITH h AS (
      |  SELECT event_type, value, count(*) AS cnt
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |ch AS (
      |  SELECT event_type, value,
      |         sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum,
      |         sum(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |b AS (
      |  SELECT event_type,
      |         [${QuantileKernel.discSelectSql("0.1", "value")},
      |          ${QuantileKernel.discSelectSql("0.2", "value")},
      |          ${QuantileKernel.discSelectSql("0.3", "value")},
      |          ${QuantileKernel.discSelectSql("0.4", "value")},
      |          ${QuantileKernel.discSelectSql("0.5", "value")},
      |          ${QuantileKernel.discSelectSql("0.6", "value")},
      |          ${QuantileKernel.discSelectSql("0.7", "value")},
      |          ${QuantileKernel.discSelectSql("0.8", "value")},
      |          ${QuantileKernel.discSelectSql("0.9", "value")}] AS bs
      |  FROM ch GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |       CASE WHEN e.value IS NULL OR bs IS NULL THEN NULL
      |            ELSE CAST(1 + len(list_filter(bs, x -> e.value > x)) AS BIGINT)
      |       END AS decile
      |FROM events e LEFT JOIN b USING (event_type)""".stripMargin) { (spark, sf) =>
    val ev = Tables.events(spark, sf)
    val hist = QuantileKernel.cumulativeHistogram(ev, "event_type", "value")
    val probs = (1 to 9).map(i => s"__b$i" -> i / 10.0)
    val bounds = QuantileKernel.discQuantiles(hist, "event_type", "value", probs)
      .select(col("event_type"), array(probs.map(p => col(p._1)): _*).as("bs"))
    // LEFT join + explicit null-out: a null value (or an all-null
    // group, which has no boundary row) gets a NULL decile in BOTH
    // engine texts rather than leaning on filter-lambda null semantics
    ev.join(broadcast(bounds), Seq("event_type"), "left")
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("value").isNotNull && col("bs").isNotNull,
          (lit(1) + size(filter(col("bs"), x => col("value") > x))).cast("long"))
          .as("decile"))
  }

  /** Winsorization — clamp each group's values into its exact [p10,
    * p90] band before averaging (the standard outlier-robust mean for
    * telemetry with fat tails). Boundaries are exact DISCRETE order
    * statistics from [[QuantileKernel.discQuantiles]] (data members,
    * no interpolation → no float-parity risk), broadcast, and the
    * clamp is a row-local CASE inside the probe stage — the same
    * boundary-broadcast shape as q33, so no corpus-wide window and no
    * per-group value buffering anywhere in the plan. Groups whose
    * values are all NULL have no histogram row and drop from both
    * engines (oracle: `WHERE lo IS NOT NULL`).
    *
    * Float discipline (the c09/positivityPeriod treatment): the
    * events value domain is exact 2dp (the QuantileKernel premise),
    * so each clamped value recovers its integer numerator via
    * round(x·100) exactly; the mean is an exact long sum divided ONCE
    * by n·100.0 and emitted RAW — one IEEE division over exact
    * integers is bit-identical in any engine at any partial-
    * aggregation order, leaving no rounding convention to disagree
    * on. (A terminal round(…, 4) over that quotient was the r6 gate's
    * only residual cross-engine surface: engines legally differ on
    * shortest-string decimal ties of the SAME double.)
    *
    * The oracle text pins the quantile convention itself — rank
    * ⌈p·n⌉ over the cumulative histogram, the exact arithmetic of
    * [[QuantileKernel.discQuantiles]] — instead of calling
    * `quantile_disc`, whose element-selection convention has varied
    * across DuckDB releases. Both texts now share every op.
    *
    * Emitted-dtype discipline (the ACTUAL r5–r7 driver-gate root
    * cause, found round 8): DuckDB's `sum()` over integers returns
    * HUGEINT, which pandas renders as float64 — a value-hashing
    * comparator then sees `178.0` vs Spark's int64 `178` even though
    * every NUMERIC comparison agrees (which is why three rounds of
    * local/judge re-runs were green while the driver stayed red).
    * q35 was the registry's only oracle whose FINAL select emitted a
    * bare integer `sum(...)`; every emitted integer aggregate must be
    * `CAST(... AS BIGINT)` (the d11p/t19 convention, now enforced by
    * the dtype-strict local gate in tools/check_oracle.py). */
  val winsorizeQ: GraftQuery = GraftQuery(
    "q35_winsorize",
    s"""WITH h AS (
      |  SELECT event_type, value, count(*) AS cnt
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |ch AS (
      |  SELECT event_type, value,
      |         sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum,
      |         sum(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |b AS (
      |  SELECT event_type,
      |         ${QuantileKernel.discSelectSql("0.10", "value")} AS lo,
      |         ${QuantileKernel.discSelectSql("0.90", "value")} AS hi
      |  FROM ch GROUP BY 1)
      |SELECT e.event_type, lo, hi,
      |       CAST(sum(CASE WHEN e.value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |       CAST(sum(CASE WHEN e.value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |       CAST(sum(CASE WHEN e.value IS NULL THEN NULL
      |                     WHEN e.value < lo THEN CAST(round(lo * 100) AS BIGINT)
      |                     WHEN e.value > hi THEN CAST(round(hi * 100) AS BIGINT)
      |                     ELSE CAST(round(e.value * 100) AS BIGINT)
      |                END) AS DOUBLE)
      |           / (count(e.value) * 100.0) AS avg_winsorized,
      |       CAST(count(e.value) AS BIGINT) AS n
      |FROM events e JOIN b USING (event_type)
      |WHERE lo IS NOT NULL
      |GROUP BY 1, 2, 3""".stripMargin) { (spark, sf) =>
    winsorizedMeans(Tables.events(spark, sf))
  }

  /** q35 over (event_type, value) rows. */
  def winsorizedMeans(events: DataFrame): DataFrame = {
    val hist = QuantileKernel.cumulativeHistogram(events, "event_type", "value")
    val bounds = QuantileKernel.discQuantiles(hist, "event_type", "value",
      Seq("lo" -> 0.10, "hi" -> 0.90))
    // clamp in scaled-long space: exact at any group size (2dp domain;
    // |sum| ≤ rows·max|value|·100 — far inside Long at any SF shard)
    val clampedScaled =
      when(col("value").isNull, lit(null).cast("long"))
        .when(col("value") < col("lo"), round(col("lo") * 100, 0).cast("long"))
        .when(col("value") > col("hi"), round(col("hi") * 100, 0).cast("long"))
        .otherwise(round(col("value") * 100, 0).cast("long"))
    events.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"), col("lo"), col("hi"))
      .agg(
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_high"),
        (sum(clampedScaled).cast("double")
          / (count(col("value")) * lit(100.0))).as("avg_winsorized"),
        count(col("value")).as("n"))
  }

  /** Point-in-interval join via bucket expansion — the non-equi join
    * Spark has no native operator for (a raw `a.ts BETWEEN b.lo AND
    * b.hi` condition plans as BroadcastNestedLoopJoin: every point
    * probes every interval). Instead both sides are mapped onto a
    * shared bucket grid: each interval explodes to the hour buckets it
    * covers (bounded by span/bucket-width), each point lands in
    * exactly ONE bucket, and the join becomes an equi-join on the
    * bucket key with the BETWEEN kept only as a residual filter inside
    * matched buckets. A point matches an interval in at most one
    * bucket (its own), so no pair-dedup is needed. At 100 TB the
    * bucket key is what bounds join width: probe cost per point is the
    * intervals overlapping its hour, never the interval count.
    *
    * Intervals here are the daily active spans (min..max ts per day)
    * of the 3 most active users (deterministic tie-break: user_id);
    * the interval side is tiny after that filter and is explicitly
    * broadcast — the bucket-grid shape is what generalizes when BOTH
    * sides are corpus-sized (the equi-join then shuffles on the bucket
    * key instead of nested-looping). The oracle runs DuckDB's native
    * inequality join over the same intervals — an independent
    * implementation, not a bucket transcription. */
  val intervalJoinQ: GraftQuery = GraftQuery(
    "j03_interval_join",
    """WITH e AS (
      |  SELECT user_id,
      |         make_timestamp(CAST(epoch_ns(ts) // 1000 AS BIGINT)) AS ts
      |  FROM events),
      |tu AS (SELECT user_id FROM e GROUP BY user_id
      |       ORDER BY count(*) DESC, user_id LIMIT 3),
      |iv AS (SELECT e.user_id AS owner, min(ts) AS s_start, max(ts) AS s_end
      |       FROM e JOIN tu USING (user_id)
      |       GROUP BY e.user_id, date_trunc('day', ts))
      |SELECT iv.owner,
      |       strftime(iv.s_start, '%Y-%m-%d %H:%M:%S') AS span_start,
      |       strftime(iv.s_end, '%Y-%m-%d %H:%M:%S') AS span_end,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM iv JOIN e ON e.ts BETWEEN iv.s_start AND iv.s_end
      |GROUP BY 1, 2, 3""".stripMargin) { (spark, sf) =>
    intervalActivity(Tables.events(spark, sf), topUsers = 3)
  }

  /** j03 over (user_id, ts) rows: daily active spans of the `topUsers`
    * most active users, joined back to every event inside the span
    * (boundaries inclusive) through the hour-bucket grid. */
  def intervalActivity(events: DataFrame, topUsers: Int): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"))
    val top = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id"))
      .limit(topUsers)
      .select(col("user_id"))
    val spans = ev.join(top, "user_id")
      .groupBy(col("user_id").as("owner"), date_trunc("day", col("ts")).as("d"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      .select(col("owner"), col("s_start"), col("s_end"),
        explode(sequence(
          date_trunc("hour", col("s_start")),
          date_trunc("hour", col("s_end")),
          expr("interval 1 hour"))).as("bucket"))
    val pts = ev.withColumn("bucket", date_trunc("hour", col("ts")))
    pts.join(broadcast(spans),
        pts("bucket") === spans("bucket")
          && pts("ts").between(col("s_start"), col("s_end")))
      .groupBy(col("owner"), col("s_start"), col("s_end"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("owner"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss").as("span_start"),
        date_format(col("s_end"), "yyyy-MM-dd HH:mm:ss").as("span_end"),
        col("n_events"), col("n_users"))
  }

  /** Finite-window EWMA terms (current hour + 5 lags, β = 1/2). */
  val EwmaTerms = 6

  /** EWMA over an aggregated (event_type, date_hour, n) series:
    * num = Σ_k β^k·lag_k, den = Σ_k β^k, both over the lags that
    * EXIST (series starts renormalize instead of biasing toward 0),
    * each built as an explicit fixed-order addition chain — so both
    * engines execute the identical IEEE sequence and `ewma` is
    * emitted raw. β = 1/2 makes every weight an exact binary double.
    * Row-based lags: a missing hour shortens the window to the
    * previous OBSERVED hours (both engines agree by construction). */
  def ewmaOverCounts(h: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("date_hour"))
    val tail = (1 until EwmaTerms).map { k =>
      val lk = lag(col("n"), k).over(w)
      (when(lk.isNotNull, lk.cast("double") * lit(math.pow(0.5, k))).otherwise(lit(0.0)),
        when(lk.isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0)))
    }
    val num = tail.map(_._1).foldLeft(col("n").cast("double"))(_ + _)
    val den = tail.map(_._2).foldLeft(lit(1.0).cast("double"))(_ + _)
    h.select(col("event_type"), col("date_hour"), col("n"),
      (num / den).as("ewma"))
  }

  /** Exponentially weighted hourly event-volume trend per event type —
    * the dashboard smoothing op next to q26's raw deltas. Scale shape
    * is q26's exactly: one agg shuffle, then a window over n_hours
    * rows per type (bounded AFTER aggregation, never a corpus sort). */
  def ewmaTrend(events: DataFrame): DataFrame =
    ewmaOverCounts(hourlyCounts(events))

  /** q36's full oracle text over an optional row filter — shared with
    * the st05 stream-replay row so the batch and stream oracles can
    * never state a different EWMA. */
  private[graft] def ewmaOracleSql(whereClause: String): String = {
    val numTail = (1 until EwmaTerms).map(k =>
      s" + CASE WHEN l$k IS NOT NULL THEN CAST(l$k AS DOUBLE) * ${math.pow(0.5, k)} ELSE 0.0 END")
      .mkString
    val denTail = (1 until EwmaTerms).map(k =>
      s" + CASE WHEN l$k IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0.0 END")
      .mkString
    val lagDefs = (1 until EwmaTerms).map(k => s"lag(n, $k) OVER w AS l$k").mkString(", ")
    s"""WITH h AS (
       |  SELECT event_type,
       |         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS date_hour,
       |         count(*) AS n
       |  FROM events $whereClause GROUP BY event_type, date_hour),
       |l AS (SELECT event_type, date_hour, n, $lagDefs
       |      FROM h WINDOW w AS (PARTITION BY event_type ORDER BY date_hour))
       |SELECT event_type, date_hour, n,
       |       (CAST(n AS DOUBLE)$numTail)
       |       / (CAST(1.0 AS DOUBLE)$denTail) AS ewma
       |FROM l""".stripMargin
  }

  val ewmaTrendQ: GraftQuery =
    GraftQuery("q36_ewma_trend", ewmaOracleSql("")) { (spark, sf) =>
      ewmaTrend(Tables.events(spark, sf))
    }

  /** SCD2-style validity intervals from the event log: per user,
    * collapse consecutive repeats of event_type and emit one row per
    * RUN with its [valid_from_us, valid_to_us) span — valid_to is the
    * next change's timestamp, null for the current state. This is the
    * slowly-changing-dimension (type 2) reconstruction a warehouse
    * runs over a CDC/change stream to answer "what was the state at
    * time T" with a range join.
    *
    * Scale shape: two windows, both keyed on user_id — a
    * corpus-cardinality key, so partitions are one user's events and
    * the plan reuses a single exchange+sort for the lag and the lead
    * (same partitioning AND ordering). Ordering is (ts_us, event_id):
    * deterministic under timestamp ties in both engines. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    // ONE window spec for both the lag and the lead: identical
    // partitioning and ordering is what lets the plan reuse a single
    // exchange+sort (pinned in PlanInvariantsSpec), so it must be
    // structural, not a textual coincidence
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("event_type") =!= col("prev"))
      .select(col("user_id"), col("event_type"),
        col("ts_us").as("valid_from_us"),
        lead(col("ts_us"), 1).over(w).as("valid_to_us"))
  }

  /** The shared oracle CTE chain for q37/j04 — events `e` → collapsed
    * validity intervals `iv` — parameterized by the source predicate
    * and the state column alias, so the two oracles can never
    * desynchronize (the Spark side shares [[scd2Intervals]] the same
    * way). Expects `e(event_id, user_id, ts_us, event_type)` in
    * scope. */
  private def scd2OracleCtes(sourceFilter: String, stateCol: String): String =
    s"""d0 AS (SELECT user_id, ts_us, event_id, event_type,
       |         lag(event_type) OVER (PARTITION BY user_id
       |                               ORDER BY ts_us, event_id) AS prev
       |       FROM e $sourceFilter),
       |c AS (SELECT user_id, ts_us, event_id, event_type FROM d0
       |      WHERE prev IS NULL OR event_type <> prev),
       |iv AS (SELECT user_id, event_type AS $stateCol, ts_us AS valid_from_us,
       |         lead(ts_us) OVER (PARTITION BY user_id
       |                           ORDER BY ts_us, event_id) AS valid_to_us
       |       FROM c)""".stripMargin

  private val eventsMicrosCte =
    """e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
      |        event_type
      |      FROM events)""".stripMargin

  val scd2Q: GraftQuery = GraftQuery(
    "q37_scd2_intervals",
    s"""WITH $eventsMicrosCte,
       |${scd2OracleCtes("", "event_type")}
       |SELECT user_id, event_type, valid_from_us, valid_to_us
       |FROM iv""".stripMargin) { (spark, sf) =>
    scd2Intervals(Tables.events(spark, sf))
  }

  /** Point-in-time (SCD2 lookup) join — q37's consumption side: each
    * purchase looks up the state interval (built from the user's
    * NON-purchase events) containing its timestamp, i.e. "what state
    * was the user in when they bought". Purchases before any recorded
    * state keep their row with null state (left join).
    *
    * Scale shape: the validity intervals partition time per user, so
    * this is an EQUI-join on user_id (corpus-cardinality key — sort-
    * merge/hash, never a nested loop; the range condition rides the
    * join as a residual filter) and each fact matches at most one
    * interval — output rows == fact rows, no fan-out. Per-user dim
    * size is that user's change count, bounded. */
  def pointInTimeState(events: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val dims = scd2Intervals(events.filter(col("event_type") =!= "purchase"))
      .select(col("user_id").as("d_user"), col("event_type").as("state"),
        col("valid_from_us"), col("valid_to_us"))
    e.filter(col("event_type") === "purchase")
      .join(dims,
        col("user_id") === col("d_user")
          && col("valid_from_us") <= col("ts_us")
          && (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("state"), col("valid_from_us").as("state_since_us"))
  }

  val pointInTimeQ: GraftQuery = GraftQuery(
    "j04_point_in_time",
    s"""WITH $eventsMicrosCte,
       |${scd2OracleCtes("WHERE event_type <> 'purchase'", "state")},
       |f AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase')
       |SELECT f.event_id, f.user_id, f.ts_us, iv.state,
       |       iv.valid_from_us AS state_since_us
       |FROM f LEFT JOIN iv ON iv.user_id = f.user_id
       |  AND iv.valid_from_us <= f.ts_us
       |  AND (iv.valid_to_us IS NULL OR f.ts_us < iv.valid_to_us)""".stripMargin) {
    (spark, sf) => pointInTimeState(Tables.events(spark, sf))
  }

  /** Incremental SCD2 maintenance — the MERGE a warehouse applies per
    * ingest batch instead of re-deriving the dimension from the full
    * history: given the current SCD2 table and a delta of new events,
    * (1) detect the delta's change points per user with the change
    * detection SEEDED by the user's open-interval state (so a delta
    * that continues the current state creates no interval), (2) close
    * each touched open interval at its user's first post-cutoff
    * change, (3) append one interval per change point, and (4) pass
    * every other dimension row through untouched.
    *
    * Scale shape: every stage keys on user_id — the open-state seed
    * join, the delta's one window (exchange+sort reused by the lag
    * and lead), and the first-change aggregation — so with the
    * dimension bucketed by user_id the merge is one delta-sized
    * shuffle; closed history is never rewritten (in a real lake the
    * MERGE touches only matched files — here it flows through the
    * union unchanged). The merged table provably equals the
    * from-scratch [[scd2Intervals]] over the full history, which is
    * exactly what the q56 gate row hash-checks. */
  def scd2Merge(dim: DataFrame, deltaEvents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val open = dim.filter(col("valid_to_us").isNull)
      .select(col("user_id").as("o_user"), col("event_type").as("open_state"))
    val changes = deltaEvents
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .join(open, col("user_id") === col("o_user"), "left")
      .withColumn("prev",
        coalesce(lag(col("event_type"), 1).over(w), col("open_state")))
      .filter(col("prev").isNull || col("event_type") =!= col("prev"))
    val newIv = changes.select(col("user_id"), col("event_type"),
      col("ts_us").as("valid_from_us"),
      lead(col("ts_us"), 1).over(w).as("valid_to_us"))
    val closeAt = changes.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("close_at"))
    val openUpd = dim.filter(col("valid_to_us").isNull)
      .join(closeAt, Seq("user_id"), "left")
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        col("close_at").as("valid_to_us"))
    dim.filter(col("valid_to_us").isNotNull)
      .unionByName(openUpd)
      .unionByName(newIv)
  }

  /** q56 — the merge≡rebuild conservation gate: build the dimension
    * from the first 3/5 of the corpus time range, MERGE the remaining
    * 2/5 as the delta batch, and hash-check the merged table against
    * q37's from-scratch oracle over the FULL history. The cutoff is a
    * driver-side min/max literal (in production it is the ingest
    * watermark, already known) so both slice predicates push into the
    * parquet scans. Strict `< cut` / `>= cut` split means no
    * within-user timestamp tie can straddle the boundary, so the
    * seeded ordering matches the from-scratch (ts_us, event_id)
    * ordering exactly. */
  val scd2MergeQ: GraftQuery = GraftQuery(
    "q56_scd2_merge",
    s"""WITH $eventsMicrosCte,
       |${scd2OracleCtes("", "event_type")}
       |SELECT user_id, event_type, valid_from_us, valid_to_us
       |FROM iv""".stripMargin) { (spark, sf) =>
    val events = Tables.events(spark, sf)
    val bounds = events
      .agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val cut = lo + (hi - lo) * 3L / 5L
    val dim = scd2Intervals(events.filter(unix_micros(col("ts")) < cut))
    scd2Merge(dim, events.filter(unix_micros(col("ts")) >= cut))
  }

  /** First-order event-type transition matrix over per-user event
    * sequences: P(next = to | current = from), the Markov summary
    * behind behavioral anomaly screens and simulated-session
    * generators. One window shuffle keyed on user_id (a user's events,
    * never corpus-scale), then a map-side-combinable count per
    * (from, to) and a per-from share. Window order is
    * (ts, event_id) — the event_id tiebreak makes the successor of a
    * tied pair the same row in both engines, so the count table is
    * deterministic, and each probability is one integer division. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    transitionTail(events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(ord))
      .filter(col("to_type").isNotNull)
      .withColumnRenamed("event_type", "from_type"))
  }

  /** The q38 count-and-share tail over (from_type, to_type) pair rows
    * — shared with the streaming replay gate (st01), whose pair rows
    * come from the watermark-finalized transition stream instead of
    * the lag window. */
  private[graft] def transitionTail(pairs: DataFrame): DataFrame = {
    val counts = pairs
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
    counts
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(wFrom))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }

  val transitionsQ: GraftQuery = GraftQuery(
    "q38_transitions",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             epoch_ns(ts) // 1000 AS ts_us FROM events),
      |nx AS (SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts_us, event_id) AS to_type
      |       FROM e),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM nx
      |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
      |       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
      |FROM c""".stripMargin) { (spark, sf) =>
    transitionMatrix(Tables.events(spark, sf))
  }

  /** Trailing-window anomaly screen over the daily event counts: each
    * (event_type, day)'s count is z-scored against the previous up to
    * seven OBSERVED days of the same type (sparse days simply don't
    * appear in the frame — both engines see the same frame rows).
    *
    * Float parity is the q35 exact-arithmetic contract: with m = frame
    * size, S1 = Σn, S2 = Σn² (all exact longs),
    * z = (m·n − S1) / sqrt(m·S2 − S1²) — algebraically
    * (n − mean)/sd_pop but expressed as ONE division and ONE sqrt over
    * exactly-representable integers, so the double is bit-identical at
    * any parallelism and in both engines. Variance 0 or fewer than two
    * baseline days ⇒ z NULL (decide-before-divide, the q28 contract).
    *
    * Scale shape: the heavy stage is the map-side-combinable daily
    * count; the window runs on the post-aggregate table
    * (|event_types| × |days| rows — kilobytes at 100 TB). */
  def dailyAnomaly(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val fr = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("m", count(col("n")).over(fr))
      .withColumn("s1", sum(col("n")).over(fr))
      .withColumn("s2", sum(col("n") * col("n")).over(fr))
      .withColumn("z",
        when(col("m") >= 2 && col("m") * col("s2") > col("s1") * col("s1"),
          (col("m") * col("n") - col("s1")).cast("double")
            / sqrt((col("m") * col("s2") - col("s1") * col("s1")).cast("double"))))
      .select(col("event_type"), col("day"), col("n"),
        col("m").as("base_days"), col("z"),
        coalesce(abs(col("z")) >= 3.0, lit(false)).as("is_anomaly"))
  }

  /** q39's full oracle text over an optional row filter — shared with
    * the st06 stream-replay row. */
  private[graft] def anomalyOracleSql(whereClause: String): String =
    s"""WITH d AS (SELECT event_type,
      |             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |             count(*) AS n
      |           FROM events $whereClause GROUP BY event_type, day),
      |w AS (SELECT event_type, day, n,
      |        count(n) OVER fr AS m,
      |        sum(n) OVER fr AS s1,
      |        sum(n * n) OVER fr AS s2
      |      FROM d WINDOW fr AS (PARTITION BY event_type ORDER BY day
      |                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT event_type, day, n, m,
      |        CASE WHEN m >= 2 AND m * s2 > s1 * s1
      |             THEN CAST(m * n - s1 AS DOUBLE)
      |                  / sqrt(CAST(m * s2 - s1 * s1 AS DOUBLE)) END AS z
      |      FROM w)
      |SELECT event_type, day, CAST(n AS BIGINT) AS n,
      |       CAST(m AS BIGINT) AS base_days, z,
      |       coalesce(abs(z) >= 3.0, false) AS is_anomaly
      |FROM z""".stripMargin

  val dailyAnomalyQ: GraftQuery = GraftQuery(
    "q39_daily_anomaly", anomalyOracleSql("")) { (spark, sf) =>
    dailyAnomaly(Tables.events(spark, sf))
  }

  /** Event-type co-occurrence lift over (user, day) baskets:
    * lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) — the
    * association strength behind market-basket screens and feature
    * co-activation reports. PMI is ln(lift); the ln is deliberately
    * NOT emitted — ln is a libm call with no cross-engine
    * bit-parity guarantee, while the lift is one IEEE division over
    * exact long products (deterministic at any parallelism).
    *
    * Scale shape: baskets = one distinct shuffle on
    * (user_id, day, event_type); the pair self-join is equi-keyed on
    * (user_id, day) — sort-merge/hash, co-partitioned, with per-basket
    * fan-out bounded by |event_types|² (a constant ~25 here, never
    * corpus-scale). The singles table and the one-row basket count
    * broadcast onto the tiny pair table. */
  def cooccurrenceLift(events: DataFrame): DataFrame = {
    val baskets = events
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .distinct()
    val nBaskets = baskets.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val singles = baskets.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"),
        col("cnt").as("n_a"))), "type_a")
      .join(broadcast(singles.select(col("event_type").as("type_b"),
        col("cnt").as("n_b"))), "type_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        ((col("n_ab") * col("n_baskets")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  val cooccurrenceQ: GraftQuery = GraftQuery(
    "q40_cooccurrence",
    """WITH b AS (SELECT DISTINCT user_id,
      |             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |             event_type
      |           FROM events),
      |t AS (SELECT count(*) AS n_baskets
      |      FROM (SELECT DISTINCT user_id, day FROM b)),
      |s AS (SELECT event_type, count(*) AS cnt FROM b GROUP BY event_type),
      |p AS (SELECT a.event_type AS type_a, bb.event_type AS type_b,
      |        count(*) AS n_ab
      |      FROM b a JOIN b bb ON a.user_id = bb.user_id AND a.day = bb.day
      |        AND a.event_type < bb.event_type
      |      GROUP BY type_a, type_b)
      |SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
      |       CAST(sa.cnt AS BIGINT) AS n_a, CAST(sb.cnt AS BIGINT) AS n_b,
      |       CAST(t.n_baskets AS BIGINT) AS n_baskets,
      |       CAST(n_ab * t.n_baskets AS DOUBLE)
      |         / CAST(sa.cnt * sb.cnt AS DOUBLE) AS lift
      |FROM p
      |JOIN s sa ON sa.event_type = p.type_a
      |JOIN s sb ON sb.event_type = p.type_b
      |CROSS JOIN t""".stripMargin) { (spark, sf) =>
    cooccurrenceLift(Tables.events(spark, sf))
  }

  /** q43 — change-point detection: per event type, the day whose
    * before/after split maximizes the absolute shift in mean daily
    * volume — the first question an operator asks of a drifting
    * metric ("WHEN did this change?"), complementing q39's "is today
    * anomalous" z-score with a retrospective level-shift scan.
    *
    * Float discipline: every candidate split's two means are single
    * IEEE divisions over exact integer prefix sums (count longs), so
    * shift doubles are bit-identical in both engines and the argmax
    * (row_number ordered by shift DESC, day ASC as the deterministic
    * tie-break) picks the same row. No rounding anywhere.
    *
    * Scale shape: the daily aggregation is map-side combined; every
    * window (prefix sum, per-type total, argmax rank) runs on the
    * POST-AGGREGATE (type × day) table — thousands of rows at any
    * corpus size — and all three share the one per-type exchange. An
    * O(D) scan per type, not O(D²): the prefix-sum identity gives
    * every candidate split from one pass. */
  def changePoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    daily
      .select(col("event_type"), col("day"),
        row_number().over(wOrd).as("k"),
        sum(col("c")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("s"),
        sum(col("c")).over(wAll).as("t"),
        count(lit(1)).over(wAll).as("d"))
      .filter(col("k") < col("d"))
      .select(col("event_type"), col("day"), col("d"),
        (col("s").cast("double") / col("k")).as("mean_before"),
        ((col("t") - col("s")).cast("double") / (col("d") - col("k")))
          .as("mean_after"))
      .withColumn("shift", abs(col("mean_after") - col("mean_before")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("shift").desc, col("day"))))
      .filter(col("__rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("d").as("n_days"), col("mean_before"), col("mean_after"),
        col("shift"))
  }

  val changePointQ: GraftQuery = GraftQuery(
    "q43_change_point",
    """WITH daily AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT event_type, day,
      |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
      |         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
      |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS t,
      |         count(*) OVER (PARTITION BY event_type) AS d
      |  FROM daily),
      |sc AS (
      |  SELECT event_type, day, d,
      |         CAST(s AS DOUBLE) / k AS mean_before,
      |         CAST(t - s AS DOUBLE) / (d - k) AS mean_after,
      |         abs(CAST(t - s AS DOUBLE) / (d - k)
      |             - CAST(s AS DOUBLE) / k) AS shift
      |  FROM p WHERE k < d),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |                ORDER BY shift DESC, day) AS rk FROM sc)
      |SELECT event_type, day AS cp_day, CAST(d AS BIGINT) AS n_days,
      |       mean_before, mean_after, shift
      |FROM r WHERE rk = 1""".stripMargin) { (spark, sf) =>
    changePoint(Tables.events(spark, sf))
  }

  /** Top-k rows emitted per (event_type, day) by q44. Shared with the
    * streaming twin ([[graft.streaming.StatefulOps.heavyHitterStream]])
    * so batch and stream emit the same surface. */
  val DailyTopK = 10

  /** q44 — daily top users: per (event type, day), the k most active
    * user ids with exact counts — the per-window heavy-hitter report
    * (abuse triage, cache-key selection, salting candidates for the
    * q41 skew decision). Deterministic tie-break (count DESC, user
    * ASC); counts are exact longs, nothing floats.
    *
    * Scale shape: the (type, day, user) aggregation is map-side
    * combined — a hot user arrives pre-reduced — and the rank window
    * runs per (type, day) over the post-aggregate table. At extreme
    * per-day user cardinality the window sort is the cost, and the
    * documented bounded-state path is the streaming twin's
    * SpaceSaving sketch (O(cap) per type·day, guarantees instead of
    * exactness) — the classic exact/approx pair, like q09 vs q24. */
  def dailyTopUsers(events: DataFrame, k: Int = DailyTopK): DataFrame =
    events
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("event_type", "day")
          .orderBy(col("n").desc, col("user_id"))))
      .filter(col("rank") <= k)
      .select(col("event_type"), col("day"),
        col("rank").cast("long").as("rank"), col("user_id"), col("n"))

  val dailyTopUsersQ: GraftQuery = GraftQuery(
    "q44_daily_top_users",
    s"""WITH c AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type, day
      |                 ORDER BY n DESC, user_id) AS rank FROM c)
      |SELECT event_type, day, CAST(rank AS BIGINT) AS rank, user_id,
      |       CAST(n AS BIGINT) AS n
      |FROM r WHERE rank <= $DailyTopK""".stripMargin) { (spark, sf) =>
    dailyTopUsers(Tables.events(spark, sf))
  }

  // ------------------------------------------------------------------
  // q54: bounded-memory batch heavy hitters (SpaceSaving contract)
  // ------------------------------------------------------------------

  /** SpaceSaving capacity for the batch sketch — mirrors the streaming
    * twin's per-(type, day) capacity, and sits BELOW the gate corpora's
    * per-day user cardinality at sf0.01/0.1 (42–587 distinct users) so
    * the contract exercises real evictions, while sf0.001 (≤10 users)
    * pins the under-capacity exactness claim. */
  val HhBatchCap = 32

  /** Bounded-memory approximate daily top-k audit — the batch twin of
    * the streaming SpaceSaving heavy hitters and the approximate
    * counterpart of exact q44 (the count-based sketch family, next to
    * q22's distinct and q24's quantile sketches): per (event_type,
    * day), a [[HhBatchCap]]-counter `graft_space_saving` sketch
    * (native TypedImperativeAggregate — O(cap) state per group, the
    * 100 TB path where q44's exact per-user counts are the state one
    * cannot keep) is audited against the exact counts, per event type,
    * on exactly the four claims the sketch THEOREM makes (events'
    * per-day counts are near-uniform — at sf0.1 every count sits far
    * below the total/cap guarantee threshold, the regime where any
    * counter sketch legitimately recalls nothing, so an unconditional
    * recall floor would be either vacuous or dishonest — measured
    * top-k recall here: 1.0 / ~0.5 / ~0.0 at sf0.001/0.01/0.1; the
    * planted-Zipf HeavyHitterSketchSpec carries the non-vacuous
    * recall pin, the regime the sketch exists for):
    *
    *  - `bounds_ok`     — EVERY kept counter satisfies
    *                      est − err ≤ true ≤ est (the SpaceSaving
    *                      containment, preserved through merges);
    *  - `guaranteed_sound` — every top-k counter the sketch GUARANTEES
    *                      in the true top-k (est − err clears the
    *                      (k+1)-th estimate, an upper bound on every
    *                      unseen user) really is there;
    *  - `coverage_ok`   — every user with true count > day_total/cap
    *                      holds a counter (Metwally et al. 2005, the
    *                      heavy-hitter guarantee; integer-exact as
    *                      n·cap > total);
    *  - `exact_under_cap` — a day with ≤ cap distinct users is tracked
    *                      EXACTLY: one counter per user, est = true
    *                      count, err = 0.
    *
    * The sketch ingests pre-reduced per-user counts, co-partitioned
    * and deterministically ordered (count DESC, user ASC — the
    * streaming twin's fold order), so each group's summary builds in
    * one partial buffer and the gate hash is stable run to run; the
    * production path feeds raw events through the same aggregate and
    * keeps only the bounds, not determinism (see SpaceSavingAgg's
    * merge note). */
  def heavyHitterAudit(events: DataFrame,
      k: Int = DailyTopK, cap: Int = HhBatchCap): DataFrame = {
    val counts = events
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val dayStats = counts
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("u"))
    val sketches = counts
      .repartition(col("event_type"), col("day"))
      .sortWithinPartitions(col("event_type"), col("day"),
        col("n").desc, col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(call_function("graft_space_saving",
        col("user_id"), col("n"), lit(cap)).as("sk"))
    val exploded = sketches
      .select(col("event_type"), col("day"),
        // the (k+1)-th estimate: the best possible true count OUTSIDE
        // the emitted top-k (and ≥ any unseen user, by the invariant)
        coalesce(get(col("sk"), lit(k)).getField("est"), lit(0L)).as("thresh"),
        size(col("sk")).as("n_counters"),
        posexplode(col("sk")).as(Seq("i", "c")))
      .select(col("event_type"), col("day"), col("n_counters"),
        col("c.user_id").as("user_id"), col("c.est").as("est"),
        col("c.err").as("err"),
        (col("i") < k && col("c.est") - col("c.err") >= col("thresh"))
          .as("guaranteed"))
    val exactTop = counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("n").desc, col("user_id"))))
      .filter(col("rank") <= k)
    val scored = exploded
      // every sketched user was observed, so the count join is total;
      // a NULL n here means a corrupted sketch and must flip bounds_ok
      .join(counts, Seq("event_type", "day", "user_id"), "left")
      .join(exactTop.select(col("event_type"), col("day"), col("user_id"))
        .withColumn("__intop", lit(true)),
        Seq("event_type", "day", "user_id"), "left")
      .groupBy(col("event_type"), col("day"))
      .agg(
        first(col("n_counters")).as("n_counters"),
        min(when(col("n").isNotNull
          && col("est") >= col("n")
          && col("est") - col("err") <= col("n"), 1L).otherwise(0L)).as("__bounds"),
        min(when(!col("guaranteed")
          || coalesce(col("__intop"), lit(false)), 1L).otherwise(0L)).as("__sound"),
        sum(when(col("est") === col("n") && col("err") === 0L, 1L)
          .otherwise(0L)).as("__exact_counters"))
    // heavy users per day (n·cap > total) vs how many of them the
    // sketch tracks — the coverage theorem, joined on the tracked set
    val heavy = counts
      .join(dayStats, Seq("event_type", "day"))
      .filter(col("n") * cap > col("total"))
      .select(col("event_type"), col("day"), col("user_id"))
    val heavyTracked = heavy
      .join(exploded.select(col("event_type"), col("day"), col("user_id"))
        .withColumn("__trk", lit(true)),
        Seq("event_type", "day", "user_id"), "left")
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_heavy"),
        sum(when(coalesce(col("__trk"), lit(false)), 1L).otherwise(0L))
          .as("n_heavy_tracked"))
    val perDay = exactTop
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("k_exact"))
      .join(dayStats, Seq("event_type", "day"))
      .join(scored, Seq("event_type", "day"))
      .join(heavyTracked, Seq("event_type", "day"), "left")
    perDay
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("k_exact")).as("k_exact_total"),
        min(col("__bounds")).as("__b"),
        min(col("__sound")).as("__s"),
        min(when(coalesce(col("n_heavy"), lit(0L))
          === coalesce(col("n_heavy_tracked"), lit(0L)), 1L).otherwise(0L))
          .as("__cov"),
        min(when(col("u") > cap
          || (col("n_counters") === col("u")
            && col("__exact_counters") === col("u")), 1L).otherwise(0L))
          .as("__ex"))
      .select(col("event_type"), col("n_days"), lit(k.toLong).as("k"),
        col("k_exact_total"),
        (col("__b") === 1L).as("bounds_ok"),
        (col("__s") === 1L).as("guaranteed_sound"),
        (col("__cov") === 1L).as("coverage_ok"),
        (col("__ex") === 1L).as("exact_under_cap"))
  }

  /** q54's gate row: the oracle replays the replayable side — day and
    * exact-top-k cardinalities per type — and expects all four
    * contract booleans TRUE (the s02/s04/d03 contract device applied
    * to the count-sketch family, with the sketch's own theorem as the
    * claims). */
  val heavyHitterAuditQ: GraftQuery = GraftQuery(
    "q54_heavy_hitters_sketch",
    s"""WITH c AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |d AS (SELECT event_type, day, count(*) AS u FROM c GROUP BY 1, 2)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST($DailyTopK AS BIGINT) AS k,
      |       CAST(sum(least($DailyTopK, u)) AS BIGINT) AS k_exact_total,
      |       TRUE AS bounds_ok,
      |       TRUE AS guaranteed_sound,
      |       TRUE AS coverage_ok,
      |       TRUE AS exact_under_cap
      |FROM d GROUP BY event_type""".stripMargin) { (spark, sf) =>
    heavyHitterAudit(Tables.events(spark, sf))
  }

  /** Last-touch label when the conversion opens its session — shared
    * with the streaming twin so the two surfaces cannot drift. */
  val DirectTouch = "(direct)"

  /** Gaps-and-islands sessionization shared by q45/q48: each event row
    * with its exact-micros time and per-user session id (10-minute
    * inactivity gap, (ts, event_id) ordering). One user-keyed exchange;
    * downstream per-session windows ride it (user_id partitioning
    * satisfies any (user, sid) clustering). */
  private def sessionized(events: DataFrame): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    val gapUs = 10L * 60L * 1000000L
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("__us"))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(wU).isNull
          || col("__us") - lag(col("__us"), 1).over(wU) >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** q45 — sessionized conversion attribution: for every session that
    * contains a purchase, credit the conversion to (a) the session's
    * FIRST event type (first-touch) and (b) the event type immediately
    * PRECEDING the first purchase (last-touch; [[DirectTouch]] when the
    * purchase opens the session) — the two classic attribution models
    * a growth pipeline reports side by side.
    *
    * Sessions are the q23 contract (10-minute inactivity gap) expressed
    * as gaps-and-islands so the session id, the in-session sequence
    * number, and the first-purchase position all come from ONE ordered
    * pass; ordering is (ts_us, event_id) — fully deterministic even if
    * micros truncation collides two events onto one instant. Counts are
    * exact longs; nothing floats.
    *
    * Scale shape: one exchange on user_id derives session ids, one on
    * (user_id, session) ranks within sessions — state per window is one
    * user's (resp. one session's) events, never corpus-scale. The
    * per-session reduction is a map-side-combinable conditional agg on
    * the same (user_id, session) keys the rank exchange already
    * established, and the two final model aggregations run on the
    * |event_types|-sized conversion table. */
  def attribution(events: DataFrame): DataFrame = {
    val sess = sessionized(events)
    val wS = Window.partitionBy(col("user_id"), col("__sid"))
      .orderBy(col("__us"), col("event_id"))
    val perSession = sess
      .withColumn("__rn", row_number().over(wS))
      .withColumn("__prn",
        min(when(col("event_type") === "purchase", col("__rn")))
          .over(Window.partitionBy(col("user_id"), col("__sid"))))
      .filter(col("__prn").isNotNull)
      .groupBy(col("user_id"), col("__sid"), col("__prn"))
      .agg(
        max(when(col("__rn") === 1, col("event_type"))).as("__first"),
        max(when(col("__rn") === col("__prn") - 1, col("event_type")))
          .as("__lastPre"))
      .select(col("__first"),
        coalesce(col("__lastPre"), lit(DirectTouch)).as("__last"))
    // both models from ONE pass: a union of two aggregations would
    // re-run the whole session pipeline per branch (plan-audited);
    // instead each conversion explodes row-locally into its two
    // (model, touched type) credits and one tiny aggregation counts
    perSession
      .select(explode(array(
        struct(lit("first_touch").as("model"), col("__first").as("event_type")),
        struct(lit("last_touch").as("model"), col("__last").as("event_type")))).as("mt"))
      .groupBy(col("mt.model").as("model"), col("mt.event_type").as("event_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  val attributionQ: GraftQuery = GraftQuery(
    "q45_attribution",
    s"""WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_ns(ts) // 1000 AS us
      |  FROM events),
      |d AS (
      |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w >= 600000000
      |                 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, sid
      |                               ORDER BY us, event_id) AS rn
      |  FROM s),
      |p AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
      |              OVER (PARTITION BY user_id, sid) AS prn
      |  FROM r),
      |conv AS (
      |  SELECT user_id, sid, prn,
      |         max(CASE WHEN rn = 1 THEN event_type END) AS first_t,
      |         coalesce(max(CASE WHEN rn = prn - 1 THEN event_type END),
      |                  '$DirectTouch') AS last_t
      |  FROM p WHERE prn IS NOT NULL GROUP BY user_id, sid, prn)
      |SELECT 'first_touch' AS model, first_t AS event_type,
      |       CAST(count(*) AS BIGINT) AS n_conversions
      |FROM conv GROUP BY first_t
      |UNION ALL
      |SELECT 'last_touch', last_t, CAST(count(*) AS BIGINT)
      |FROM conv GROUP BY last_t""".stripMargin) { (spark, sf) =>
    attribution(Tables.events(spark, sf))
  }

  /** The autocorrelation lags q46 reports (days). */
  val AutocorrLags: Seq[Int] = Seq(1, 7)

  /** q46 — lag-k autocorrelation of the daily volume series per event
    * type (k = 1 day and 7 days): the "is this metric periodic?"
    * screen behind q42's hour-of-week profile and q39's anomaly
    * baseline. The series is ZERO-FILLED over each type's observed
    * [first_day, last_day] calendar span — a day with no events is a
    * real 0 observation, and both engines materialize the identical
    * grid — then r_k is the Pearson correlation of (count_{t-k},
    * count_t) pairs.
    *
    * Float parity is the q32 contract: counts are exact integers, the
    * five co-moment sums accumulate in DECIMAL(38,0)/HUGEINT
    * (order-independent, overflow-safe), and r is one
    * cast-sqrt-mul-div IEEE sequence over those exact values, with
    * decide-before-divide NULL on degenerate series (under two pairs
    * or zero variance on either margin).
    *
    * Overflow bound (r8 ADVICE): the widest accumulator is
    * n·Σ(x·y) ≤ days·(max daily count)², so DECIMAL(38,0) holds
    * through ~10¹⁴ events/day over a 10⁴-day span — far beyond any
    * real stream, but NOT failure-equivalent beyond it: Spark's
    * default precision-loss mode yields NULL where DuckDB's HUGEINT
    * raises, so past the bound the engines would diverge quietly
    * rather than both failing loudly (the v09 Long-sum bound note is
    * the same contract; enable ANSI mode if a deployment needs the
    * loud failure).
    *
    * Scale shape: one map-side-combinable daily aggregation; the
    * calendar grid, the single window pass (both lags come from one
    * sort — the unpivot happens row-locally after), and the co-moment
    * aggregation all run on the (|types| × |days|) post-aggregate
    * table — kilobytes at any corpus size. */
  def autocorrelation(events: DataFrame, lags: Seq[Int] = AutocorrLags): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("__d"))
      .agg(count(lit(1)).as("__c"))
    val grid = daily.groupBy(col("event_type"))
      .agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(col("event_type"), explode(sequence(col("__lo"), col("__hi"))).as("__d"))
      .join(daily, Seq("event_type", "__d"), "left")
      .select(col("event_type"), col("__d"), coalesce(col("__c"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("__d"))
    // one window sort yields every lag column; the unpivot to
    // (lag_days, x, y) rows is row-local (generator over plain columns)
    val lagged = grid.select(
      col("event_type") +: col("n").as("y") +:
        lags.map(k => lag(col("n"), k).over(w).as(s"__x$k")): _*)
    val pairs = lagged
      .select(col("event_type"), col("y"),
        explode(array(lags.map(k =>
          struct(lit(k).as("k"), col(s"__x$k").as("x"))): _*)).as("lx"))
      .select(col("event_type"), col("lx.k").as("lag_days"), col("lx.x").as("x"), col("y"))
      .filter(col("x").isNotNull)
    pairs.groupBy(col("event_type"), col("lag_days").cast("long").as("lag_days"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast(dec)).as("__sx"), sum(col("y").cast(dec)).as("__sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("__sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("__syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("__sxy"))
      .withColumn("__cn", col("n_pairs").cast(dec) * col("__sxy")
        - col("__sx") * col("__sy"))
      .withColumn("__dx", col("n_pairs").cast(dec) * col("__sxx")
        - col("__sx") * col("__sx"))
      .withColumn("__dy", col("n_pairs").cast(dec) * col("__syy")
        - col("__sy") * col("__sy"))
      .select(col("event_type"), col("lag_days"), col("n_pairs"),
        when(col("n_pairs") > 1 && col("__dx") > 0 && col("__dy") > 0,
          col("__cn").cast("double")
            / (sqrt(col("__dx").cast("double")) * sqrt(col("__dy").cast("double"))))
          .as("autocorr"))
  }

  val autocorrQ: GraftQuery = GraftQuery(
    "q46_autocorr",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT event_type, min(d) AS lo, max(d) AS hi
      |         FROM daily GROUP BY 1),
      |days AS (SELECT event_type,
      |           CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      |         FROM span),
      |grid AS (SELECT g.event_type, g.d, coalesce(c, 0) AS n
      |         FROM days g LEFT JOIN daily dd
      |           ON dd.event_type = g.event_type AND dd.d = g.d),
      |g2 AS (SELECT event_type, n AS y,
      |         lag(n, 1) OVER w AS x1, lag(n, 7) OVER w AS x7
      |       FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      |l AS (SELECT event_type, 1 AS lag_days, x1 AS x, y FROM g2 WHERE x1 IS NOT NULL
      |      UNION ALL
      |      SELECT event_type, 7, x7, y FROM g2 WHERE x7 IS NOT NULL),
      |s AS (SELECT event_type, lag_days, count(*) AS n_pairs,
      |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |        sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
      |        sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
      |        sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
      |      FROM l GROUP BY 1, 2),
      |m AS (SELECT event_type, lag_days, n_pairs,
      |        CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS cn,
      |        CAST(n_pairs AS HUGEINT) * sxx - sx * sx AS dx,
      |        CAST(n_pairs AS HUGEINT) * syy - sy * sy AS dy
      |      FROM s)
      |SELECT event_type, CAST(lag_days AS BIGINT) AS lag_days,
      |       CAST(n_pairs AS BIGINT) AS n_pairs,
      |       CASE WHEN n_pairs > 1 AND dx > 0 AND dy > 0
      |            THEN CAST(cn AS DOUBLE)
      |                 / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))) END
      |         AS autocorr
      |FROM m""".stripMargin) { (spark, sf) =>
    autocorrelation(Tables.events(spark, sf))
  }

  /** q47 — weekly cohort retention triangle: users are cohorted by the
    * Monday-truncated week of their FIRST event; each (cohort_week,
    * week_offset) cell counts the cohort's users active in that later
    * week, with retention = active/cohort as one exact-integer IEEE
    * division. Week truncation is Monday-anchored in both engines
    * (`date_trunc('week', …)`), and offsets divide an exact multiple
    * of 7 days, so every cell is integer-deterministic. The full
    * triangle generalizes q30's day-offset retention vector.
    *
    * Scale shape: the (user, week) activity set is one distinct
    * shuffle; the per-user cohort min is map-side combinable on the
    * user key; the activity⋈cohort join is user-keyed (co-partitioned
    * with the cohort aggregation); cells and cohort sizes live on
    * (|weeks|²/2)- and |weeks|-sized tables, and the sizes join is a
    * broadcast. No corpus-sized window anywhere. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("__w"))
      .distinct()
    val cohort = weeks.groupBy(col("user_id")).agg(min(col("__w")).as("__cw"))
    val sizes = cohort.groupBy(col("__cw")).agg(count(lit(1)).as("cohort_users"))
    weeks.join(cohort, "user_id")
      .groupBy(col("__cw"),
        (datediff(col("__w"), col("__cw")) / lit(7)).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(sizes), Seq("__cw"))
      .select(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("active_users"), col("cohort_users"),
        (col("active_users").cast("double") / col("cohort_users")).as("retention"))
  }

  val cohortRetentionQ: GraftQuery = GraftQuery(
    "q47_cohort_matrix",
    """WITH weeks AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      |  FROM events),
      |cohort AS (SELECT user_id, min(w) AS cw FROM weeks GROUP BY 1),
      |sizes AS (SELECT cw, count(*) AS cohort_users FROM cohort GROUP BY 1),
      |act AS (SELECT c.cw, date_diff('day', c.cw, k.w) // 7 AS week_offset,
      |          count(*) AS active_users
      |        FROM weeks k JOIN cohort c USING (user_id) GROUP BY 1, 2)
      |SELECT strftime(a.cw, '%Y-%m-%d') AS cohort_week,
      |       CAST(week_offset AS BIGINT) AS week_offset,
      |       CAST(active_users AS BIGINT) AS active_users,
      |       CAST(cohort_users AS BIGINT) AS cohort_users,
      |       CAST(active_users AS DOUBLE) / cohort_users AS retention
      |FROM act a JOIN sizes s ON s.cw = a.cw""".stripMargin) { (spark, sf) =>
    cohortRetention(Tables.events(spark, sf))
  }

  /** q48 — conversion-latency histogram: for every converting session
    * (the q45 population), the time from session start to the FIRST
    * purchase, bucketed into operational latency bands with per-band
    * count / exact-mean / min / max — the "how long does a conversion
    * take" distribution a funnel owner reads next to q45's credit
    * split. A fixed band histogram instead of latency quantiles
    * because band counts are exact integers at any scale, while exact
    * order statistics over an unbounded microsecond domain would need
    * a corpus-sized sort (q24's sketch is the approximate tool there).
    *
    * Latencies are exact integer micros; the per-band mean sums them
    * in DECIMAL(38,0)/HUGEINT (overflow-safe at any session count —
    * the q32 device) and divides once. Bucket edges are closed-open,
    * pinned identically in both texts.
    *
    * Scale shape: the session derivation is q45's one user exchange;
    * per-session start/first-purchase are conditional aggregates on
    * the same keys; the histogram is a map-side-combined aggregation
    * to ≤5 rows. */
  def conversionLatency(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val lat = sessionized(events)
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("__us")).as("__s0"),
        min(when(col("event_type") === "purchase", col("__us"))).as("__p0"))
      .filter(col("__p0").isNotNull)
      .select((col("__p0") - col("__s0")).as("lat_us"))
    val m = 60000000L
    lat
      .select(col("lat_us"),
        when(col("lat_us") < m, "00_lt_1m")
          .when(col("lat_us") < 5 * m, "01_1m_5m")
          .when(col("lat_us") < 15 * m, "02_5m_15m")
          .when(col("lat_us") < 60 * m, "03_15m_1h")
          .otherwise("04_ge_1h").as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        sum(col("lat_us").cast(dec)).as("__sum"),
        min(col("lat_us")).as("min_us"),
        max(col("lat_us")).as("max_us"))
      .select(col("band"), col("n"),
        (col("__sum").cast("double") / col("n")).as("mean_us"),
        col("min_us"), col("max_us"))
  }

  val conversionLatencyQ: GraftQuery = GraftQuery(
    "q48_conversion_latency",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_ns(ts) // 1000 AS us
      |  FROM events),
      |d AS (
      |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w >= 600000000
      |                 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d),
      |l AS (
      |  SELECT min(us) AS s0,
      |         min(CASE WHEN event_type = 'purchase' THEN us END) AS p0
      |  FROM s GROUP BY user_id, sid),
      |lat AS (SELECT p0 - s0 AS lat_us FROM l WHERE p0 IS NOT NULL),
      |b AS (
      |  SELECT lat_us,
      |         CASE WHEN lat_us < 60000000 THEN '00_lt_1m'
      |              WHEN lat_us < 300000000 THEN '01_1m_5m'
      |              WHEN lat_us < 900000000 THEN '02_5m_15m'
      |              WHEN lat_us < 3600000000 THEN '03_15m_1h'
      |              ELSE '04_ge_1h' END AS band
      |  FROM lat)
      |SELECT band, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(lat_us AS HUGEINT)) AS DOUBLE) / count(*) AS mean_us,
      |       CAST(min(lat_us) AS BIGINT) AS min_us,
      |       CAST(max(lat_us) AS BIGINT) AS max_us
      |FROM b GROUP BY band""".stripMargin) { (spark, sf) =>
    conversionLatency(Tables.events(spark, sf))
  }

  /** q50 — daily new-vs-returning split: per day, how many distinct
    * users were active, how many were seen for the FIRST time ever,
    * the returning remainder, and the cumulative user count — the
    * growth-accounting table every daily dashboard leads with, and the
    * per-day margin of q47's cohort matrix (new_users(d) is the size
    * of the cohort that day opens; cum_users is the running cohort
    * total).
    *
    * Counts are exact longs; returning = active − new is exact
    * integer arithmetic and cum_users is an integer running sum on
    * the |days| table. Nothing floats at all.
    *
    * Scale shape: one (user, day) distinct shuffle, one
    * map-side-combinable user-keyed first-day min, then joins and the
    * running-sum window on the |days|-row table only. */
  def dailyNewReturning(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct()
    val active = ud.groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    val newU = ud.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    active.join(newU, Seq("day"), "left")
      .select(col("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("returning_users", col("active_users") - col("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  val dailyNewReturningQ: GraftQuery = GraftQuery(
    "q50_new_returning",
    """WITH ud AS (
      |  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
      |act AS (SELECT day, count(*) AS active_users FROM ud GROUP BY day),
      |fd AS (SELECT user_id, min(day) AS day FROM ud GROUP BY user_id),
      |nu AS (SELECT day, count(*) AS new_users FROM fd GROUP BY day)
      |SELECT act.day,
      |       CAST(active_users AS BIGINT) AS active_users,
      |       CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
      |       CAST(active_users - coalesce(new_users, 0) AS BIGINT) AS returning_users,
      |       CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY act.day
      |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM act LEFT JOIN nu USING (day)""".stripMargin) { (spark, sf) =>
    dailyNewReturning(Tables.events(spark, sf))
  }

  /** q51 — burstiness profile of the daily event series: per type,
    * the Fano factor (variance/mean of daily counts) and coefficient
    * of variation over the type's [first_day, last_day] calendar span
    * — the dispersion statistics behind rate-limiter sizing and
    * bot/campaign screening (a Poisson-ish organic stream sits at
    * Fano ≈ 1; campaign bursts push it far above, metronome bots
    * below). Days with no events are real 0 observations: they
    * contribute 0 to both sums, so only the span length m needs the
    * calendar — no grid materializes.
    *
    * Float parity is the q32/q46 exact-co-moment contract: S1/S2
    * accumulate in DECIMAL(38,0)/HUGEINT (same overflow bound and
    * NULL-vs-raise caveat as q46), and each statistic is ONE terminal
    * IEEE op over exact values — fano = (m·S2−S1²)/(m·S1), cv =
    * √(m·S2−S1²)/S1 (√ is correctly rounded in both engines) — with
    * decide-before-divide NULL on an empty-sum series.
    *
    * Scale shape: one map-side-combinable daily aggregation, then a
    * |types|-row reduction. */
  def burstiness(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("__d"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(
        (datediff(max(col("__d")), min(col("__d"))) + 1).cast(dec).as("__m"),
        sum(col("c").cast(dec)).as("__s1"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("__s2"))
      .withColumn("__num", col("__m") * col("__s2") - col("__s1") * col("__s1"))
      .select(col("event_type"),
        col("__m").cast("long").as("n_days"),
        col("__s1").cast("long").as("total"),
        when(col("__s1") > 0,
          col("__num").cast("double") / (col("__m") * col("__s1")).cast("double"))
          .as("fano"),
        when(col("__s1") > 0,
          sqrt(col("__num").cast("double")) / col("__s1").cast("double"))
          .as("cv"))
  }

  val burstinessQ: GraftQuery = GraftQuery(
    "q51_burstiness",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |a AS (
      |  SELECT event_type,
      |         date_diff('day', min(d), max(d)) + 1 AS m,
      |         sum(c) AS s1, sum(c * c) AS s2
      |  FROM daily GROUP BY 1)
      |SELECT event_type, CAST(m AS BIGINT) AS n_days, CAST(s1 AS BIGINT) AS total,
      |       CASE WHEN s1 > 0
      |            THEN CAST(m * s2 - s1 * s1 AS DOUBLE) / CAST(m * s1 AS DOUBLE)
      |       END AS fano,
      |       CASE WHEN s1 > 0
      |            THEN sqrt(CAST(m * s2 - s1 * s1 AS DOUBLE)) / CAST(s1 AS DOUBLE)
      |       END AS cv
      |FROM a""".stripMargin) { (spark, sf) =>
    burstiness(Tables.events(spark, sf))
  }

  /** q52 — seasonal-naive forecast backtest: per event type, the MAE
    * of the two baselines every real forecast must beat before it
    * ships — seasonal naive (predict day d with day d−7, the weekly
    * rhythm q42 measures) and persistence (predict with d−1). A model
    * whose error does not undercut BOTH numbers is worse than no
    * model; which baseline wins also tells you whether the series is
    * rhythm-dominated (seasonal wins) or level-dominated (persistence
    * wins).
    *
    * Contract: error is measured over OBSERVED day pairs only — a day
    * absent from the counts table contributes neither as target nor
    * as predictor (a zero-fill variant would materialize the calendar
    * grid; on sparse types that choice is a different statistic, so
    * it is left to the caller). Every |error| is an exact integer,
    * the MAE one IEEE division, NULL when a type has no lagged pair
    * (decide-before-divide).
    *
    * Scale shape: one map-side-combinable daily count; the lagged
    * predictors are RANGE-frame windows over the day ordinal (frame
    * exactly [−lag, −lag] — an empty frame is NULL, which IS the
    * observed-pairs contract), so both lags and the final aggregation
    * ride ONE post-aggregate exchange on the (type, day) table —
    * kilobytes at 100 TB (q39's argument). A date-key self-join
    * formulation planned the tiny aggregate once PER LAG SIDE (the
    * join's key-notnull filters defeat exchange reuse — 3 scans,
    * plan-audited), which is why this is windows, not joins. */
  def seasonalBacktest(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("__d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__ord",
        datediff(col("__d"), to_date(lit("1970-01-01"))).cast("long"))
    def lagFrame(lag: Int) = Window.partitionBy(col("event_type"))
      .orderBy(col("__ord")).rangeBetween(-lag, -lag)
    daily
      .withColumn("__p7", sum(col("n")).over(lagFrame(7)))
      .withColumn("__p1", sum(col("n")).over(lagFrame(1)))
      .groupBy(col("event_type"))
      .agg(
        count(col("__p7")).as("n_days_seasonal"),
        coalesce(sum(when(col("__p7").isNotNull, abs(col("n") - col("__p7")))),
          lit(0L)).as("__ae7"),
        count(col("__p1")).as("n_days_persistence"),
        coalesce(sum(when(col("__p1").isNotNull, abs(col("n") - col("__p1")))),
          lit(0L)).as("__ae1"))
      .select(col("event_type"),
        col("n_days_seasonal"),
        when(col("n_days_seasonal") > 0,
          col("__ae7").cast("double") / col("n_days_seasonal")).as("mae_seasonal"),
        col("n_days_persistence"),
        when(col("n_days_persistence") > 0,
          col("__ae1").cast("double") / col("n_days_persistence"))
          .as("mae_persistence"))
  }

  val seasonalBacktestQ: GraftQuery = GraftQuery(
    "q52_seasonal_backtest",
    """WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |             count(*) AS n
      |           FROM events GROUP BY event_type, day),
      |o AS (SELECT event_type, n, day - DATE '1970-01-01' AS ord FROM d),
      |j AS (SELECT event_type, n,
      |        sum(n) OVER (PARTITION BY event_type ORDER BY ord
      |                     RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS p7,
      |        sum(n) OVER (PARTITION BY event_type ORDER BY ord
      |                     RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS p1
      |      FROM o)
      |SELECT event_type,
      |       CAST(count(p7) AS BIGINT) AS n_days_seasonal,
      |       CASE WHEN count(p7) > 0
      |            THEN CAST(coalesce(sum(CASE WHEN p7 IS NOT NULL
      |                   THEN abs(n - p7) END), 0) AS DOUBLE) / count(p7)
      |       END AS mae_seasonal,
      |       CAST(count(p1) AS BIGINT) AS n_days_persistence,
      |       CASE WHEN count(p1) > 0
      |            THEN CAST(coalesce(sum(CASE WHEN p1 IS NOT NULL
      |                   THEN abs(n - p1) END), 0) AS DOUBLE) / count(p1)
      |       END AS mae_persistence
      |FROM j GROUP BY event_type""".stripMargin) { (spark, sf) =>
    seasonalBacktest(Tables.events(spark, sf))
  }

  /** q53 — batch drift audit: the event stream split at its time-span
    * MIDPOINT (exact integer comparison ts·2 < lo+hi — no division,
    * no quantile), each event type profiled across the halves: row
    * counts, presence status (a type that appears only in one half is
    * a schema/emitter change — the thing that silently breaks
    * downstream jobs), and the 2dp-exact value means with their
    * delta. This is t23's token-DF drift device applied to the events
    * table — the pre-flight check before retraining on a refreshed
    * window.
    *
    * Float discipline: value means ride q32's exact ×100 integer
    * sums; each mean is one IEEE division and the delta one
    * subtraction of the two division results — the same sequence in
    * both engines. Scale shape: one broadcast min/max row, one
    * map-side-combined aggregation — O(|types|) output. */
  def valueDrift(events: DataFrame): DataFrame = {
    val q100 = round(col("value") * 100, 0).cast("long")
    val bounds = broadcast(events.agg(
      min(unix_micros(col("ts"))).as("__lo"),
      max(unix_micros(col("ts"))).as("__hi")))
    events.crossJoin(bounds)
      .select(col("event_type"),
        when(unix_micros(col("ts")) * 2 < col("__lo") + col("__hi"), lit(0))
          .otherwise(lit(1)).as("__h"),
        q100.as("__q"), col("value"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("__h") === 0, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("__h") === 1, 1L).otherwise(0L)).as("n_second"),
        sum(when(col("__h") === 0, col("__q"))).as("__s1"),
        count(when(col("__h") === 0, col("value"))).as("__c1"),
        sum(when(col("__h") === 1, col("__q"))).as("__s2"),
        count(when(col("__h") === 1, col("value"))).as("__c2"))
      .select(col("event_type"), col("n_first"), col("n_second"),
        when(col("n_first") > 0 && col("n_second") > 0, "both")
          .when(col("n_first") > 0, "first_only")
          .otherwise("second_only").as("status"),
        when(col("__c1") > 0,
          col("__s1").cast("double") / (col("__c1") * lit(100.0))).as("mean_first"),
        when(col("__c2") > 0,
          col("__s2").cast("double") / (col("__c2") * lit(100.0))).as("mean_second"),
        when(col("__c1") > 0 && col("__c2") > 0,
          col("__s2").cast("double") / (col("__c2") * lit(100.0))
            - col("__s1").cast("double") / (col("__c1") * lit(100.0)))
          .as("delta_mean"))
  }

  val valueDriftQ: GraftQuery = GraftQuery(
    "q53_value_drift",
    """WITH b AS (SELECT min(epoch_ns(ts) // 1000) AS lo,
      |             max(epoch_ns(ts) // 1000) AS hi FROM events),
      |h AS (SELECT e.event_type,
      |        CASE WHEN (epoch_ns(e.ts) // 1000) * 2 < b.lo + b.hi
      |             THEN 0 ELSE 1 END AS hh,
      |        CAST(round(e.value * 100) AS BIGINT) AS q, e.value
      |      FROM events e CROSS JOIN b),
      |g AS (SELECT event_type,
      |        sum(CASE WHEN hh = 0 THEN 1 ELSE 0 END) AS n_first,
      |        sum(CASE WHEN hh = 1 THEN 1 ELSE 0 END) AS n_second,
      |        sum(CASE WHEN hh = 0 THEN q END) AS s1,
      |        count(CASE WHEN hh = 0 THEN value END) AS c1,
      |        sum(CASE WHEN hh = 1 THEN q END) AS s2,
      |        count(CASE WHEN hh = 1 THEN value END) AS c2
      |      FROM h GROUP BY event_type)
      |SELECT event_type,
      |       CAST(n_first AS BIGINT) AS n_first,
      |       CAST(n_second AS BIGINT) AS n_second,
      |       CASE WHEN n_first > 0 AND n_second > 0 THEN 'both'
      |            WHEN n_first > 0 THEN 'first_only'
      |            ELSE 'second_only' END AS status,
      |       CASE WHEN c1 > 0 THEN CAST(s1 AS DOUBLE) / (c1 * 100.0) END
      |         AS mean_first,
      |       CASE WHEN c2 > 0 THEN CAST(s2 AS DOUBLE) / (c2 * 100.0) END
      |         AS mean_second,
      |       CASE WHEN c1 > 0 AND c2 > 0
      |            THEN CAST(s2 AS DOUBLE) / (c2 * 100.0)
      |                 - CAST(s1 AS DOUBLE) / (c1 * 100.0)
      |       END AS delta_mean
      |FROM g""".stripMargin) { (spark, sf) =>
    valueDrift(Tables.events(spark, sf))
  }

  val all: Seq[GraftQuery] =
    Seq(asOfJoinQ, asOfWindowQ, hourlyDeltasQ, valueRanksQ, funnelQ,
      sessionFunnelQ, retentionQ, decileBucketsQ, winsorizeQ, intervalJoinQ,
      ewmaTrendQ, scd2Q, scd2MergeQ, pointInTimeQ, transitionsQ, dailyAnomalyQ,
      cooccurrenceQ, changePointQ, dailyTopUsersQ, attributionQ, autocorrQ,
      cohortRetentionQ, conversionLatencyQ, asOfForwardQ, interEventGapsQ,
      dailyNewReturningQ, burstinessQ, seasonalBacktestQ, valueDriftQ,
      heavyHitterAuditQ, asOfNearestQ)
}
