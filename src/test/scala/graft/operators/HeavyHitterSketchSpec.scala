package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SpaceSaving batch aggregate's theorem, pinned on PLANTED
  * fixtures (the gate corpus is near-uniform — no natural heavy
  * hitters — so the non-vacuous recall/coverage claims live here,
  * while q54's gate row checks the theorem booleans on the corpus):
  * bound containment under every merge tree, the single-summary
  * coverage guarantee, under-capacity exactness, and O(cap) output
  * regardless of input cardinality. */
class HeavyHitterSketchSpec extends SparkSpec {

  private val Cap = 8

  /** Aggregate (user, weight) rows into one sketch across `parts`
    * partitions — parts > 1 exercises real partial-buffer MERGES with
    * a nondeterministic tree, which is exactly what the bound
    * containment must survive. */
  private def sketchOf(rows: Seq[(Long, Long)], parts: Int,
      cap: Int = Cap): Array[(Long, Long, Long)] = {
    import spark.implicits._
    rows.toDF("user_id", "w").repartition(parts)
      .agg(call_function("graft_space_saving",
        col("user_id"), col("w"), lit(cap)).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.user_id"), col("c.est"), col("c.err"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("planted Zipf: dominant hitters surface on top with exact-contained bounds") {
    // three dominant users far above the tail; merging can dilute the
    // coverage threshold (see SpaceSavingAgg's merge note) but not by
    // enough to displace counts this far above total/cap
    val users = Seq((1L, 400L), (2L, 200L), (3L, 100L)) ++
      (100L until 140L).map(u => (u, 1L))
    val expanded = users.flatMap { case (u, n) => Seq.fill(n.toInt)((u, 1L)) }
    val truth = users.toMap
    for (parts <- Seq(1, 3, 7)) {
      val sk = sketchOf(expanded, parts)
      assert(sk.length <= Cap)
      sk.foreach { case (u, est, err) =>
        assert(est >= truth(u) && est - err <= truth(u),
          s"bounds violated for user $u: ($est, $err) vs true ${truth(u)} (parts=$parts)")
      }
      assert(sk.sortBy { case (u, e, _) => (-e, u) }.take(3).map(_._1).toSet
        === Set(1L, 2L, 3L), s"dominant hitters lost (parts=$parts)")
    }
  }

  test("single summary: every user above total/cap is tracked (Metwally coverage)") {
    // moderately-heavy users right at the threshold — the claim the
    // UNMERGED theorem makes (q54's gate row feeds one partial buffer
    // per group for exactly this reason)
    val users = (1L to 40L).map(u => (u, if (u <= 5) 30L else 2L))
    val total = users.map(_._2).sum
    val expanded = users.flatMap { case (u, n) => Seq.fill(n.toInt)((u, 1L)) }
    val sk = sketchOf(expanded, parts = 1)
    users.filter { case (_, n) => n * Cap > total }.foreach { case (u, _) =>
      assert(sk.exists(_._1 == u), s"heavy user $u lost a counter")
    }
  }

  test("under capacity the sketch IS the exact count table, err = 0") {
    val users = (1L to 6L).map(u => (u, u * 3L))
    val expanded = users.flatMap { case (u, n) => Seq.fill(n.toInt)((u, 1L)) }
    for (parts <- Seq(1, 4)) {
      assert(sketchOf(expanded, parts).toSet
        === users.map { case (u, n) => (u, n, 0L) }.toSet)
    }
  }

  test("random splits: bounds contain truth under every merge tree; output stays O(cap)") {
    val rnd = new scala.util.Random(42)
    val users = Seq.tabulate(60)(i => (i.toLong, (rnd.nextInt(30) + 1).toLong))
    val truth = users.toMap
    val expanded = rnd.shuffle(users.flatMap { case (u, n) => Seq.fill(n.toInt)((u, 1L)) })
    for (parts <- Seq(2, 5, 11, 32)) {
      val sk = sketchOf(expanded, parts)
      assert(sk.length <= Cap, s"state exceeded cap (parts=$parts)")
      sk.foreach { case (u, est, err) =>
        assert(est >= truth(u) && est - err <= truth(u),
          s"bounds violated for user $u: ($est, $err) vs true ${truth(u)} (parts=$parts)")
      }
    }
  }

  test("weighted updates equal unit-expanded updates (single partition)") {
    val users = Seq((1L, 9L), (2L, 5L), (3L, 5L), (4L, 1L))
    val expanded = users.flatMap { case (u, n) => Seq.fill(n.toInt)((u, 1L)) }
    // same fold order either way: under capacity both are exact
    assert(sketchOf(users, 1).toSet === sketchOf(expanded, 1).toSet)
  }

  test("gate-corpus audit row: all four contract booleans true at sf0.001") {
    val out = TemporalOps.heavyHitterAuditQ.run(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("bounds_ok"), r.toString)
      assert(r.getAs[Boolean]("guaranteed_sound"), r.toString)
      assert(r.getAs[Boolean]("coverage_ok"), r.toString)
      assert(r.getAs[Boolean]("exact_under_cap"), r.toString)
    }
  }
}
