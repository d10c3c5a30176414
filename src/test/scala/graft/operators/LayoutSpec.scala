package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZInterleave

/** z-order layout semantics: the bit kernel against a brute-force
  * reference, the SQL/codegen path, and the pruning theorem on a
  * planted uniform grid where every file boundary is hand-computable.
  */
class LayoutSpec extends SparkSpec {

  /** Brute-force interleave: bit i of a → bit 2i, bit i of b → 2i+1. */
  private def reference(a: Long, b: Long): Long =
    (0 until ZInterleave.Bits).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))
    }

  test("ZInterleave matches the brute-force bit reference, incl. edges") {
    val edges = Seq(0L, 1L, 2L, 0x5555L, 0xAAAAL, 0xFF00L, 0x00FFL,
      ZInterleave.Mask, ZInterleave.Mask + 1, -1L)
    val rnd = new scala.util.Random(7)
    val pairs = (for (a <- edges; b <- edges) yield (a, b)) ++
      Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    pairs.foreach { case (a, b) =>
      assert(ZInterleave.eval(a, b) === reference(a & ZInterleave.Mask,
        b & ZInterleave.Mask), s"($a, $b)")
    }
  }

  test("z-order keys sort compact quadrants: file id is the interleaved block id") {
    // file = zkey >> 4 over 4-bit ranks depends only on the 4×4 block
    // (ra/4, rb/4) — and is itself the 2-bit interleave of the block
    // coordinates, so each of the 16 files is one compact block
    val cells = for (ra <- 0 until 16; rb <- 0 until 16) yield {
      val file = ZInterleave.eval(ra.toLong, rb.toLong) >> 4
      assert(file === ZInterleave.eval(ra >> 2, rb >> 2), s"ra=$ra rb=$rb")
      file -> (ra / 4, rb / 4)
    }
    cells.groupBy(_._1).foreach { case (f, cs) =>
      assert(cs.size === 16, s"file $f")
      assert(cs.map(_._2).distinct.size === 1, s"file $f spans blocks")
    }
  }

  test("graft_zorder through SQL (codegen path) equals the interpreted eval") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextLong() & 0xFFFFL, rnd.nextLong() & 0xFFFFL))
    val out = rows.toDF("a", "b")
      .select(col("a"), col("b"), call_function("graft_zorder", col("a"), col("b")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) === ZInterleave.eval(r.getLong(0), r.getLong(1)))
    }
  }

  /** 64×64 uniform grid: user_id 0–63 × value w·6.0 (cents 600·w,
    * w 0–63). Exact-quantile rank buckets are then 4 users / 4 values
    * wide, each z file a 4-bucket × 4-bucket block. */
  private lazy val gridAudit = {
    import spark.implicits._
    val rows = for (u <- 0 until 64; w <- 0 until 64)
      yield (u.toLong, w * 6.0)
    val ev = rows.toDF("user_id", "value")
    LayoutOps.zorderAudit(spark, ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  test("uniform grid: value-slice probes full-scan the linear layout, not z") {
    // probes 3–5 are value slices over the full user range: the
    // user-major sort prunes NOTHING (every file spans all values);
    // z-order files are 4×4 rank blocks, so at most one b-block row
    // of 4 files intersects a 2 000-cent slice
    (3 to 5).foreach { p =>
      assert(gridAudit(("linear", p)) === 16L, s"probe $p")
      assert(gridAudit(("zorder", p)) <= 4L, s"probe $p")
    }
  }

  test("uniform grid: z never scans more than the block perimeter; totals win") {
    assert(gridAudit.values.max <= 16L)
    val zTotal = gridAudit.collect { case (("zorder", _), n) => n }.sum
    val linTotal = gridAudit.collect { case (("linear", _), n) => n }.sum
    assert(zTotal < linTotal, s"z=$zTotal linear=$linTotal")
    assert(gridAudit.collect { case (("zorder", _), n) => n }.max <= 8L)
  }

  test("uniform grid: user-slice probes favor linear, and z stays bounded") {
    // probes 0–2 are 16-user slices: linear puts each inside 4
    // consecutive ra files; z needs the full b-block column (4 files
    // per intersecting a-block)
    (0 to 2).filter(p => LayoutOps.Probes(p)._2 < 64).foreach { p =>
      assert(gridAudit(("linear", p)) <= 4L, s"probe $p")
      assert(gridAudit(("zorder", p)) <= 8L, s"probe $p")
    }
  }

  test("q64: appends decay pruning on every probe; re-optimize repairs it") {
    import spark.implicits._
    // arrival order (event_id) must not cluster either dimension into
    // the append files: id = w·64 + u makes the delta slice
    // (id % 4 = 0 ⟺ u % 4 = 0) span every value, and each append
    // file (id DIV 4 mod 4 ⟺ u DIV 4 mod 4) contains u-runs spread
    // across the whole user range — both probe classes hit all four
    val rows = for (u <- 0 until 64; w <- 0 until 64)
      yield ((w * 64 + u).toLong, u.toLong, w * 6.0)
    val ev = rows.toDF("event_id", "user_id", "value")
    val audit = LayoutOps.layoutDecayAudit(spark, ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    LayoutOps.Probes.foreach { case (p, _, _, _, _) =>
      val dec = audit(("decayed", p))
      val re = audit(("reoptimized", p))
      assert(dec >= re, s"probe $p: decayed $dec < reoptimized $re")
      // arrival-ordered append files span ~the whole key space: every
      // probe that hits ANY data pays all 4 of them (probe 2's user
      // slice lies above the 64-user grid and legitimately hits 0)
      if (re > 0)
        assert(dec >= re + 4, s"probe $p: append tax missing ($dec vs $re)")
    }
  }

  test("q65: the advisory fires on the appended branch only, and acting on it pays") {
    import spark.implicits._
    val rows = for (u <- 0 until 64; w <- 0 until 64)
      yield ((w * 64 + u).toLong, u.toLong, w * 6.0)
    val ev = rows.toDF("event_id", "user_id", "value")
    val out = LayoutOps.layoutReoptAdvisory(spark, ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5))).toMap
    LayoutOps.Probes.foreach { case (p, _, _, _, _) =>
      val (beforeA, taxA, adviseA, afterA) = out(("appended", p))
      val (beforeF, taxF, adviseF, afterF) = out(("fresh", p))
      // appended branch: the derived rule must FIRE and the acted-on
      // audit must be the repaired layout's
      assert(adviseA, s"probe $p: append tax $taxA must trip the advisory")
      assert(taxA > LayoutOps.ReoptFileBudget, s"probe $p: tax $taxA under budget")
      assert(afterA <= beforeA, s"probe $p: acting must not cost more ($afterA vs $beforeA)")
      // control branch: same rule, no appends, must NOT fire
      assert(!adviseF && taxF === 0L, s"probe $p: fresh branch fired (tax $taxF)")
      assert(afterF === beforeF, s"probe $p: fresh after must equal before")
    }
    // the decision pays in aggregate over the probe workload
    val sumBefore = LayoutOps.Probes.map(p => out(("appended", p._1))._1).sum
    val sumAfter = LayoutOps.Probes.map(p => out(("appended", p._1))._4).sum
    assert(sumAfter < sumBefore,
      s"re-optimize must reduce total files scanned ($sumAfter vs $sumBefore)")
  }
}
