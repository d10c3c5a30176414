package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.ZInterleave

/** Data-layout operators: how rows are ARRANGED into files, the lever
  * that turns min/max footer statistics into scan pruning at 100 TB.
  * A linear (single-column) sort clusters one dimension and shreds
  * every other; the z-order (Morton) curve interleaves two dimensions
  * so each file covers a compact rectangle of the key space and stays
  * useful for range probes on EITHER dimension.
  *
  * Raw column values must not be interleaved directly: a dimension
  * whose domain underfills its bit budget (user_id ≪ 2^16 here)
  * contributes dead high bits and the curve degenerates to a sort on
  * the other dimension (measured on this corpus: z-order LOST to the
  * linear layout at sf0.1 before normalization). So, as production
  * z-ordering does (Delta OPTIMIZE ZORDER's range-partition-id
  * device), each dimension is first rank-bucketed onto a 16-bucket
  * equal-mass grid by its exact quantiles ([[QuantileKernel]] — the
  * q33 broadcast shape, no corpus-wide window, no sampled
  * nondeterministic boundaries), and the buckets are interleaved.
  * With 16 files on the 8-bit z key, each file is a compact 4×4 block
  * of the 16×16 rank grid: ~1/4 of each dimension's mass, vs the
  * linear layout's 1/16 of one dimension × ALL of the other.
  *
  * In production the layout is applied at write time —
  * `repartitionByRange(F, $"zkey").sortWithinPartitions($"zkey")` —
  * and consumed for free by Parquet row-group pruning on the RAW
  * columns' min/max footers, which is exactly what the audit
  * measures.
  */
object LayoutOps {

  /** Rank buckets per dimension == files per layout (the 15 exact
    * 16-quantiles of each dimension are the bucket boundaries). */
  val ZFiles = 16

  /** Deterministic 2-D range probes (probe_id, a_lo, a_hi, b_lo,
    * b_hi) over the raw (user_id, value-in-cents) space, three per
    * class: 0–2 user-slices (full value range — favors the
    * user-major linear sort), 3–5 value-slices (full user range —
    * the class a user-major sort cannot prune AT ALL), 6–8 squares.
    * Shared literal source for the Spark relation and the oracle
    * VALUES list. */
  val Probes: Seq[(Int, Long, Long, Long, Long)] =
    (0 until 3).map { k => (k, 32L * k, 32L * k + 15L, 0L, 65535L) } ++
      (0 until 3).map { k => (3 + k, 0L, 65535L, 16000L * k, 16000L * k + 1999L) } ++
      (0 until 3).map { k => (6 + k, 32L * k, 32L * k + 31L, 12000L * k, 12000L * k + 5999L) }

  private val probsTagged: Seq[(String, Double)] =
    (1 until ZFiles).map(i => s"__q$i" -> i.toDouble / ZFiles)

  /** Per (layout, probe): how many of the [[ZFiles]] files a min/max-
    * pruning reader must scan, under rank-normalized z-order vs a
    * user-major linear sort of the same rows. Dimensions: a =
    * user_id, b = value in cents, both masked onto the 16-bit grid
    * (exact integer math end to end; the 2dp value domain makes
    * round(value·100) exact — the q35 device).
    *
    * Plan shape: one events scan for the per-dimension histograms
    * (both dimensions ride one explode), one for the file assignment;
    * the boundary relation collapses to ONE broadcast row, file
    * assignment is a row-local rank lookup + the [[ZInterleave]]
    * codegen kernel, and the per-(layout, file) min/max aggregation —
    * 32 rows — broadcasts into the probe grid. Every shuffle is keyed
    * and map-side combined; nothing corpus-wide. */
  def zorderAudit(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val base = events
      .where(col("value").isNotNull && col("user_id").isNotNull)
      .select(
        col("user_id").bitwiseAND(lit(ZInterleave.Mask)).as("a"),
        round(col("value") * 100).cast("long")
          .bitwiseAND(lit(ZInterleave.Mask)).as("b"))
    val dims = base
      .select(explode(array(
        struct(lit("a").as("dim"), col("a").as("v")),
        struct(lit("b").as("dim"), col("b").as("v")))).as("d"))
      .select(col("d.dim").as("dim"), col("d.v").as("v"))
    val hist = QuantileKernel.cumulativeHistogram(dims, "dim", "v")
    val bounds = QuantileKernel.discQuantiles(hist, "dim", "v", probsTagged)
      .select(col("dim"),
        array(probsTagged.map(p => col(p._1)): _*).as("bs"))
    // pivot the 2-row boundary relation into ONE broadcast row in a
    // single aggregation (a where/crossJoin pivot would recompute the
    // histogram subtree once per dimension — plan-visible as 4 scans)
    val bset = bounds.agg(
      first(when(col("dim") === "a", col("bs")), ignoreNulls = true).as("bs_a"),
      first(when(col("dim") === "b", col("bs")), ignoreNulls = true).as("bs_b"))
    val ranked = base.crossJoin(broadcast(bset))
      .select(col("a"), col("b"),
        size(filter(col("bs_a"), x => col("a") > x)).cast("long").as("ra"),
        size(filter(col("bs_b"), x => col("b") > x)).cast("long").as("rb"))
    val keyed = ranked.select(col("a"), col("b"),
      shiftright(call_function("graft_zorder", col("ra"), col("rb")), 4)
        .as("zfile"),
      col("ra").as("linfile"))
    val u = keyed
      .select(explode(array(
        struct(lit("zorder").as("layout"), col("zfile").as("file_id")),
        struct(lit("linear").as("layout"), col("linfile").as("file_id")))).as("x"),
        col("a"), col("b"))
      .select(col("x.layout").as("layout"), col("x.file_id").as("file_id"),
        col("a"), col("b"))
    val fs = u.groupBy(col("layout"), col("file_id"))
      .agg(min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .withColumnRenamed("layout", "f_layout")
    val probesDf = Probes.toDF("probe_id", "a_lo", "a_hi", "b_lo", "b_hi")
    val grid = Seq("zorder", "linear").toDF("layout")
      .crossJoin(broadcast(probesDf))
    grid.join(broadcast(fs),
        col("f_layout") === col("layout") &&
          col("min_a") <= col("a_hi") && col("max_a") >= col("a_lo") &&
          col("min_b") <= col("b_hi") && col("max_b") >= col("b_lo"),
        "left")
      .groupBy(col("layout"), col("probe_id"))
      .agg(count(col("file_id")).as("files_hit"))
  }

  private def zorderOracleSql: String = {
    val boundarySelects = probsTagged
      .map { case (_, p) => QuantileKernel.discSelectSql(p.toString, "v") }
      .mkString(",\n          ")
    val probeValues = Probes
      .map { case (id, aLo, aHi, bLo, bHi) => s"($id, $aLo, $aHi, $bLo, $bHi)" }
      .mkString(", ")
    val m = ZInterleave.Mask
    s"""WITH base AS (
       |  SELECT user_id & $m AS a,
       |         CAST(round(value * 100) AS BIGINT) & $m AS b
       |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
       |d AS (SELECT 'a' AS dim, a AS v FROM base
       |      UNION ALL SELECT 'b' AS dim, b AS v FROM base),
       |h AS (SELECT dim, v, count(*) AS cnt FROM d GROUP BY 1, 2),
       |ch AS (SELECT dim, v,
       |              sum(cnt) OVER (PARTITION BY dim ORDER BY v) AS cum,
       |              sum(cnt) OVER (PARTITION BY dim) AS n
       |       FROM h),
       |bd AS (SELECT dim,
       |          [$boundarySelects] AS bs
       |       FROM ch GROUP BY dim),
       |r AS (SELECT a, b,
       |             len(list_filter((SELECT bs FROM bd WHERE dim = 'a'),
       |                             x -> a > x)) AS ra,
       |             len(list_filter((SELECT bs FROM bd WHERE dim = 'b'),
       |                             x -> b > x)) AS rb
       |      FROM base),
       |z0 AS (SELECT a, b, ra, ra AS sa, rb AS sb FROM r),
       |${ZInterleave.spreadCtesSql("z0", "z", "a, b, ra")},
       |k AS (SELECT a, b, ra, (sa | (sb << 1)) >> 4 AS zfile
       |      FROM ${ZInterleave.spreadLastCte("z")}),
       |u AS (SELECT 'zorder' AS layout, zfile AS file_id, a, b FROM k
       |      UNION ALL
       |      SELECT 'linear' AS layout, ra AS file_id, a, b FROM k),
       |fs AS (SELECT layout, file_id,
       |              min(a) AS min_a, max(a) AS max_a,
       |              min(b) AS min_b, max(b) AS max_b
       |       FROM u GROUP BY 1, 2),
       |p AS (SELECT * FROM (VALUES $probeValues)
       |        AS t(probe_id, a_lo, a_hi, b_lo, b_hi)),
       |g AS (SELECT l.layout, p.*
       |      FROM (VALUES ('zorder'), ('linear')) AS l(layout) CROSS JOIN p)
       |SELECT g.layout, g.probe_id,
       |       CAST(count(fs.file_id) AS BIGINT) AS files_hit
       |FROM g LEFT JOIN fs ON fs.layout = g.layout
       |  AND fs.min_a <= g.a_hi AND fs.max_a >= g.a_lo
       |  AND fs.min_b <= g.b_hi AND fs.max_b >= g.b_lo
       |GROUP BY 1, 2""".stripMargin
  }

  /** q57 — the layout experiment at the gate: same rows, two layouts,
    * the pruning cost of every probe hash-checked in both engines. */
  val zorderAuditQ: GraftQuery =
    GraftQuery("q57_zorder_layout", zorderOracleSql) { (spark, sf) =>
      zorderAudit(spark, Tables.events(spark, sf))
    }

  val all: Seq[GraftQuery] = Seq(zorderAuditQ)
}
