package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  * Pure `functions._` lambdas (zip_with / aggregate / transform) — no
  * UDFs, so the expressions are codegen-eligible and fully distributed.
  * Floats are widened to double before any arithmetic for stable,
  * engine-reproducible results.
  */
object VectorFunctions {

  /** Deterministic random hyperplanes (seeded), used by the sign-LSH
    * bucketer. Public-knowledge SimHash-for-cosine construction
    * (Charikar 2002). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Embedding dimensionality of the harness corpus (TESTDATA.md) —
    * lives here (not in an operator object) so the operator objects
    * that share it never form an object-initializer cycle. */
  val Dim = 64

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dyadic snap-to-grid — the float-discipline kernel that makes a
    * per-row double SUMMABLE order-independently (r7, replacing the
    * v02/v03/v06 `round(avg, 4)` contract whose pre-round double was
    * partial-aggregation-order dependent): multiply by a POWER OF TWO
    * (an exact exponent shift for every finite double — no rounding,
    * unlike the 10^k scaling inside `round()`), pin the half-up tie
    * convention textually as `floor(x·S + 0.5)` (the v01 device), and
    * sum the resulting exact longs. The one lossy step is a
    * deterministic per-row function, so the sum is bit-identical at
    * ANY partial-aggregation order in ANY engine; the terminal
    * division is then a single IEEE op over order-independent inputs.
    * For float32 inputs with |x| ≥ 2^-12 the snap at 2^35 is exactly
    * lossless (x·2^35 = m·2^(e+12) is already an integer); elsewhere
    * the grid error is < 2^-36 — ~12 orders below the float32 ulp of
    * the values it measures. */
  val SnapScale: Double = 34359738368.0 // 2^35: |x| ≤ ~1 components; Σ fits Long to ~10^8 rows/group
  val DistScale: Double = 1073741824.0 // 2^30: distances / squared distances (|d²| ≤ ~100)

  /** The SQL literal spellings of the snap scales — interpolate THESE
    * into oracle texts (never hand-write the number twice); the
    * require pins them to the exact Scala constants so engine and
    * oracle can never land on different grids. */
  val SnapScaleSql: String = "34359738368.0"
  val DistScaleSql: String = "1073741824.0"
  require(SnapScaleSql.toDouble == SnapScale && DistScaleSql.toDouble == DistScale,
    "snap-scale SQL literals drifted from the Scala constants")

  /** floor(x·scale + 0.5) as an exact Long (Spark's floor is already
    * LongType). Sum these, then divide once via [[snapMean]]. */
  def snapLong(x: Column, scale: Double = SnapScale): Column =
    floor(x * lit(scale) + lit(0.5))

  /** The terminal mean over a snapped sum: one IEEE division.
    * Mirror in SQL as `CAST(s AS DOUBLE) / (n * <scale>)`. */
  def snapMean(sumScaled: Column, n: Column, scale: Double = SnapScale): Column =
    sumScaled.cast("double") / (n * lit(scale))

  /** Native codegen'd dot product (see [[DotProduct]]); accepts
    * array<float> or array<double> on either side and sums in double,
    * bit-identical to folding the cast-to-double arrays in order. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Dot product against a constant plane (literal array). */
  def dotConst(v: Column, plane: Array[Double]): Column =
    dot(v, typedLit(plane.toSeq))

  /** Sign-LSH bucket id: one bit per hyperplane (positive half-space).
    * Vectors with high cosine similarity land in the same bucket with
    * probability (1 - theta/pi)^nPlanes. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotConst(v, p) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Planes-per-table sized to the corpus so expected bucket occupancy
    * stays ~targetBucket as data grows: 2^planes ≈ n / targetBucket.
    * Join-key cardinality therefore scales linearly with corpus size —
    * candidate volume is O(n · targetBucket · tables), never O(n²), and
    * there is no fixed parallelism ceiling at 100 TB. */
  def planesForCorpus(n: Long, targetBucket: Int = 32): Int = {
    val raw = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(30, math.max(4, raw))
  }

  /** Banded multi-table sign-LSH: `tables` independent hyperplane sets
    * (one seed per table), yielding one bucket id per table. A pair is
    * a candidate if it collides in ANY table (OR-amplification):
    * recall for a pair at angle theta is 1-(1-p^planes)^tables with
    * p = 1-theta/pi — the same band construction as the MinHash LSH in
    * DedupOps, replacing the former single fixed-64-bucket table. */
  def lshBandBuckets(
      v: Column, tables: Int, planesPerTable: Int, dim: Int,
      seed: Long = 42L): Column =
    array((0 until tables).map { t =>
      lshBucket(v, hyperplanes(planesPerTable, dim, seed + 1000L * t))
    }: _*)
}
