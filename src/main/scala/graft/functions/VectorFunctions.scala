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
