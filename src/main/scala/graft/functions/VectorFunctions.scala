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

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Dot product against a constant plane (literal array). */
  def dotConst(v: Column, plane: Array[Double]): Column =
    aggregate(zip_with(v, typedLit(plane.toSeq), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-LSH bucket id: one bit per hyperplane (positive half-space).
    * Vectors with high cosine similarity land in the same bucket with
    * probability (1 - theta/pi)^nPlanes. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotConst(v, p) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
}
