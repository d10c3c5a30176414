package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** v15's float tier: the contract row proves convergence/bounds, but
  * only a planted spectrum can pin that the DIRECTION is right. */
class VectorPcaSpec extends SparkSpec {

  test("v15 top PC recovers a planted dominant axis") {
    import spark.implicits._
    // variance ~4 along axis 3, ~0.002 elsewhere: the top PC must be
    // ±e3 to high precision, and it must dominate the spectrum
    val rows = (0 until 200).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 8 + d) * 0.05)
      v(3) += (i % 7 - 3).toDouble
      Tuple1(v.toSeq)
    }
    val emb = rows.toDF("v")
    val (v, lambda, rel, n, trace, maxDiag) =
      VectorOps.topPrincipalComponent(emb, dim = 8)
    assert(n === 200L)
    assert(rel < 1e-9, s"power iteration must converge, residual $rel")
    assert(math.abs(v(3)) > 0.99,
      s"top PC must align with the planted axis, got ${v.toSeq}")
    assert(lambda > 0.9 * trace,
      "the planted axis carries nearly all the variance")
    assert(lambda >= maxDiag.toDouble * (1 - 1e-9) && lambda <= trace.toDouble)
  }

  test("v15 is safe on a degenerate (constant) corpus: zero matrix, zero lambda") {
    import spark.implicits._
    val emb = (0 until 50).map(_ => Tuple1(Seq.fill(8)(0.25))).toDF("v")
    val (v, lambda, rel, n, trace, _) =
      VectorOps.topPrincipalComponent(emb, dim = 8)
    assert(n === 50L && trace === 0L && lambda === 0.0 && rel === 0.0)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12,
      "the start vector stays unit when M annihilates everything")
  }

  test("v15 eigenvalue dominates every 2x2 principal minor bound (sanity vs v14)") {
    // on the real sf0.001 corpus: lambda1 >= max over dims of
    // M_ii (diag bound) is part of the gate; here additionally check
    // convergence quality on real data
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    val (_, lambda, rel, _, trace, maxDiag) =
      VectorOps.topPrincipalComponent(emb)
    assert(rel < 1e-6, s"residual $rel")
    assert(lambda >= maxDiag.toDouble && lambda <= trace.toDouble)
  }

  test("v16 deflation recovers the SECOND planted axis and removes the first") {
    import spark.implicits._
    // variance along axis 3 (±3 pattern) dominates; axis 5 (±1.5
    // pattern at a coprime period) is second; everything else ~0
    val rows = (0 until 210).map { i =>
      val v = Array.fill(8)(0.0)
      v(3) = if (i % 2 == 0) 3.0 else -3.0
      v(5) = if (i % 3 == 0) 1.5 else -0.75 // zero-mean over period 3
      Tuple1(v.toSeq)
    }
    val emb = rows.toDF("v")
    val (n, trace, _, v1, l1, rel1, v2, l2, _, sProj, sCent, sPost) =
      VectorOps.abttKernel(emb, 8, VectorOps.CorrSnap, VectorOps.PcIters)
    assert(n === 210L)
    assert(rel1 < 1e-9)
    assert(math.abs(v1(3)) > 0.999, s"v1 must be the planted top axis: ${v1.toSeq}")
    assert(math.abs(v2(5)) > 0.999, s"v2 must be the SECOND axis: ${v2.toSeq}")
    assert(l2 < l1 && l2 > 0.0)
    // the distributed sums agree with the driver spectrum
    assert(math.abs(sCent * n - trace.toDouble) <= 1e-6 * trace)
    assert(math.abs(sProj * n - l1) <= 1e-6 * l1)
    assert(math.abs(sPost * n - (trace - l1)) <= 1e-6 * trace,
      "postprocessed corpus variance = trace minus exactly the removed component")
  }
}
