package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection over one query's
  * candidate pool (Carbonell & Goldstein 1998): from
  * `array<struct<vec_id, v, nrm, rel>>` pick `k` items, the first by
  * max relevance, each next by max `lam·rel − penWeight·maxSim` where
  * maxSim is the candidate's max cosine to the already-selected set.
  * Ties break toward the smaller vec_id at every step. Returns
  * `array<struct<neighbor_id, rank, rel, mmr_score>>` in rank order
  * (rank 1's mmr_score is its relevance — no penalty exists yet).
  *
  * Why an expression instead of the two obvious formulations:
  *  - an unrolled k-step DataFrame loop (join-penalize-argmax per
  *    step) plans the candidate scan once PER STEP and pays k global
  *    shuffle barriers — the greedy data dependency chains them;
  *  - collect-to-driver greedy is a driver-side loop over what, at
  *    serving-batch scale, is millions of query pools.
  *  Here the pool rides ONE groupBy shuffle (collect_list, bounded at
  *  C·dim doubles per query by the candidate-rank cutoff upstream),
  *  and the greedy is row-local O(C·k·dim) — every query selects in
  *  parallel, no cross-query coordination at any scale.
  *
  * Float discipline: the cosine is the same fold-left dot / norm
  * product as every other row (`list_dot_product` parity); the
  * penalty max is exact (max of identical doubles); the score is two
  * multiplies and a subtract with `lam` and `penWeight` pinned as
  * SEPARATE literals in both texts (never computing 1−λ, whose IEEE
  * result differs from the decimal literal). The selection is
  * therefore bit-reproducible against the oracle's unrolled-CTE
  * formulation, and pool ORDER never matters: every argmax scans the
  * whole pool with the vec_id tie-break.
  *
  * Null semantics: null pool → null; a null struct, null vector, or
  * null element anywhere → null (the operator always builds the pool
  * from non-null projections, so this only guards misuse).
  */
case class MmrSelect(
    child: Expression, k: Int, lam: Double, penWeight: Double)
  extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "graft_mmr_select"

  private val outStruct = StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("rank", IntegerType, nullable = false),
    StructField("rel", DoubleType, nullable = false),
    StructField("mmr_score", DoubleType, nullable = false)))

  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, DoubleType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<long, array<double>, double, double>>, " +
        s"got ${other.catalogString}")
  }

  /** Public: invoked from generated code via a reference object. */
  def select(pool: ArrayData): ArrayData = {
    val nC = pool.numElements()
    if (nC == 0) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](nC)
    val vecs = new Array[Array[Double]](nC)
    val nrms = new Array[Double](nC)
    val rels = new Array[Double](nC)
    var c = 0
    while (c < nC) {
      if (pool.isNullAt(c)) return null
      val row = pool.getStruct(c, 4)
      if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2) || row.isNullAt(3))
        return null
      ids(c) = row.getLong(0)
      val v = row.getArray(1)
      val d = v.numElements()
      val vv = new Array[Double](d)
      var i = 0
      while (i < d) {
        if (v.isNullAt(i)) return null
        vv(i) = v.getDouble(i)
        i += 1
      }
      vecs(c) = vv
      nrms(c) = row.getDouble(2)
      rels(c) = row.getDouble(3)
      c += 1
    }
    val kk = math.min(k, nC)
    val used = new Array[Boolean](nC)
    val pen = Array.fill(nC)(Double.NegativeInfinity)
    val out = new Array[Any](kk)
    // rank 1: pure relevance argmax, smaller id on ties
    var best = -1
    c = 0
    while (c < nC) {
      if (best < 0 || rels(c) > rels(best) ||
        (rels(c) == rels(best) && ids(c) < ids(best))) best = c
      c += 1
    }
    used(best) = true
    out(0) = new GenericInternalRow(
      Array[Any](ids(best), 1, rels(best), rels(best)))
    var last = best
    var j = 1
    while (j < kk) {
      // fold the newly selected item into each survivor's penalty max —
      // after k steps each candidate has seen every selected item once
      c = 0
      while (c < nC) {
        if (!used(c)) {
          // decide-before-divide: zero-norm cosine pins to 0.0 (the
          // operator-level contract) — a NaN here would poison both
          // argmax loops into pool-order-dependent selection
          val cos =
            if (nrms(c) == 0.0 || nrms(last) == 0.0) 0.0
            else {
              val a = vecs(c); val b = vecs(last)
              var s = 0.0
              var i = 0
              while (i < a.length) { s += a(i) * b(i); i += 1 }
              s / (nrms(c) * nrms(last))
            }
          if (cos > pen(c)) pen(c) = cos
        }
        c += 1
      }
      best = -1
      var bestScore = 0.0
      c = 0
      while (c < nC) {
        if (!used(c)) {
          val m = lam * rels(c) - penWeight * pen(c)
          if (best < 0 || m > bestScore ||
            (m == bestScore && ids(c) < ids(best))) { best = c; bestScore = m }
        }
        c += 1
      }
      used(best) = true
      out(j) = new GenericInternalRow(
        Array[Any](ids(best), j + 1, rels(best), bestScore))
      last = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    select(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmrSelect", this, classOf[MmrSelect].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $ref.select($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}
