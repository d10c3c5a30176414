package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`probes` IVF cells for an embedding row, scored against a
  * BROADCAST codebook: `array<int>` of cell ids ordered by
  * (dot(v, centroid) desc, cell id desc), element 1 = the assignment
  * cell.
  *
  * Why an expression over a broadcast instead of the two obvious
  * formulations:
  *  - per-centroid literal `struct(dot(v, lit(c)), i)` arrays put
  *    k·dim literal doubles in the logical plan — at a 4096-cell
  *    codebook that is ~262k literals analyzed, optimized, and
  *    shipped with every task binary (the round-2 plan-bloat defect);
  *  - a broadcast codebook RELATION cross-joined under an argmax
  *    aggregation/window materializes n·k rows into the aggregation:
  *    the window form shuffles n·sqrt(n) rows and the collect_list
  *    form buffers k structs per group map-side — both collapse at
  *    100 TB.
  * Here the plan carries one broadcast HANDLE; executors fetch the
  * codebook once per JVM (torrent broadcast), each row does k·dim
  * fused multiply-adds in a tight primitive loop, and the projection
  * stays inside whole-stage codegen (the generated code makes one
  * virtual call into [[computeProbes]] per row — the same
  * reference-object pattern Spark's own regexp expressions use).
  *
  * Scoring matches the first-k/k-means codebook contract: centroids
  * are L2-normalized, so the dot argmax is the cosine argmax; ties
  * break toward the HIGHER cell id (parity with both the former
  * struct-max formulation and the DuckDB oracle's
  * `ORDER BY score DESC, cell DESC`).
  *
  * Null semantics follow [[DotProduct]]: null array → null, any null
  * element → null, dimension mismatch with the codebook → null.
  */
case class CellProbes(
    child: Expression,
    codebook: Broadcast[Array[Array[Double]]],
    probes: Int) extends UnaryExpression {

  require(probes >= 1, "probes must be >= 1")

  override def prettyName: String = "graft_cell_probes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public: invoked from generated code via a reference object. */
  def computeProbes(v: ArrayData): ArrayData = {
    val cb = codebook.value
    val k = cb.length
    val n = v.numElements()
    if (k == 0 || cb(0).length != n) return null
    // one pass extracting to a primitive array: the k scoring loops
    // then run over double[] without ArrayData virtual calls
    val vv = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vv(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cb(c)
      var s = 0.0
      i = 0
      while (i < n) { s += vv(i) * cent(i); i += 1 }
      scores(c) = s
      c += 1
    }
    // p passes of masked argmax — O(k·p) with p tiny, no full sort
    val p = math.min(probes, k)
    val chosen = new Array[Int](p)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < p) {
      var best = -1
      c = 0
      while (c < k) {
        if (!used(c) && (best < 0 || scores(c) > scores(best) ||
          (scores(c) == scores(best) && c > best))) best = c
        c += 1
      }
      used(best) = true
      chosen(j) = best
      j += 1
    }
    new GenericArrayData(chosen)
  }

  override def nullSafeEval(input: Any): Any =
    computeProbes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellProbes", this, classOf[CellProbes].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $ref.computeProbes($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellProbes =
    copy(child = newChild)
}

/** Driver-side handoff of broadcast codebooks into analysis: the SQL
  * function surface only passes Expressions, so `graft_cell_probes`
  * takes a literal registry id and the injected builder resolves it
  * here. Bounded LRU — the expression itself holds the strong
  * reference once built, so evicted entries only bar NEW analyses,
  * and old broadcasts become GC-collectable (ContextCleaner) when
  * their plans are released. */
object CodebookRegistry {
  private val MaxEntries = 64
  private val books =
    new java.util.LinkedHashMap[Integer, Broadcast[Array[Array[Double]]]](
      MaxEntries, 0.75f, true) { // access-order: get() refreshes (true LRU)
      override def removeEldestEntry(
          e: java.util.Map.Entry[Integer, Broadcast[Array[Array[Double]]]]): Boolean =
        size() > MaxEntries
    }
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

  def register(b: Broadcast[Array[Array[Double]]]): Int = books.synchronized {
    val id = nextId.getAndIncrement()
    books.put(id, b)
    id
  }

  def get(id: Int): Broadcast[Array[Array[Double]]] = books.synchronized {
    val b = books.get(id)
    require(b != null, s"codebook $id is not registered (or was evicted)")
    b
  }

  /** Drop the registry's reference; live plans keep theirs. */
  def unregister(id: Int): Unit = books.synchronized {
    books.remove(id); ()
  }
}
