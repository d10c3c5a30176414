package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact integer Gram/co-moment accumulator over snapped vectors:
  * count, per-dimension sums, and the upper-triangle (i ≤ j) of
  * Σ xᵢ·xⱼ, all as longs.
  *
  * Layout (flattened, what [[GramAgg.eval]] returns):
  * `[0]` = n, `[1..d]` = Σxᵢ, `[1+d + tri(i,j)]` = Σxᵢxⱼ with
  * `tri(i,j) = i·d − i(i−1)/2 + (j − i)` for i ≤ j.
  *
  * Exactness contract: inputs are SNAPPED integer images
  * ([[VectorFunctions.snapLong]]) and every accumulated cell is an
  * exact long, so the aggregate is order-independent and mergeable by
  * elementwise addition — any merge tree yields the identical state,
  * and a SQL engine replays it with plain integer sums (the v03/t27
  * snap discipline). The caller picks the snap scale to bound the
  * cells: |x| ≤ 1 at scale 2^k gives |Σxᵢxⱼ| ≤ n·2^2k — int64-exact
  * for n ≤ 2^(63−2k) and double-exact for n ≤ 2^(53−2k). The BINDING
  * bound is usually downstream: a Pearson numerator n·Σxᵢxⱼ − Σxᵢ·Σxⱼ
  * reaches n²·2^2k, so double-exactness needs n ≤ 2^((53−2k)/2)
  * (~5.8k rows at k = 14) and int64 safety n ≤ 2^((63−2k)/2)
  * (~1.9·10⁵ at k = 14). A larger corpus drops the snap scale, not
  * the algorithm: k = 8 holds the corr numerator double-exact to
  * n ≈ 2^18.5 and int64-safe to n ≈ 2^23.5. */
final class GramState(val dim: Int) {
  val cells: Array[Long] = new Array[Long](1 + dim + dim * (dim + 1) / 2)

  def addVector(xs: Array[Long]): Unit = {
    cells(0) += 1L
    var i = 0
    var t = 1 + dim
    while (i < dim) {
      cells(1 + i) += xs(i)
      var j = i
      while (j < dim) {
        cells(t) += xs(i) * xs(j)
        t += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeFrom(o: GramState): Unit = {
    var i = 0
    while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
  }
}

/** `graft_gram(xs, <dim literal>)` — one-pass exact co-moment matrix
  * as a native [[TypedImperativeAggregate]]: O(d²) state per group
  * regardless of group cardinality, map-side-combinable. This is THE
  * scalable shape for corpus-level correlation/covariance audits — the
  * relational alternative explodes d(d−1)/2 pair rows per input row
  * (2,016× volume at d = 64) or self-joins the exploded table; the
  * aggregate folds each row into the triangle in place and ships one
  * ~17 KB buffer per partition. Input must be `array<bigint>` of
  * exactly `dim` snapped values (null arrays are skipped; a null/short
  * row is the caller's bug and throws). */
case class GramAgg(
    child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramState] {

  require(dim > 0, "graft_gram dim must be positive")

  /** Pin array<bigint> input at ANALYSIS time: `toLongArray` on an
    * array<double> column would reinterpret the IEEE bits as longs and
    * yield silently-garbage co-moments instead of an error. */
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_gram requires array<bigint> (snapped integer image), got " +
            other.catalogString)
    }

  override def prettyName: String = "graft_gram"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): GramState = new GramState(dim)

  override def update(b: GramState, input: InternalRow): GramState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"graft_gram: expected $dim elements, got ${arr.numElements()}")
      b.addVector(arr.toLongArray())
    }
    b
  }

  override def merge(a: GramState, b: GramState): GramState = {
    a.mergeFrom(b); a
  }

  override def eval(b: GramState): Any = new GenericArrayData(b.cells)

  override def serialize(b: GramState): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 * b.cells.length)
    buf.asLongBuffer().put(b.cells)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): GramState = {
    val st = new GramState(dim)
    ByteBuffer.wrap(bytes).asLongBuffer().get(st.cells)
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}
