package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded KMV (k-minimum-values) distinct sketch (Bar-Yossef et al.
  * 2002; Beyer et al., SIGMOD'07): the k lexicographically-smallest
  * DISTINCT member digests. Digests are fixed-width lowercase hex
  * (md5), where lexicographic order equals numeric order — the
  * portable-tier device — so the sketch is bit-replayable by any
  * engine that can sort hex strings.
  *
  * Unlike the counter sketches (SpaceSaving's merge is only
  * bound-preserving), KMV is EXACTLY mergeable: bottom-k of a union
  * is a pure function of the two bottom-k's, so any merge tree yields
  * the identical sketch and the aggregate is deterministic end to end
  * — which is why the d24/d25 gate rows need no contract booleans:
  * the oracle replays the very same sketch with ORDER BY hh LIMIT k. */
final class KmvSketch(val k: Int) {
  /** Ascending bounded set of the k smallest distinct digests. */
  val set: java.util.TreeSet[String] = new java.util.TreeSet[String]()

  def add(h: String): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h.compareTo(set.last()) < 0 && set.add(h)) { set.pollLast(); () }
}

/** `graft_kmv(digest, k)` — mergeable KMV distinct sketch as a native
  * [[TypedImperativeAggregate]]: O(k) state per group regardless of
  * group cardinality, map-side-combinable like any partial aggregate.
  * Returns the sketch as an ascending `array<string>`; consumers read
  * `size(...)` (exact count when under capacity) or the k-th element
  * (the KMV estimator's threshold) and can union sketches relationally
  * (explode → distinct → bottom-k again) for set-operation estimates —
  * the d25 cross-source overlap path. */
case class KmvAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] {

  require(k > 0, "graft_kmv k must be positive")

  override def prettyName: String = "graft_kmv"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  override def update(b: KmvSketch, input: InternalRow): KmvSketch = {
    val h = child.eval(input)
    if (h != null) b.add(h.toString)
    b
  }

  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch = {
    val it = b.set.iterator()
    while (it.hasNext) a.add(it.next())
    a
  }

  override def eval(b: KmvSketch): Any = {
    val out = new Array[Any](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: KmvSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) out.writeUTF(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new KmvSketch(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { sk.set.add(in.readUTF()); i += 1 }
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren(0))
}
