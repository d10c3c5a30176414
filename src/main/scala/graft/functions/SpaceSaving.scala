package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded SpaceSaving summary (Metwally et al. 2005): at most `cap`
  * counters; each counter's estimate over-counts its user's true
  * weight by at most `err` (the evicted minimum it inherited), so
  * `est − err ≤ true ≤ est`, and any user whose true weight exceeds
  * total/cap is guaranteed a counter. */
final class SpaceSavingSketch(val cap: Int) {
  /** user → (est, err). */
  val counters: mutable.HashMap[Long, (Long, Long)] = mutable.HashMap.empty

  /** Upper bound on the true weight of any UNTRACKED user: 0 while
    * under capacity (untracked ⇒ never seen), else the minimum
    * estimate (the SpaceSaving invariant). */
  def untrackedBound: Long =
    if (counters.size < cap) 0L
    else counters.valuesIterator.map(_._1).min

  def add(u: Long, w: Long): Unit =
    counters.get(u) match {
      case Some((e, r)) => counters.update(u, (e + w, r))
      case None if counters.size < cap => counters.update(u, (w, 0L))
      case None =>
        // deterministic victim: (est ASC, user ASC)
        val (vu, (ve, _)) = counters.minBy { case (cu, (ce, _)) => (ce, cu) }
        counters.remove(vu)
        counters.update(u, (ve + w, ve))
    }
}

/** `graft_space_saving(user, weight, cap)` — mergeable SpaceSaving
  * heavy-hitter aggregate as a native [[TypedImperativeAggregate]]:
  * O(cap) state per group regardless of group cardinality (the
  * bounded-memory batch twin of the exact q44 top-k, and the same
  * summary the streaming tier keeps per (type, day)). Returns the full
  * counter set as `array<struct<user_id, est, err>>` sorted
  * (est DESC, user ASC); consumers take their top-k prefix and carry
  * the per-counter error bound.
  *
  * The MERGE is the conservative mergeable-summaries combine (Agarwal
  * et al., PODS'12): for each user in either summary, the merged upper
  * bound adds the other side's untracked bound when the user is
  * missing there, the merged lower bound adds 0 — then the top `cap`
  * users by upper bound survive, carrying `err = upper − lower`. Both
  * directions of the containment `est − err ≤ true ≤ est` are
  * preserved by construction under ANY merge tree, which is what lets
  * partial sketches combine map-side like any other partial aggregate.
  * (The conservative combine trades a little coverage for simplicity:
  * each merge level can dilute the tracked-above-total/cap guarantee
  * by the summed untracked bounds — the lossless Misra-Gries-style
  * merge would preserve it exactly — so consumers that need the
  * Metwally coverage theorem verbatim feed one buffer per group, as
  * the q54 row does.) Merge is commutative but (like every bounded
  * summary) not exactly associative: different merge trees can
  * surface different borderline counters while every surfaced bound
  * stays valid —
  * contract consumers therefore check bound validity and recall
  * floors, never counter-set equality (the q22/q24 sketch-contract
  * philosophy; the q54 registry row additionally feeds pre-reduced,
  * co-partitioned, deterministically-ordered counts so its gate hash
  * is stable run to run). */
case class SpaceSavingAgg(
    child: Expression, weight: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch] {

  require(cap > 0, "graft_space_saving cap must be positive")

  override def prettyName: String = "graft_space_saving"
  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingSketch =
    new SpaceSavingSketch(cap)

  override def update(b: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val u = child.eval(input)
    val w = weight.eval(input)
    if (u != null && w != null) b.add(u.asInstanceOf[Long], w.asInstanceOf[Long])
    b
  }

  override def merge(a: SpaceSavingSketch, b: SpaceSavingSketch): SpaceSavingSketch = {
    if (b.counters.isEmpty) return a
    if (a.counters.isEmpty) { a.counters ++= b.counters; return a }
    val ua = a.untrackedBound
    val ub = b.untrackedBound
    val users = (a.counters.keySet ++ b.counters.keySet).toArray
    val merged = users.map { u =>
      val (ea, ra) = a.counters.getOrElse(u, (ua, ua)) // untracked: [0, ua]
      val (eb, rb) = b.counters.getOrElse(u, (ub, ub))
      (u, ea + eb, ra + rb) // upper = Σ upper, err = upper − Σ lower
    }
    val kept = merged.sortBy { case (u, e, _) => (-e, u) }.take(cap)
    a.counters.clear()
    kept.foreach { case (u, e, r) => a.counters.update(u, (e, r)) }
    a
  }

  override def eval(b: SpaceSavingSketch): Any = {
    val rows = b.counters.toArray
      .sortBy { case (u, (e, _)) => (-e, u) }
      .map { case (u, (e, r)) => InternalRow(u, e, r) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(b: SpaceSavingSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counters.size)
    b.counters.foreach { case (u, (e, r)) =>
      out.writeLong(u); out.writeLong(e); out.writeLong(r)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch = {
    val buf = ByteBuffer.wrap(bytes)
    val sk = new SpaceSavingSketch(cap)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      sk.counters.update(buf.getLong, (buf.getLong, buf.getLong))
      i += 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}
