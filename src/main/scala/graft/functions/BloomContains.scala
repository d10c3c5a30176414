package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a BROADCAST Bloom
  * filter — the per-row primitive a Bloom-prefiltered join needs,
  * which Spark exposes no public expression for (the
  * `DataFrameStatFunctions.bloomFilter` sketch is driver-side only,
  * and a Scala UDF would leave whole-stage codegen and box every row).
  *
  * Same broadcast-in-expression pattern as [[CellProbes]]: the plan
  * carries a handle, executors fetch the filter once per JVM, and the
  * generated code makes one virtual call per row. Probes use the raw
  * UTF-8 bytes, which matches `BloomFilter.putString`'s encoding, so
  * a filter built with putString answers mightContain for exactly the
  * same key space.
  *
  * Guarantee inherited from the sketch: NO false negatives — a probe
  * returning false proves the key was never inserted, so filtering
  * before an exact join cannot change the join's result, only shrink
  * its input. Null input → null.
  */
case class BloomContains(
    child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  /** Public: invoked from generated code via a reference object. */
  def contains(s: UTF8String): Boolean =
    bloom.value.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this, classOf[BloomContains].getName)
    defineCodeGen(ctx, ev, v => s"$ref.contains($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

/** Driver-side handoff of broadcast Bloom filters into analysis —
  * the [[CodebookRegistry]] mechanism for the literal-only SQL
  * function surface. Bounded LRU; built expressions hold their own
  * strong reference, so eviction only bars NEW analyses. Callers
  * should [[unregister]] once their plan is analyzed (Dataset
  * construction analyzes eagerly, so the resolved [[BloomContains]]
  * already holds the broadcast) — then the filter's lifetime is the
  * plan's, not the process's. */
object BloomRegistry {
  private val MaxEntries = 64
  private val filters =
    new java.util.LinkedHashMap[Integer, Broadcast[BloomFilter]](
      MaxEntries, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Integer, Broadcast[BloomFilter]]): Boolean =
        size() > MaxEntries
    }
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

  def register(b: Broadcast[BloomFilter]): Int = filters.synchronized {
    val id = nextId.getAndIncrement()
    filters.put(id, b)
    id
  }

  def get(id: Int): Broadcast[BloomFilter] = filters.synchronized {
    val b = filters.get(id)
    require(b != null, s"bloom filter $id is not registered (or was evicted)")
    b
  }

  /** Drop the registry's reference; live plans keep theirs. */
  def unregister(id: Int): Unit = filters.synchronized {
    filters.remove(id); ()
  }
}
