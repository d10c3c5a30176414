package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk spans (m13's boundary detector, LBFS
  * SOSP'01) as ONE native expression: for a payload (string OR binary)
  * it returns the chunk span array `[(off, len), …]` induced by the
  * cut set `{0, b₁ … b_k, L}`, where BYTE position `p`
  * (W ≤ p ≤ L−1, 0-based) is a boundary iff the window hash of the
  * W bytes ending at `p` has its LAST BYTE ≡ 0 (mod divisor).
  *
  * The window hash is md5 over the window's UPPERCASE-HEX encoding —
  * not over the raw bytes — deliberately: it is the one byte-range
  * hash BOTH engines can state byte-exactly on arbitrary (non-ASCII,
  * non-UTF-8) payloads. DuckDB 1.0 has no `md5(BLOB)` and its VARCHAR
  * `substr` is character-based, so a raw-byte window rule is
  * unstatable there for multi-byte content; `md5(substr(hex(encode(
  * t)), (p−W)·2+1, W·2))` is, and Spark's `hex` produces the identical
  * uppercase encoding. Hex is injective on bytes, so the hash is still
  * a uniform function of the window CONTENT — the boundary
  * distribution (P = 1/divisor per position) and the re-alignment
  * property are those of LBFS; production swaps a Rabin/gear rolling
  * hash into the same plan shape either way.
  *
  * The output is SPANS, not cut positions, deliberately: the consumer
  * explodes the array once and slices each chunk from the payload —
  * an expression feeding a generator is evaluated once per row,
  * whereas a cut-position array referenced by `element_at` inside a
  * `transform` lambda gets INLINED by projection collapse and
  * re-evaluated per reference (measured: the cut-array shape was
  * SLOWER than the exploded pipeline it replaced; the span shape is
  * 4× faster).
  *
  * Why an expression and not the exploded pipeline it replaces: the
  * relational form materializes one row PER PAYLOAD BYTE (explode of
  * `sequence(W, L−1)` → md5 → filter → groupBy collect_list → join
  * back), which is ~L rows of operator traffic per document before
  * ~1/64 of them survive — correct and codegen'd, but the dominant
  * CPU cost of the row at 100 TB (the r13 audit's last noted
  * hot spot). Here the per-position loop runs inside one generated
  * function call per ROW: no row expansion, no aggregation, no join,
  * and the downstream chunk-splitting transform consumes the array
  * directly. Measured at sf0.1: 3.4 s → 0.95 s for the full m13 row.
  *
  * Offsets/lengths are BYTE offsets into the payload. A BinaryType
  * child is consumed as-is; a StringType child is chunked over its
  * UTF-8 encoding (identical bytes), and the consumer must then slice
  * the BINARY form of the payload — `substring` over a string is
  * character-based and would mis-slice multi-byte content (the r14
  * ASCII caveat, closed by [[graft.operators.MultimodalOps.cdcChunks]]
  * slicing the binary payload). */
case class CdcCuts(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_cdc_cuts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("off", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if ((child.dataType == StringType || child.dataType == BinaryType)
        && window > 0 && divisor > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string or binary) with positive window/divisor literals, got " +
        child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => CdcCuts.compute(s, window, divisor)
    case b: Array[Byte] => CdcCuts.computeBytes(b, window, divisor)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.CdcCuts.compute($c, $window, $divisor);"
      case _ =>
        s"${ev.value} = graft.functions.CdcCuts.computeBytes($c, $window, $divisor);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val HexUpper = "0123456789ABCDEF".getBytes("US-ASCII")

  def compute(s: UTF8String, window: Int, divisor: Int): ArrayData =
    computeBytes(s.getBytes, window, divisor)

  /** The per-row kernel, shared by the interpreted eval and the
    * generated code (called through the companion's static
    * forwarder — the loop never leaves whole-stage codegen's generated
    * function). The payload is hex-encoded ONCE; each window hash
    * reads its 2W-char slice of that buffer (no per-position
    * re-encoding). */
  def computeBytes(bytes: Array[Byte], window: Int, divisor: Int): ArrayData = {
    val len = bytes.length
    // the hex scratch buffer is len * 2 INTS — past 1 GiB the
    // multiplication overflows to a negative array size; fail with a
    // diagnosis instead (a payload that large should be pre-split
    // upstream: CDC chunking exists to bound exactly this)
    require(len <= Int.MaxValue / 2,
      s"graft_cdc_cuts: payload of $len bytes exceeds the " +
        s"${Int.MaxValue / 2}-byte hex-encoding bound; split the payload " +
        "upstream before chunking")
    val hex = new Array[Byte](len * 2)
    var i = 0
    while (i < len) {
      val v = bytes(i) & 0xff
      hex(2 * i) = HexUpper(v >>> 4)
      hex(2 * i + 1) = HexUpper(v & 0xf)
      i += 1
    }
    val spans = scala.collection.mutable.ArrayBuffer.empty[Any]
    val md = mdLocal.get()
    var last = 0
    var p = window
    while (p < len) { // boundaries only at p ∈ [W, L−1]
      md.reset()
      md.update(hex, (p - window) * 2, window * 2)
      if (((md.digest()(15) & 0xff) % divisor) == 0) {
        spans += org.apache.spark.sql.catalyst.InternalRow(last, p - last)
        last = p
      }
      p += 1
    }
    spans += org.apache.spark.sql.catalyst.InternalRow(last, len - last)
    new GenericArrayData(spans.toArray)
  }
}
