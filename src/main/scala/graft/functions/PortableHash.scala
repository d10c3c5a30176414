package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared plumbing for the portable (md5) hash kernels: a per-thread
  * MessageDigest (tasks share deserialized expression instances in
  * local mode, and MD5 instances are stateful) and a branch-free
  * lowercase-hex renderer. */
private[functions] object PortableHash {
  val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase 8-hex-char rendering of a 32-bit value (given as the
    * low 32 bits of a long) — identical to the substring of
    * DigestUtils.md5Hex the relational formulation emitted. */
  def hex8(v: Long): UTF8String = {
    val cs = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      cs(i) = HexChars(((v >>> ((7 - i) * 4)) & 0xF).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(cs)
  }
}

/** Row-local portable MinHash signature over a document's text — the
  * hot kernel of the `minhash_sigs` lake build and every inline
  * md5-family derivation (d14/d17/d21's audit tier, d12's ingest
  * deltas): whitespace tokenize → distinct 3-token shingles →
  * `digests` md5 calls per shingle → per-lane 32-bit minima → 32
  * lowercase-hex lanes, all in one eval.
  *
  * Why native (the [[MinHashBandKeys]] argument, applied to the md5
  * family): the relational formulation exploded one row per (doc,
  * distinct shingle), evaluated `digests` md5 expressions per row —
  * each allocating a fresh MessageDigest, a concat buffer, AND a
  * 32-char hex string — then hash-aggregated 32 per-lane `min(substring)`
  * UTF8String comparisons per row through a doc_id exchange. This
  * kernel computes the whole signature where the text already is: the
  * explode, the hex/substring allocations, and the aggregation
  * EXCHANGE are gone (the signature relation becomes scan → project —
  * at 100 TB the one shuffle left in the lake build is the bucketed
  * write's, §2.4's pay-the-keyed-exchange-once).
  *
  * Semantics (bit-identical to the relational formulation, gated by
  * the hash-checked d14/d15/d17/d21/d23 oracle rows):
  *  - tokens = text split on a single space, trailing empties KEPT
  *    (Spark's `split(text, " ")` → regex limit -1);
  *  - null text or < 3 tokens → NULL (the relational shape's
  *    `size(toks) >= 3` filter — callers filter the NULLs out);
  *  - shingle i = tokens i,i+1,i+2 joined by " "; duplicates hashed
  *    once (array_distinct there, a seen-set here — min is
  *    multiplicity-blind either way);
  *  - signature element p = min over shingles of the 8-hex-char lane
  *    `substr(md5("${p/lanes}:" + shingle), (p%lanes)*8+1, 8)`;
  *    lexicographic min on fixed-width lowercase hex == numeric min
  *    on the unsigned 32-bit lane value, so the kernel tracks integer
  *    minima and renders hex once per doc, not once per row. */
case class PortableMinHashSig(child: Expression, digests: Int, lanes: Int)
    extends UnaryExpression with CodegenFallback {

  require(digests > 0 && digests <= 10 && lanes > 0 && lanes <= 4,
    s"portable minhash geometry out of range: $digests digests x $lanes lanes")

  override def prettyName: String = "graft_portable_minhash_sig"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  // "<i>:" md5 prefixes, precomputed once per expression instance
  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until digests).map(i => s"$i:".getBytes(StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < 3) return null
    val nSh = toks.length - 2
    val nLanes = digests * lanes
    val mins = new Array[Long](nLanes)
    java.util.Arrays.fill(mins, 0x1FFFFFFFFL) // > any u32 lane value
    val seen = new java.util.HashSet[String](nSh * 2)
    val md = PortableHash.md5Local.get()
    var i = 0
    while (i < nSh) {
      val sh = new java.lang.StringBuilder(toks(i))
        .append(' ').append(toks(i + 1))
        .append(' ').append(toks(i + 2)).toString
      if (seen.add(sh)) {
        val sb = sh.getBytes(StandardCharsets.UTF_8)
        var d = 0
        while (d < digests) {
          md.reset()
          md.update(prefixes(d))
          md.update(sb)
          val dig = md.digest()
          var l = 0
          while (l < lanes) {
            val o = l * 4
            val v = ((dig(o) & 0xFFL) << 24) | ((dig(o + 1) & 0xFFL) << 16) |
              ((dig(o + 2) & 0xFFL) << 8) | (dig(o + 3) & 0xFFL)
            val p = d * lanes + l
            if (v < mins(p)) mins(p) = v
            l += 1
          }
          d += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](nLanes)
    var p = 0
    while (p < nLanes) { out(p) = PortableHash.hex8(mins(p)); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSig =
    copy(child = newChild)
}

/** Row-local portable 128-bit SimHash fingerprint — the `simhash_fp`
  * lake build's and d15's hot kernel: whitespace tokenize → per-token
  * occurrence counts → one md5 bit pool per DISTINCT token → 128
  * ±count bit sums → two majority-vote 64-bit lanes, all in one eval.
  *
  * Why native: the relational formulation grouped (doc, token) through
  * an exchange, parsed 32 `conv(substring(h, j, 1), 16, 10)` nibbles
  * per distinct token, and folded them through 128 conditional `sum`
  * aggregate columns in a second doc_id exchange. This kernel does the
  * same arithmetic on the raw digest bytes where the text already is:
  * both exchanges and every hex-string allocation are gone.
  *
  * Semantics (bit-identical, gated by the hash-checked d15 oracle):
  *  - tokens = split(text, " ") with trailing empties kept; null text
  *    → NULL (the relational shape dropped null-text docs at the
  *    explode — callers filter), empty text = one "" token (ditto);
  *  - bit w of lane l reads bit (w % 4) of hex nibble l·16 + w/4 of
  *    md5(token) (nibble j = high/low half-byte of digest byte j/2);
  *  - sums weight each distinct token by its occurrence count
  *    (Σ over occurrences ≡ Σ over distinct × count);
  *  - lane bit set iff its signed sum is strictly positive. */
case class PortableSimhashFp(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_portable_simhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    var t = 0
    while (t < toks.length) {
      counts.merge(toks(t), 1, (a, b) => a + b)
      t += 1
    }
    val sums = new Array[Int](128)
    val md = PortableHash.md5Local.get()
    val nibs = new Array[Int](32)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue
      md.reset()
      val dig = md.digest(e.getKey.getBytes(StandardCharsets.UTF_8))
      var k = 0
      while (k < 16) {
        nibs(2 * k) = (dig(k) >>> 4) & 0xF
        nibs(2 * k + 1) = dig(k) & 0xF
        k += 1
      }
      var w = 0
      while (w < 128) {
        val nib = nibs((w >>> 6) * 16 + ((w & 63) >>> 2))
        if (((nib >>> (w & 3)) & 1) == 1) sums(w) += cnt else sums(w) -= cnt
        w += 1
      }
    }
    val out = new Array[Long](2)
    var l = 0
    while (l < 2) {
      var lane = 0L
      var w = 0
      while (w < 64) {
        if (sums(l * 64 + w) > 0) lane |= (1L << w)
        w += 1
      }
      out(l) = lane
      l += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSimhashFp =
    copy(child = newChild)
}
