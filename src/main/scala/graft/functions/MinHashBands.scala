package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local MinHash LSH band keys over a document's text — the hot
  * kernel of the STREAMING near-dup dedup tier
  * ([[graft.streaming.TweetIngest.nearDupDedupedParse]]): whitespace
  * tokenize → 3-gram shingles → `bands × rowsPerBand` minhash → one
  * key per band, all in one eval.
  *
  * Why native: the higher-order-function formulation (shingles via
  * `transform(sequence(…))`, one `array_min(transform(…))` per
  * permutation) is interpreted — lambda functions have no codegen —
  * and its `element_at(split(text), i)` sub-expressions re-split the
  * text once per shingle position (~54 splits/row at 20 tokens in the
  * physical plan). Measured ~180 µs/row; this kernel is ~6 µs/row and
  * allocates only the shingle strings and the output array.
  *
  * Semantics (kept from the HOF formulation it replaces):
  *  - tokens = text split on a single space, trailing empties KEPT
  *    (Spark's `split(text, " ")` → regex limit -1);
  *  - shingle i = tokens i,i+1,i+2 joined by " ", for i in
  *    [0, n_tokens−3];
  *  - null text or < 3 tokens → NULL (callers fall back to a
  *    raw-payload fingerprint; an all-constant key would collapse
  *    every short doc into one survivor);
  *  - base = XXH64(shingle bytes, seed 42 — `xxhash64`'s base);
  *    permutation p's minhash = min over shingles of
  *    `XXH64.hashLong(base, p)` — re-hashing the 8-byte base instead
  *    of the string is 32× cheaper with the same pairwise-collision
  *    structure (equal keys for unrelated docs need a 2⁻⁶⁴ base
  *    collision);
  *  - band b's key = the fold `acc = hashLong(minhash_r, acc)` seeded
  *    by b, rendered as hex.
  */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_minhash_bands"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if bands > 0 && rowsPerBand > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column and positive band geometry, got " +
        s"${child.dataType.catalogString} ($bands x $rowsPerBand)")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val nSh = toks.length - 2
    if (nSh < 1) return null
    val base = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      val u = UTF8String.fromString(
        new java.lang.StringBuilder(toks(i))
          .append(' ').append(toks(i + 1))
          .append(' ').append(toks(i + 2)).toString)
      base(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        val p = (b * rowsPerBand + r).toLong
        var m = Long.MaxValue
        var j = 0
        while (j < nSh) {
          val h = XXH64.hashLong(base(j), p)
          if (h < m) m = h
          j += 1
        }
        acc = XXH64.hashLong(m, acc)
        r += 1
      }
      out(b) = UTF8String.fromString(java.lang.Long.toHexString(acc))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}
