package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** graft_cdc_cuts semantics: the span array against a brute-force
  * per-position reference (stated over BYTE windows — the expression's
  * contract on any payload, ASCII or not), codegen-vs-interpreted
  * parity, string-vs-binary input parity, and the partition invariants
  * every consumer depends on (spans tile the payload exactly, in
  * order, no gaps). */
class CdcCutsSpec extends SparkSpec {

  private val W = 16
  private val D = 64

  /** Brute-force reference: per BYTE position p, the boundary hash is
    * MD5 over the UPPERCASE-HEX encoding of the W bytes ending at p
    * (the DuckDB-statable byte-range rule — see CdcCuts's scaladoc);
    * boundary iff the digest's last byte ≡ 0 (mod D). Stated
    * independently of the expression's internal loop (re-encodes per
    * position; the kernel encodes once). */
  private def referenceSpans(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    for (p <- W until bytes.length) {
      val hexWin = bytes.slice(p - W, p).map("%02X".format(_)).mkString
      md.reset()
      md.update(hexWin.getBytes("US-ASCII"))
      if (((md.digest()(15) & 0xff) % D) == 0) cuts += p
    }
    cuts += bytes.length
    cuts.sliding(2).map(w => (w(0), w(1) - w(0))).toSeq
  }

  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(7)
    Seq("", "x", "a" * (W - 1), "b" * W, "c" * (W + 1),
      // multi-byte UTF-8: byte length > char length, so a char-counting
      // chunker diverges from every assertion below
      "δέλτα→Ωß±µ " * 12,
      "mixed ascii κτω £20 → done " * 9) ++
      (0 until 50).map(_ => rnd.alphanumeric.take(20 + rnd.nextInt(400)).mkString)
  }

  test("spans match the brute-force byte-window reference and tile the payload exactly") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), col("t"),
        call_function("graft_cdc_cuts", col("t"), lit(W), lit(D)).as("spans"))
    val got = df.select(col("id"), col("t"), expr("spans.off"), expr("spans.len"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        r.getSeq[Int](2).zip(r.getSeq[Int](3)).toSeq))
      .toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val (t2, spans) = got(i.toLong)
      assert(t2 === t)
      assert(spans === referenceSpans(t.getBytes("UTF-8")), s"doc $i (len ${t.length})")
      // tiling: in order, gap-free, covering [0, L) in BYTES
      assert(spans.head._1 === 0)
      spans.sliding(2).foreach {
        case Seq((o1, l1), (o2, _)) => assert(o1 + l1 === o2, s"gap in doc $i")
        case _ =>
      }
      assert(spans.map(_._2).sum === t.getBytes("UTF-8").length)
    }
  }

  test("binary payloads (including non-UTF-8 bytes) chunk identically to the reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // raw bytes, NOT valid UTF-8 — the multimodal case (m-rows carry
    // binary payloads upstream of any string view)
    val blobs: Seq[Array[Byte]] = (0 until 20).map { _ =>
      val b = new Array[Byte](8 + rnd.nextInt(400)); rnd.nextBytes(b); b
    } :+ Array.empty[Byte]
    val df = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "b")
      .select(col("id"),
        call_function("graft_cdc_cuts", col("b"), lit(W), lit(D)).as("spans"))
    val got = df.select(col("id"), expr("spans.off"), expr("spans.len")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Int](1).zip(r.getSeq[Int](2)).toSeq).toMap
    blobs.zipWithIndex.foreach { case (b, i) =>
      assert(got(i.toLong) === referenceSpans(b), s"blob $i (len ${b.length})")
    }
    // string-vs-binary parity: the same content chunks the same
    // whether it arrives as a string or as its UTF-8 bytes
    val texts = corpus.filter(_.nonEmpty)
    val both = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.getBytes("UTF-8")) }
      .toDF("id", "t", "b")
      .select(
        call_function("graft_cdc_cuts", col("t"), lit(W), lit(D)).as("s1"),
        call_function("graft_cdc_cuts", col("b"), lit(W), lit(D)).as("s2"))
      .filter(expr("s1 <> s2")).count()
    assert(both === 0L, "string and binary views of the same bytes must agree")
  }

  test("interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{BinaryType, StringType}
    corpus.foreach { t =>
      val e = CdcCuts(BoundReference(0, StringType, nullable = false), W, D)
      val interp = e.eval(InternalRow(UTF8String.fromString(t)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val viaScala = CdcCuts.compute(UTF8String.fromString(t), W, D)
      assert(interp.numElements() === viaScala.numElements())
      // the SQL path above runs through whole-stage codegen (the
      // generated call site is the same static `compute`); here we pin
      // that the interpreted eval agrees element-for-element
      (0 until interp.numElements()).foreach { i =>
        val a = interp.getStruct(i, 2)
        val b = viaScala.getStruct(i, 2)
        assert(a.getInt(0) === b.getInt(0) && a.getInt(1) === b.getInt(1))
      }
      // binary-typed interpreted eval runs the same kernel
      val eb = CdcCuts(BoundReference(0, BinaryType, nullable = false), W, D)
      val interpB = eb.eval(InternalRow(t.getBytes("UTF-8")))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(interpB.numElements() === viaScala.numElements())
    }
  }
}
