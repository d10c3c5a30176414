package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** graft_cdc_cuts semantics: the span array against a brute-force
  * per-position reference, codegen-vs-interpreted parity, and the
  * partition invariants every consumer depends on (spans tile the
  * payload exactly, in order, no gaps). */
class CdcCutsSpec extends SparkSpec {

  private val W = 16
  private val D = 64

  /** Brute-force reference: MD5 per window position, boundary iff the
    * digest's last byte ≡ 0 (mod D) — stated independently of the
    * expression's internal loop. */
  private def referenceSpans(s: String): Seq[(Int, Int)] = {
    val bytes = s.getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    for (p <- W until bytes.length) {
      md.reset()
      md.update(bytes, p - W, W)
      if (((md.digest()(15) & 0xff) % D) == 0) cuts += p
    }
    cuts += bytes.length
    cuts.sliding(2).map(w => (w(0), w(1) - w(0))).toSeq
  }

  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(7)
    Seq("", "x", "a" * (W - 1), "b" * W, "c" * (W + 1)) ++
      (0 until 50).map(_ => rnd.alphanumeric.take(20 + rnd.nextInt(400)).mkString)
  }

  test("spans match the brute-force reference and tile the payload exactly") {
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
      assert(spans === referenceSpans(t), s"doc $i (len ${t.length})")
      // tiling: in order, gap-free, covering [0, L)
      assert(spans.head._1 === 0)
      spans.sliding(2).foreach {
        case Seq((o1, l1), (o2, _)) => assert(o1 + l1 === o2, s"gap in doc $i")
        case _ =>
      }
      assert(spans.map(_._2).sum === t.getBytes("UTF-8").length)
    }
  }

  test("interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
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
    }
  }
}
