package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupOps, TextOps}

/** graft_bloom_contains semantics + the d09 ≡ d08 equivalence the
  * Bloom prefilter must preserve, and the t13 scoring math.
  */
class BloomSpec extends SparkSpec {

  private def bloomOf(items: Seq[String], fpp: Double = 0.01) = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(items.size.toLong.max(1), fpp)
    items.foreach(bf.putString)
    spark.sparkContext.broadcast(bf)
  }

  test("bloom probe: no false negatives, few false positives, null-safe") {
    import spark.implicits._
    val inserted = (0 until 1000).map(i => s"gram-$i")
    val id = BloomRegistry.register(bloomOf(inserted))
    val probe = call_function("graft_bloom_contains", col("s"), lit(id))
    val hits = inserted.toDF("s").filter(probe).count()
    assert(hits == 1000L) // every inserted key must probe true
    val fps = (0 until 10000).map(i => s"absent-$i").toDF("s").filter(probe).count()
    assert(fps < 300L) // 1% fpp target, wide margin
    val nulls = Seq[Option[String]](None).toDF("s").select(probe.as("p")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("d09 bloom-prefiltered decontamination equals exact d08") {
    val d08 = DedupOps.decontaminateQ.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val d09 = DedupOps.decontaminateBloomQ.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(d09 == d08 && d08.nonEmpty)
    assert(d08.exists(_._3)) // the template corpus has real contamination
  }

  test("t13 unigram NLL matches hand-computed corpus frequencies") {
    import spark.implicits._
    // corpus: a a a b -> p(a)=3/4, p(b)=1/4
    val out = TextOps.unigramNll(Seq(1L -> "a a a", 2L -> "b").toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == math.rint(-math.log(0.75) * 1e4) / 1e4)
    assert(out(2L) == math.rint(-math.log(0.25) * 1e4) / 1e4)
  }

  test("t15 bands: repetition-graded corpus tails into boilerplate/keep/noise") {
    import spark.implicits._
    // doc i mixes (51-i) copies of the dominant token with one rare
    // token: NLL rises monotonically with i, so the p10/p90 band cuts
    // land on a graded distribution (a corpus of IDENTICAL docs has one
    // giant tie at the boundary and nothing strictly outside it — the
    // strict-inequality band semantics keep such a mass in 'keep')
    val docs = (1L to 50L).map(i =>
      i -> (Seq.fill(51 - i.toInt)("the") :+ s"tok$i").mkString(" "))
      .toDF("doc_id", "text")
    val out = TextOps.nllBand(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "boilerplate", s"most-repetitive doc: ${out(1L)}")
    assert(out(50L) == "noise", s"rarest doc: ${out(50L)}")
    assert(out(25L) == "keep")
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes("boilerplate") >= 2 && sizes("boilerplate") <= 8, sizes.toString)
    assert(sizes("noise") >= 2 && sizes("noise") <= 8, sizes.toString)
    // bands partition the corpus: every doc gets exactly one verdict
    assert(out.size === 50)
  }
}
