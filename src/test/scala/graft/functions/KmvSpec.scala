package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The KMV sketch's claims, pinned on PLANTED fixtures (the d24/d25
  * gate rows hash-check the sketch against the oracle's replay on the
  * corpus; accuracy in the ESTIMATING regime is probabilistic, so its
  * non-vacuous pins live here): exact determinism under every merge
  * tree (KMV's bottom-k-of-union IS a pure function of the inputs,
  * unlike SpaceSaving's bound-preserving combine), under-capacity
  * exactness, set semantics, estimator accuracy, and the union-sketch
  * Jaccard estimate the d25 row builds relationally. */
class KmvSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Aggregate member strings into one sketch across `parts`
    * partitions — parts > 1 exercises real partial-buffer merges with
    * a nondeterministic tree; the result must not depend on it. */
  private def sketchOf(members: Seq[String], k: Int, parts: Int): Seq[String] = {
    import spark.implicits._
    members.toDF("m").repartition(parts)
      .agg(call_function("graft_kmv", md5(col("m")), lit(k)).as("sk"))
      .select(explode(col("sk")).as("h"))
      .collect().map(_.getString(0)).toSeq
  }

  test("merge determinism: identical sketch under every merge tree") {
    val members = (0 until 5000).map(i => s"member$i")
    val expected = members.map(md5hex).distinct.sorted.take(256)
    for (parts <- Seq(1, 2, 5, 11, 32)) {
      val sk = sketchOf(members, k = 256, parts = parts)
      assert(sk === expected, s"sketch diverged at parts=$parts")
    }
  }

  test("under capacity the sketch IS the set and stays sorted ascending") {
    val members = (0 until 100).map(i => s"m$i")
    val sk = sketchOf(members ++ members, k = 256, parts = 3) // dups too
    assert(sk === members.map(md5hex).distinct.sorted,
      "under-cap sketch must be the full sorted digest set")
    assert(sk.length === 100, "duplicates must not inflate the sketch")
  }

  test("estimator: (k-1)*2^60/h60 within 10% on a 10k-member set") {
    val n = 10000
    val sk = sketchOf((0 until n).map(i => s"elem$i"), k = 256, parts = 4)
    assert(sk.length === 256)
    val h60 = java.lang.Long.parseLong(sk.last.take(15), 16)
    val est = 255.0 * 1152921504606846976.0 / h60
    assert(math.abs(est / n - 1.0) < 0.10,
      s"KMV estimate $est too far from true $n (theory sigma ~ ${1 / math.sqrt(254.0)})")
  }

  test("union-sketch Jaccard (the d25 estimate) recovers planted overlap") {
    // |A| = |B| = 4000, |A ∩ B| = 2000 -> J = 1/3
    val a = (0 until 4000).map(i => s"shared$i")
    val b = (2000 until 6000).map(i => s"shared$i")
    val k = 512
    val skA = sketchOf(a, k, parts = 3).toSet
    val skB = sketchOf(b, k, parts = 3).toSet
    // bottom-k of the union from the two sketches alone, then count
    // members in both sketches - exactly what d25 does relationally
    val unionK = (skA ++ skB).toSeq.sorted.take(k)
    val jac = unionK.count(h => skA(h) && skB(h)).toDouble / unionK.length
    assert(math.abs(jac - 1.0 / 3) < 0.07,
      s"union-sketch Jaccard $jac too far from planted 1/3")
  }

  test("nulls are skipped, empty input yields an empty sketch") {
    import spark.implicits._
    val sk = Seq(Some("x"), None, Some("x")).toDF("m")
      .agg(call_function("graft_kmv", md5(col("m")), lit(8)).as("sk"))
      .select(size(col("sk"))).collect().head.getInt(0)
    assert(sk === 1)
    val empty = Seq.empty[String].toDF("m")
      .agg(call_function("graft_kmv", md5(col("m")), lit(8)).as("sk"))
      .select(size(col("sk"))).collect().head.getInt(0)
    assert(empty === 0)
  }
}
