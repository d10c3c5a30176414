package graft.sources

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps

class SignatureLakeSpec extends SparkSpec {

  test("one derivation per (session, sfDir): same persisted instance, parity with direct derivation") {
    SignatureLake.invalidate(spark)
    val a = SignatureLake.portableBandKeys(spark, sf001)
    val b = SignatureLake.portableBandKeys(spark, sf001)
    assert(a eq b, "second read must hit the materialized entry")
    assert(a.storageLevel.useMemory, "the index must be persisted")

    // the index IS the derivation — row-for-row
    val direct = DedupOps.portableBandKeys(
      DedupOps.portableSignatures(Tables.documents(spark, sf001)))
    assert(a.exceptAll(direct).isEmpty && direct.exceptAll(a).isEmpty,
      "lake band keys must equal a cold derivation")

    // distinct scale factors are distinct entries
    val other = SignatureLake.portableBandKeys(spark, sf01)
    assert(!(other eq a))

    SignatureLake.invalidate(spark)
    // (storageLevel can't distinguish the dropped entry from the fresh
    // one — Spark's cache lookup is by canonical plan, and the fresh
    // entry re-registers an identical plan — so pin identity only)
    val c = SignatureLake.portableBandKeys(spark, sf001)
    assert(!(c eq a), "invalidate must force a fresh entry")
    SignatureLake.invalidate(spark)
  }

  test("fingerprint and ann-bucket families cover the corpus") {
    SignatureLake.invalidate(spark)
    val nDocs = Tables.documents(spark, sf001).count()
    val nVecs = Tables.embeddings(spark, sf001).count()
    assert(SignatureLake.portableFingerprints(spark, sf001).count() === nDocs)
    assert(SignatureLake.portableAnnBuckets(spark, sf001).count()
      === nVecs * DedupOps.PortableAnnTables)
    SignatureLake.invalidate(spark)
  }
}
