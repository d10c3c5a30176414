package graft

import org.apache.spark.sql.functions._

/** Property gate over [[FixtureSlices]] — the two r15 bug classes,
  * made impossible to reintroduce silently:
  *  1. an UNREACHABLE residue (d37's `3 mod 3`) fails at slice
  *     construction;
  *  2. an EMPTY or SWALLOWED slice (the CDC suffix landing entirely
  *     inside the takedown slice, vacating d36's multi-byte teeth)
  *     fails here against the real gate corpus, not a synthetic id
  *     range — non-dense or shifted ids would be caught too. */
class FixtureSlicesSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame, col0: String): Seq[Long] =
    df.select(col(col0)).collect().map(_.getLong(0)).toSeq

  test("every declared slice is reachable, uniquely named, and non-empty on the gate corpus") {
    val names = FixtureSlices.all.map(_.name)
    assert(names.distinct.size === names.size, s"duplicate slice names: $names")
    val docIds = ids(Tables.documents(spark, sf001), "doc_id")
    val vecIds = ids(Tables.embeddings(spark, sf001), "vec_id")
    FixtureSlices.all.foreach { s =>
      val domain = if (s eq FixtureSlices.embDelta) vecIds else docIds
      assert(domain.exists(s.contains),
        s"fixture slice '${s.name}' (% ${s.mod} == ${s.rem}) is EMPTY on the " +
          "gate corpus — its gate would be a no-op both engines agree on")
    }
    // the embedding-keyed slices must also be non-empty on vec ids
    // (takedown and the sweeps run on both id domains)
    (FixtureSlices.takedown +: FixtureSlices.compactSweep).foreach { s =>
      assert(vecIds.exists(s.contains),
        s"slice '${s.name}' empty on the embedding ids")
    }
  }

  test("crossing slice pairs overlap AND separate on the full gate-corpus range") {
    // sf0.1 — the largest gate corpus (5000 docs; sf0.001 and sf0.01
    // both carry 500). Found BY this spec: no id under 500 is both a
    // probe query (%100==0) and tombstoned (%7==3) — the first such
    // id is 500 (CRT: ≡500 mod 700) — so the "takedown silences
    // probes" side of d34/s34/st17/st18 is exercised only at sf0.1
    // (7 silenced probes there), and pinning the crossing at the
    // small corpora would pin a falsehood. The survivor side (A∖B)
    // holds at every sf via the non-emptiness test above.
    val docIds = ids(Tables.documents(spark, sf1), "doc_id")
    val vecIds = ids(Tables.embeddings(spark, sf1), "vec_id")
    FixtureSlices.crossingPairs.foreach { case (a, b) =>
      val domain = if (a eq FixtureSlices.embDelta) vecIds else docIds
      val inA = domain.filter(a.contains)
      assert(inA.exists(b.contains),
        s"'${a.name}' ∩ '${b.name}' is empty — the pair is disjoint, not crossing")
      assert(inA.exists(!b.contains(_)),
        s"'${a.name}' ∖ '${b.name}' is empty — '${b.name}' swallows '${a.name}' " +
          "(the r15 CDC-suffix-inside-takedown shape)")
    }
  }

  test("designed-disjoint pairs stay disjoint (multi-byte payloads always survive takedowns)") {
    val docIds = ids(Tables.documents(spark, sf001), "doc_id")
    FixtureSlices.disjointPairs.foreach { case (a, b) =>
      val inA = docIds.filter(a.contains)
      assert(inA.nonEmpty, s"'${a.name}' empty — vacuous disjointness")
      assert(!inA.exists(b.contains),
        s"'${a.name}' ∩ '${b.name}' is non-empty — a constant shuffle re-landed " +
          s"'${a.name}' on '${b.name}'")
    }
  }

  test("constructing an unreachable slice fails loudly (the d37 residue-3-mod-3 bug class)") {
    intercept[IllegalArgumentException] {
      FixtureSlices.Slice("bogus", 3, 3)
    }
    intercept[IllegalArgumentException] {
      FixtureSlices.Slice("bogus", 0, 0)
    }
  }

  test("the registry derives from the operator constants — no second copy of any modulus") {
    import graft.operators.{DedupOps, MultimodalOps, SimilarityOps}
    assert(FixtureSlices.takedown.mod === DedupOps.TombMod.toLong &&
      FixtureSlices.takedown.rem === DedupOps.TombRem.toLong)
    assert(FixtureSlices.cdcSuffix.mod === MultimodalOps.CdcSuffixMod.toLong &&
      FixtureSlices.cdcSuffix.rem === MultimodalOps.CdcSuffixRem.toLong)
    assert(FixtureSlices.querySample.mod === SimilarityOps.Bm25QueryMod.toLong)
    assert(FixtureSlices.docDelta.mod === DedupOps.DocDeltaMod.toLong &&
      FixtureSlices.docDelta.rem === DedupOps.DocDeltaRem.toLong)
    assert(FixtureSlices.bandDelta.mod === DedupOps.DocDeltaMod.toLong &&
      FixtureSlices.bandDelta.rem === DedupOps.BandDeltaRem.toLong)
    assert(FixtureSlices.embDelta.mod === DedupOps.IncEmbMod.toLong)
    assert(FixtureSlices.compactSweep.map(_.mod) ===
      SimilarityOps.CompactDeleteMods.map(_.toLong))
    assert(FixtureSlices.staleSweep.map(_.mod) ===
      SimilarityOps.StaleDeltaMods.map(_.toLong))
  }
}
