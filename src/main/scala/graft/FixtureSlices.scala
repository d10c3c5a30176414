package graft

import graft.operators.{DedupOps, MultimodalOps, SimilarityOps}

/** The ONE declaration of every residue-class fixture slice the
  * registry rows carve out of the gate corpora (takedown batches,
  * ingest deltas, query samples, benchmark membership, the CDC
  * non-ASCII suffix, the delete-fraction sweeps).
  *
  * Why this exists (two silent r15 bugs in one round, both of this
  * class): the CDC multi-byte suffix initially landed on the takedown
  * residue, so d36's survivor corpus carried no multi-byte payloads
  * and the byte-vs-char gate was vacuously green; d37's first fixture
  * used residue 3 under modulus 3 — unreachable, so its purge leg
  * deleted NOTHING while both engines happily agreed on the no-op.
  * Each slice here references the operator constant it derives from
  * (no second copy of any modulus), construction rejects an
  * unreachable residue, and FixtureSlicesSpec asserts on the real
  * gate corpus that every slice is non-empty and that every pair the
  * fixtures treat as independent actually overlaps AND separates. */
object FixtureSlices {

  /** One residue-class slice: ids with `id % mod == rem`. Constructing
    * an unreachable slice (rem outside [0, mod)) fails loudly — the
    * d37 bug class can no longer compile-and-pass. */
  final case class Slice(name: String, mod: Long, rem: Long) {
    require(mod > 0 && rem >= 0 && rem < mod,
      s"fixture slice '$name': residue $rem is unreachable under modulus $mod")
    def contains(id: Long): Boolean = id % mod == rem
  }

  /** The takedown slice (d28/d29/s22/d34–d36/st13/st17/st18, and the
    * s34 masked-tier gate). */
  val takedown = Slice("takedown", DedupOps.TombMod, DedupOps.TombRem)

  /** The streamed/incremental ingest delta over documents
    * (d33/d35/d36/d38/s31/st15/st16/st18 and the term/semcell lake
    * slices) — derives from the operator constant, like takedown. */
  val docDelta = Slice("doc_delta", DedupOps.DocDeltaMod, DedupOps.DocDeltaRem)

  /** The embedding-side ingest delta (d26/d29/s20/s31). */
  val embDelta = Slice("emb_delta", DedupOps.IncEmbMod, 0)

  /** The band-lake ingest delta (d12/d28 split on
    * [[DedupOps.BandDeltaRem]] of the same 10-way modulus). */
  val bandDelta = Slice("band_delta", DedupOps.DocDeltaMod, DedupOps.BandDeltaRem)

  /** The CDC non-ASCII suffix (m13/st16/d36's multi-byte teeth). */
  val cdcSuffix =
    Slice("cdc_suffix", MultimodalOps.CdcSuffixMod, MultimodalOps.CdcSuffixRem)

  /** The BM25 probe-query sample (every s2x/s3x/st15–st18 serve). */
  val querySample = Slice("query_sample", SimilarityOps.Bm25QueryMod, 0)

  /** Benchmark-suite membership for decontamination (d08/d09/d16). */
  val decontamBench = Slice("decontam_bench", 50, 0)

  /** The delete-fraction sweep (d37/d38) and the staleness sweep
    * (s33) — residue 0 by construction so every modulus is
    * reachable. */
  val compactSweep: Seq[Slice] =
    SimilarityOps.CompactDeleteMods.map(m => Slice(s"compact_del_$m", m, 0))
  val staleSweep: Seq[Slice] =
    SimilarityOps.StaleDeltaMods.map(m => Slice(s"stale_delta_$m", m, 0))

  /** Every declared slice — the spec asserts each is NON-EMPTY on the
    * gate corpus (an empty slice turns its gate into a no-op that
    * both engines agree on, the d37 failure shape). */
  val all: Seq[Slice] =
    Seq(takedown, docDelta, embDelta, bandDelta, cdcSuffix, querySample,
      decontamBench) ++ compactSweep ++ staleSweep

  /** Pairs where slice A must CUT ACROSS slice B — the gate assumes A
    * exercises its property on both sides of B, so the spec asserts
    * A∩B and A∖B are both non-empty on the real corpus:
    *  - (docDelta, takedown): the d33-family takedowns (d35/d36,
    *    st17/st18) must hit base AND delta;
    *  - (bandDelta, takedown): d28's explicit claim — its delta is
    *    the BAND split's residue, not docDelta's;
    *  - (embDelta, takedown): same on the vector side (d29/s22);
    *  - (querySample, takedown): surviving probes must exist (d34/
    *    s34/st17/st18 all issue queries from survivors) and deleted
    *    probes must exist (a takedown must also silence queries);
    *  - (cdcSuffix, docDelta): multi-byte payloads must arrive both
    *    in the base build and mid-stream (st16's teeth). */
  val crossingPairs: Seq[(Slice, Slice)] = Seq(
    (docDelta, takedown),
    (bandDelta, takedown),
    (embDelta, takedown),
    (querySample, takedown),
    (cdcSuffix, docDelta))

  /** Pairs that are DISJOINT BY DESIGN — the r15 fix put the CDC
    * suffix on a different residue of the takedown's own modulus
    * precisely so every multi-byte payload SURVIVES every takedown
    * (all-suffix-deleted is the bug that silently un-tested d36's
    * byte path). The spec pins the emptiness of A∩B as well as A's
    * own non-emptiness, so a constant shuffle that re-lands the
    * suffix on the takedown residue fails loudly. */
  val disjointPairs: Seq[(Slice, Slice)] = Seq(
    (cdcSuffix, takedown))
}
