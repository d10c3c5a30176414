package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.{lshBandBuckets, toDouble}
import graft.operators.{DedupOps, SimilarityOps}

/** Materialized signature index for the PORTABLE dedup families — the
  * d12 "precomputed lake index" pattern made concrete: the md5
  * MinHash band keys, md5 SimHash fingerprints, and literal-plane ANN
  * bucket relations are derived ONCE per (session, sfDir) on first
  * access, persisted, and read by every subsequent consumer.
  *
  * This is how the 100 TB deployment actually runs: the dedup jobs
  * write signature/fingerprint tables to the lake alongside the
  * corpus (they must — the signatures ARE the dedup state), and audit
  * consumers like the d11p coverage funnel read those tables instead
  * of re-hashing petabytes per report. Locally the "lake" is the
  * session's block-manager cache; the derivation cost is paid by the
  * first consumer and is itself measured by the d14_sig / d15_fp
  * BenchOne stages and the self-contained d14/d15 audit rows, which
  * deliberately do NOT read this index.
  *
  * Size is bounded: each relation is O(docs · bands) rows of
  * fixed-width keys per scale factor — no payload text, no vectors
  * except the bucket ids. Entries are keyed by the owning
  * SparkSession, so a stopped session's entries are never served to a
  * live one, and every access sweeps stopped sessions' entries out of
  * the map (a session-per-job JVM must not accumulate dead session
  * graphs here); `invalidate` drops a live session's entries when a
  * caller wants a cold re-derivation.
  */
object SignatureLake {

  private final case class Key(session: SparkSession, sfDir: String, family: String)

  private val cache = new ConcurrentHashMap[Key, DataFrame]()

  /** Drop entries owned by stopped sessions — a session per job in a
    * long-lived JVM must not accumulate dead (session, DataFrame)
    * graphs in this static map. Runs on every get: the map holds a
    * handful of entries, so the sweep is O(entries) pointer checks. */
  private def evictStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey.session.sparkContext.isStopped) it.remove()
    }
  }

  private def get(spark: SparkSession, sfDir: String, family: String)(
      build: => DataFrame): DataFrame = {
    evictStopped()
    cache.computeIfAbsent(Key(spark, sfDir, family), _ => build.persist())
  }

  /** Portable MinHash SIGNATURES (doc_id, sig: array<string> hex
    * lanes) — the root relation of the minhash family; the band-key
    * relation derives from it, so the md5 pass over the corpus runs
    * ONCE per (session, sfDir) no matter how many audit consumers
    * (band keys, d17's lane-agreement calibration) read the family. */
  def portableSignatures(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, sfDir, "minhash_sigs") {
      DedupOps.portableSignatures(Tables.documents(spark, sfDir))
    }

  /** Portable MinHash band keys (doc_id, band, band_key) —
    * [[DedupOps.portableBandKeys]] over the materialized
    * [[portableSignatures]]. */
  def portableBandKeys(spark: SparkSession, sfDir: String): DataFrame = {
    // resolve the root family BEFORE entering the band-keys closure:
    // ConcurrentHashMap.computeIfAbsent forbids a recursive update of
    // the same map from inside a mapping function
    val sigs = portableSignatures(spark, sfDir)
    get(spark, sfDir, "minhash_bands") { DedupOps.portableBandKeys(sigs) }
  }

  /** Portable SimHash fingerprints (doc_id, sh0, sh1). */
  def portableFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, sfDir, "simhash_fp") {
      DedupOps.portableSimhashFingerprints(Tables.documents(spark, sfDir))
    }

  /** Portable sign-LSH ANN buckets (vec_id, table, bucket). */
  def portableAnnBuckets(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, sfDir, "ann_buckets") {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .select(col("vec_id"),
          posexplode(lshBandBuckets(col("v"), DedupOps.PortableAnnTables,
            DedupOps.PortableAnnPlanes, SimilarityOps.Dim))
            .as(Seq("table", "bucket")))
    }

  /** Drop (and unpersist) every entry owned by `spark`. */
  def invalidate(spark: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.session eq spark) {
        // blocking: callers invalidate to get a clean-slate session
        // (tests assert on getPersistentRDDs right after)
        e.getValue.unpersist(blocking = true)
        it.remove()
      }
    }
  }
}
