package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions
import graft.functions.VectorFunctions._

/** Deduplication operators for the training-data pipeline: exact,
  * token-set, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design (the point of these at 100 TB):
  *  - exact / token-set dedup are single hash-shuffles on a derived key;
  *  - MinHash/SimHash avoid the O(n²) pairwise comparison entirely —
  *    candidates come from equality joins on band keys, so the only
  *    shuffles are groupBy(doc) for signatures and groupBy(band key) for
  *    candidate generation; both partition cleanly across executors;
  *  - signatures are fixed-width (32×8 bytes), so signature state per
  *    document is O(1) regardless of document length;
  *  - all hashing uses Spark's codegen'd xxhash64 — no UDFs.
  */
object DedupOps {

  val NumHashes = 32 // minhash permutations
  val Bands     = 8  // LSH bands => 4 rows/band
  val RowsPerBand: Int = NumHashes / Bands

  /** doc_id + exploded distinct 3-token shingles. */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))).as("shingle"))

  /** MinHash signature per doc: element i = min over shingles of
    * xxhash64(i, shingle) (seeded hash family). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    shingles(docs)
      .groupBy(col("doc_id"))
      .agg(array((0 until NumHashes).map(i =>
        min(xxhash64(lit(i), col("shingle")))): _*).as("sig"))

  /** Explode each signature into its LSH band keys. */
  def bandKeys(sigs: DataFrame): DataFrame = {
    val bands = array((0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => col("sig")(b * RowsPerBand + r))
      xxhash64((lit(b) +: rows): _*)
    }: _*)
    sigs.select(col("doc_id"), col("sig"), posexplode(bands).as(Seq("band", "band_key")))
  }

  /** Band-join candidate rows (may contain a pair once per shared
    * band): equality join on (band, band_key) — never a cross product. */
  def rawCandidatePairs(docs: DataFrame): DataFrame = {
    val bands = bandKeys(minhashSignatures(docs))
    val a = bands.select(col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = bands.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
  }

  /** Distinct candidate pairs with signatures. */
  def candidatePairs(docs: DataFrame): DataFrame =
    rawCandidatePairs(docs).dropDuplicates("doc_a", "doc_b")

  /** Exact dedup: one representative (min doc_id) per identical text. */
  val exactQ: GraftQuery = GraftQuery(
    "d01_dedup_exact",
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents GROUP BY text""".stripMargin) { (spark, sf) =>
    Tables.documents(spark, sf)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
  }

  /** Token-set (bag-of-words) dedup: group by the canonical sorted
    * distinct-token signature — catches reorderings/repetitions. */
  val tokenSetQ: GraftQuery = GraftQuery(
    "d02_dedup_tokenset",
    """SELECT min(doc_id) AS doc_id, count(*) AS n_members
      |FROM (SELECT doc_id,
      |             array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS sig
      |      FROM documents) t
      |GROUP BY sig""".stripMargin) { (spark, sf) =>
    Tables.documents(spark, sf)
      .select(col("doc_id"), TextFunctions.tokenSetSignature(col("text")).as("sig"))
      .groupBy(col("sig"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_members"))
      .select(col("doc_id"), col("n_members"))
  }

  /** MinHash+LSH near-dup pairs with signature-estimated Jaccard ≥ 0.5.
    * Hash-based — not ANSI-SQL-expressible, verified by ScalaTest
    * against the corpus's planted near-duplicates. */
  val minhashQ: GraftQuery = GraftQuery.noOracle("d03_dedup_minhash") { (spark, sf) =>
    val pairs = rawCandidatePairs(Tables.documents(spark, sf))
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    // estimate BEFORE the pair-dedup so the dedup shuffle carries one
    // double instead of two 32-element signature arrays
    pairs
      .withColumn("est_jaccard", round(matches.cast("double") / NumHashes, 3))
      .filter(col("est_jaccard") >= 0.5)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** SimHash per doc (64-bit, token-frequency weighted) + near-dup pairs
    * via 4×16-bit band blocking and Hamming distance ≤ 12.
    *
    * Summing ±1 per token *occurrence* equals summing count-weighted ±1
    * per distinct token, so no intermediate (doc, token) aggregation is
    * needed — one shuffle on doc_id, with map-side partial aggregation
    * shrinking it to 64 longs per document. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("th", xxhash64(col("token")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("th"), i).bitwiseAND(1) === 1, lit(1))
        .otherwise(lit(-1))).as(s"s$i")
    }
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  val simhashQ: GraftQuery = GraftQuery.noOracle("d04_dedup_simhash") { (spark, sf) =>
    val sh = simhash(Tables.documents(spark, sf))
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "band_val")))
    val a = banded.select(col("band"), col("band_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 12)
  }

  /** Exact n-gram Jaccard on LSH candidates: MinHash proposes, the true
    * shingle-set Jaccard disposes (≥ 0.6). The expensive set compare
    * only runs on candidate pairs — never all pairs. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = shingles(docs).groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("sh"))
    val pairs = candidatePairs(docs).select(col("doc_a"), col("doc_b"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b")))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(jac, 3))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val ngramJaccardQ: GraftQuery = GraftQuery.noOracle("d05_dedup_ngram") { (spark, sf) =>
    ngramJaccardPairs(Tables.documents(spark, sf), 0.6)
  }

  /** Embedding near-dup report: per vector, the most similar other
    * vector inside its sign-LSH bucket, with an is_dup flag at 0.95
    * cosine. Bucket join (64 buckets) instead of O(n²) all-pairs. */
  val embeddingDupQ: GraftQuery = GraftQuery.noOracle("d06_dedup_embedding") { (spark, sf) =>
    val planes = hyperplanes(nPlanes = 6, dim = 64)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v")))
    val a = emb.select(col("bucket"), col("vec_id"), col("v"), col("nrm"))
    val b = emb.select(col("bucket"), col("vec_id").as("vec_id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("vec_id_b"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("vec_id_b"))
      .withColumn("cos_sim", dot(col("v"), col("v_b")) / (col("nrm") * col("nrm_b")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("vec_id_b").as("best_match"),
        round(col("cos_sim"), 4).as("cos_sim"),
        (col("cos_sim") >= 0.95).as("is_dup"))
  }

  val all: Seq[GraftQuery] = Seq(
    exactQ, tokenSetQ, minhashQ, simhashQ, ngramJaccardQ, embeddingDupQ)
}
