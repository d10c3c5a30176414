package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token statistics, fingerprinting. All row-local
  * (narrow, no shuffle) — at 100 TB these run as a single map stage
  * fused into the parquet scan by whole-stage codegen.
  *
  * The oracle SQL is generated from the same marker/stopword tables as
  * the Spark expressions so the two cannot drift.
  */
object TextOps {

  private def occSql(s: String, m: String): String =
    s"(length($s) - length(replace($s, '$m', ''))) / ${m.length}"

  private[operators] val langScoreSql: Seq[(String, String)] =
    langMarkers.map { case (l, ms) =>
      l -> ms.map(m => occSql("p", m)).mkString(" + ")
    }

  private[operators] val langCaseSql: String = {
    val allZero = langScoreSql.map { case (l, _) => s"s_$l = 0" }.mkString(" AND ")
    val arms = langScoreSql.zipWithIndex.init.map { case ((l, _), i) =>
      val laterLangs = langScoreSql.drop(i + 1).map(_._1)
      val cond = laterLangs.map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }
    s"CASE WHEN $allZero THEN 'und' ${arms.mkString(" ")} ELSE '${langScoreSql.last._1}' END"
  }

  /** Language identification via stopword-marker scoring. */
  val langIdQ: GraftQuery = GraftQuery(
    "t01_lang_id",
    s"""WITH t AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
       |s AS (SELECT doc_id,
       |${langScoreSql.map { case (l, e) => s"  $e AS s_$l" }.mkString(",\n")}
       |      FROM t)
       |SELECT doc_id, $langCaseSql AS lang_pred FROM s""".stripMargin) { (spark, sf) =>
    Tables.documents(spark, sf)
      .select(col("doc_id"), langId(col("text")).as("lang_pred"))
  }

  private[operators] val stopListSql = stopwords.map(s => s"'$s'").mkString(", ")

  /** [[qualityStatsSql]] carrying extra projected columns (t18 needs
    * `source` alongside the stats) — one definition of the stat
    * expressions for every consumer. */
  private[operators] def qualityStatsSqlWith(extraCols: String): String =
    qualityStatsSql.replace("SELECT doc_id,", s"SELECT doc_id, $extraCols")

  /** DuckDB CTE body computing the t02 quality statistics per document
    * — shared with every oracle that scores quality (t02, d10, t18) so
    * the fragments cannot drift. */
  private[operators] val qualityStatsSql: String =
    s"""SELECT doc_id,
       |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |       CAST(length(replace(text, ' ', '')) AS DOUBLE)
       |         / len(string_split(text, ' ')) AS avg_len,
       |       CAST(len(list_filter(string_split(text, ' '),
       |                x -> x IN ($stopListSql))) AS DOUBLE)
       |         / len(string_split(text, ' ')) AS stop_ratio
       |FROM documents""".stripMargin

  /** The t02 composite score over [[qualityStatsSql]]'s columns —
    * a left-assoc sum of literal constants, the identical IEEE
    * sequence in both engines, so it ships RAW (r7 audit). */
  private[operators] val qualityExprSql: String =
    """(CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
      |    + (CASE WHEN avg_len >= 3.0 AND avg_len <= 10.0 THEN 0.3 ELSE 0.0 END)
      |    + (CASE WHEN stop_ratio >= 0.01 AND stop_ratio <= 0.5 THEN 0.3 ELSE 0.0 END)""".stripMargin

  /** Quality scoring: length / token-shape / stopword-ratio rules. */
  val qualityQ: GraftQuery = GraftQuery(
    "t02_quality",
    s"""WITH t AS (
       |$qualityStatsSql)
       |SELECT doc_id, n_tokens,
       |       CAST(floor(avg_len * 10000) AS BIGINT) AS avg_len_e4,
       |       $qualityExprSql AS quality
       |FROM t""".stripMargin) { (spark, sf) =>
    // avg token length emitted as floor(x*1e4): IEEE division is
    // bit-identical across engines, so the floored integer is exact —
    // unlike round(), whose tie-handling differs between engines.
    Tables.documents(spark, sf).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      floor(avgTokenLength(col("text")) * 10000).cast("long").as("avg_len_e4"),
      qualityScore(col("text")).as("quality"))
  }

  /** Token counting: whitespace tokens, distinct tokens, regex words,
    * non-space chars. */
  val tokenStatsQ: GraftQuery = GraftQuery(
    "t03_token_stats",
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_words_re,
      |       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
      |       string_split(text, ' ')[1] AS first_token
      |FROM documents""".stripMargin) { (spark, sf) =>
    // element_at is the reference's annotator-head extraction (P7,
    // functions.py:88,95) — 1-based, null-safe on short arrays
    Tables.documents(spark, sf).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      distinctTokenCount(col("text")).as("n_distinct"),
      regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("n_words_re"),
      length(replace(col("text"), lit(" "), lit(""))).cast("long").as("n_chars_nospace"),
      element_at(tokens(col("text")), 1).as("first_token"))
  }

  /** Document fingerprinting: content hash + canonical token-set hash. */
  val fingerprintQ: GraftQuery = GraftQuery(
    "t04_fingerprint",
    """SELECT doc_id,
      |       md5(lower(text)) AS fp,
      |       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS tokenset_fp
      |FROM documents""".stripMargin) { (spark, sf) =>
    Tables.documents(spark, sf).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      md5(tokenSetSignature(col("text"))).as("tokenset_fp"))
  }

  /** Winnowing geometry: token-gram length and selection-window size
    * (Schleimer, Wilkerson, Aiken 2003 — the MOSS local fingerprint,
    * over token n-grams: ~6x fewer grams than char 8-grams on this
    * corpus for the same dedup power). */
  val WinnowN = 3
  val WinnowW = 8

  /** Winnowing document fingerprint: hash every token n-gram, keep the
    * minimum hash of each sliding window of w consecutive grams — any
    * shared run of w+n-1 tokens yields a shared selected fingerprint,
    * so near-dups overlap heavily in fingerprint space while storage
    * stays ~2/(w+1) of the gram count. Hashes are md5 strings (window
    * min = lexicographic) so the oracle recomputes the identical
    * selection in SQL; a production tuning would swap md5 for a custom
    * rolling-hash Expression — the selection semantics, which is what
    * this operator pins, are unchanged. */
  val winnowQ: GraftQuery = GraftQuery(
    "t05_winnow_fingerprint",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         list_transform(range(1, len(tk) - ${WinnowN - 2}),
       |           i -> md5(concat_ws(' ', tk[CAST(i AS INT)], tk[CAST(i+1 AS INT)], tk[CAST(i+2 AS INT)]))) AS kg
       |  FROM t),
       |s AS (
       |  SELECT doc_id, kg,
       |         list_transform(range(1, len(kg) - $WinnowW + 2),
       |           i -> list_min(kg[CAST(i AS INT):CAST(i + ${WinnowW - 1} AS INT)])) AS sel
       |  FROM g)
       |SELECT doc_id,
       |       CAST(len(kg) AS BIGINT) AS n_grams,
       |       CAST(len(list_distinct(sel)) AS BIGINT) AS n_selected,
       |       md5(array_to_string(list_sort(list_distinct(sel)), '')) AS fp_digest
       |FROM s""".stripMargin) { (spark, sf) =>
    winnowSelections(Tables.documents(spark, sf))
      .select(
        col("doc_id"),
        size(col("kg")).cast("long").as("n_grams"),
        size(array_distinct(col("sel"))).cast("long").as("n_selected"),
        md5(concat_ws("", sort_array(array_distinct(col("sel"))))).as("fp_digest"))
  }

  /** doc_id + token-gram hashes + winnowed selections (see [[winnowQ]]).
    * Row-local array expressions — narrow, no shuffle; gram count per
    * doc is bounded by token count. (An exploded window-function
    * formulation was tried and measured slower: Generate replicates the
    * text column per position and the window forces a 5M-row shuffle.) */
  def winnowSelections(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val kg = when(size(col("tk")) >= WinnowN,
      transform(sequence(lit(1), size(col("tk")) - WinnowN + 1),
        i => md5(concat_ws(" ", slice(col("tk"), i, lit(WinnowN))))))
      .otherwise(array().cast("array<string>"))
    docs
      .withColumn("tk", split(col("text"), " "))
      .withColumn("kg", kg)
      .withColumn("sel", when(size(col("kg")) >= WinnowW,
        transform(sequence(lit(1), size(col("kg")) - WinnowW + 1),
          i => array_min(slice(col("kg"), i, lit(WinnowW)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Corpus vocabulary head: global top-20 tokens by frequency.
    * Global top-k the scale-safe way — partial counts combine
    * map-side, then TakeOrderedAndProject keeps k rows per partition
    * and merges on the driver; the rank window runs over the ≤ k
    * surviving rows (bounded, post-reduction — NOT the
    * single-partition-window-over-the-corpus anti-pattern). */
  val topTokensQ: GraftQuery = GraftQuery(
    "t06_top_tokens",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |c AS (SELECT token, count(*) AS n FROM tok GROUP BY token)
      |SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rank
      |FROM c ORDER BY n DESC, token LIMIT 20""".stripMargin) { (spark, sf) =>
    // served off the token-frequency lake (the signature-family rule:
    // corpus-stats consumers read the materialized vocabulary, they
    // don't re-tokenize the corpus per report) — token-bucketed, so
    // the per-token sum reads its distribution off the scan
    val counts = graft.sources.SignatureLake.tokenCounts(spark, sf)
      .groupBy(col("token")).agg(sum(col("tf")).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
  }

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf · ln((N+1)/(df+1)). Two keyed aggregations + a broadcast of
    * the one-row corpus count; the per-doc rank window partitions on
    * doc_id. Scores are rounded to 4dp BEFORE ranking on both engines:
    * ln() implementations may differ in the last ulp, so both the
    * emitted value and the tie-break order are functions of the
    * rounded score. */
  val tfidfQ: GraftQuery = GraftQuery(
    "t07_tfidf_keywords",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
      |dfreq AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY token),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (SELECT tf.doc_id, tf.token,
      |        round(tf.tf * ln((nd.n_docs + 1.0) / (dfreq.dfreq + 1.0)), 4) AS score
      |      FROM tf JOIN dfreq USING (token) CROSS JOIN nd),
      |r AS (SELECT doc_id, token, score,
      |        row_number() OVER (PARTITION BY doc_id
      |                           ORDER BY score DESC, token) AS rank
      |      FROM s)
      |SELECT doc_id, token, score, rank FROM r WHERE rank <= 3""".stripMargin) { (spark, sf) =>
    val docs = Tables.documents(spark, sf)
    // tf comes from the materialized token-frequency lake (t06's
    // family); df derives from it with a token-local aggregation
    val tf = graft.sources.SignatureLake.tokenCounts(spark, sf)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("dfreq"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("dfreq") + 1.0)), 4))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("token"), col("score"), col("rank"))
  }

  /** Deterministic train/val/test split: bucket = (first 4 hex digits
    * of md5(doc_id), i.e. the top 16 bits) mod 100, thresholds
    * 80/10/10. Hash-based (not doc_id-mod) so the assignment is
    * uncorrelated with insertion order or any id-range structure, yet
    * stable across runs, repartitioning, and engines — md5 is a hash
    * Spark and DuckDB both expose bit-identically, so the split is
    * fully oracle-checked (the property a pipeline needs: re-running
    * assignment NEVER moves a document between splits). 65536 % 100 =
    * 36 gives buckets 0-35 a +1/655 relative weight — ~0.005pp on the
    * 80% split, irrelevant next to sampling noise. The hex→int fold is
    * column math (position in a hex alphabet), no UDF. */
  val hashSplitQ: GraftQuery = {
    // same hex-fold bucket generator as t12 sampling / t14 reweighting
    // / pk01 sharding (Md5Bucket) — one implementation, unsalted here
    def bucketExpr(engine: String): String = {
      val in = if (engine == "spark") "CAST(doc_id AS STRING)" else "CAST(doc_id AS VARCHAR)"
      Md5Bucket.bucketSql(engine, in, 100)
    }
    GraftQuery(
      "t08_hash_split",
      s"""SELECT doc_id, bucket,
         |       ${SplitPolicy.caseSql("bucket")} AS split
         |FROM (SELECT doc_id,
         |        CAST(${bucketExpr("duckdb")} AS BIGINT) AS bucket
         |      FROM documents) t""".stripMargin) { (spark, sf) =>
      val b = expr(bucketExpr("spark")).cast("long")
      Tables.documents(spark, sf).select(
        col("doc_id"),
        b.as("bucket"),
        SplitPolicy.caseCol(b).as("split"))
    }
  }

  /** Unigram negative log-likelihood per document — the cheap proxy
    * for LM-perplexity quality filtering (CCNet-style): score =
    * −mean ln(corpusFreq(token)/corpusTokens). Same two-aggregation +
    * token-keyed join shape as t07 (vocab counts are corpus-sized and
    * shuffle-joined on token; the one-row total broadcasts).
    *
    * Float discipline (r7 review): the per-doc mean runs through the
    * dyadic snap (per-row ln values summed as exact 2^-30-grid longs,
    * one division), so the pre-round double is order-INdependent —
    * the former round(avg(double)) was run-order fragile within one
    * engine, the r5 q35 intermittent mode. The terminal round(…, 4)
    * stays, but its job is now only the cross-engine surface the snap
    * cannot pin: ln() is a libm call with no bit-parity guarantee, so
    * a last-ulp ln difference may shift a row's snapped long by one
    * grid cell and the 4dp round absorbs that ≤2^-30/n drift. */
  val unigramNllQ: GraftQuery = GraftQuery(
    "t13_unigram_nll",
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |f AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
      |tot AS (SELECT count(*) AS t FROM tok),
      |s AS (SELECT tok.doc_id, ln(CAST(f.c AS DOUBLE) / t.t) AS lp
      |      FROM tok JOIN f USING (token) CROSS JOIN tot t)
      |SELECT doc_id,
      |       round(-(CAST(sum(CAST(floor(lp * ${graft.functions.VectorFunctions.DistScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
      |               / (count(*) * ${graft.functions.VectorFunctions.DistScaleSql})), 4) AS nll
      |FROM s GROUP BY doc_id""".stripMargin) {
    (spark, sf) => unigramNll(Tables.documents(spark, sf))
  }

  /** t13 over (doc_id, text) rows. */
  def unigramNll(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.VectorFunctions.{snapLong, DistScale}
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val total = broadcast(tok.agg(count(lit(1)).as("t")))
    tok.join(freq, "token")
      .crossJoin(total)
      .withColumn("lp", log(col("c").cast("double") / col("t")))
      .groupBy(col("doc_id"))
      .agg(round(-(sum(snapLong(col("lp"), DistScale)).cast("double")
        / (count(lit(1)) * lit(DistScale))), 4).as("nll"))
  }

  /** Perplexity-band corpus pruning (the CCNet practice t13 feeds):
    * keep documents whose unigram NLL lies inside the [p10, p90]
    * corpus band — the low tail is boilerplate (too predictable), the
    * high tail is noise (too random). Boundaries are exact DISCRETE
    * order statistics from [[QuantileKernel.discQuantiles]] over the
    * 4dp-rounded NLL (so both engines compare identical doubles; the
    * histogram the kernel sorts is bounded by the 4dp NLL domain —
    * tens of thousands of distinct values at ANY corpus size, never
    * corpus rows), broadcast to a row-local band assignment. */
  val nllBandQ: GraftQuery = GraftQuery(
    "t15_nll_band",
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |f AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
      |tot AS (SELECT count(*) AS t FROM tok),
      |s AS (SELECT tok.doc_id, ln(CAST(f.c AS DOUBLE) / t.t) AS lp
      |      FROM tok JOIN f USING (token) CROSS JOIN tot t),
      |n AS (SELECT doc_id,
      |        round(-(CAST(sum(CAST(floor(lp * ${graft.functions.VectorFunctions.DistScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
      |                / (count(*) * ${graft.functions.VectorFunctions.DistScaleSql})), 4) AS nll
      |      FROM s GROUP BY doc_id),
      |qh AS (SELECT nll, count(*) AS cnt FROM n GROUP BY nll),
      |qch AS (SELECT nll, sum(cnt) OVER (ORDER BY nll) AS cum,
      |          sum(cnt) OVER () AS nr FROM qh),
      |b AS (SELECT ${QuantileKernel.discSelectSql("0.1", "nll", n = "nr")} AS lo,
      |        ${QuantileKernel.discSelectSql("0.9", "nll", n = "nr")} AS hi
      |      FROM qch)
      |SELECT doc_id, nll,
      |       CASE WHEN nll < lo THEN 'boilerplate'
      |            WHEN nll > hi THEN 'noise'
      |            ELSE 'keep' END AS band
      |FROM n CROSS JOIN b""".stripMargin) { (spark, sf) =>
    nllBand(Tables.documents(spark, sf))
  }

  /** t15 over (doc_id, text) rows. */
  def nllBand(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nll = unigramNll(docs).withColumn("_k", lit(1))
    val hist = QuantileKernel.cumulativeHistogram(nll, "_k", "nll")
    val bounds = QuantileKernel.discQuantiles(hist, "_k", "nll",
      Seq("lo" -> 0.1, "hi" -> 0.9))
    nll.join(broadcast(bounds), "_k")
      .select(col("doc_id"), col("nll"),
        when(col("nll") < col("lo"), "boilerplate")
          .when(col("nll") > col("hi"), "noise")
          .otherwise("keep").as("band"))
  }

  /** Corpus-frequent n-gram coverage (the RefinedWeb/C4 boilerplate
    * signal): score each document by the fraction of its tokens
    * covered by a 3-gram that appears in ≥ K distinct documents.
    * The corpus on this harness has no newlines, so the practice's
    * line-level dedup is expressed at its token-gram granularity —
    * the relational shape is identical.
    *
    * Scale shape: one hash aggregate keyed by gram (map-side combined;
    * distinct-doc counting) produces the frequent set, whose size is
    * bounded by total-gram-occurrences / K — it SHRINKS as K grows, so
    * with K set proportionally to the corpus (as the practice does) it
    * broadcasts; for a fixed small K over a huge corpus the same probe
    * runs through the d09 Bloom kernel instead of a raw broadcast.
    * Coverage is then a broadcast semi-probe of the gram stream, a
    * 3-offset position expansion, and one doc_id-keyed distinct-count
    * — no self-join, no window, nothing corpus-quadratic. */
  val boilerplateQ: GraftQuery = GraftQuery(
    "t16_boilerplate_coverage",
    """WITH docs AS (SELECT doc_id, text FROM documents),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs
      |         WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 3),
      |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
      |         i -> struct_pack(s := i, g := t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sg
      |       FROM toks),
      |g3 AS (SELECT doc_id, sg.s AS s, sg.g AS gram FROM g2),
      |f AS (SELECT gram FROM g3 GROUP BY gram HAVING count(DISTINCT doc_id) >= 5),
      |cov AS (SELECT DISTINCT doc_id, s + o.o AS p FROM g3 JOIN f USING (gram),
      |        (VALUES (0), (1), (2)) o(o)),
      |c AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY doc_id)
      |SELECT d.doc_id,
      |       CASE WHEN d.text IS NULL THEN CAST(0 AS BIGINT)
      |            ELSE CAST(len(string_split(d.text, ' ')) AS BIGINT) END AS n_tokens,
      |       CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
      |       CASE WHEN d.text IS NULL THEN NULL
      |            ELSE CAST(coalesce(c.covered, 0) AS DOUBLE)
      |                 / len(string_split(d.text, ' '))
      |       END AS boilerplate_frac
      |FROM docs d LEFT JOIN c USING (doc_id)""".stripMargin) { (spark, sf) =>
    boilerplateCoverage(Tables.documents(spark, sf), minDocFreq = 5)
  }

  /** t16 over (doc_id, text) rows. Gram start positions are 0-based
    * here and 1-based in the oracle — only distinct covered-position
    * COUNTS are emitted, so the convention is internal to each
    * engine. */
  def boilerplateCoverage(docs: org.apache.spark.sql.DataFrame,
      minDocFreq: Long): org.apache.spark.sql.DataFrame = {
    val tk = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
    val grams = tk.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")))
      .select(col("doc_id"), col("pos").as("s"), col("col").as("gram"))
    val freq = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("gram"))
    val covered = grams.join(broadcast(freq), "gram")
      .select(col("doc_id"),
        explode(array(col("s"), col("s") + 1, col("s") + 2)).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("covered"))
    docs.select(col("doc_id"), col("text"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("text").isNull, 0L)
          .otherwise(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        coalesce(col("covered"), lit(0L)).as("covered_tokens"),
        when(col("text").isNull, lit(null).cast("double"))
          .otherwise(
            // raw quotient: one IEEE division over exact integers is
            // bit-identical cross-engine; a terminal round() is the
            // only op whose tie convention could differ (r7 audit)
            coalesce(col("covered"), lit(0L)).cast("double")
              / size(split(col("text"), " "))).as("boilerplate_frac"))
  }

  /** n-gram novelty: the fraction of a document's distinct 3-grams
    * that appear in NO other document — the originality signal dual to
    * t16's boilerplate coverage (t16 asks how much of me is common
    * text; t19 asks how much of me exists nowhere else — the
    * memorization-risk / dedup-pressure metric an audit reads next to
    * d11's funnel). `novelty` is a ratio of exact integers (raw-double
    * parity, no rounding); gramless docs (<3 tokens, or null text)
    * report 0 grams and a NULL novelty.
    *
    * Scale shape: one map-side-combinable aggregation per distinct
    * gram for the document frequency (hot boilerplate grams arrive
    * pre-reduced), one shuffle join back on the gram key, one
    * per-document count — all keys are grams or doc ids, nothing
    * fixed-cardinality, no window. */
  val ngramNoveltyQ: GraftQuery = GraftQuery(
    "t19_ngram_novelty",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
      |         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS g
      |       FROM toks WHERE len(t) >= 3),
      |df AS (SELECT g, count(*) AS df FROM tg GROUP BY g),
      |per AS (SELECT tg.doc_id, count(*) AS n_grams,
      |          sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS n_unique
      |        FROM tg JOIN df USING (g) GROUP BY tg.doc_id)
      |SELECT d.doc_id,
      |       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
      |       CAST(coalesce(p.n_unique, 0) AS BIGINT) AS n_unique,
      |       CASE WHEN p.n_grams > 0
      |            THEN CAST(p.n_unique AS DOUBLE) / p.n_grams
      |       END AS novelty
      |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin) { (spark, sf) =>
    ngramNovelty(Tables.documents(spark, sf))
  }

  /** The t19 computation; grams are per-document DISTINCT 3-grams, so
    * df counts documents, and rows (not countDistinct) suffice. */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val grams = DedupOps.tokenShingles(docs, 3)
    val df = grams.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val per = grams.join(df, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        when(col("n_grams") > 0,
          col("n_unique").cast("double") / col("n_grams")).as("novelty"))
  }

  /** Per-source vocabulary profile: token volume, type (distinct
    * token) count, type-token ratio, and hapax legomena share — the
    * lexical-diversity fingerprint used to spot template/boilerplate
    * sources (low TTR, low hapax share) and OCR-noise sources
    * (pathologically high hapax share) before mixing. Two shuffles,
    * both map-side combinable: (source, token) counts, then per-source
    * sums — the per-token intermediate is bounded by each source's
    * vocabulary, never the corpus token volume. Both ratios are one
    * exact-integer division each, so the row hashes identically at any
    * parallelism. */
  def sourceVocab(docs: DataFrame): DataFrame = {
    val tok = docs.filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    tok.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_hapax").cast("double") / col("n_types")).as("hapax_ratio"))
  }

  val sourceVocabQ: GraftQuery = GraftQuery(
    "t20_source_vocab",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
      |             FROM documents WHERE text IS NOT NULL),
      |tc AS (SELECT source, token, count(*) AS cnt FROM tok GROUP BY source, token)
      |SELECT source,
      |       CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_types,
      |       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |       CAST(count(*) AS DOUBLE) / sum(cnt) AS ttr,
      |       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
      |         AS hapax_ratio
      |FROM tc GROUP BY source""".stripMargin) { (spark, sf) =>
    sourceVocab(Tables.documents(spark, sf))
  }

  /** Noise floor for t23: tokens seen in fewer total docs than this
    * never rank (a 1-vs-0 hapax would otherwise dominate any ratio
    * report). Part of the report's contract, not a silent cap. */
  val DriftMinDf = 5
  /** Rows t23 emits — the drift report is a top-N diagnostic. */
  val DriftTopN = 50

  /** t23 — token document-frequency drift between two corpus halves:
    * which vocabulary is appearing or disappearing across the split —
    * the curation diagnostic for distribution shift between crawls /
    * time slices (here the deterministic doc_id parity split stands in
    * for the time cutoff a dated corpus would use; same shape either
    * way). Per token, the distinct-doc count in each half and the
    * add-one ratio both ways; ranked by the larger ratio (symmetric
    * divergence) with the token as tie-break.
    *
    * Float discipline: df counts are exact longs from ONE token-keyed
    * aggregation (the (doc, token) dedup is row-local
    * `array_distinct` — no per-pair shuffle); each ratio is a single
    * IEEE division of exact integers and `greatest` of two such
    * doubles is exact — nothing rounds, nothing accumulates.
    *
    * Scale shape: explode → map-side-combinable count per token; the
    * top-N is TakeOrdered (no global window over the vocabulary) and
    * the rank window runs on the N retained rows. */
  def dfDrift(docs: DataFrame, minDf: Int = DriftMinDf, topN: Int = DriftTopN): DataFrame = {
    val halves = docs
      .select((col("doc_id") % 2 === 0).as("ha"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("ha"), 1L).otherwise(0L)).as("df_a"),
        sum(when(col("ha"), 0L).otherwise(1L)).as("df_b"))
      .filter(col("df_a") + col("df_b") >= minDf)
      .withColumn("drift", (col("df_b") + 1).cast("double") / (col("df_a") + 1))
      .withColumn("divergence", greatest(
        (col("df_b") + 1).cast("double") / (col("df_a") + 1),
        (col("df_a") + 1).cast("double") / (col("df_b") + 1)))
      .orderBy(col("divergence").desc, col("token"))
      .limit(topN)
    halves
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("divergence").desc, col("token"))).cast("long"))
      .select(col("token"), col("df_a"), col("df_b"), col("drift"),
        col("divergence"), col("rank"))
  }

  val dfDriftQ: GraftQuery = GraftQuery(
    "t23_df_drift",
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      |  FROM documents),
      |d AS (SELECT token,
      |        CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_a,
      |        CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS df_b
      |      FROM tok GROUP BY token),
      |f AS (SELECT token, df_a, df_b,
      |        CAST(df_b + 1 AS DOUBLE) / (df_a + 1) AS drift,
      |        greatest(CAST(df_b + 1 AS DOUBLE) / (df_a + 1),
      |                 CAST(df_a + 1 AS DOUBLE) / (df_b + 1)) AS divergence
      |      FROM d WHERE df_a + df_b >= $DriftMinDf),
      |r AS (SELECT *, row_number() OVER (ORDER BY divergence DESC, token) AS rank
      |      FROM f)
      |SELECT token, df_a, df_b, drift, divergence, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= $DriftTopN""".stripMargin) { (spark, sf) =>
    dfDrift(Tables.documents(spark, sf))
  }

  /** t24 — bigram NLL with add-one smoothing: per document, the mean
    * negative log conditional probability −E[ln p(w₂|w₁)] under the
    * corpus bigram model p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V) — the next
    * rung above t13's unigram NLL on the LM-based quality ladder
    * (repetitive boilerplate scores low, token soup scores high,
    * against a model that knows local word order).
    *
    * c(w₁) is the bigram-PREFIX count (Σ_w c(w₁w)) so probabilities
    * condition on exactly the events the model scores; V is the
    * corpus unigram vocabulary. Bigrams are formed ROW-LOCALLY
    * (zip_with over two slices — no positional shuffle), then
    * pre-reduced to per-doc (w₁,w₂) multiplicities so the count joins
    * touch distinct bigrams, not instances (the d15 occurrence-weight
    * device). Each ln lands on the 2^-30 dyadic grid before the
    * multiplicity-weighted sum (t13's snap discipline — exact longs,
    * order-independent), and the doc NLL is one terminal IEEE
    * division. Docs with <2 tokens keep a row (n_bigrams 0, nll NULL)
    * via the doc-side left join.
    *
    * Scale shape: one map-side-combinable bigram-count aggregation,
    * the prefix count via a vocab-sized window over it, and ONE hash
    * join back to the per-doc instances — no broadcast of the
    * (possibly vocab²-sized) bigram model, corpus never collected; the
    * vocab scalar is a one-row broadcast. */
  def bigramNll(docs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.{snapLong, DistScale}
    val toks = split(col("text"), " ")
    val inst = docs
      .select(col("doc_id"),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    // c1 (prefix count) derives from the c12 table by a vocab-sized
    // window rather than a third corpus pass: the plan then computes
    // the bigram explode exactly twice (the aggregate path and the
    // probe side) — re-reading the column-pruned scan is the right
    // 100 TB trade vs shuffling the full instance table for a window
    val c12 = inst.groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("c12"))
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
    val vocab = broadcast(docs
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t")).as("v")))
    val perDoc = inst
      .join(c12, Seq("w1", "w2"))
      .crossJoin(vocab)
      .withColumn("lp",
        log((col("c12") + 1).cast("double") / (col("c1") + col("v"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        (-(sum(snapLong(col("lp"), DistScale) * col("m")).cast("double"))
          / (sum(col("m")) * lit(DistScale))).as("nll"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("nll"))
  }

  val bigramNllQ: GraftQuery = GraftQuery(
    "t24_bigram_nll",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |b0 AS (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks),
      |big AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM b0),
      |inst AS (SELECT doc_id, w1, w2, count(*) AS m FROM big GROUP BY 1, 2, 3),
      |c12 AS (SELECT w1, w2, sum(m) AS c12 FROM inst GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(m) AS c1 FROM inst GROUP BY 1),
      |v AS (SELECT count(DISTINCT t) AS v
      |      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
      |s AS (SELECT i.doc_id, i.m,
      |        ln(CAST(c12.c12 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS lp
      |      FROM inst i JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
      |n AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
      |        -(CAST(sum(CAST(floor(lp * ${graft.functions.VectorFunctions.DistScaleSql} + 0.5) AS BIGINT) * m) AS DOUBLE)
      |          / (sum(m) * ${graft.functions.VectorFunctions.DistScaleSql})) AS nll
      |      FROM s GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(n.n_bigrams, 0) AS BIGINT) AS n_bigrams, n.nll
      |FROM documents d LEFT JOIN n USING (doc_id)""".stripMargin) { (spark, sf) =>
    bigramNll(Tables.documents(spark, sf))
  }

  /** Bucket count for the t25 growth curve. */
  val GrowthBuckets = 10

  /** t25 — vocabulary-growth (Heaps-law) curve: the corpus is split
    * into [[GrowthBuckets]] doc-id-range prefixes and each bucket
    * reports its doc/token volume, the number of NEVER-SEEN-BEFORE
    * tokens it introduces, and the cumulative token/vocab totals — the
    * sub-linear vocab-vs-tokens curve that tells a corpus curator
    * whether new data still adds lexical coverage or is re-treading
    * the same vocabulary.
    *
    * Buckets are VALUE-range deciles of doc_id (exact integer `div` on
    * broadcast min/max bounds — identical in both engines), NOT a
    * row_number prefix: no corpus-sized window anywhere. "First seen
    * in bucket b" is a token-keyed min — map-side combinable — and
    * every later step (per-bucket rollups, the two running sums) runs
    * on the [[GrowthBuckets]]-row table. All counts exact longs;
    * nothing floats. */
  def vocabGrowth(docs: DataFrame, nBuckets: Int = GrowthBuckets): DataFrame = {
    val bounds = broadcast(docs.agg(
      min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx")))
    val base = docs.crossJoin(bounds)
      .select(col("doc_id"), col("text"),
        least(lit(nBuckets - 1L),
          expr(s"(doc_id - __mn) * $nBuckets div (__mx - __mn + 1)")).as("b"))
    val tok = base.select(col("b"), explode(split(col("text"), " ")).as("t"))
    val newVocab = tok.groupBy(col("t")).agg(min(col("b")).as("fb"))
      .groupBy(col("fb").as("b")).agg(count(lit(1)).as("new_tokens"))
    val perBucket = tok.groupBy(col("b")).agg(count(lit(1)).as("tokens"))
      .join(base.groupBy(col("b")).agg(count(lit(1)).as("docs")), Seq("b"))
      .join(newVocab, Seq("b"), "left")
      .select(col("b"), col("docs"), col("tokens"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .select(col("b").as("bucket"), col("docs"), col("tokens"),
        col("new_tokens"),
        sum(col("tokens")).over(w).as("cum_tokens"),
        sum(col("new_tokens")).over(w).as("cum_vocab"))
  }

  val vocabGrowthQ: GraftQuery = GraftQuery(
    "t25_vocab_growth",
    s"""WITH bounds AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
      |base AS (SELECT doc_id, text,
      |           least($GrowthBuckets - 1,
      |                 (doc_id - mn) * $GrowthBuckets // (mx - mn + 1)) AS b
      |         FROM documents CROSS JOIN bounds),
      |tok AS (SELECT b, unnest(string_split(text, ' ')) AS t FROM base),
      |nv AS (SELECT fb AS b, count(*) AS new_tokens
      |       FROM (SELECT t, min(b) AS fb FROM tok GROUP BY t) GROUP BY fb),
      |tp AS (SELECT b, count(*) AS tokens FROM tok GROUP BY b),
      |dc AS (SELECT b, count(*) AS docs FROM base GROUP BY b),
      |pb AS (SELECT dc.b AS bucket, dc.docs, tp.tokens,
      |         coalesce(nv.new_tokens, 0) AS new_tokens
      |       FROM dc JOIN tp ON tp.b = dc.b LEFT JOIN nv ON nv.b = dc.b)
      |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(docs AS BIGINT) AS docs,
      |       CAST(tokens AS BIGINT) AS tokens,
      |       CAST(new_tokens AS BIGINT) AS new_tokens,
      |       CAST(sum(tokens) OVER cum AS BIGINT) AS cum_tokens,
      |       CAST(sum(new_tokens) OVER cum AS BIGINT) AS cum_vocab
      |FROM pb WINDOW cum AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)""".stripMargin) {
    (spark, sf) => vocabGrowth(Tables.documents(spark, sf))
  }

  /** t26 — language confusion matrix: declared metadata language vs
    * t01's detected language, with per-declared-language shares — the
    * metadata-trust audit a curation pipeline runs before keying any
    * decision (sampling rates, tokenizer choice, mixture weights) off
    * the `lang` column: a source whose declared labels disagree with
    * detection gets its metadata quarantined, not consumed.
    *
    * Counts are exact longs; each share is one IEEE division of exact
    * integers (the q38 row-probability device). The detector is the
    * SAME marker tables both engines already share through t01, so the
    * cell assignment cannot drift.
    *
    * Scale shape: detection is row-local (fused with the scan); the
    * matrix is one map-side-combined aggregation to ≤|langs|²+|langs|
    * rows and the share window runs on that tiny table. */
  def langConfusion(docs: DataFrame): DataFrame =
    docs
      .select(col("lang").as("lang_declared"), langId(col("text")).as("lang_pred"))
      .groupBy(col("lang_declared"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("declared_total",
        sum(col("n")).over(Window.partitionBy(col("lang_declared"))))
      .select(col("lang_declared"), col("lang_pred"), col("n"),
        col("declared_total"),
        (col("n").cast("double") / col("declared_total")).as("share"),
        (col("lang_declared") === col("lang_pred")).as("agree"))

  val langConfusionQ: GraftQuery = GraftQuery(
    "t26_lang_confusion",
    s"""WITH t AS (SELECT doc_id, lang AS lang_declared, ' ' || text || ' ' AS p
      |           FROM documents),
      |s AS (SELECT doc_id, lang_declared,
      |${langScoreSql.map { case (l, e) => s"  $e AS s_$l" }.mkString(",\n")}
      |      FROM t),
      |d AS (SELECT lang_declared, $langCaseSql AS lang_pred FROM s),
      |c AS (SELECT lang_declared, lang_pred, count(*) AS n
      |      FROM d GROUP BY 1, 2)
      |SELECT lang_declared, lang_pred, CAST(n AS BIGINT) AS n,
      |       CAST(sum(n) OVER (PARTITION BY lang_declared) AS BIGINT) AS declared_total,
      |       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang_declared) AS share,
      |       lang_declared = lang_pred AS agree
      |FROM c""".stripMargin) { (spark, sf) =>
    langConfusion(Tables.documents(spark, sf))
  }

  /** t27 — per-source Zipf slope: least-squares slope of ln(freq) on
    * ln(rank) over each source's full token rank-frequency table —
    * the one-number language-likeness diagnostic (natural text sits
    * near −1, Zipf 1949; templated/boilerplate sources flatten toward
    * 0, and token-soup noise steepens). Read next to t20's vocab
    * sizes and t25's growth curve when deciding per-source mixture
    * weights.
    *
    * Float discipline: ranks and counts are exact integers; the four
    * regression terms (x, y, x·y, x²; x = ln rank, y = ln count) snap
    * on the 2^-30 grid (t13's device — order-independent sums), the
    * centered co-moments n·Σxy·S − Σx·Σy accumulate in DECIMAL(38,0)
    * (q32's device — the cross products overflow a Long at realistic
    * vocab sizes; 38 digits supports ~10^7 ranks/source at S = 2^30),
    * and the slope is ONE IEEE division of two exact integers. The
    * terminal round(,4) absorbs only libm ln ulp drift (t13's
    * argument). Shape: one token aggregation (map-side combined), a
    * per-source rank window over the POST-AGGREGATE vocab table
    * (distinct tokens, not token instances), one final per-source
    * aggregation — O(1) driver state, no corpus-scale window. */
  val zipfSlopeQ: GraftQuery = {
    val s = graft.functions.VectorFunctions.DistScale.toLong // 2^30
    GraftQuery(
      "t27_zipf_slope",
      s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |             FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT source, token, count(*) AS c FROM tok GROUP BY source, token),
        |r AS (SELECT source, c,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY c DESC, token) AS rank
        |      FROM f),
        |t AS (SELECT source,
        |        CAST(floor(ln(CAST(rank AS DOUBLE)) * $s + 0.5) AS BIGINT) AS sx,
        |        CAST(floor(ln(CAST(c AS DOUBLE)) * $s + 0.5) AS BIGINT) AS sy,
        |        CAST(floor(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE)) * $s + 0.5)
        |          AS BIGINT) AS sxy,
        |        CAST(floor(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)) * $s + 0.5)
        |          AS BIGINT) AS sxx
        |      FROM r),
        |g AS (SELECT source, count(*) AS n,
        |        CAST(sum(CAST(sx AS HUGEINT)) AS HUGEINT) AS ssx,
        |        CAST(sum(CAST(sy AS HUGEINT)) AS HUGEINT) AS ssy,
        |        CAST(sum(CAST(sxy AS HUGEINT)) AS HUGEINT) AS ssxy,
        |        CAST(sum(CAST(sxx AS HUGEINT)) AS HUGEINT) AS ssxx
        |      FROM t GROUP BY source),
        |m AS (SELECT source, n,
        |        CAST(n AS HUGEINT) * ssxy * CAST($s AS HUGEINT) - ssx * ssy AS num,
        |        CAST(n AS HUGEINT) * ssxx * CAST($s AS HUGEINT) - ssx * ssx AS den
        |      FROM g)
        |SELECT source, CAST(n AS BIGINT) AS n_ranks,
        |       CASE WHEN n > 1 AND den > 0
        |            THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4)
        |       END AS slope
        |FROM m""".stripMargin) { (spark, sf) =>
      zipfSlope(Tables.documents(spark, sf))
    }
  }

  /** The t27 regression over any (source, text) corpus. */
  def zipfSlope(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{snapLong, DistScale}
    val dec = "decimal(38,0)"
    val sDec = lit(DistScale.toLong).cast(dec)
    val f = docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("c").desc, col("token"))
    val x = log(col("rank").cast("double"))
    val y = log(col("c").cast("double"))
    f.withColumn("rank", row_number().over(w))
      .select(col("source"),
        snapLong(x, DistScale).as("sx"), snapLong(y, DistScale).as("sy"),
        snapLong(x * y, DistScale).as("sxy"),
        snapLong(x * x, DistScale).as("sxx"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("sx").cast(dec)).as("ssx"), sum(col("sy").cast(dec)).as("ssy"),
        sum(col("sxy").cast(dec)).as("ssxy"), sum(col("sxx").cast(dec)).as("ssxx"))
      .withColumn("__num",
        col("n").cast(dec) * col("ssxy") * sDec - col("ssx") * col("ssy"))
      .withColumn("__den",
        col("n").cast(dec) * col("ssxx") * sDec - col("ssx") * col("ssx"))
      .select(col("source"), col("n").as("n_ranks"),
        when(col("n") > 1 && col("__den") > 0,
          round(col("__num").cast("double") / col("__den").cast("double"), 4))
          .as("slope"))
  }

  /** t28 rule thresholds as exact rationals (num, den) — the Gopher
    * repetition-filter family (Rae et al. 2021 §A1.1.2: remove docs
    * whose most frequent word or duplicate n-gram mass exceeds a fixed
    * share). Top-word share ≤ 1/5 and duplicate-word fraction ≤ 3/5
    * are the published word-level cuts; the duplicate-bigram cut is
    * tightened to 1/10 for this corpus (single-space word streams —
    * measured p99 ≈ 0.10, so the rule discriminates rather than
    * passing vacuously). Evaluated by integer cross-multiplication —
    * no division, no float, no epsilon. */
  val TopWordMaxShare: (Int, Int) = (1, 5)
  val DupWordMaxShare: (Int, Int) = (3, 5)
  val DupBigramMaxShare: (Int, Int) = (1, 10)

  /** t28 — per-source repetition-rule panel (Gopher §A1.1.2 class):
    * for each document, the most-frequent-word share, the
    * duplicate-word fraction 1 − distinct/total, and the
    * duplicate-bigram fraction (occurrences of already-seen word
    * bigrams over total bigrams); per source, how many documents pass
    * each cut, pass all three, and the mean duplicate-bigram fraction
    * (the 2^-30 snap-grid mean — order-independent sum, one terminal
    * IEEE division). t02 scores length/shape/stopwords; this panel is
    * the repetition axis it deliberately left out.
    *
    * Shape: ONE corpus scan, ZERO per-doc shuffles — every per-doc
    * statistic is row-local (a document's tokens fit in one array):
    * distinct counts via `array_distinct`, the top-word multiplicity
    * as the longest run in `array_sort(tokens)` (one O(n log n) sort
    * + O(n) fold per row — no (doc_id, token) explode, which costs
    * two shuffles linear in TOKEN instances; this plan's only
    * exchange is the final per-source rollup, linear in DOCUMENTS).
    * No joins anywhere; the rule booleans are integer
    * cross-products. Snapped-sum bound: dupfrac ≤ 1 so the
    * per-source Long sum holds to ~8·10^9 docs/source (the v09
    * bound-note contract). */
  val repetitionRulesQ: GraftQuery = {
    val (twN, twD) = TopWordMaxShare
    val (dwN, dwD) = DupWordMaxShare
    val (dbN, dbD) = DupBigramMaxShare
    val s = graft.functions.VectorFunctions.DistScaleSql
    GraftQuery(
      "t28_repetition_rules",
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words
        |           FROM documents WHERE text IS NOT NULL),
        |u AS (SELECT doc_id, source, 0 AS k, unnest(words) AS it FROM w
        |      UNION ALL
        |      SELECT doc_id, source, 1 AS k,
        |             unnest([words[i] || ' ' || words[i+1]
        |                     for i in range(1, len(words))]) AS it
        |      FROM w),
        |g1 AS (SELECT doc_id, source, k, it, count(*) AS c
        |       FROM u GROUP BY doc_id, source, k, it),
        |g2 AS (SELECT doc_id, source,
        |         sum(CASE WHEN k = 0 THEN c END) AS n_tokens,
        |         count(CASE WHEN k = 0 THEN 1 END) AS n_distinct,
        |         max(CASE WHEN k = 0 THEN c END) AS maxc,
        |         coalesce(sum(CASE WHEN k = 1 THEN c END), 0) AS nb,
        |         count(CASE WHEN k = 1 THEN 1 END) AS ndb
        |       FROM g1 GROUP BY doc_id, source),
        |r AS (SELECT source,
        |        CASE WHEN maxc * $twD <= n_tokens * $twN THEN 1 ELSE 0 END AS p_tw,
        |        CASE WHEN (n_tokens - n_distinct) * $dwD <= n_tokens * $dwN
        |             THEN 1 ELSE 0 END AS p_dw,
        |        CASE WHEN nb = 0 OR (nb - ndb) * $dbD <= nb * $dbN
        |             THEN 1 ELSE 0 END AS p_db,
        |        CAST(floor((CASE WHEN nb > 0
        |                         THEN CAST(nb - ndb AS DOUBLE) / nb
        |                         ELSE 0.0 END) * $s + 0.5) AS BIGINT) AS snap_db
        |      FROM g2)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(p_tw) AS BIGINT) AS pass_top_word,
        |       CAST(sum(p_dw) AS BIGINT) AS pass_dup_word,
        |       CAST(sum(p_db) AS BIGINT) AS pass_dup_bigram,
        |       CAST(sum(p_tw * p_dw * p_db) AS BIGINT) AS pass_all,
        |       CAST(CAST(sum(snap_db) AS BIGINT) AS DOUBLE)
        |         / (count(*) * $s) AS mean_dup_bigram
        |FROM r GROUP BY source""".stripMargin) { (spark, sf) =>
      repetitionRules(Tables.documents(spark, sf))
    }
  }

  /** The t28 kernel over any (doc_id, source, text) corpus.
    *
    * All per-document statistics are computed INSIDE the row (no
    * (doc_id, item) explode — that shape shuffles twice, linear in
    * token instances): distinct counts via `array_distinct`, bigram
    * totals by construction (n − 1), and the top-word multiplicity as
    * the longest equal-run in the sorted token array via one
    * `aggregate` fold. The only exchange left is the final per-source
    * rollup over one pre-aggregated row per partition. */
  def repetitionRules(docs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.{snapLong, snapMean, DistScale}
    val (twN, twD) = TopWordMaxShare
    val (dwN, dwD) = DupWordMaxShare
    val (dbN, dbD) = DupBigramMaxShare
    val ww = col("w")
    val bigrams = when(size(ww) >= 2,
      transform(sequence(lit(1), size(ww) - 1),
        i => concat_ws(" ", element_at(ww, i), element_at(ww, i + 1))))
      .otherwise(array().cast("array<string>"))
    // One fold over the sorted copy yields BOTH token stats: the
    // longest equal-run == max multiplicity, and the number of run
    // starts == distinct count. Init prev = NULL: a real token never
    // <=>-matches it, so the first element always starts a run of 1
    // (tokens can be "" — a non-null sentinel would miscount that
    // case).
    val runStats = aggregate(
      array_sort(ww),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("nd")),
      (acc, x) => {
        val cont = x <=> acc.getField("prev")
        val run2 = when(cont, acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run2.as("run"),
          greatest(acc.getField("best"), run2).as("best"),
          (acc.getField("nd") + when(cont, 0L).otherwise(1L)).as("nd"))
      },
      acc => struct(acc.getField("best").as("maxc"),
        acc.getField("nd").as("n_distinct")))
    // Token array and fold-struct are projected once and referenced by
    // name: CollapseProject keeps non-cheap multiply-referenced
    // expressions materialized, so split/sort/fold each run once.
    val g2 = docs
      .where(col("text").isNotNull)
      .select(col("source"), tokens(col("text")).as("w"))
      .select(col("source"), ww, runStats.as("rs"))
      .select(
        col("source"),
        size(ww).cast("long").as("n_tokens"),
        col("rs.n_distinct").as("n_distinct"),
        col("rs.maxc").as("maxc"),
        when(size(ww) >= 2, (size(ww) - 1).cast("long")).otherwise(lit(0L))
          .as("nb"),
        size(array_distinct(bigrams)).cast("long").as("ndb"))
    val pTw = when(col("maxc") * twD <= col("n_tokens") * twN, 1L).otherwise(0L)
    val pDw = when((col("n_tokens") - col("n_distinct")) * dwD
      <= col("n_tokens") * dwN, 1L).otherwise(0L)
    val pDb = when(col("nb") === 0 ||
      (col("nb") - col("ndb")) * dbD <= col("nb") * dbN, 1L).otherwise(0L)
    val dupFrac = when(col("nb") > 0,
      (col("nb") - col("ndb")).cast("double") / col("nb")).otherwise(lit(0.0))
    g2.select(col("source"), pTw.as("p_tw"), pDw.as("p_dw"), pDb.as("p_db"),
        snapLong(dupFrac, DistScale).as("snap_db"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("p_tw")).as("pass_top_word"),
        sum(col("p_dw")).as("pass_dup_word"),
        sum(col("p_db")).as("pass_dup_bigram"),
        sum(col("p_tw") * col("p_dw") * col("p_db")).as("pass_all"),
        sum(col("snap_db")).as("__s"))
      .select(col("source"), col("n_docs"), col("pass_top_word"),
        col("pass_dup_word"), col("pass_dup_bigram"), col("pass_all"),
        snapMean(col("__s"), col("n_docs"), DistScale).as("mean_dup_bigram"))
  }

  /** t29 chunking geometry: 32-token windows advancing 24 tokens —
    * an 8-token overlap so no span is ever split without a copy that
    * sees it whole (the RAG / context-window prep convention). */
  private val ChunkSize = 32
  private val ChunkStride = 24

  /** t29 — overlapping token-window chunking with stable ids: every
    * document unfolds into `1 + ceil(max(n − size, 0) / stride)`
    * chunks at starts 0, stride, 2·stride, … — full coverage, the
    * last chunk short rather than a trailing no-new-token window.
    * Each chunk carries a POSITIONAL id (md5 of doc_id:idx — stable
    * under re-runs, the retrieval handle) and a CONTENT fingerprint
    * (md5 of the chunk text — what chunk-level dedup keys on, so two
    * docs sharing a window collide here and nowhere else).
    *
    * Scale shape: one narrow stage — tokenize, a row-local
    * sequence+posexplode (no shuffle, no window), and string slicing
    * fused into the scan by codegen. Chunk volume is ~n_tokens/stride
    * rows per doc, linear in corpus tokens; nothing is driver-side.
    * The oracle replays the exact geometry (integer ceil, 1-based
    * inclusive slicing) over the same whitespace tokens. */
  val chunkOverlapQ: GraftQuery = GraftQuery(
    "t29_chunk_overlap",
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, len(toks) AS n,
      |        1 + (greatest(len(toks) - $ChunkSize, 0) + ${ChunkStride - 1})
      |              // $ChunkStride AS n_chunks
      |      FROM d),
      |c AS (SELECT doc_id, toks, n,
      |        unnest(range(0, CAST(n_chunks AS BIGINT))) AS idx
      |      FROM s)
      |SELECT doc_id,
      |       CAST(idx AS BIGINT) AS chunk_idx,
      |       CAST(idx * $ChunkStride AS BIGINT) AS start_token,
      |       CAST(least(n - idx * $ChunkStride, $ChunkSize) AS BIGINT) AS n_tokens,
      |       array_to_string(
      |         toks[CAST(idx * $ChunkStride + 1 AS BIGINT) :
      |              CAST(least(idx * $ChunkStride + $ChunkSize, n) AS BIGINT)],
      |         ' ') AS chunk_text,
      |       md5(CAST(doc_id AS VARCHAR) || ':' || CAST(idx AS VARCHAR)) AS chunk_id,
      |       md5(array_to_string(
      |         toks[CAST(idx * $ChunkStride + 1 AS BIGINT) :
      |              CAST(least(idx * $ChunkStride + $ChunkSize, n) AS BIGINT)],
      |         ' ')) AS content_fp
      |FROM c""".stripMargin) { (spark, sf) =>
    chunkOverlap(Tables.documents(spark, sf))
  }

  /** The t29 kernel over any (doc_id, text) frame — geometry pinned by
    * QueryInvariantsSpec on planted docs (coverage, stride, short-doc
    * single chunk). */
  def chunkOverlap(docs: DataFrame,
      size0: Int = ChunkSize, stride: Int = ChunkStride): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    // integer ceil((n - size)^+ / stride): exact in doubles far past
    // any real token count, floored back to an int chunk count
    val nChunks = (lit(1) +
      floor((greatest(n - lit(size0), lit(0)) + lit(stride - 1))
        / lit(stride))).cast("int")
    val chunkText = concat_ws(" ",
      slice(col("toks"), col("start_token").cast("int") + lit(1), lit(size0)))
    docs
      .select(col("doc_id"), toks.as("toks"), n.as("n"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0L), (col("n_chunks") - 1).cast("long") * stride,
          lit(stride.toLong))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start_token")
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_token"),
        least(col("n") - col("start_token"), lit(size0)).cast("long")
          .as("n_tokens"),
        chunkText.as("chunk_text"),
        md5(concat_ws(":", col("doc_id"), col("chunk_idx"))).as("chunk_id"),
        md5(chunkText).as("content_fp"))
  }

  val all: Seq[GraftQuery] = Seq(
    langIdQ, qualityQ, tokenStatsQ, fingerprintQ, winnowQ, topTokensQ, tfidfQ,
    hashSplitQ, unigramNllQ, nllBandQ, boilerplateQ, ngramNoveltyQ, sourceVocabQ,
    dfDriftQ, bigramNllQ, vocabGrowthQ, langConfusionQ, zipfSlopeQ,
    repetitionRulesQ, chunkOverlapQ)
}
