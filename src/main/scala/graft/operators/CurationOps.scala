package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._

/** Row of [[CurationOps.packQ]]'s input: one document routed to a
  * pack shard with its token cost. */
final case class PackIn(doc_id: Long, shard: Int, n_tokens: Long)

/** Row of [[CurationOps.packQ]]'s output: the document's bin within
  * its shard and its token offset within the bin. */
final case class PackOut(
    doc_id: Long, shard: Int, bin: Long, tok_offset: Long, n_tokens: Long)

/** Training-data curation operators beyond per-doc text analysis
  * ([[TextOps]]): corpus-level repetition signals, the composite
  * keep/drop quality gate, PII redaction, stratified sampling, and
  * sequence packing — the stages a 100 TB pretraining pipeline runs
  * between raw crawl and tokenizer.
  *
  * Everything here is oracle-checked: signals are ratios of integer
  * counts (raw IEEE doubles — bit-identical across engines) and the
  * sequential packing loop is mirrored by a DuckDB recursive CTE.
  */
/** The train/val/test boundary policy t08 (per-document) and t17
  * (per-cluster) share — one definition so a rebalance can never move
  * one split and silently leave the other on the old scheme. */
private[operators] object SplitPolicy {
  val TrainUpper = 80
  val ValUpper = 90
  def caseSql(bucket: String): String =
    s"CASE WHEN $bucket < $TrainUpper THEN 'train' " +
      s"WHEN $bucket < $ValUpper THEN 'val' ELSE 'test' END"
  def caseCol(bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.when(bucket < TrainUpper, "train")
      .when(bucket < ValUpper, "val").otherwise("test")
}

/** md5-derived integer bucket, generated as engine-native SQL for
  * Spark and DuckDB: fold the top 16 bits (first 4 hex digits) of
  * md5(input) into an int, mod `mod`. Salting the input string
  * decorrelates independent uses (split vs sample vs shard vs
  * reweight). Hash-stable across runs, partitionings, and engines.
  * Top-level (not nested in [[CurationOps]]) because [[TextOps]]'s
  * t08 split also uses it while CurationOps' t10 SQL reads TextOps
  * vals — nesting would make module initialization order-sensitive. */
private[operators] object Md5Bucket {
  private val alphabet = "0123456789abcdef"
  private def hexVal(engine: String, input: String, i: Int): String = engine match {
    // 1-indexed substring in both; instr/position return 1-based
    case "spark" => s"(instr('$alphabet', substring(md5($input), $i, 1)) - 1)"
    case _       => s"(position(substring(md5($input), $i, 1) IN '$alphabet') - 1)"
  }
  def bucketSql(engine: String, input: String, mod: Int): String =
    (1 to 4).map(i => s"${hexVal(engine, input, i)} * ${math.pow(16, 4 - i).toLong}")
      .mkString("(", " + ", s") % $mod")
}

object CurationOps {

  // ------------------------------------------------------ t09 repetition

  /** Token n-gram occurrence counts per document: one (doc_id, gram, n)
    * row per distinct gram. Two shuffles — (doc_id, gram) then doc_id —
    * both keyed on per-document data, so parallelism scales with the
    * corpus and no key exceeds a single document's gram count. */
  private def gramCounts(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        explode(when(size(col("tk")) >= n,
          transform(sequence(lit(1), size(col("tk")) - n + 1),
            i => array_join(slice(col("tk"), i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))

  /** (doc_id, top2_frac): fraction of 2-gram occurrences accounted for
    * by the document's most frequent 2-gram (Rae et al. 2021 "Gopher"
    * §A1.1 repetition-signal family, over token grams). */
  private[operators] def top2Frac(docs: DataFrame): DataFrame =
    gramCounts(docs, 2)
      .groupBy(col("doc_id"))
      .agg((max(col("n")).cast("double") / sum(col("n"))).as("top2_frac"))

  private def repetitionSql(gram: Int, agg: String): String = {
    val parts = (0 until gram)
      .map(o => s"tk[CAST(i${if (o == 0) "" else s" + $o"} AS INT)]")
      .mkString(" || ' ' || ")
    s"""g$gram AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, len(tk) - ${gram - 2}), i -> $parts)) AS g
       |  FROM tk),
       |c$gram AS (SELECT doc_id, g, count(*) AS n FROM g$gram GROUP BY doc_id, g),
       |a$gram AS (SELECT doc_id, $agg FROM c$gram GROUP BY doc_id)""".stripMargin
  }

  /** Per-document repetition signals over (doc_id, text) rows:
    * most-common-2-gram occurrence fraction and duplicated-3-gram
    * occurrence fraction. Documents too short to have grams report
    * 0.0. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val dup3 = gramCounts(docs, 3)
      .groupBy(col("doc_id"))
      .agg((sum(when(col("n") > 1, col("n")).otherwise(0L)).cast("double")
        / sum(col("n"))).as("dup3_frac"))
    docs.select(col("doc_id"))
      .join(top2Frac(docs), Seq("doc_id"), "left")
      .join(dup3, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("dup3_frac"), lit(0.0)).as("dup3_frac"))
  }

  /** [[repetitionSignals]] as a registry query. Raw doubles (ratios of
    * integer counts — IEEE division is bit-identical across
    * engines). */
  val repetitionQ: GraftQuery = GraftQuery(
    "t09_repetition",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |${repetitionSql(2, "CAST(max(n) AS DOUBLE) / CAST(sum(n) AS BIGINT) AS top2_frac")},
       |${repetitionSql(3, "CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE) / CAST(sum(n) AS BIGINT) AS dup3_frac")}
       |SELECT d.doc_id,
       |       coalesce(a2.top2_frac, 0.0) AS top2_frac,
       |       coalesce(a3.dup3_frac, 0.0) AS dup3_frac
       |FROM documents d
       |LEFT JOIN a2 ON a2.doc_id = d.doc_id
       |LEFT JOIN a3 ON a3.doc_id = d.doc_id""".stripMargin) { (spark, sf) =>
    repetitionSignals(Tables.documents(spark, sf))
  }

  // ---------------------------------------------------- t10 quality gate

  /** Rule thresholds for the composite gate. Shapes are the C4/Gopher
    * public rules (Raffel et al. 2020 §2.2; Rae et al. 2021 §A1.1);
    * numeric cutoffs are tuned so each rule discriminates on the
    * synthetic corpus (e.g. the Gopher top-2-gram cutoff of 0.20 never
    * fires on 10-99-token documents — 0.08 is the same rule scaled to
    * this length regime). */
  val MinTokens = 20
  val MaxTokens = 1000
  val MaxTop2Frac = 0.08

  /** Composite quality gate: keep a document only if it passes language
    * (predicted en), length, token-shape, stopword-ratio, and
    * repetition rules; failing rule names are emitted in fixed order as
    * the audit trail. One corpus-level aggregation (the 2-gram signal);
    * everything else is row-local and fuses into the scan. */
  /** The t10 gate's CTE chain (… → `f` with the five ok_* booleans) —
    * body form shared by the t10 row and p03's funnel stage, so the
    * gate rules are spelled exactly once. */
  private def qualityGateCtesSql: String =
    s"""t AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
       |s AS (SELECT doc_id,
       |${TextOps.langScoreSql.map { case (l, e) => s"  $e AS s_$l" }.mkString(",\n")}
       |      FROM t),
       |l AS (SELECT doc_id, ${TextOps.langCaseSql} AS lang_pred FROM s),
       |m AS (SELECT doc_id,
       |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |        CAST(length(replace(text, ' ', '')) AS DOUBLE)
       |          / len(string_split(text, ' ')) AS avg_len,
       |        CAST(len(list_filter(string_split(text, ' '),
       |                 x -> x IN (${TextOps.stopListSql}))) AS DOUBLE)
       |          / len(string_split(text, ' ')) AS stop_ratio
       |      FROM documents),
       |tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |${repetitionSql(2, "CAST(max(n) AS DOUBLE) / CAST(sum(n) AS BIGINT) AS top2_frac")},
       |f AS (SELECT m.doc_id,
       |        l.lang_pred = 'en' AS ok_lang,
       |        m.n_tokens BETWEEN $MinTokens AND $MaxTokens AS ok_len,
       |        m.avg_len >= 3.0 AND m.avg_len <= 10.0 AS ok_shape,
       |        m.stop_ratio >= 0.01 AND m.stop_ratio <= 0.5 AS ok_stop,
       |        coalesce(a2.top2_frac, 0.0) <= $MaxTop2Frac AS ok_rep
       |      FROM m
       |      JOIN l ON l.doc_id = m.doc_id
       |      LEFT JOIN a2 ON a2.doc_id = m.doc_id)""".stripMargin

  val qualityFilterQ: GraftQuery = GraftQuery(
    "t10_quality_filter",
    s"""WITH $qualityGateCtesSql
       |SELECT doc_id,
       |       CASE WHEN ok_lang AND ok_len AND ok_shape AND ok_stop AND ok_rep
       |            THEN 'keep' ELSE 'drop' END AS verdict,
       |       coalesce(array_to_string(list_filter([
       |         CASE WHEN NOT ok_lang THEN 'lang' END,
       |         CASE WHEN NOT ok_len THEN 'len' END,
       |         CASE WHEN NOT ok_shape THEN 'shape' END,
       |         CASE WHEN NOT ok_stop THEN 'stop' END,
       |         CASE WHEN NOT ok_rep THEN 'rep' END], x -> x IS NOT NULL), ','), '') AS reasons
       |FROM f""".stripMargin) { (spark, sf) =>
    qualityVerdict(Tables.documents(spark, sf))
  }

  /** The t10 gate over (doc_id, text) rows: verdict + failed-rule audit
    * trail. */
  def qualityVerdict(docs: DataFrame): DataFrame = {
    val sig = docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      avgTokenLength(col("text")).as("avg_len"),
      (stopwordCount(col("text")).cast("double") / tokenCount(col("text"))).as("stop_ratio"),
      langId(col("text")).as("lang_pred"))
      .join(top2Frac(docs), Seq("doc_id"), "left")
      .withColumn("top2_frac", coalesce(col("top2_frac"), lit(0.0)))
    val okLang  = col("lang_pred") === "en"
    val okLen   = col("n_tokens").between(MinTokens, MaxTokens)
    val okShape = col("avg_len") >= 3.0 && col("avg_len") <= 10.0
    val okStop  = col("stop_ratio") >= 0.01 && col("stop_ratio") <= 0.5
    val okRep   = col("top2_frac") <= MaxTop2Frac
    sig.select(
      col("doc_id"),
      when(okLang && okLen && okShape && okStop && okRep, "keep")
        .otherwise("drop").as("verdict"),
      array_join(filter(array(
        when(!okLang, "lang"), when(!okLen, "len"), when(!okShape, "shape"),
        when(!okStop, "stop"), when(!okRep, "rep")), x => x.isNotNull), ",")
        .as("reasons"))
  }

  // --------------------------------------------------- t11 PII redaction

  /** PII patterns, dialect-portable between java.util.regex (Spark) and
    * RE2 (DuckDB): character classes, bounded repetition, grouping, and
    * the (?i) flag only — no backreferences or lookaround. Public-shape
    * patterns (precision-tuned variants of the classic email/IPv4/E.164
    * expressions). Email is (?i) so 'John.Doe@Example.COM' is caught —
    * mail addresses are case-insensitive; IP/phone have no letters. */
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,6}"
  val Ipv4Re  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+[0-9]{7,15}"

  /** PII columns: match counts on the raw text plus the redacted text
    * (email → ip → phone replacement order). Row-local, codegen'd. */
  private[operators] def piiCols(text: org.apache.spark.sql.Column) = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    (regexp_count(text, lit(EmailRe)).cast("long"),
      regexp_count(text, lit(Ipv4Re)).cast("long"),
      regexp_count(text, lit(PhoneRe)).cast("long"),
      redacted)
  }

  /** PII detection + redaction over the corpus. The synthetic corpus
    * contains no PII, so the oracle hash additionally proves the
    * no-false-positive side over every document; planted fixtures in
    * CurationSpec prove detection/redaction (the m05 pattern: an empty
    * result over honest data is a result, the spec plants the
    * positives). Emits md5 of the redacted text — the contract is
    * "redaction changed exactly the matched spans", not a text dump. */
  val piiRedactQ: GraftQuery = GraftQuery(
    "t11_pii_redact",
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |       CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
       |       md5(regexp_replace(regexp_replace(regexp_replace(text,
       |         '$EmailRe', '<EMAIL>', 'g'),
       |         '$Ipv4Re', '<IP>', 'g'),
       |         '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM documents""".stripMargin) { (spark, sf) =>
    val (emails, ips, phones, redacted) = piiCols(col("text"))
    Tables.documents(spark, sf).select(
      col("doc_id"),
      emails.as("n_emails"), ips.as("n_ips"), phones.as("n_phones"),
      md5(redacted).as("redacted_md5"))
  }

  // ----------------------------------------------- t12 stratified sample

  /** Per-language sampling rates in bucket percent: downsample the
    * dominant language, thin the CJK slice harder, keep the rest. */
  val SampleRates: Seq[(String, Int)] = Seq("en" -> 50, "zh" -> 25)
  val DefaultRate = 100

  /** Deterministic stratified sampling: keep a document iff its salted
    * md5 bucket falls under its language's rate. Hash-based, so the
    * sample is reproducible across runs/engines/partitionings and
    * independent of t08's split assignment (different salt). A pure
    * filter — fuses into the scan, no shuffle, trivially 100 TB-safe. */
  val stratifiedSampleQ: GraftQuery = {
    val rateCase = (engine: String) =>
      s"CASE lang ${SampleRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")} ELSE $DefaultRate END"
    GraftQuery(
      "t12_stratified_sample",
      s"""SELECT doc_id, lang, bucket
         |FROM (SELECT doc_id, lang,
         |        CAST(${Md5Bucket.bucketSql("duckdb", "'s:' || CAST(doc_id AS VARCHAR)", 100)} AS BIGINT) AS bucket
         |      FROM documents) t
         |WHERE bucket < ${rateCase("duckdb")}""".stripMargin) { (spark, sf) =>
      val bucket = expr(Md5Bucket.bucketSql("spark", "concat('s:', CAST(doc_id AS STRING))", 100)).cast("long")
      val rate = SampleRates.foldRight(lit(DefaultRate)) { case ((l, r), e) =>
        when(col("lang") === l, lit(r)).otherwise(e)
      }
      Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(col("bucket") < rate)
    }
  }

  // -------------------------------------------------- pk01 sequence pack

  /** Token budget per packed bin (small to exercise multi-bin shards on
    * the 10-99-token corpus; production would use the model context). */
  val PackBudget = 256L

  /** Pack shards: fixed here for oracle determinism; at scale the count
    * is corpus-sized (n_docs·avg_tokens / desired shard footprint) —
    * the algorithm is per-shard-sequential / cross-shard-parallel
    * either way. */
  val PackShards = 16

  /** Greedy first-fit sequence packing of documents into token-budget
    * bins — the pretraining step that concatenates documents into fixed
    * context windows without splitting them. Documents are routed to a
    * hash shard, ordered by doc_id, and packed left-to-right: a
    * document that would overflow the current bin opens the next one
    * (an oversized document gets a bin to itself).
    *
    * Exact greedy packing is inherently sequential per shard, so this
    * is one of the rare legitimate `mapPartitions` operators: rows
    * arrive hash-partitioned by shard and sorted (shard, doc_id), and
    * a streaming O(1)-state pass assigns bins — no per-group buffering,
    * no driver involvement, shards pack in parallel. The oracle mirrors
    * the same loop as a DuckDB recursive CTE advancing all shards in
    * lock-step. */
  def packed(docs: DataFrame, shards: Int, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val shard = expr(Md5Bucket.bucketSql("spark", "concat('p:', CAST(doc_id AS STRING))", shards)).cast("int")
    docs
      .select(col("doc_id"), shard.as("shard"), tokenCount(col("text")).as("n_tokens"))
      .as[PackIn]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        var shard = Int.MinValue
        var fill = 0L
        var bin = 0L
        it.map { r =>
          if (r.shard != shard) { shard = r.shard; bin = 0L; fill = r.n_tokens }
          else if (fill + r.n_tokens <= budget) { fill += r.n_tokens }
          else { bin += 1L; fill = r.n_tokens }
          PackOut(r.doc_id, r.shard, bin, fill - r.n_tokens, r.n_tokens)
        }
      }
      .toDF()
  }

  /** pk01's greedy pack as a recursive CTE — the ONE spelling shared
    * by every pk oracle that replays the bin assignment (pk01, pk02,
    * pk05), so the packing convention is written exactly once. */
  private def packRecursiveCtes: String =
    s"""o AS (
       |  SELECT doc_id,
       |         CAST(${Md5Bucket.bucketSql("duckdb", "'p:' || CAST(doc_id AS VARCHAR)", PackShards)} AS INT) AS shard,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         row_number() OVER (
       |           PARTITION BY CAST(${Md5Bucket.bucketSql("duckdb", "'p:' || CAST(doc_id AS VARCHAR)", PackShards)} AS INT)
       |           ORDER BY doc_id) AS rn
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, shard, n_tokens, rn, n_tokens AS fill, CAST(0 AS BIGINT) AS bin
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.doc_id, o.shard, o.n_tokens, o.rn,
       |         CASE WHEN r.fill + o.n_tokens <= $PackBudget
       |              THEN r.fill + o.n_tokens ELSE o.n_tokens END,
       |         CASE WHEN r.fill + o.n_tokens <= $PackBudget
       |              THEN r.bin ELSE r.bin + 1 END
       |  FROM r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1)""".stripMargin

  val packQ: GraftQuery = GraftQuery(
    "pk01_sequence_pack",
    s"""WITH RECURSIVE $packRecursiveCtes
       |SELECT doc_id, shard, bin, fill - n_tokens AS tok_offset, n_tokens
       |FROM r""".stripMargin) { (spark, sf) =>
    packed(Tables.documents(spark, sf), PackShards, PackBudget)
  }

  /** pk06 cut length: tokens per training window. Shorter than
    * [[PackBudget]] on purpose — the two packing disciplines are
    * different operators with different knobs. */
  val CutLen = 256L

  /** pk06 — CONCATENATE-AND-CUT packing (the GPT-pretraining
    * discipline, distinct from pk01's greedy bin packing): documents
    * are concatenated in doc_id order into one token stream and cut
    * into fixed [[CutLen]]-token windows; a document may straddle a
    * cut, and the row reports, per document, its absolute token span
    * and how many training sequences it touches — the
    * boundary-crossing accounting an attention-masking / loss-masking
    * pipeline needs.
    *
    * Scale shape — the reason this is NOT one corpus-wide window: the
    * absolute token offset is a PREFIX SUM, computed two-tier like a
    * distributed scan. Documents shard by contiguous doc_id range
    * ([[PackShards]] ranges); within-shard running sums are a window
    * partitioned by shard (parallel across shards), per-shard totals
    * aggregate to a [[PackShards]]-row relation whose own cumsum — the
    * only unpartitioned window — runs over 32 rows, then broadcasts
    * back. A naive `Window.orderBy(doc_id)` with no partition would
    * single-thread the corpus; this shape survives 100 TB because the
    * unpartitioned step is O(shards), never O(docs). */
  def concatCut(docs: DataFrame): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
    // contiguous-range sharding keeps concatenation order == (shard
    // asc, doc_id asc) == global doc_id order
    // exact integer DIV (the oracle's `//`) — a double division here
    // could round differently at corpus-scale ids
    val shardSize = toks.agg(
      expr(s"CAST(max(doc_id) DIV $PackShards + 1 AS BIGINT)").as("__sz"))
    val sharded = toks.crossJoin(broadcast(shardSize))
      .select(col("doc_id"), col("n_tokens"),
        expr("doc_id DIV __sz").as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = sharded.withColumn("__run", sum(col("n_tokens")).over(w))
    val wOff = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = sharded.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(wOff) - col("__tot"))
      .select(col("shard"), col("__off"))
    within.join(broadcast(offsets), "shard")
      .select(col("doc_id"), col("n_tokens"),
        (col("__off") + col("__run") - col("n_tokens")).as("tok_start"))
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        expr(s"tok_start DIV $CutLen").as("first_seq"),
        expr(s"(tok_start + n_tokens - 1) DIV $CutLen").as("last_seq"))
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        col("first_seq"), col("last_seq"),
        (col("last_seq") - col("first_seq") + 1L).as("n_seqs"),
        (col("first_seq") =!= col("last_seq")).as("crosses_cut"))
  }

  val concatCutQ: GraftQuery = GraftQuery(
    "pk06_concat_cut",
    s"""WITH tk AS (SELECT doc_id,
       |              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |            FROM documents WHERE text IS NOT NULL),
       |sz AS (SELECT CAST(max(doc_id) // $PackShards + 1 AS BIGINT) AS s FROM tk),
       |sh AS (SELECT doc_id, n_tokens, doc_id // sz.s AS shard FROM tk, sz),
       |wi AS (SELECT doc_id, n_tokens, shard,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS UNBOUNDED PRECEDING) AS run
       |       FROM sh),
       |st AS (SELECT shard, sum(n_tokens) AS tot FROM sh GROUP BY shard),
       |so AS (SELECT shard,
       |         sum(tot) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) - tot
       |           AS off FROM st),
       |sp AS (SELECT wi.doc_id, wi.n_tokens,
       |         CAST(so.off + wi.run - wi.n_tokens AS BIGINT) AS tok_start
       |       FROM wi JOIN so USING (shard))
       |SELECT doc_id, n_tokens, tok_start,
       |       tok_start // $CutLen AS first_seq,
       |       (tok_start + n_tokens - 1) // $CutLen AS last_seq,
       |       (tok_start + n_tokens - 1) // $CutLen - tok_start // $CutLen + 1
       |         AS n_seqs,
       |       tok_start // $CutLen <> (tok_start + n_tokens - 1) // $CutLen
       |         AS crosses_cut
       |FROM sp""".stripMargin) { (spark, sf) =>
    concatCut(Tables.documents(spark, sf))
  }

  // ---------------------------------------------- t14 source reweight

  /** Domain-mixture rebalancing: downsample over-represented sources
    * toward a UNIFORM mixture. Per-source keep rate in basis points =
    * min(10000, ⌊10000·total / (k·count_source)⌋) — pure integer math
    * (`div`/`//`, not float division, so both engines floor the same
    * quotient bit-for-bit) — and the keep decision is the salted-md5
    * bucket against that rate (salt 'w:' decorrelates from t08's
    * split and t12's sample). Emits the full per-document decision
    * report, kept and dropped alike, so the downstream mixture is
    * auditable.
    *
    * Scale shape: the rate table is O(sources) built by one
    * map-combined aggregation and broadcast back; the per-document
    * pass is row-local. No corpus-wide shuffle. */
  val sourceReweightQ: GraftQuery = GraftQuery(
    "t14_source_reweight",
    s"""WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_total, count(*) AS k FROM c),
       |r AS (SELECT source,
       |        least(10000, (10000 * n_total) // (k * n_src)) AS rate_bp
       |      FROM c CROSS JOIN t)
       |SELECT d.doc_id, d.source, r.rate_bp,
       |       CAST(${Md5Bucket.bucketSql("duckdb", "'w:' || CAST(doc_id AS VARCHAR)", 10000)} AS BIGINT)
       |         < r.rate_bp AS kept
       |FROM documents d JOIN r USING (source)""".stripMargin) { (spark, sf) =>
    sourceReweight(Tables.documents(spark, sf))
  }

  /** The t14 computation over any (doc_id, source) frame. */
  def sourceReweight(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val totals = counts.agg(sum(col("n_src")).as("n_total"), count(lit(1)).as("k"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("source"),
        least(lit(10000L), expr("(10000 * n_total) div (k * n_src)")).as("rate_bp"))
    docs
      .select(col("doc_id"), col("source"),
        expr(Md5Bucket.bucketSql("spark", "concat('w:', CAST(doc_id AS STRING))", 10000))
          .cast("long").as("bucket"))
      .join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("rate_bp"),
        (col("bucket") < col("rate_bp")).as("kept"))
  }

  /** Bottom per-source quantile dropped by t18. */
  val SourceQualityFloor = 0.25

  /** Per-source quality calibration: a raw quality bar is not
    * comparable across sources (a web crawl and a curated archive have
    * different score distributions), so the filtering literature
    * normalizes per source — each document's quality maps to its exact
    * WITHIN-SOURCE quantile rank (fraction of the source strictly
    * below it) and the keep bar is a rank, not a score. Emits the full
    * decision report like t14.
    *
    * Scale shape: [[QuantileKernel.cumulativeHistogram]] keyed on
    * source — per-task state is the distinct (source, quality) domain
    * (t02's composite takes 6 values, so the rank table is
    * O(|sources|·6) and broadcasts); the per-document pass is one
    * broadcast join, no corpus-wide window anywhere (contrast q27).
    * q_rank = (cum − cnt)/n is a ratio of exact integers — raw-double
    * bit parity, no rounding. */
  val sourceQualityNormQ: GraftQuery = GraftQuery(
    "t18_source_quality_norm",
    s"""WITH t AS (
       |${TextOps.qualityStatsSqlWith("source,")}),
       |q AS (SELECT doc_id, source, ${TextOps.qualityExprSql} AS quality FROM t),
       |h AS (SELECT source, quality, count(*) AS cnt FROM q
       |      WHERE quality IS NOT NULL GROUP BY source, quality),
       |c AS (SELECT source, quality, cnt,
       |        sum(cnt) OVER (PARTITION BY source ORDER BY quality
       |                       ROWS UNBOUNDED PRECEDING) AS cum,
       |        sum(cnt) OVER (PARTITION BY source) AS n
       |      FROM h)
       |SELECT q.doc_id, q.source, q.quality,
       |       CAST(c.cum - c.cnt AS DOUBLE) / CAST(c.n AS DOUBLE) AS q_rank,
       |       CAST(c.cum - c.cnt AS DOUBLE) / CAST(c.n AS DOUBLE)
       |         >= $SourceQualityFloor AS keep
       |FROM q LEFT JOIN c ON q.source = c.source AND q.quality = c.quality"""
      .stripMargin) { (spark, sf) =>
    sourceQualityNorm(Tables.documents(spark, sf))
  }

  /** The t18 computation over any (doc_id, source, text) frame. */
  def sourceQualityNorm(docs: DataFrame, floor: Double = SourceQualityFloor): DataFrame = {
    val scored = docs.select(col("doc_id"), col("source"),
      // raw score: a left-assoc sum of literals — identical IEEE
      // sequence in both engines, so it is also a safe group/join key
      graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
    val ranks = QuantileKernel.cumulativeHistogram(scored, "source", "quality")
      .select(col("source"), col("quality"),
        ((col("cum") - col("cnt")).cast("double") / col("n").cast("double"))
          .as("q_rank"))
    scored.join(broadcast(ranks), Seq("source", "quality"), "left")
      .select(col("doc_id"), col("source"), col("quality"), col("q_rank"),
        (col("q_rank") >= floor).as("keep"))
  }

  /** Fraction of the corpus' TOKEN mass the sampled mixture may keep. */
  val TokenBudgetFrac = 0.95

  /** t21 — token-budget mixture sampling: the allocation policy that
    * sizes a training mixture by TOKEN MASS, not document count
    * (t14's axis): every source gets an equal share of a corpus-wide
    * token budget (frac·total/ns tokens), sources under their share
    * keep everything, sources over it are downsampled to fit. The
    * keep rate is pure integer basis-point math — rate_bp =
    * min(10000, (9500·total) // (ns·t_s)) — so both engines floor the
    * same quotient bit-for-bit (the t14 device), and the keep
    * decision is the salted-md5 bucket ('tb:' decorrelates from
    * t08/t12/t14). The full decision report (kept and dropped alike)
    * ships so the realized mixture is auditable downstream.
    *
    * Scale shape: per-source token totals are one map-combined
    * aggregation broadcast back; the per-document pass is row-local.
    * No corpus-wide shuffle. */
  val tokenBudgetQ: GraftQuery = GraftQuery(
    "t21_token_budget_sample",
    s"""WITH base AS (SELECT doc_id, source,
       |        CASE WHEN text IS NULL THEN CAST(0 AS BIGINT)
       |             ELSE CAST(len(string_split(text, ' ')) AS BIGINT) END AS n_tokens
       |      FROM documents),
       |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s FROM base GROUP BY source),
       |gt AS (SELECT CAST(sum(t_s) AS BIGINT) AS total, count(*) AS ns FROM ps),
       |r AS (SELECT source, t_s,
       |        least(10000, (${(TokenBudgetFrac * 10000).toLong} * total) // (ns * t_s)) AS rate_bp
       |      FROM ps CROSS JOIN gt)
       |SELECT b.doc_id, b.source, b.n_tokens, r.rate_bp,
       |       CAST(${Md5Bucket.bucketSql("duckdb", "'tb:' || CAST(doc_id AS VARCHAR)", 10000)} AS BIGINT)
       |         < r.rate_bp AS kept
       |FROM base b JOIN r USING (source)""".stripMargin) { (spark, sf) =>
    tokenBudgetSample(Tables.documents(spark, sf))
  }

  /** The t21 computation over any (doc_id, source, text) frame. */
  def tokenBudgetSample(docs: DataFrame,
      budgetFrac: Double = TokenBudgetFrac): DataFrame = {
    val bp = (budgetFrac * 10000).toLong
    val base = docs.select(col("doc_id"), col("source"),
      when(col("text").isNull, lit(0L))
        .otherwise(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val perSource = base.groupBy(col("source")).agg(sum(col("n_tokens")).as("t_s"))
    val rates = perSource.crossJoin(broadcast(
        perSource.agg(sum(col("t_s")).as("total"), count(lit(1)).as("ns"))))
      .select(col("source"),
        least(lit(10000L), expr(s"($bp * total) div (ns * t_s)")).as("rate_bp"))
    base
      .withColumn("bucket",
        expr(Md5Bucket.bucketSql("spark", "concat('tb:', CAST(doc_id AS STRING))", 10000))
          .cast("long"))
      .join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("rate_bp"),
        (col("bucket") < col("rate_bp")).as("kept"))
  }

  /** t22 — temperature-scaled mixture weights (the multilingual-LLM
    * sampling scheme: w_s ∝ (T_s/ΣT)^α dampens dominant sources
    * without flattening to uniform). α is pinned to ½ so the exponent
    * is `sqrt` — correctly-rounded IEEE in BOTH engines, unlike
    * `pow`/`ln`, whose libm ulp conventions differ — and the
    * normalizing sum over per-source sqrt shares goes through the
    * dyadic snap ([[graft.functions.VectorFunctions.snapLong]]), so
    * every emitted double (share, weight, expected epochs under the
    * t21 budget) is a deterministic IEEE sequence at any aggregation
    * order in any engine.
    *
    * Scale shape: two O(sources) aggregates, both broadcast — the
    * corpus is touched once for token totals. */
  val mixtureWeightsQ: GraftQuery = GraftQuery(
    "t22_mixture_weights",
    s"""WITH base AS (SELECT doc_id, source,
       |        CASE WHEN text IS NULL THEN CAST(0 AS BIGINT)
       |             ELSE CAST(len(string_split(text, ' ')) AS BIGINT) END AS n_tokens
       |      FROM documents),
       |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s FROM base GROUP BY source),
       |gt AS (SELECT CAST(sum(t_s) AS BIGINT) AS total FROM ps),
       |r AS (SELECT source, t_s, total,
       |        CAST(t_s AS DOUBLE) / total AS share,
       |        sqrt(CAST(t_s AS DOUBLE) / total) AS sq
       |      FROM ps CROSS JOIN gt),
       |nm AS (SELECT CAST(sum(CAST(floor(sq * ${graft.functions.VectorFunctions.SnapScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
       |         / ${graft.functions.VectorFunctions.SnapScaleSql} AS s FROM r)
       |SELECT source, t_s, share,
       |       sq / s AS weight,
       |       CASE WHEN t_s = 0 THEN 0.0
       |            ELSE sq / s * (CAST($TokenBudgetFrac AS DOUBLE) * total) / t_s
       |       END AS expected_epochs
       |FROM r CROSS JOIN nm""".stripMargin) { (spark, sf) =>
    mixtureWeights(Tables.documents(spark, sf))
  }

  /** The t22 computation over any (doc_id, source, text) frame. */
  def mixtureWeights(docs: DataFrame,
      budgetFrac: Double = TokenBudgetFrac): DataFrame = {
    import graft.functions.VectorFunctions.{snapLong, SnapScale}
    val base = docs.select(col("doc_id"), col("source"),
      when(col("text").isNull, lit(0L))
        .otherwise(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val ps = base.groupBy(col("source")).agg(sum(col("n_tokens")).as("t_s"))
    val r = ps.crossJoin(broadcast(ps.agg(sum(col("t_s")).as("total"))))
      .withColumn("share", col("t_s").cast("double") / col("total"))
      .withColumn("sq", sqrt(col("share")))
    r.crossJoin(broadcast(
        r.agg((sum(snapLong(col("sq"))).cast("double") / lit(SnapScale)).as("s"))))
      .select(col("source"), col("t_s"), col("share"),
        (col("sq") / col("s")).as("weight"),
        // decide-before-divide (the v05/v07 contract): a zero-token
        // source is 0/0 = NaN in Spark but NULL in DuckDB
        when(col("t_s") === 0, lit(0.0))
          .otherwise((col("sq") / col("s") * (lit(budgetFrac) * col("total")))
            / col("t_s"))
          .as("expected_epochs"))
  }

  /** pk02 — packing utilization report: per (shard, bin) of pk01's
    * greedy packing, the document count, token fill, fill rate against
    * the budget, and an overflow flag (a bin can exceed the budget
    * only when a single oversized document owns it) — the artifact a
    * pretraining-data owner reads to decide whether the budget/shard
    * sizing wastes context-window tokens. Padding waste = 1−fill_rate
    * is the number that directly prices the packing policy.
    *
    * Fill rates are one IEEE division of exact longs; the oracle
    * re-runs pk01's recursive-CTE pack and aggregates, so the whole
    * bin assignment is re-verified end-to-end, not read from a cached
    * engine artifact.
    *
    * Scale shape: pk01's per-shard sequential pass, then one
    * map-side-combined aggregation to (shards × bins) rows. */
  def packStats(docs: DataFrame, shards: Int = PackShards,
      budget: Long = PackBudget): DataFrame =
    packed(docs, shards, budget)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"))
      .select(col("shard").cast("long").as("shard"), col("bin"),
        col("n_docs"), col("tokens"),
        (col("tokens").cast("double") / budget).as("fill_rate"),
        (col("tokens") > budget).as("is_overflow"))

  val packStatsQ: GraftQuery = GraftQuery(
    "pk02_pack_stats",
    s"""WITH RECURSIVE $packRecursiveCtes
       |SELECT CAST(shard AS BIGINT) AS shard, bin,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |       CAST(sum(n_tokens) AS DOUBLE) / $PackBudget AS fill_rate,
       |       sum(n_tokens) > $PackBudget AS is_overflow
       |FROM r GROUP BY shard, bin""".stripMargin) { (spark, sf) =>
    packStats(Tables.documents(spark, sf))
  }

  /** pk05 — packed-shard training MANIFEST: m06's artifact for the
    * TEXT pipeline, published next to pk01's packed shards — per
    * shard, the numbers a trainer's data loader reads before it maps
    * the shard (document count, bin count = context windows, token
    * total, fill rate against bins×budget) plus the two integrity
    * columns a manifest needs to be worth shipping: `max_bin_tokens`
    * (the pk01 budget invariant visible IN the artifact — a packer
    * that silently overflowed a bin flips `has_overflow`) and the
    * doc_id checksum that pins shard membership without listing rows
    * (m06's device). pack → manifest is the last hop of the text
    * pipeline exactly as decode → shard → manifest is for media.
    *
    * The oracle replays the greedy pack itself (the shared recursive
    * CTE), so the manifest is re-derived end-to-end, never read from
    * an engine artifact. Scale shape: pk01's per-shard sequential
    * pass, a (shard, bin) map-combined aggregation, then |shards|
    * rows; fill_rate is one IEEE division of exact longs. */
  def packManifest(docs: DataFrame, shards: Int = PackShards,
      budget: Long = PackBudget): DataFrame =
    packed(docs, shards, budget)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("bin_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        sum(col("doc_id")).as("bin_ids"))
      .groupBy(col("shard"))
      .agg(sum(col("bin_docs")).as("n_docs"),
        count(lit(1)).as("n_bins"),
        sum(col("bin_tokens")).as("n_tokens"),
        max(col("bin_tokens")).as("max_bin_tokens"),
        sum(col("bin_ids")).as("id_checksum"))
      .select(col("shard").cast("long").as("shard"),
        col("n_docs"), col("n_bins"), col("n_tokens"), col("max_bin_tokens"),
        (col("n_tokens").cast("double") / (col("n_bins") * lit(budget)))
          .as("fill_rate"),
        (col("max_bin_tokens") > budget).as("has_overflow"),
        col("id_checksum"))

  val packManifestQ: GraftQuery = GraftQuery(
    "pk05_pack_manifest",
    s"""WITH RECURSIVE $packRecursiveCtes,
       |bins AS (
       |  SELECT shard, bin, count(*) AS bin_docs,
       |         sum(n_tokens) AS bin_tokens, sum(doc_id) AS bin_ids
       |  FROM r GROUP BY shard, bin)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |       CAST(sum(bin_docs) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_bins,
       |       CAST(sum(bin_tokens) AS BIGINT) AS n_tokens,
       |       CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
       |       CAST(sum(bin_tokens) AS DOUBLE) / (count(*) * $PackBudget) AS fill_rate,
       |       max(bin_tokens) > $PackBudget AS has_overflow,
       |       CAST(sum(bin_ids) AS BIGINT) AS id_checksum
       |FROM bins GROUP BY shard""".stripMargin) { (spark, sf) =>
    packManifest(Tables.documents(spark, sf))
  }

  /** pk03 — per-source truncation-loss report: what a HARD sequence
    * budget of [[PackBudget]] tokens costs each source under
    * head-truncation (keep the first L tokens, drop the tail) — the
    * number a data planner reads BEFORE picking the packing budget
    * pk01 then enforces: a source whose docs are systematically
    * longer than the budget silently loses its document tails, and
    * loss concentrated in one source skews the trained mixture in a
    * way the pk02 utilization report cannot see (bins can be full of
    * truncated fragments). Exact integers per doc (kept = min(n, L),
    * lost = n − kept), map-side-combined per-source sums, loss_rate
    * one IEEE division — fully hash-checked, no floors. */
  val truncationLossQ: GraftQuery = GraftQuery(
    "pk03_truncation_loss",
    s"""WITH t AS (SELECT source,
      |             len(string_split(text, ' ')) AS n
      |           FROM documents WHERE text IS NOT NULL)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN n > $PackBudget THEN 1 ELSE 0 END) AS BIGINT)
      |         AS docs_truncated,
      |       CAST(sum(least(n, $PackBudget)) AS BIGINT) AS tokens_kept,
      |       CAST(sum(greatest(n - $PackBudget, 0)) AS BIGINT) AS tokens_lost,
      |       CASE WHEN sum(n) > 0
      |            THEN CAST(sum(greatest(n - $PackBudget, 0)) AS DOUBLE)
      |                 / sum(n)
      |       END AS loss_rate
      |FROM t GROUP BY source""".stripMargin) { (spark, sf) =>
    truncationLoss(Tables.documents(spark, sf))
  }

  /** The pk03 aggregation over any (source, text) corpus and budget. */
  def truncationLoss(docs: DataFrame, budget: Long = PackBudget): DataFrame = {
    val n = size(split(col("text"), " ")).cast("long")
    docs.filter(col("text").isNotNull)
      .select(col("source"), n.as("__n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__n") > budget, 1L).otherwise(0L)).as("docs_truncated"),
        sum(least(col("__n"), lit(budget))).as("tokens_kept"),
        sum(greatest(col("__n") - budget, lit(0L))).as("tokens_lost"))
      .select(col("source"), col("n_docs"), col("docs_truncated"),
        col("tokens_kept"), col("tokens_lost"),
        when(col("tokens_kept") + col("tokens_lost") > 0,
          col("tokens_lost").cast("double")
            / (col("tokens_kept") + col("tokens_lost"))).as("loss_rate"))
  }

  /** pk04 — deterministic mixture-interleaved training order: every
    * document gets a POSITION on one shared axis such that reading the
    * corpus in position order interleaves the sources sqrt-dampened —
    * source s's i-th document (in salted-md5 order, so the within-
    * source sequence is a stable shuffle decorrelated from t08/t12's
    * hashes) sits at (i − ½)/√n_s, which puts source prefixes in
    * proportion √n_s : √n_t at every cut: the t14/t22 dampening
    * motivation applied to the ORDER the trainer consumes, not just
    * the sampling rate. √ of an integer is IEEE-correctly-rounded and
    * the position is one subtraction + one division — bit-identical in
    * both engines, no snap needed.
    *
    * The row emits NO global rank on purpose: a corpus-wide
    * row_number is a single-partition window (the q41-audit
    * anti-pattern); the total order is the SORT KEY
    * (position, source, doc_id) — at scale a range-partitioned sort,
    * which is exactly how the materialized training manifest would be
    * written. Both windows here are keyed by source (rank + count),
    * parallel across sources. */
  val mixtureOrderQ: GraftQuery = GraftQuery(
    "pk04_mixture_order",
    """WITH r AS (SELECT doc_id, source,
      |             row_number() OVER (PARTITION BY source
      |               ORDER BY md5('ord:' || CAST(doc_id AS VARCHAR)),
      |                        doc_id) AS i,
      |             count(*) OVER (PARTITION BY source) AS ns
      |           FROM documents)
      |SELECT doc_id, source, CAST(i AS BIGINT) AS src_rank,
      |       CAST(ns AS BIGINT) AS n_src,
      |       (CAST(i AS DOUBLE) - 0.5) / sqrt(CAST(ns AS DOUBLE)) AS position
      |FROM r""".stripMargin) { (spark, sf) =>
    mixtureOrder(Tables.documents(spark, sf))
  }

  /** The pk04 ordering over any (doc_id, source) corpus. */
  def mixtureOrder(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySource = Window.partitionBy(col("source"))
    val w = bySource.orderBy(col("__ord"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        md5(concat(lit("ord:"), col("doc_id").cast("string"))).as("__ord"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("n_src", count(lit(1)).over(bySource))
      .select(col("doc_id"), col("source"), col("src_rank"), col("n_src"),
        ((col("src_rank").cast("double") - lit(0.5))
          / sqrt(col("n_src").cast("double"))).as("position"))
  }

  // ------------------------------------------------ p03 curation funnel

  /** p03 — the WHOLE curation pipeline as one artifact: raw → quality
    * gate (t10) → exact dedup (d01's min-id representative, applied to
    * the survivors) → decontamination (d08's 8-gram rule: eval docs
    * AND contaminated train docs leave) → token-budget sampling (t21,
    * with rates recomputed over the corpus that actually reaches the
    * stage — the honest pipeline order). One row per stage with the
    * surviving document and token counts — the nightly report a data
    * owner reads to see WHERE the corpus went, and the row that gates
    * stage COMPOSITION (each stage is individually proven by its own
    * row; this one proves the hand-offs).
    *
    * The oracle chains the exact same shared CTE bodies the stage
    * rows use (qualityGateCtesSql, DedupOps.decontamGramsBodySql,
    * t21's rate arithmetic), so a drift in any stage's convention
    * breaks BOTH that stage's row and the funnel. All counts are
    * exact integers.
    *
    * Scale shape: each stage is its own proven-scalable kernel; the
    * funnel adds only doc_id semi-joins between stages (hash joins on
    * the key) and five single-row aggregations. */
  def curationFunnel(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"), col("text"),
      when(col("text").isNull, lit(0L))
        .otherwise(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    // each stage's surviving-id set is EAGERLY localCheckpointed (the
    // s17 lineage-truncation discipline): the five stage aggregates
    // below otherwise re-evaluate the shared kernel chain once per
    // stage (measured 6.3 s vs ~2 s at sf0.1 — stage k re-ran kernels
    // 1..k), and at 100 TB a nightly funnel materializes its stage
    // boundaries for exactly this reason. The checkpointed sets are
    // O(docs) ids, released by the ContextCleaner with the plan.
    def checkpointIds(df: DataFrame): DataFrame =
      df.select("doc_id").localCheckpoint()
    val keep1 = checkpointIds(
      qualityVerdict(docs).filter(col("verdict") === "keep"))
    val s1 = tok.join(keep1, "doc_id")
    val s2 = tok.join(
      checkpointIds(
        s1.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))),
      "doc_id")
    val trainSurv = s2.filter(col("doc_id") % 50 =!= 0)
    val clean = checkpointIds(DedupOps.decontaminate(
        trainSurv.select(col("doc_id"), col("text")),
        docs.filter(col("doc_id") % 50 === 0).select(col("doc_id"), col("text")))
      .filter(!col("contaminated")))
    val s3 = trainSurv.join(clean, "doc_id")
    val s4 = s3.join(
      checkpointIds(
        tokenBudgetSample(s3.select(col("doc_id"), col("source"), col("text")))
          .filter(col("kept"))),
      "doc_id")
    def stage(idx: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("tokens"))
        .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("docs"), col("tokens"))
    Seq(stage(0, "raw", tok), stage(1, "quality", s1),
        stage(2, "exact_dedup", s2), stage(3, "decontaminate", s3),
        stage(4, "token_budget", s4))
      .reduce(_.unionByName(_))
  }

  val curationFunnelQ: GraftQuery = GraftQuery(
    "p03_curation_funnel",
    s"""WITH $qualityGateCtesSql,
       |keep1 AS (SELECT doc_id FROM f
       |          WHERE ok_lang AND ok_len AND ok_shape AND ok_stop AND ok_rep),
       |tokf AS (SELECT doc_id, source,
       |           CASE WHEN text IS NULL THEN CAST(0 AS BIGINT)
       |                ELSE CAST(len(string_split(text, ' ')) AS BIGINT) END AS n_tokens
       |         FROM documents),
       |s2 AS (SELECT min(d.doc_id) AS doc_id
       |       FROM documents d JOIN keep1 k ON k.doc_id = d.doc_id
       |       GROUP BY d.text),
       |${graft.operators.DedupOps.decontamGramsBodySql},
       |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
       |hits AS (SELECT g.doc_id, count(*) AS n_hits
       |         FROM grams g JOIN bench b USING (g)
       |         WHERE g.doc_id % 50 <> 0
       |         GROUP BY g.doc_id),
       |s3 AS (SELECT s2.doc_id FROM s2 LEFT JOIN hits h ON h.doc_id = s2.doc_id
       |       WHERE s2.doc_id % 50 <> 0 AND coalesce(h.n_hits, 0) = 0),
       |b4 AS (SELECT t.doc_id, t.source, t.n_tokens
       |       FROM tokf t JOIN s3 USING (doc_id)),
       |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s
       |       FROM b4 GROUP BY source),
       |gt AS (SELECT CAST(sum(t_s) AS BIGINT) AS total, count(*) AS ns FROM ps),
       |r4 AS (SELECT source,
       |         least(10000, (${(TokenBudgetFrac * 10000).toLong} * total) // (ns * t_s)) AS rate_bp
       |       FROM ps CROSS JOIN gt),
       |s4 AS (SELECT b.doc_id FROM b4 b JOIN r4 USING (source)
       |       WHERE CAST(${Md5Bucket.bucketSql("duckdb", "'tb:' || CAST(doc_id AS VARCHAR)", 10000)} AS BIGINT)
       |             < r4.rate_bp)
       |SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage,
       |       CAST(count(*) AS BIGINT) AS docs,
       |       coalesce(CAST(sum(n_tokens) AS BIGINT), 0) AS tokens FROM tokf
       |UNION ALL
       |SELECT CAST(1 AS BIGINT), 'quality', CAST(count(*) AS BIGINT),
       |       coalesce(CAST(sum(n_tokens) AS BIGINT), 0)
       |FROM tokf JOIN keep1 USING (doc_id)
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), 'exact_dedup', CAST(count(*) AS BIGINT),
       |       coalesce(CAST(sum(n_tokens) AS BIGINT), 0)
       |FROM tokf JOIN s2 USING (doc_id)
       |UNION ALL
       |SELECT CAST(3 AS BIGINT), 'decontaminate', CAST(count(*) AS BIGINT),
       |       coalesce(CAST(sum(n_tokens) AS BIGINT), 0)
       |FROM tokf JOIN s3 USING (doc_id)
       |UNION ALL
       |SELECT CAST(4 AS BIGINT), 'token_budget', CAST(count(*) AS BIGINT),
       |       coalesce(CAST(sum(n_tokens) AS BIGINT), 0)
       |FROM tokf JOIN s4 USING (doc_id)""".stripMargin) { (spark, sf) =>
    curationFunnel(Tables.documents(spark, sf))
  }

  val all: Seq[GraftQuery] = Seq(
    repetitionQ, qualityFilterQ, piiRedactQ, stratifiedSampleQ, packQ,
    sourceReweightQ, sourceQualityNormQ, tokenBudgetQ, mixtureWeightsQ,
    packStatsQ, truncationLossQ, mixtureOrderQ, packManifestQ,
    curationFunnelQ, concatCutQ)
}
