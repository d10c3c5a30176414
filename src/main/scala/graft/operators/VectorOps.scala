package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.VectorFunctions._

/** Embedding-column operators beyond search ([[SimilarityOps]]):
  * storage quantization and per-label aggregation — the vector-side
  * utilities of a training-data pipeline (shrink the embedding store,
  * summarize label clusters).
  *
  * Both are fully oracle-checked: quantization uses floor-based
  * half-up rounding (identical in both engines, unlike round()) and
  * all float reductions go through the shared fold-left dot product,
  * so every emitted double is the same IEEE op sequence in Spark and
  * DuckDB.
  */
object VectorOps {

  /** Symmetric per-vector int8 quantization: scale = max|x|/127,
    * q_i = floor(x_i/scale + 0.5) (half-up toward +inf in both
    * engines), plus the reconstruction MSE computed from the three dot
    * products — (v·v − 2s(v·q) + s²(q·q))/dim — so the float reduction
    * order is the shared fold-left kernel, not an engine-specific sum.
    * Row-local, no shuffle; the checksum qsum pins the full quantized
    * array without dumping 64 ints per row. */
  def quantized(emb: DataFrame, dim: Int = graft.functions.VectorFunctions.Dim): DataFrame =
    emb
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / 127)
      .withColumn("q",
        when(col("scale") === 0, transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"),
            x => floor(x / col("scale") + 0.5).cast("int"))))
      .withColumn("qd", transform(col("q"), _.cast("double")))
      .select(
        col("vec_id"),
        col("scale"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("qsum"),
        ((dot(col("v"), col("v"))
          - lit(2) * col("scale") * dot(col("v"), col("qd"))
          + col("scale") * col("scale") * dot(col("qd"), col("qd"))) / dim).as("mse"))

  val quantizeQ: GraftQuery = GraftQuery(
    "v01_quantize_int8",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |        list_max(list_transform(v, x -> abs(x))) / 127 AS scale
       |      FROM e),
       |q AS (SELECT vec_id, v, scale,
       |        CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
       |             ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
       |        END AS q
       |      FROM s),
       |d AS (SELECT vec_id, v, scale, q,
       |        list_transform(q, x -> CAST(x AS DOUBLE)) AS qd
       |      FROM q)
       |SELECT vec_id, scale,
       |       CAST(list_sum(q) AS BIGINT) AS qsum,
       |       (list_dot_product(v, v)
       |         - 2 * scale * list_dot_product(v, qd)
       |         + scale * scale * list_dot_product(qd, qd)) / ${graft.functions.VectorFunctions.Dim} AS mse
       |FROM d""".stripMargin) { (spark, sf) =>
    quantized(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** Per-label centroid in long form (label, pos, mean component) plus
    * the label population: posexplode + one hash aggregation keyed on
    * (label, dim-position) — cardinality labels×dim, so partial
    * aggregation combines map-side and the shuffle carries one partial
    * sum per key per partition regardless of corpus size. Means use
    * the [[graft.functions.VectorFunctions.snapLong dyadic-snap]]
    * kernel (r7): components sum as exact 2^-35-grid longs — lossless
    * for these float32 inputs — and divide ONCE, so the emitted double
    * is bit-identical at any partial-aggregation order in any engine
    * (the former round(avg, 4) left an order-dependent pre-round
    * double — the q35 knife-edge class). */
  val labelCentroidsQ: GraftQuery = GraftQuery(
    "v02_label_centroids",
    s"""SELECT label, CAST(i AS INT) AS pos,
       |       CAST(sum(CAST(floor(v[i + 1] * ${graft.functions.VectorFunctions.SnapScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
       |         / (count(*) * ${graft.functions.VectorFunctions.SnapScaleSql}) AS mean_val,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |CROSS JOIN range(0, ${graft.functions.VectorFunctions.Dim}) r(i)
       |GROUP BY label, pos""".stripMargin) { (spark, sf) =>
    labelCentroids(Tables.embeddings(spark, sf)
      .select(col("label"), toDouble(col("embedding")).as("v")))
  }

  /** Long-form per-label componentwise means over (label, v) rows. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(snapLong(col("x"))).as("__s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        snapMean(col("__s"), col("n")).as("mean_val"), col("n"))

  /** Per-vector outlier score: L2 distance to the vector's label
    * centroid, z-scored within the label — the embedding-space
    * mislabel/contamination probe a curation pipeline runs before
    * training on labeled data.
    *
    * Float parity (r7, fully order-independent): centroid components
    * are dyadic-snap means ([[graft.functions.VectorFunctions.snapLong]]
    * — exact long sums, one terminal division; lossless for float32
    * inputs); distance² comes from the dot identity v·v − 2·v·c + c·c
    * over the SHARED fold-left kernel; and the per-label mu/sd are
    * computed from snapped-long first and second moments of dist (grid
    * 2^-30 — deterministic per row, so the sums are order-independent
    * exact integers and every later op is a single IEEE sequence both
    * engines share). dist, z, mu, sd all ship RAW — no rounding
    * convention anywhere in the query.
    *
    * Scale shape: centroid and stats relations are O(labels) — both
    * broadcast; the corpus is touched in two narrow map passes plus
    * one labels×dim aggregation. No per-vector shuffle. */
  def centroidOutliers(emb: DataFrame): DataFrame = {
    val cent = emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(snapLong(col("x"))).as("__s"), count(lit(1)).as("__n"))
      .select(col("label"), col("pos"), snapMean(col("__s"), col("__n")).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
    val d = emb.join(broadcast(cent), "label")
      .withColumn("dist", sqrt(greatest(lit(0.0),
        dot(col("v"), col("v"))
          - lit(2) * dot(col("v"), col("c"))
          + dot(col("c"), col("c")))))
    // sample stddev from snapped integer moments: Σq, Σq2 are exact
    // longs; var = (Σd² − n·mu²)/(n−1) with each factor one IEEE op
    val stats = d.groupBy(col("label"))
      .agg(sum(snapLong(col("dist"), DistScale)).as("__q"),
        sum(snapLong(col("dist") * col("dist"), DistScale)).as("__q2"),
        count(lit(1)).as("__n"))
      .withColumn("mu", snapMean(col("__q"), col("__n"), DistScale))
      .withColumn("sd", when(col("__n") > 1,
        sqrt(greatest(lit(0.0),
          (col("__q2").cast("double") / lit(DistScale)
            - col("__n") * (col("mu") * col("mu")))
            / (col("__n") - 1)))))
      .select(col("label"), col("mu"), col("sd"))
    // sd can be exactly 0 (all distances in a label on the same snap
    // cell with n≥2, or the greatest() clamp firing): Spark's non-ANSI
    // x/0 is NULL; DuckDB 1.0 matches but newer versions default to
    // IEEE ±Inf, which would flip the flag — deciding the degenerate
    // case before the division in both engine texts makes parity
    // oracle-version-independent (z → NULL, outlier → false).
    val sdOk = col("sd").isNotNull && col("sd") =!= 0.0
    d.join(broadcast(stats), "label")
      .withColumn("z", when(sdOk, (col("dist") - col("mu")) / col("sd")))
      .select(col("vec_id"), col("label"), col("dist"), col("z"),
        when(sdOk, col("z") > 2.0).otherwise(lit(false)).as("outlier"))
  }

  val centroidOutliersQ: GraftQuery = GraftQuery(
    "v03_centroid_outliers",
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |comp AS (SELECT label, i AS pos,
       |           CAST(sum(CAST(floor(v[i + 1] * ${graft.functions.VectorFunctions.SnapScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
       |             / (count(*) * ${graft.functions.VectorFunctions.SnapScaleSql}) AS m
       |         FROM e CROSS JOIN range(0, ${graft.functions.VectorFunctions.Dim}) r(i)
       |         GROUP BY label, pos),
       |cent AS (SELECT label, list(m ORDER BY pos) AS c FROM comp GROUP BY label),
       |d AS (SELECT vec_id, e.label,
       |        sqrt(greatest(0.0, list_dot_product(v, v)
       |          - 2 * list_dot_product(v, c)
       |          + list_dot_product(c, c))) AS dist
       |      FROM e JOIN cent ON e.label = cent.label),
       |st0 AS (SELECT label,
       |          CAST(sum(CAST(floor(dist * ${graft.functions.VectorFunctions.DistScaleSql} + 0.5) AS BIGINT)) AS BIGINT) AS q,
       |          CAST(sum(CAST(floor(dist * dist * ${graft.functions.VectorFunctions.DistScaleSql} + 0.5) AS BIGINT)) AS BIGINT) AS q2,
       |          count(*) AS n
       |        FROM d GROUP BY label),
       |st1 AS (SELECT label, q, q2, n,
       |          CAST(q AS DOUBLE) / (n * ${graft.functions.VectorFunctions.DistScaleSql}) AS mu
       |        FROM st0),
       |st AS (SELECT label, mu,
       |         CASE WHEN n > 1 THEN
       |           sqrt(greatest(0.0,
       |             (CAST(q2 AS DOUBLE) / ${graft.functions.VectorFunctions.DistScaleSql} - n * (mu * mu)) / (n - 1)))
       |         ELSE NULL END AS sd
       |       FROM st1)
       |SELECT d.vec_id, d.label, d.dist,
       |       CASE WHEN st.sd IS NULL OR st.sd = 0 THEN NULL
       |            ELSE (d.dist - st.mu) / st.sd END AS z,
       |       CASE WHEN st.sd IS NULL OR st.sd = 0 THEN false
       |            ELSE (d.dist - st.mu) / st.sd > 2.0 END AS outlier
       |FROM d JOIN st USING (label)""".stripMargin) { (spark, sf) =>
    centroidOutliers(Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v")))
  }

  // ------------------------------------------------------------------
  // v04: product quantization (PQ) code assignment
  // ------------------------------------------------------------------

  /** PQ geometry: 64-dim vectors → 8 sub-blocks of 8 dims, 16 codes
    * per block — each vector compresses to 8 half-byte codes (4 B vs
    * 256 B raw), the standard embedding-store compression at 100 TB
    * (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI'11). */
  val PqBlocks = 8
  val PqCodes = 16
  /** Sub-vector width (dims per block). */
  val PqSub: Int = graft.functions.VectorFunctions.Dim / PqBlocks

  /** PQ code assignment with the deterministic first-k sub-codebooks
    * (the same oracle-parity device as s03: the k-means-trained
    * codebook is the production upgrade, exactly as s04 is to s03, and
    * equally lives driver-side). Emits long form (vec_id, b, code,
    * bdist): one row per sub-block with its chosen code and RAW
    * squared reconstruction distance — every double is the shared
    * fold-left dot sequence, so the oracle matches bit-for-bit.
    *
    * Scale shape: the codebook is blocks·codes rows (128) — a
    * broadcast joined against the posexploded block stream, then one
    * (vec_id, b)-keyed min-struct aggregation (map-side combinable;
    * ties break to the smaller code in both engines). Candidate volume
    * is n·blocks·codes — linear in the corpus with a 128× constant;
    * the CellProbes-style codegen'd argmin expression is the named
    * upgrade if the constant ever dominates a profile. */
  /** The first-k sub-codebooks as a (b, code, cv) relation —
    * blocks·codes rows, built from one bounded TakeOrdered action
    * (shared by v04 assignment and s06 ADC search so the two can
    * never disagree on the codebook). */
  def pqCodebook(emb: DataFrame, blocks: Int = PqBlocks, codes: Int = PqCodes,
      dim: Int = graft.functions.VectorFunctions.Dim): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sub = dim / blocks
    emb.orderBy(col("vec_id")).limit(codes)
      .select(col("vec_id"), col("v")).collect()
      .sortBy(_.getLong(0))
      .zipWithIndex.flatMap { case (r, code) =>
        val v = r.getSeq[Double](1).toArray
        (0 until blocks).map(b => (b, code, v.slice(b * sub, (b + 1) * sub).toSeq))
      }.toSeq.toDF("b", "code", "cv")
  }

  /** Each vector posexploded into its (b, sub-vector) blocks. */
  def pqBlockStream(emb: DataFrame, blocks: Int = PqBlocks,
      dim: Int = graft.functions.VectorFunctions.Dim): DataFrame = {
    val sub = dim / blocks
    emb.select(col("vec_id"), posexplode(
      array((0 until blocks).map(b => slice(col("v"), b * sub + 1, sub)): _*))
      .as(Seq("b", "bv")))
  }

  /** @param codebook a prebuilt [[pqCodebook]] relation, so a caller
    *        that also needs the codebook (s06's distance table) pays
    *        the bounded TakeOrdered collect once, not twice */
  def pqAssign(emb: DataFrame, blocks: Int = PqBlocks, codes: Int = PqCodes,
      dim: Int = graft.functions.VectorFunctions.Dim,
      codebook: Option[DataFrame] = None): DataFrame = {
    val cb = codebook.getOrElse(pqCodebook(emb, blocks, codes, dim))
    val blockStream = pqBlockStream(emb, blocks, dim)
    blockStream.join(broadcast(cb), "b")
      .withColumn("bdist",
        dot(col("bv"), col("bv")) - lit(2) * dot(col("bv"), col("cv"))
          + dot(col("cv"), col("cv")))
      .groupBy(col("vec_id"), col("b"))
      .agg(min(struct(col("bdist"), col("code"))).as("m"))
      .select(col("vec_id"), col("b"), col("m.code").as("code"),
        col("m.bdist").as("bdist"))
  }

  val pqQ: GraftQuery = GraftQuery(
    "v04_pq_codes",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
       |        FROM e ORDER BY vec_id LIMIT ${PqCodes}),
       |bs AS (SELECT unnest(range(0, ${PqBlocks})) AS b),
       |cb AS (SELECT bs.b AS b, cb0.code AS code,
       |         list_slice(cb0.v, bs.b * ${PqSub} + 1, bs.b * ${PqSub} + ${PqSub}) AS cv
       |       FROM cb0 CROSS JOIN bs),
       |bl AS (SELECT e.vec_id, bs.b AS b,
       |         list_slice(e.v, bs.b * ${PqSub} + 1, bs.b * ${PqSub} + ${PqSub}) AS bv
       |       FROM e CROSS JOIN bs),
       |d AS (SELECT bl.vec_id, bl.b, cb.code,
       |        list_dot_product(bl.bv, bl.bv)
       |          - 2 * list_dot_product(bl.bv, cb.cv)
       |          + list_dot_product(cb.cv, cb.cv) AS bdist
       |      FROM bl JOIN cb USING (b)),
       |r AS (SELECT vec_id, b, code, bdist,
       |        row_number() OVER (PARTITION BY vec_id, b
       |                           ORDER BY bdist, code) AS rn
       |      FROM d)
       |SELECT vec_id, CAST(b AS INT) AS b, CAST(code AS INT) AS code, bdist
       |FROM r WHERE rn = 1""".stripMargin) { (spark, sf) =>
    pqAssign(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** Per-label embedding drift between two corpus batches: L2 shift
    * and cosine between the batches' label centroids plus both batch
    * counts — the distribution-shift monitor run when an embedding
    * model is re-versioned or a new crawl lands (a label whose
    * centroid moved is re-annotated before training). The harness
    * corpus has no snapshot column, so the batch is vec_id parity —
    * production substitutes its snapshot/date column; nothing else
    * changes.
    *
    * Float parity (r7): the v02/v03 contract — centroid components
    * are dyadic-snap means (exact long sums at the 2^-35 grid,
    * lossless for float32 inputs, one terminal division — bit-stable
    * at any aggregation order in any engine), then drift² = a·a −
    * 2·a·b + b·b and the cosine run through the SHARED fold-left dot
    * kernel over pos-sorted arrays, so every emitted double is the
    * same IEEE sequence in both engines and ships RAW — the former
    * round(avg, 4) knife-edge (r6 ADVICE) is gone.
    *
    * Scale shape: one labels×dim×2 aggregation (map-side combined),
    * then O(labels) rows assemble arrays and join — no per-vector
    * shuffle, nothing corpus-scale past the first aggregate. */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val cent = emb
      .withColumn("batch", (col("vec_id") % 2).cast("int"))
      .select(col("label"), col("batch"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("batch"), col("pos"))
      .agg(sum(snapLong(col("x"))).as("__s"), count(lit(1)).as("n"))
      .select(col("label"), col("batch"), col("pos"),
        snapMean(col("__s"), col("n")).as("m"), col("n"))
      .groupBy(col("label"), col("batch"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"),
        max(col("n")).as("n"))
    val a = cent.filter(col("batch") === 0)
      .select(col("label"), col("c").as("ca"), col("n").as("n_even"))
    val b = cent.filter(col("batch") === 1)
      .select(col("label"), col("c").as("cb"), col("n").as("n_odd"))
    a.join(b, "label")
      .select(col("label"), col("n_even"), col("n_odd"),
        sqrt(greatest(lit(0.0),
          dot(col("ca"), col("ca")) - lit(2) * dot(col("ca"), col("cb"))
            + dot(col("cb"), col("cb")))).as("drift"),
        // zero-norm pin (retrofit of the round-8 convention): an
        // all-zero snapped centroid reads cos 0.0 in both engines
        when(dot(col("ca"), col("ca")) === 0.0 || dot(col("cb"), col("cb")) === 0.0,
          lit(0.0))
          .otherwise(dot(col("ca"), col("cb"))
            / (sqrt(dot(col("ca"), col("ca"))) * sqrt(dot(col("cb"), col("cb")))))
          .as("cos_sim"))
  }

  val centroidDriftQ: GraftQuery = GraftQuery(
    "v06_centroid_drift",
    s"""WITH e AS (SELECT vec_id, label, CAST(vec_id % 2 AS INT) AS batch,
       |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |m AS (SELECT label, batch, i AS pos,
       |        CAST(sum(CAST(floor(v[i + 1] * ${graft.functions.VectorFunctions.SnapScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
       |          / (count(*) * ${graft.functions.VectorFunctions.SnapScaleSql}) AS m,
       |        count(*) AS n
       |      FROM e CROSS JOIN range(0, ${graft.functions.VectorFunctions.Dim}) r(i)
       |      GROUP BY label, batch, pos),
       |c AS (SELECT label, batch, list(m ORDER BY pos) AS c, max(n) AS n
       |      FROM m GROUP BY label, batch),
       |a AS (SELECT label, c AS ca, n AS n_even FROM c WHERE batch = 0),
       |b AS (SELECT label, c AS cb, n AS n_odd FROM c WHERE batch = 1)
       |SELECT label, CAST(n_even AS BIGINT) AS n_even, CAST(n_odd AS BIGINT) AS n_odd,
       |       sqrt(greatest(0.0, list_dot_product(ca, ca)
       |              - 2 * list_dot_product(ca, cb)
       |              + list_dot_product(cb, cb))) AS drift,
       |       CASE WHEN list_dot_product(ca, ca) = 0
       |              OR list_dot_product(cb, cb) = 0 THEN 0.0
       |            ELSE list_dot_product(ca, cb)
       |              / (sqrt(list_dot_product(ca, ca)) * sqrt(list_dot_product(cb, cb)))
       |       END AS cos_sim
       |FROM a JOIN b USING (label)""".stripMargin) { (spark, sf) =>
    centroidDrift(Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v")))
  }

  /** Dimensions kept by the truncation-fidelity eval (v05): the first
    * half of the embedding — the matryoshka/truncation convention. */
  val TruncDims: Int = graft.functions.VectorFunctions.Dim / 2

  /** Top-k depth for the truncation recall eval. Deeper than the
    * serving K so the recall signal has resolution (k=10 over a 500+
    * vector corpus distinguishes 0.9 from 1.0; k=5 mostly saturates). */
  val RecallK = 10

  /** Dimension-truncation retrieval fidelity: for each query vector,
    * recall@k of top-k-by-truncated-cosine (first [[TruncDims]] dims)
    * against top-k-by-full-cosine — the acceptance metric for storing
    * half-width embeddings (matryoshka-style). One broadcast-join scan
    * computes BOTH similarities per (query, corpus) pair, then two
    * rank windows share the per-query exchange; hits is a count of
    * pairs ranked <= k by both. At 100 TB the shape is s01's: map-only
    * scan against a broadcast query set plus a window bounded per
    * query — no corpus-wide shuffle, no second pass over the scan for
    * the truncated ranking. recall = hits/k is one exact-integer
    * division in both engines. */
  def truncRecall(emb: DataFrame, k: Int = RecallK, dims: Int = TruncDims): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb
      .withColumn("vt", slice(col("v"), 1, dims))
      .withColumn("nrm", norm(col("v")))
      .withColumn("nrmt", norm(col("vt")))
    val queries = broadcast(
      base.filter(col("vec_id") < SimilarityOps.QueryVecs)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("vt").as("qvt"),
          col("nrm").as("qnrm"), col("nrmt").as("qnrmt")))
    val wFull = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_full").desc, col("vec_id"))
    val wTrunc = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_trunc").desc, col("vec_id"))
    base.join(queries, col("vec_id") =!= col("query_id"))
      // decide-before-divide on zero norms (r7 review): 0/0 is NaN in
      // Spark but NULL in DuckDB 1.0 - and the two sort to OPPOSITE
      // ends of a DESC ordering, so an all-zero vector (or zero-tail
      // truncation) would silently flip ranks cross-engine
      .withColumn("cos_full",
        when(col("qnrm") === 0 || col("nrm") === 0, lit(0.0))
          .otherwise(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))))
      .withColumn("cos_trunc",
        when(col("qnrmt") === 0 || col("nrmt") === 0, lit(0.0))
          .otherwise(dot(col("qvt"), col("vt")) / (col("qnrmt") * col("nrmt"))))
      .withColumn("rank_full", row_number().over(wFull))
      .withColumn("rank_trunc", row_number().over(wTrunc))
      .groupBy(col("query_id"))
      .agg(sum(when(col("rank_full") <= k && col("rank_trunc") <= k, 1L)
        .otherwise(0L)).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / k).as("recall"))
  }

  val truncRecallQ: GraftQuery = GraftQuery(
    "v05_trunc_recall",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, v[1:$TruncDims] AS vt,
       |        sqrt(list_dot_product(v, v)) AS nrm,
       |        sqrt(list_dot_product(v[1:$TruncDims], v[1:$TruncDims])) AS nrmt
       |      FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, vt AS qvt, nrm AS qnrm, nrmt AS qnrmt
       |      FROM b WHERE vec_id < ${SimilarityOps.QueryVecs}),
       |s AS (SELECT q.query_id, b.vec_id,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY CASE WHEN q.qnrm = 0 OR b.nrm = 0 THEN 0.0
       |                        ELSE list_dot_product(q.qv, b.v) / (q.qnrm * b.nrm)
       |                   END DESC,
       |                   b.vec_id) AS rank_full,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY CASE WHEN q.qnrmt = 0 OR b.nrmt = 0 THEN 0.0
       |                        ELSE list_dot_product(q.qvt, b.vt) / (q.qnrmt * b.nrmt)
       |                   END DESC,
       |                   b.vec_id) AS rank_trunc
       |      FROM q JOIN b ON b.vec_id <> q.query_id)
       |SELECT query_id,
       |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_trunc <= $RecallK
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_trunc <= $RecallK
       |                     THEN 1 ELSE 0 END) AS DOUBLE) / $RecallK AS recall
       |FROM s GROUP BY query_id""".stripMargin) { (spark, sf) =>
    truncRecall(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** Dimension-truncation's sibling for STORAGE quantization (v07):
    * recall@k of top-k-by-cosine over the int8-RECONSTRUCTED vectors
    * (v01's q·scale) against full-precision top-k — the acceptance
    * metric for serving ANN from the quantized store. Same
    * shared-exchange two-rank-window shape as v05; the
    * reconstruction is row-local (no second scan), and recall is one
    * exact-integer division. Degenerate all-zero vectors (scale = 0)
    * reconstruct to zero and their cosine is DEFINED as 0 before any
    * division in both texts (the q29/v03 decide-before-divide device,
    * oracle-version-independent). */
  def quantRecall(emb: DataFrame, k: Int = RecallK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / 127)
      .withColumn("rq",
        when(col("scale") === 0, transform(col("v"), _ => lit(0.0)))
          .otherwise(transform(col("v"),
            x => floor(x / col("scale") + 0.5) * col("scale"))))
      .withColumn("nrm", norm(col("v")))
      .withColumn("nrmq", norm(col("rq")))
    val queries = broadcast(
      base.filter(col("vec_id") < SimilarityOps.QueryVecs)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("rq").as("qrq"),
          col("nrm").as("qnrm"), col("nrmq").as("qnrmq")))
    val wFull = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_full").desc, col("vec_id"))
    val wQuant = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_quant").desc, col("vec_id"))
    base.join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cos_full",
        when(col("qnrm") === 0 || col("nrm") === 0, lit(0.0))
          .otherwise(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))))
      .withColumn("cos_quant",
        when(col("qnrmq") === 0 || col("nrmq") === 0, lit(0.0))
          .otherwise(dot(col("qrq"), col("rq")) / (col("qnrmq") * col("nrmq"))))
      .withColumn("rank_full", row_number().over(wFull))
      .withColumn("rank_quant", row_number().over(wQuant))
      .groupBy(col("query_id"))
      .agg(sum(when(col("rank_full") <= k && col("rank_quant") <= k, 1L)
        .otherwise(0L)).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / k).as("recall"))
  }

  val quantRecallQ: GraftQuery = GraftQuery(
    "v07_quant_recall",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s0 AS (SELECT vec_id, v,
       |         list_max(list_transform(v, x -> abs(x))) / 127 AS scale
       |       FROM e),
       |b AS (SELECT vec_id, v, scale,
       |        CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
       |             ELSE list_transform(v, x -> floor(x / scale + 0.5) * scale)
       |        END AS rq
       |      FROM s0),
       |n AS (SELECT vec_id, v, rq,
       |        sqrt(list_dot_product(v, v)) AS nrm,
       |        sqrt(list_dot_product(rq, rq)) AS nrmq
       |      FROM b),
       |q AS (SELECT vec_id AS query_id, v AS qv, rq AS qrq, nrm AS qnrm, nrmq AS qnrmq
       |      FROM n WHERE vec_id < ${SimilarityOps.QueryVecs}),
       |s AS (SELECT q.query_id, n.vec_id,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY CASE WHEN q.qnrm = 0 OR n.nrm = 0 THEN 0.0
       |                        ELSE list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm)
       |                   END DESC,
       |                   n.vec_id) AS rank_full,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY CASE WHEN q.qnrmq = 0 OR n.nrmq = 0 THEN 0.0
       |                        ELSE list_dot_product(q.qrq, n.rq) / (q.qnrmq * n.nrmq)
       |                   END DESC,
       |                   n.vec_id) AS rank_quant
       |      FROM q JOIN n ON n.vec_id <> q.query_id)
       |SELECT query_id,
       |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_quant <= $RecallK
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_quant <= $RecallK
       |                     THEN 1 ELSE 0 END) AS DOUBLE) / $RecallK AS recall
       |FROM s GROUP BY query_id""".stripMargin) { (spark, sf) =>
    quantRecall(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** Prefix lengths for the v08 curve — the candidate serving
    * dimensions a matryoshka-style store would choose between. One
    * constant interpolated into both texts. */
  val MatryoshkaDims: Seq[Int] = Seq(8, 16, 32, 48)

  /** v08 — matryoshka truncation-recall CURVE: v05's single-dim
    * acceptance check generalized to the whole decision — recall@k of
    * prefix-cosine ranking vs full-precision ranking at EVERY
    * candidate serving dimension, in one query. The operator a team
    * runs once to pick the cheapest prefix that clears their recall
    * bar (8× storage cut at dims=8 vs 1.33× at dims=48).
    *
    * Shape: one corpus scan, queries broadcast, and all
    * |dims|+1 rank windows share the ONE per-query exchange (same
    * partitioning, different orderings — the v05/v07 shared-exchange
    * device, plan-pinned). Hits are exact longs; recall is one IEEE
    * division; zero-norm cosines pin to 0.0 in both texts
    * (decide-before-divide). Output is long-format
    * (query_id, dims, hits, recall) via an inline explode — no second
    * scan, no unpivot shuffle. */
  def matryoshkaRecall(
      emb: DataFrame, k: Int = RecallK,
      dims: Seq[Int] = MatryoshkaDims): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = dims.foldLeft(emb.withColumn("nrm", norm(col("v")))) { (df, d) =>
      df.withColumn(s"vt_$d", slice(col("v"), 1, d))
        .withColumn(s"nrmt_$d", norm(col(s"vt_$d")))
    }
    val qcols = Seq(col("vec_id").as("query_id"), col("v").as("qv"),
      col("nrm").as("qnrm")) ++
      dims.flatMap(d => Seq(col(s"vt_$d").as(s"qvt_$d"),
        col(s"nrmt_$d").as(s"qnrmt_$d")))
    val queries = broadcast(
      base.filter(col("vec_id") < SimilarityOps.QueryVecs).select(qcols: _*))
    def w(c: String) = Window.partitionBy(col("query_id"))
      .orderBy(col(c).desc, col("vec_id"))
    val ranked = dims.foldLeft(
      base.join(queries, col("vec_id") =!= col("query_id"))
        .withColumn("cos_full",
          when(col("qnrm") === 0 || col("nrm") === 0, lit(0.0))
            .otherwise(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))))
        .withColumn("rank_full", row_number().over(w("cos_full")))) { (df, d) =>
      df.withColumn(s"cos_$d",
          when(col(s"qnrmt_$d") === 0 || col(s"nrmt_$d") === 0, lit(0.0))
            .otherwise(dot(col(s"qvt_$d"), col(s"vt_$d"))
              / (col(s"qnrmt_$d") * col(s"nrmt_$d"))))
        .withColumn(s"rank_$d", row_number().over(w(s"cos_$d")))
    }
    val hitCols = dims.map(d =>
      sum(when(col("rank_full") <= k && col(s"rank_$d") <= k, 1L)
        .otherwise(0L)).as(s"hits_$d"))
    ranked.groupBy(col("query_id"))
      .agg(hitCols.head, hitCols.tail: _*)
      .select(col("query_id"),
        explode(array(dims.map(d => struct(
          lit(d.toLong).as("dims"), col(s"hits_$d").as("hits"))): _*)).as("r"))
      .select(col("query_id"), col("r.dims"), col("r.hits"),
        (col("r.hits").cast("double") / k).as("recall"))
  }

  private def matryoshkaSelectSql(d: Int): String =
    s"""SELECT query_id, CAST($d AS BIGINT) AS dims,
       |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_$d <= $RecallK
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_$d <= $RecallK
       |                     THEN 1 ELSE 0 END) AS DOUBLE) / $RecallK AS recall
       |FROM s GROUP BY query_id""".stripMargin

  val matryoshkaRecallQ: GraftQuery = GraftQuery(
    "v08_matryoshka_recall",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |${MatryoshkaDims.map(d =>
      s"        v[1:$d] AS vt_$d, sqrt(list_dot_product(v[1:$d], v[1:$d])) AS nrmt_$d")
        .mkString(",\n")}
       |      FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm,
       |${MatryoshkaDims.map(d => s"        vt_$d AS qvt_$d, nrmt_$d AS qnrmt_$d")
        .mkString(",\n")}
       |      FROM b WHERE vec_id < ${SimilarityOps.QueryVecs}),
       |s AS (SELECT q.query_id, b.vec_id,
       |        row_number() OVER (PARTITION BY q.query_id
       |          ORDER BY CASE WHEN q.qnrm = 0 OR b.nrm = 0 THEN 0.0
       |                        ELSE list_dot_product(q.qv, b.v) / (q.qnrm * b.nrm)
       |                   END DESC, b.vec_id) AS rank_full,
       |${MatryoshkaDims.map(d =>
      s"""        row_number() OVER (PARTITION BY q.query_id
         |          ORDER BY CASE WHEN q.qnrmt_$d = 0 OR b.nrmt_$d = 0 THEN 0.0
         |                        ELSE list_dot_product(q.qvt_$d, b.vt_$d)
         |                             / (q.qnrmt_$d * b.nrmt_$d)
         |                   END DESC, b.vec_id) AS rank_$d""".stripMargin)
        .mkString(",\n")}
       |      FROM q JOIN b ON b.vec_id <> q.query_id)
       |${MatryoshkaDims.map(matryoshkaSelectSql).mkString("\nUNION ALL\n")}""".stripMargin) {
    (spark, sf) =>
      matryoshkaRecall(Tables.embeddings(spark, sf)
        .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** Sample-variance floor below which v09 flags a dimension dead. */
  val DeadVarThreshold = 1e-6

  /** v09 — per-dimension health report: for every embedding position,
    * the corpus mean, sample variance, exact min/max, and a `is_dead`
    * flag for near-zero-variance dimensions — the embedding-store
    * audit run before quantization (v01) or truncation (v05/v08): a
    * dead dimension wastes a codebook slot, and a collapsed range
    * signals an upstream encoder bug.
    *
    * Float parity: the mean is a dyadic-snap mean (2^-35 grid, exact
    * long sums — the v02 kernel); the second moment snaps x² on the
    * 2^-30 grid (the v03 distance kernel; Σ fits Long to ~10^9
    * rows·dim at |x|≲3), and the variance is the same
    * cast-divide-multiply-subtract IEEE sequence in both texts with
    * n>1 decided before the division. min/max are exact comparisons
    * of the raw doubles — no arithmetic at all. The dead flag
    * compares the deterministic variance double to one literal.
    *
    * Scale shape: posexplode → ONE hash aggregation keyed on the
    * 64-value dimension index — partial aggregation combines map-side,
    * so the shuffle carries dim × partitions tiny partials; everything
    * after runs on the 64-row table. */
  def dimStats(emb: DataFrame): DataFrame =
    emb
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(snapLong(col("x"))).as("__s1"),
        sum(snapLong(col("x") * col("x"), DistScale)).as("__s2"),
        min(col("x")).as("min_val"),
        max(col("x")).as("max_val"))
      .withColumn("mean_val", snapMean(col("__s1"), col("n")))
      .withColumn("var_samp", when(col("n") > 1,
        greatest(lit(0.0),
          (col("__s2").cast("double") / lit(DistScale)
            - col("n") * (col("mean_val") * col("mean_val")))
            / (col("n") - 1))))
      .select(col("pos"), col("n"), col("mean_val"), col("var_samp"),
        col("min_val"), col("max_val"),
        coalesce(col("var_samp") < DeadVarThreshold, lit(false)).as("is_dead"))

  val dimStatsQ: GraftQuery = GraftQuery(
    "v09_dim_stats",
    s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT CAST(i AS INT) AS pos, count(*) AS n,
       |        sum(CAST(floor(v[i + 1] * ${graft.functions.VectorFunctions.SnapScaleSql} + 0.5) AS BIGINT)) AS s1,
       |        sum(CAST(floor(v[i + 1] * v[i + 1] * ${graft.functions.VectorFunctions.DistScaleSql} + 0.5) AS BIGINT)) AS s2,
       |        min(v[i + 1]) AS min_val, max(v[i + 1]) AS max_val
       |      FROM e CROSS JOIN range(0, ${graft.functions.VectorFunctions.Dim}) r(i)
       |      GROUP BY pos),
       |m AS (SELECT pos, n,
       |        CAST(s1 AS DOUBLE) / (n * ${graft.functions.VectorFunctions.SnapScaleSql}) AS mean_val,
       |        s2, min_val, max_val
       |      FROM s),
       |v AS (SELECT pos, n, mean_val, min_val, max_val,
       |        CASE WHEN n > 1 THEN greatest(0.0,
       |          (CAST(s2 AS DOUBLE) / ${graft.functions.VectorFunctions.DistScaleSql}
       |            - n * (mean_val * mean_val)) / (n - 1)) END AS var_samp
       |      FROM m)
       |SELECT pos, n, mean_val, var_samp, min_val, max_val,
       |       coalesce(var_samp < $DeadVarThreshold, false) AS is_dead
       |FROM v""".stripMargin) { (spark, sf) =>
    dimStats(Tables.embeddings(spark, sf)
      .select(toDouble(col("embedding")).as("v")))
  }

  /** v10 — inter-class centroid separation matrix: pairwise L2 and
    * cosine between every two label centroids — the BETWEEN-class
    * companion of v03's within-class spread: labels whose centroids
    * sit close (high cosine, small L2) are the confusable classes a
    * labeling audit inspects first, and the matrix is the standard
    * embedding-space class-separability report.
    *
    * Float parity is the v06 contract verbatim: dyadic-snap centroid
    * components, the shared fold-left dot over pos-sorted arrays,
    * drift-style L2 via the a·a − 2·a·b + b·b identity, cos raw.
    *
    * Scale shape: one labels×dim aggregation (map-side combined), then
    * the |labels|-row centroid table self-joins under a broadcast —
    * |labels|²/2 output rows, nothing corpus-scale past the first
    * aggregate. */
  def centroidSeparation(emb: DataFrame): DataFrame = {
    val cent = emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(snapLong(col("x"))).as("__s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        snapMean(col("__s"), col("n")).as("m"), col("n"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"),
        max(col("n")).as("n"))
    // pair expansion from ONE evaluation of the centroid pipeline (a
    // self-join would re-run the corpus aggregation per side — the
    // s10/bucketPairs lesson): collect the O(labels·dim) centroid
    // table into one row (bounded by the same ≤32 MiB contract as the
    // v03 broadcast) and explode the ordered pairs row-locally
    val pairs = cent
      .agg(collect_list(struct(col("label"), col("c"), col("n"))).as("all"))
      .select(explode(col("all")).as("a"), col("all"))
      .select(col("a"), explode(col("all")).as("b"))
      .filter(col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.c").as("ca"), col("b.c").as("cb"))
    pairs
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        sqrt(greatest(lit(0.0),
          dot(col("ca"), col("ca")) - lit(2) * dot(col("ca"), col("cb"))
            + dot(col("cb"), col("cb")))).as("l2_dist"),
        // zero-norm pin (the s10/s11/d06p convention): an all-zero
        // snapped centroid must read cos 0.0 in both engines, never
        // an engine-dependent 0/0
        when(dot(col("ca"), col("ca")) === 0.0 || dot(col("cb"), col("cb")) === 0.0,
          lit(0.0))
          .otherwise(dot(col("ca"), col("cb"))
            / (sqrt(dot(col("ca"), col("ca"))) * sqrt(dot(col("cb"), col("cb")))))
          .as("cos_sim"))
  }

  val centroidSeparationQ: GraftQuery = GraftQuery(
    "v10_centroid_separation",
    s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |m AS (SELECT label, i AS pos,
       |        CAST(sum(CAST(floor(v[i + 1] * ${graft.functions.VectorFunctions.SnapScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
       |          / (count(*) * ${graft.functions.VectorFunctions.SnapScaleSql}) AS m,
       |        count(*) AS n
       |      FROM e CROSS JOIN range(0, ${graft.functions.VectorFunctions.Dim}) r(i)
       |      GROUP BY label, pos),
       |c AS (SELECT label, list(m ORDER BY pos) AS c, max(n) AS n
       |      FROM m GROUP BY label)
       |SELECT a.label AS label_a, b.label AS label_b,
       |       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       |       sqrt(greatest(0.0, list_dot_product(a.c, a.c)
       |              - 2 * list_dot_product(a.c, b.c)
       |              + list_dot_product(b.c, b.c))) AS l2_dist,
       |       CASE WHEN list_dot_product(a.c, a.c) = 0
       |              OR list_dot_product(b.c, b.c) = 0 THEN 0.0
       |            ELSE list_dot_product(a.c, b.c)
       |              / (sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c)))
       |       END AS cos_sim
       |FROM c a JOIN c b ON a.label < b.label""".stripMargin) { (spark, sf) =>
    centroidSeparation(Tables.embeddings(spark, sf)
      .select(col("label"), toDouble(col("embedding")).as("v")))
  }

  /** v11 — PQ distortion audit: per sub-block, the assigned-code
    * squared-L2 distortion profile (vector count, snapped-mean and
    * exact-max distortion) — the codebook-quality artifact published
    * next to a PQ index (v04's codes, s06's search, v07's recall):
    * a block whose mean distortion dwarfs the others is a sub-space
    * the codebook under-covers, and the max flags the worst-quantized
    * vectors a re-train should target.
    *
    * Float discipline: per-(vector, block) distortion is v04's exact
    * IEEE sequence; the mean snaps on the 2^-30 distance grid (v03's
    * kernel — order-independent sums); the max is a plain double max
    * (no accumulation). One aggregation over the v04 relation —
    * |blocks| rows out, map-side combined. */
  val pqDistortionQ: GraftQuery = GraftQuery(
    "v11_pq_distortion",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
       |        FROM e ORDER BY vec_id LIMIT ${PqCodes}),
       |bs AS (SELECT unnest(range(0, ${PqBlocks})) AS b),
       |cb AS (SELECT bs.b AS b, cb0.code AS code,
       |         list_slice(cb0.v, bs.b * ${PqSub} + 1, bs.b * ${PqSub} + ${PqSub}) AS cv
       |       FROM cb0 CROSS JOIN bs),
       |bl AS (SELECT e.vec_id, bs.b AS b,
       |         list_slice(e.v, bs.b * ${PqSub} + 1, bs.b * ${PqSub} + ${PqSub}) AS bv
       |       FROM e CROSS JOIN bs),
       |d AS (SELECT bl.vec_id, bl.b, cb.code,
       |        list_dot_product(bl.bv, bl.bv)
       |          - 2 * list_dot_product(bl.bv, cb.cv)
       |          + list_dot_product(cb.cv, cb.cv) AS bdist
       |      FROM bl JOIN cb USING (b)),
       |r AS (SELECT vec_id, b, bdist,
       |        row_number() OVER (PARTITION BY vec_id, b
       |                           ORDER BY bdist, code) AS rn
       |      FROM d),
       |a AS (SELECT b, bdist FROM r WHERE rn = 1)
       |SELECT CAST(b AS INT) AS b, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(sum(CAST(floor(bdist * ${graft.functions.VectorFunctions.DistScaleSql} + 0.5) AS BIGINT)) AS DOUBLE)
       |         / (count(*) * ${graft.functions.VectorFunctions.DistScaleSql}) AS mean_dist,
       |       max(bdist) AS max_dist
       |FROM a GROUP BY b""".stripMargin) { (spark, sf) =>
    pqDistortion(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** The v11 aggregation over any corpus/PQ geometry. */
  def pqDistortion(emb: DataFrame, blocks: Int = PqBlocks, codes: Int = PqCodes,
      dim: Int = graft.functions.VectorFunctions.Dim): DataFrame = {
    import graft.functions.VectorFunctions.{snapLong, snapMean, DistScale}
    pqAssign(emb, blocks, codes, dim)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(snapLong(col("bdist"), DistScale)).as("__s"),
        max(col("bdist")).as("max_dist"))
      .select(col("b"), col("n_vecs"),
        snapMean(col("__s"), col("n_vecs"), DistScale).as("mean_dist"),
        col("max_dist"))
  }

  /** v12 — 1-bit (sign) quantization recall: pack each vector's sign
    * pattern into ONE 64-bit word (bit i ⟺ v[i] > 0 — 256× smaller
    * than float32 at dim 64), rank the corpus per query by Hamming
    * distance on the packed words, and score recall@[[RecallK]]
    * against the full-precision cosine ranking — the acceptance check
    * for the cheapest retrieval tier there is (a binary index is what
    * a 100 TB store scans FIRST; rerank tiers like v07/s06 sit above
    * it). Everything is exact: packing is a strict sign test, Hamming
    * is bit_count over XOR (integers), ranks tie on vec_id, hits are
    * longs and recall one IEEE division — fully hash-checked, no
    * floors needed.
    *
    * Shape: the v05/v07 kernel — queries broadcast, ONE corpus scan,
    * both rank windows share the one per-query exchange; the scan
    * side of a production binary index carries 8 bytes/vector. The
    * oracle states the same fingerprint as a 64-char bitstring
    * (Hamming is invariant under the position relabeling — the d15
    * BIT device). */
  def binaryRecall(emb: DataFrame, k: Int = RecallK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = graft.functions.VectorFunctions.Dim
    val packed = (0 until dim).map(i =>
      when(element_at(col("v"), i + 1) > 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))).reduce(_.bitwiseOR(_))
    val base = emb
      .withColumn("nrm", norm(col("v")))
      .withColumn("bq", packed)
    val queries = broadcast(
      base.filter(col("vec_id") < SimilarityOps.QueryVecs)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm"), col("bq").as("qbq")))
    val wFull = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_full").desc, col("vec_id"))
    val wBin = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("vec_id"))
    base.join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cos_full",
        when(col("qnrm") === 0 || col("nrm") === 0, lit(0.0))
          .otherwise(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))))
      .withColumn("hamming", bit_count(col("qbq").bitwiseXOR(col("bq"))))
      .withColumn("rank_full", row_number().over(wFull))
      .withColumn("rank_bin", row_number().over(wBin))
      .groupBy(col("query_id"))
      .agg(sum(when(col("rank_full") <= k && col("rank_bin") <= k, 1L)
        .otherwise(0L)).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / k).as("recall"))
  }

  val binaryRecallQ: GraftQuery = {
    val dim = graft.functions.VectorFunctions.Dim
    val bitChars = (1 to dim)
      .map(i => s"CASE WHEN v[$i] > 0 THEN '1' ELSE '0' END").mkString(", ")
    GraftQuery(
      "v12_binary_recall",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         |        CAST(concat($bitChars) AS BIT) AS bq
         |      FROM e),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bq AS qbq
         |      FROM n WHERE vec_id < ${SimilarityOps.QueryVecs}),
         |s AS (SELECT q.query_id, n.vec_id,
         |        row_number() OVER (PARTITION BY q.query_id
         |          ORDER BY CASE WHEN q.qnrm = 0 OR n.nrm = 0 THEN 0.0
         |                        ELSE list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm)
         |                   END DESC,
         |                   n.vec_id) AS rank_full,
         |        row_number() OVER (PARTITION BY q.query_id
         |          ORDER BY bit_count(xor(q.qbq, n.bq)), n.vec_id) AS rank_bin
         |      FROM q JOIN n ON n.vec_id <> q.query_id)
         |SELECT query_id,
         |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_bin <= $RecallK
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       CAST(sum(CASE WHEN rank_full <= $RecallK AND rank_bin <= $RecallK
         |                     THEN 1 ELSE 0 END) AS DOUBLE) / $RecallK AS recall
         |FROM s GROUP BY query_id""".stripMargin) { (spark, sf) =>
      binaryRecall(Tables.embeddings(spark, sf)
        .select(col("vec_id"), toDouble(col("embedding")).as("v")))
    }
  }

  /** v13 — kNN label purity on the probe sample: for each label, the
    * fraction of its probes' EXACT top-[[SimilarityOps.GraphK]]
    * neighbors that share the label — the embedding-quality number a
    * classifier or retrieval team reads per CLASS (corpus-level
    * recall evals like v05/v07 can hide one broken class behind nine
    * good ones; v10's centroid separation sees the class MEANS but
    * not whether individual neighborhoods are pure). Everything is
    * exact — probe-sample exact graph, integer edge counts, one IEEE
    * division — so the row is fully hash-checked, no floors.
    *
    * Scale shape: the exact side is the audit-tier probe-sample
    * kernel (s10's ground-truth machinery); the label joins are
    * broadcast-sized (vec_id → label), and the aggregation is
    * O(|labels|) out. */
  def knnLabelPurity(emb: DataFrame,
      mod: Int = SimilarityOps.GraphSampleMod,
      k: Int = SimilarityOps.GraphK): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label"))
    val edges = SimilarityOps.knnGraphExact(
      emb.select(col("vec_id"), col("v")), mod, k)
    edges
      .join(labels.select(col("vec_id").as("src_id"),
        col("label").as("src_label")), "src_id")
      .join(labels.select(col("vec_id").as("dst_id"),
        col("label").as("dst_label")), "dst_id")
      .groupBy(col("src_label").as("label"))
      .agg(countDistinct(col("src_id")).as("n_probes"),
        count(lit(1)).as("n_edges"),
        sum(when(col("src_label") === col("dst_label"), 1L).otherwise(0L))
          .as("same_label_edges"))
      .select(col("label"), col("n_probes"), col("n_edges"),
        col("same_label_edges"),
        (col("same_label_edges").cast("double") / col("n_edges")).as("purity"))
  }

  val knnLabelPurityQ: GraftQuery = GraftQuery(
    "v13_knn_label_purity",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |          FROM embeddings),
       |n AS (SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |q AS (SELECT vec_id AS src_id, v AS qv, nrm AS qnrm, label AS src_label
       |      FROM n WHERE vec_id % ${SimilarityOps.GraphSampleMod} = 0),
       |s AS (SELECT q.src_id, q.src_label, n.label AS dst_label,
       |        row_number() OVER (PARTITION BY q.src_id
       |          ORDER BY CASE WHEN q.qnrm = 0 OR n.nrm = 0 THEN 0.0
       |                        ELSE list_dot_product(q.qv, n.v) / (q.qnrm * n.nrm)
       |                   END DESC,
       |                   n.vec_id) AS rank
       |      FROM q JOIN n ON n.vec_id <> q.src_id),
       |t AS (SELECT * FROM s WHERE rank <= ${SimilarityOps.GraphK})
       |SELECT src_label AS label,
       |       CAST(count(DISTINCT src_id) AS BIGINT) AS n_probes,
       |       CAST(count(*) AS BIGINT) AS n_edges,
       |       CAST(sum(CASE WHEN src_label = dst_label THEN 1 ELSE 0 END)
       |            AS BIGINT) AS same_label_edges,
       |       CAST(sum(CASE WHEN src_label = dst_label THEN 1 ELSE 0 END)
       |            AS DOUBLE) / count(*) AS purity
       |FROM t GROUP BY src_label""".stripMargin) { (spark, sf) =>
    knnLabelPurity(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label")))
  }

  /** v14's snap scale: 2^14. |x| ≤ 1 ⇒ Gram cells ≤ n·2^28, and the
    * corr numerators below reach n²·2^28 — double-exact for
    * n ≤ 2^12.5 ≈ 5.8k vectors (the harness corpora: ≤5k at sf0.1)
    * and int64-safe to n ≈ 1.9·10⁵. A larger corpus passes a lower
    * `snap` to [[dimCorrelation]] (k = 8 is double-exact to ~2^18.5
    * rows) — the aggregate is scale-agnostic. */
  val CorrSnap = 16384.0

  /** v14 — dimension-correlation audit: the Pearson correlation of
    * every embedding-dimension PAIR (upper triangle, d(d−1)/2 = 2,016
    * rows at d = 64) — the redundancy report behind truncation (v05),
    * matryoshka (v08), and PQ sub-space (v04) decisions: a dim pair
    * with |corr| ≈ 1 is a wasted coordinate, and a block of correlated
    * dims is where product-quantization distortion concentrates.
    *
    * Scale shape — the reason this row exists as an AGGREGATE:
    * co-moments accumulate in ONE pass through
    * [[graft.functions.GramAgg]] (`graft_gram`, O(d²) mergeable longs
    * per group; ~17 KB at d = 64), never the d²-per-row pair explode
    * or an exploded self-join (2,016× the corpus volume at d = 64 —
    * the thing that dies at 100 TB). The relation then unfolds the
    * returned triangle with 2,016 element_at lookups on a ONE-row
    * frame.
    *
    * Float discipline: inputs are the 2^14 snap images, so n, sums,
    * and co-moments are exact longs; corr's numerator/denominator are
    * exact-long products cast to double (every value < 2^53 — exact),
    * one multiply, one sqrt, one division — the identical IEEE
    * sequence both engines spell. Zero-variance dims emit NULL. The
    * oracle replays the co-moments with a plain exploded self-join —
    * the semantics, not the plan. */
  val dimCorrelationQ: GraftQuery = GraftQuery(
    "v14_dim_correlation",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT vec_id,
       |        list_transform(v, x -> CAST(floor(x * $CorrSnap + 0.5) AS BIGINT)) AS xs
       |      FROM e WHERE v IS NOT NULL),
       |x AS (SELECT vec_id, i, xs[i + 1] AS xv
       |      FROM s CROSS JOIN range(0, ${Dim}) t(i)),
       |p AS (SELECT a.i AS di, b.i AS dj,
       |        CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(a.xv) AS BIGINT) AS si, CAST(sum(b.xv) AS BIGINT) AS sj,
       |        CAST(sum(a.xv * a.xv) AS BIGINT) AS sii,
       |        CAST(sum(b.xv * b.xv) AS BIGINT) AS sjj,
       |        CAST(sum(a.xv * b.xv) AS BIGINT) AS sij
       |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i < b.i
       |      GROUP BY a.i, b.i)
       |SELECT CAST(di AS BIGINT) AS di, CAST(dj AS BIGINT) AS dj, n, sij,
       |       CASE WHEN (n * sii - si * si) = 0 OR (n * sjj - sj * sj) = 0
       |            THEN NULL
       |            ELSE CAST(n * sij - si * sj AS DOUBLE)
       |                 / sqrt(CAST(n * sii - si * si AS DOUBLE)
       |                        * CAST(n * sjj - sj * sj AS DOUBLE)) END AS corr
       |FROM p""".stripMargin) { (spark, sf) =>
    dimCorrelation(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** The v14 relation over any (vec_id, v) frame. */
  def dimCorrelation(emb: DataFrame, dim: Int = Dim,
      snap: Double = CorrSnap): DataFrame = {
    val g = emb
      .select(transform(col("v"), x => snapLong(x, snap)).as("xs"))
      .agg(call_function("graft_gram", col("xs"), lit(dim)).as("g"))
    // unfold the triangle: tri(i,j) = i·dim − i(i−1)/2 + (j − i);
    // element_at is 1-based and the layout is [n, sums(dim), tri(...)]
    def sumAt(i: org.apache.spark.sql.Column) = element_at(col("g"), (i + 2).cast("int"))
    def gramAt(i: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      element_at(col("g"),
        (lit(2 + dim) + i * lit(dim) - (i * (i - 1)) / 2 + (j - i)).cast("int"))
    val n = element_at(col("g"), 1)
    val pairs = g
      .select(col("g"), explode(sequence(lit(0L), lit((dim - 2).toLong))).as("di"))
      .select(col("g"), col("di"),
        explode(sequence(col("di") + 1, lit((dim - 1).toLong))).as("dj"))
    val (si, sj) = (sumAt(col("di")), sumAt(col("dj")))
    val (sii, sjj) = (gramAt(col("di"), col("di")), gramAt(col("dj"), col("dj")))
    val sij = gramAt(col("di"), col("dj"))
    val (vi, vj) = (n * sii - si * si, n * sjj - sj * sj)
    pairs.select(col("di"), col("dj"), n.as("n"), sij.as("sij"),
      when(vi === 0 || vj === 0, lit(null).cast("double"))
        .otherwise((n * sij - si * sj).cast("double")
          / sqrt(vi.cast("double") * vj.cast("double"))).as("corr"))
  }

  /** v15 power-iteration budget: enough that the top-eigenspace
    * component ratio (λ₂/λ₁)^T is far below double precision for any
    * non-degenerate spectrum (0.97^2000 ≈ 10⁻²⁷). Fixed count, no
    * early-stop — determinism over adaptivity. */
  val PcIters = 2000

  /** v15 driver kernel — top principal component of the snapped
    * covariance image M = n·S − s·sᵀ (PSD, n²× the covariance, same
    * eigenvectors) built from ONE [[graft.functions.GramAgg]] pass:
    * exact-long matrix assembly (every cell < 2^53 under the v14
    * sizing note), deterministic start vector 1 + i/dim, `iters`
    * unnormalized-then-renormalized multiplies, Rayleigh λ, relative
    * residual ‖Mv − λv‖/λ. Driver cost is O(d²·iters) flops on a
    * d×d matrix — bounded state exactly like the IVF codebook, never
    * a distributed eigensolve. Returns
    * (v, λ, residual, n, traceScaled, maxDiagScaled). */
  def topPrincipalComponent(emb: DataFrame, dim: Int = Dim,
      snap: Double = CorrSnap, iters: Int = PcIters)
      : (Array[Double], Double, Double, Long, Long, Long) = {
    val (m, n, trace, maxDiag, _) = scatterMatrix(emb, dim, snap)
    val (v, lambda, rel) = powerIterate(m, dim, iters)
    (v, lambda, rel, n, trace, maxDiag)
  }

  /** The snapped scatter image M = n·S − s·sᵀ (= n·Σ(x−μ)(x−μ)ᵀ, PSD,
    * n²× the covariance, same eigenvectors) from ONE
    * [[graft.functions.GramAgg]] pass, as exact-long cells (< 2^53
    * under the v14 sizing note). Returns (m, n, trace, maxDiag,
    * dimension sums) — the sums are what v16 needs for μ. */
  private[operators] def scatterMatrix(emb: DataFrame, dim: Int, snap: Double)
      : (Array[Array[Double]], Long, Long, Long, Array[Long]) = {
    val g = emb
      .select(transform(col("v"), x => snapLong(x, snap)).as("xs"))
      .agg(call_function("graft_gram", col("xs"), lit(dim)).as("g"))
      .head.getSeq[Long](0).toArray
    val n = g(0)
    def sumAt(i: Int) = g(1 + i)
    def tri(i: Int, j: Int) = g(1 + dim + i * dim - i * (i - 1) / 2 + (j - i))
    val m = Array.ofDim[Double](dim, dim)
    var trace = 0L
    var maxDiag = Long.MinValue
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cell = n * tri(i, j) - sumAt(i) * sumAt(j) // exact long
        m(i)(j) = cell.toDouble
        m(j)(i) = cell.toDouble
        if (i == j) { trace += cell; maxDiag = math.max(maxDiag, cell) }
        j += 1
      }
      i += 1
    }
    (m, n, trace, maxDiag, Array.tabulate(dim)(sumAt))
  }

  /** Deterministic power iteration (start vector 1 + i/dim, `iters`
    * renormalized multiplies, Rayleigh λ, relative residual). */
  private[operators] def powerIterate(m: Array[Array[Double]], dim: Int,
      iters: Int): (Array[Double], Double, Double) = {
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { r =>
        var s = 0.0; var c = 0
        while (c < dim) { s += m(r)(c) * v(c); c += 1 }
        s
      }
    def nrm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    var v = Array.tabulate(dim)(i => 1.0 + i.toDouble / dim)
    val n0 = nrm(v); v = v.map(_ / n0)
    var t = 0
    while (t < iters) {
      val w = matVec(v)
      val nw = nrm(w)
      if (nw == 0.0) t = iters // M annihilates v (zero matrix): keep v
      else { v = w.map(_ / nw); t += 1 }
    }
    val mv = matVec(v)
    val lambda = v.zip(mv).map { case (a, b) => a * b }.sum
    val res = nrm(v.indices.map(i => mv(i) - lambda * v(i)).toArray)
    val rel = if (lambda == 0.0) res else res / math.abs(lambda)
    (v, lambda, rel)
  }

  /** v15 — top-PC spectral audit off ONE corpus pass: the PCA
    * front-door every embedding pipeline wants (whitening decisions,
    * matryoshka truncation sizing v05/v08, drift direction v06)
    * without ever materializing an n×d×d anything — the co-moment
    * matrix arrives via the v14 `graft_gram` aggregate (O(d²)
    * mergeable longs) and the eigensolve is driver-side bounded
    * state. The gate row is a CONTRACT (the s19 device): the exact
    * integers an oracle CAN replay (n, scaled trace, max diagonal —
    * the same snapped self-join as v14) plus the spectral invariants
    * the engine's float tier must satisfy — unit eigenvector,
    * relative residual ≤ 10⁻⁶ (power iteration converged), max_diag ≤
    * λ ≤ trace (Rayleigh bounds, 10⁻⁹ slack for the float boundary),
    * explained variance above uniform and ≤ 1. Any boolean false →
    * hash split. VectorPcaSpec pins the DIRECTION on planted
    * anisotropic data, which no oracle-replayable scalar can. */
  val topPcQ: GraftQuery = GraftQuery(
    "v15_top_pc",
    s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT list_transform(v, x -> CAST(floor(x * $CorrSnap + 0.5) AS BIGINT)) AS xs
       |      FROM e WHERE v IS NOT NULL),
       |x AS (SELECT xs, i, xs[i + 1] AS xv FROM s CROSS JOIN range(0, $Dim) t(i)),
       |d AS (SELECT i, CAST(count(*) AS BIGINT) AS n, CAST(sum(xv) AS BIGINT) AS si,
       |        CAST(sum(xv * xv) AS BIGINT) AS sii FROM x GROUP BY i)
       |SELECT CAST($Dim AS BIGINT) AS dim, max(n) AS n,
       |       CAST(sum(n * sii - si * si) AS BIGINT) AS trace,
       |       CAST(max(n * sii - si * si) AS BIGINT) AS max_diag,
       |       TRUE AS unit_norm_ok, TRUE AS residual_ok,
       |       TRUE AS lambda_ge_max_diag, TRUE AS lambda_le_trace,
       |       TRUE AS ev_gt_avg, TRUE AS psd_ok
       |FROM d""".stripMargin) { (spark, sf) =>
    val emb = Tables.embeddings(spark, sf)
      .select(toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    val (v, lambda, rel, n, trace, maxDiag) = topPrincipalComponent(emb)
    val unitErr = math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0)
    val slack = 1e-9
    import spark.implicits._
    Seq((Dim.toLong, n, trace, maxDiag,
      unitErr < 1e-12, rel <= 1e-6,
      lambda >= maxDiag.toDouble * (1 - slack),
      lambda <= trace.toDouble * (1 + slack),
      lambda >= trace.toDouble / Dim * (1 - slack),
      lambda >= 0.0 && maxDiag >= 0L))
      .toDF("dim", "n", "trace", "max_diag", "unit_norm_ok", "residual_ok",
        "lambda_ge_max_diag", "lambda_le_trace", "ev_gt_avg", "psd_ok")
  }

  /** v16 driver kernel — all-but-the-top postprocess audit: top PC of
    * the scatter image, the DEFLATED second component (power iteration
    * on M − λ₁v₁v₁ᵀ), plus the distributed sums over the actually-
    * postprocessed vectors. Returns everything the spec pins. */
  private[operators] def abttKernel(emb: DataFrame, dim: Int, snap: Double,
      iters: Int): (Long, Long, Long, // n, trace, maxDiag
      Array[Double], Double, Double,  // v1, λ1, rel1
      Array[Double], Double, Double,  // v2, λ2, res2 (absolute)
      Double, Double, Double) = {     // sProj, sCent, sPost (×n, snapped units)
    val (m, n, trace, maxDiag, sums) = scatterMatrix(emb, dim, snap)
    val (v1, l1, rel1) = powerIterate(m, dim, iters)
    val m2 = Array.tabulate(dim, dim)((i, j) => m(i)(j) - l1 * v1(i) * v1(j))
    val (v2, l2, rel2) = powerIterate(m2, dim, iters)
    val res2 = rel2 * math.abs(l2) // back to absolute scale
    val mu = sums.map(s => if (n == 0) 0.0 else s.toDouble / n)
    val muLit = array(mu.map(lit): _*)
    val v1Lit = array(v1.map(lit): _*)
    val stats = emb
      .select(transform(col("v"), x => snapLong(x, snap).cast("double")).as("xs"))
      .select(zip_with(col("xs"), muLit, (a, b) => a - b).as("c"))
      .select(col("c"),
        aggregate(zip_with(col("c"), v1Lit, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("p"))
      // e' = c − p·v1: the ACTUAL postprocessed vector, its norm taken
      // explicitly so the row exercises the operator, not Pythagoras
      .select(col("p"),
        aggregate(col("c"), lit(0.0), (acc, x) => acc + x * x).as("nsq"),
        aggregate(zip_with(col("c"), v1Lit, (ci, vi) => ci - col("p") * vi),
          lit(0.0), (acc, x) => acc + x * x).as("psq"))
      .agg(sum(col("p") * col("p")).as("s_proj"), sum(col("nsq")).as("s_cent"),
        sum(col("psq")).as("s_post"))
      .head
    val (sProj, sCent, sPost) =
      if (stats.isNullAt(0)) (0.0, 0.0, 0.0)
      else (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    (n, trace, maxDiag, v1, l1, rel1, v2, l2, res2, sProj, sCent, sPost)
  }

  /** v16 — all-but-the-top (Mu & Viswanath, ICLR'18) embedding
    * postprocess, audited end to end: subtract the corpus mean, remove
    * the projection onto the top principal component — the standard
    * isotropy fix that measurably improves similarity search on
    * anisotropic embedding spaces (the common-direction artifact every
    * trained encoder has). The eigensolves are v15's bounded driver
    * state (one `graft_gram` pass + O(d²·iters) flops; the second
    * component comes from the DEFLATED matrix M − λ₁v₁v₁ᵀ); the
    * postprocess itself is a row-local literal-plane expression —
    * zero shuffle, and the audit sums over the postprocessed vectors
    * are one map-side-combined aggregation.
    *
    * Contract row (the v15/s19 device): replayable exact integers
    * (n, scaled trace, max diagonal) plus invariants the float tier
    * must satisfy — the distributed Σ(v₁·c)² matches λ₁/n (the driver
    * eigenvector explains exactly the variance it claims, measured on
    * the corpus, ≤10⁻⁶ rel), Σ‖c‖² matches trace/n, Σ‖e′‖² matches
    * (trace−λ₁)/n (the removal removed exactly the top component and
    * nothing else), λ₂ ≤ λ₁, v₂ ⊥ v₁, and the deflated iteration
    * converged. Any boolean false → hash split. */
  val abttQ: GraftQuery = GraftQuery(
    "v16_abtt",
    s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT list_transform(v, x -> CAST(floor(x * $CorrSnap + 0.5) AS BIGINT)) AS xs
       |      FROM e WHERE v IS NOT NULL),
       |x AS (SELECT xs, i, xs[i + 1] AS xv FROM s CROSS JOIN range(0, $Dim) t(i)),
       |d AS (SELECT i, CAST(count(*) AS BIGINT) AS n, CAST(sum(xv) AS BIGINT) AS si,
       |        CAST(sum(xv * xv) AS BIGINT) AS sii FROM x GROUP BY i)
       |SELECT CAST($Dim AS BIGINT) AS dim, max(n) AS n,
       |       CAST(sum(n * sii - si * si) AS BIGINT) AS trace,
       |       CAST(max(n * sii - si * si) AS BIGINT) AS max_diag,
       |       TRUE AS cent_var_ok, TRUE AS top_var_ok, TRUE AS post_var_ok,
       |       TRUE AS lambda2_le_lambda1, TRUE AS deflation_orthogonal,
       |       TRUE AS residual2_ok
       |FROM d""".stripMargin) { (spark, sf) =>
    val emb = Tables.embeddings(spark, sf)
      .select(toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    val (n, trace, maxDiag, v1, l1, _, v2, l2, res2, sProj, sCent, sPost) =
      abttKernel(emb, Dim, CorrSnap, PcIters)
    val traceScale = math.max(trace.toDouble, 1.0)
    val orth = math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum)
    import spark.implicits._
    Seq((Dim.toLong, n, trace, maxDiag,
      math.abs(sCent * n - trace.toDouble) <= 1e-6 * traceScale,
      math.abs(sProj * n - l1) <= 1e-6 * math.max(l1, 1.0),
      math.abs(sPost * n - (trace.toDouble - l1)) <= 1e-6 * traceScale,
      l2 <= l1 * (1 + 1e-9) + 1e-9,
      orth <= 1e-6,
      // residual measured against the spectral scale: on a near-rank-1
      // corpus λ₂ ≈ 0 and the float noise floor is set by λ₁
      res2 <= 1e-6 * math.max(math.abs(l2), math.max(l1 * 1e-6, 1.0))))
      .toDF("dim", "n", "trace", "max_diag", "cent_var_ok", "top_var_ok",
        "post_var_ok", "lambda2_le_lambda1", "deflation_orthogonal",
        "residual2_ok")
  }

  val all: Seq[GraftQuery] = Seq(quantizeQ, labelCentroidsQ, centroidOutliersQ, pqQ,
    truncRecallQ, centroidDriftQ, quantRecallQ, matryoshkaRecallQ, dimStatsQ,
    centroidSeparationQ, pqDistortionQ, binaryRecallQ, knnLabelPurityQ,
    dimCorrelationQ, topPcQ, abttQ)
}
