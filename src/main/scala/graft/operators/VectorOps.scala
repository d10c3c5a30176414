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
  def quantized(emb: DataFrame, dim: Int = SimilarityOps.Dim): DataFrame =
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
       |         + scale * scale * list_dot_product(qd, qd)) / ${SimilarityOps.Dim} AS mse
       |FROM d""".stripMargin) { (spark, sf) =>
    quantized(Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")))
  }

  /** Per-label centroid in long form (label, pos, mean component) plus
    * the label population: posexplode + one hash aggregation keyed on
    * (label, dim-position) — cardinality labels×dim, so partial
    * aggregation combines map-side and the shuffle carries one partial
    * sum per key per partition regardless of corpus size. Means are
    * rounded to 4dp on both engines (double-sum order differs across
    * engines/partitionings; 4dp is far above the ulp drift and far
    * below the signal). */
  val labelCentroidsQ: GraftQuery = GraftQuery(
    "v02_label_centroids",
    s"""SELECT label, CAST(i AS INT) AS pos,
       |       round(avg(v[i + 1]), 4) AS mean_val,
       |       count(*) AS n
       |FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |CROSS JOIN range(0, ${SimilarityOps.Dim}) r(i)
       |GROUP BY label, pos""".stripMargin) { (spark, sf) =>
    labelCentroids(Tables.embeddings(spark, sf)
      .select(col("label"), toDouble(col("embedding")).as("v")))
  }

  /** Long-form per-label componentwise means over (label, v) rows. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 4).as("mean_val"), count(lit(1)).as("n"))

  /** Per-vector outlier score: L2 distance to the vector's label
    * centroid, z-scored within the label — the embedding-space
    * mislabel/contamination probe a curation pipeline runs before
    * training on labeled data.
    *
    * Float parity: centroid components are rounded to 4dp (double-sum
    * order differs across engines — same contract as v02); every
    * later op is then bit-identical in both engines: distance² comes
    * from the dot identity v·v − 2·v·c + c·c over the SHARED fold-left
    * kernel, sqrt is correctly-rounded IEEE, and z is plain arithmetic
    * on the (4dp-rounded) per-label mean/stddev. So dist and z are
    * emitted RAW.
    *
    * Scale shape: centroid and stats relations are O(labels) — both
    * broadcast; the corpus is touched in two narrow map passes plus
    * one labels×dim aggregation. No per-vector shuffle. */
  def centroidOutliers(emb: DataFrame): DataFrame = {
    val cent = emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 4).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
    val d = emb.join(broadcast(cent), "label")
      .withColumn("dist", sqrt(greatest(lit(0.0),
        dot(col("v"), col("v"))
          - lit(2) * dot(col("v"), col("c"))
          + dot(col("c"), col("c")))))
    val stats = d.groupBy(col("label"))
      .agg(round(avg(col("dist")), 4).as("mu"),
        round(stddev_samp(col("dist")), 4).as("sd"))
    // sd can round to 0 at 4dp (all distances in a label equal with n≥2):
    // Spark's non-ANSI x/0 is NULL; DuckDB 1.0 matches but newer versions
    // default to IEEE ±Inf, which would flip the flag — deciding the
    // degenerate case before the division in both engine texts makes
    // parity oracle-version-independent (z → NULL, outlier → false).
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
       |comp AS (SELECT label, i AS pos, round(avg(v[i + 1]), 4) AS m
       |         FROM e CROSS JOIN range(0, ${SimilarityOps.Dim}) r(i)
       |         GROUP BY label, pos),
       |cent AS (SELECT label, list(m ORDER BY pos) AS c FROM comp GROUP BY label),
       |d AS (SELECT vec_id, e.label,
       |        sqrt(greatest(0.0, list_dot_product(v, v)
       |          - 2 * list_dot_product(v, c)
       |          + list_dot_product(c, c))) AS dist
       |      FROM e JOIN cent ON e.label = cent.label),
       |st AS (SELECT label, round(avg(dist), 4) AS mu,
       |         round(stddev_samp(dist), 4) AS sd
       |       FROM d GROUP BY label)
       |SELECT d.vec_id, d.label, d.dist,
       |       CASE WHEN st.sd IS NULL OR st.sd = 0 THEN NULL
       |            ELSE (d.dist - st.mu) / st.sd END AS z,
       |       CASE WHEN st.sd IS NULL OR st.sd = 0 THEN false
       |            ELSE (d.dist - st.mu) / st.sd > 2.0 END AS outlier
       |FROM d JOIN st USING (label)""".stripMargin) { (spark, sf) =>
    centroidOutliers(Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v")))
  }

  val all: Seq[GraftQuery] = Seq(quantizeQ, labelCentroidsQ, centroidOutliersQ)
}
