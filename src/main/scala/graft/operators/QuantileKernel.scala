package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mergeable exact-quantile kernel: order statistics computed from a
  * distinct-value histogram instead of an all-values-in-one-buffer
  * aggregation (the scale defect of `percentile`-style aggregates,
  * whose buffer holds every distinct value of a group in ONE task).
  *
  * Shape, and why it survives 100 TB:
  *  1. `groupBy(key, value).count()` — a plain hash aggregate with
  *     map-side combine: per-task state and shuffle volume are the
  *     DISTINCT (key, value) pairs, not the corpus. For fixed-point
  *     telemetry (the events table carries 2-decimal values in a
  *     bounded range) the distinct-value domain is bounded (~60k per
  *     key) no matter how many rows feed it.
  *  2. a running-count window over the HISTOGRAM, partitioned by key —
  *     the sort touches distinct values only, spills like any sort,
  *     and is orders of magnitude smaller than the q27-style
  *     corpus-wide rank window it replaces.
  *  3. order statistics become conditional `min` aggregates over the
  *     cumulative counts — mergeable, no buffering.
  * For genuinely continuous domains (distinct ≈ rows) this degenerates
  * to a per-key histogram sort and the bounded-memory tool is the KLL
  * sketch (`q24_approx_quantiles`); the two queries document that
  * trade explicitly.
  */
object QuantileKernel {

  /** Distinct-value histogram with running cumulative counts:
    * (key, value, cnt, cum, n) where `cum` is the count of rows with
    * a value ≤ this one inside the key and `n` the key's row total
    * (joined back as a broadcast — O(keys) rows). */
  def cumulativeHistogram(df: DataFrame, key: String, value: String): DataFrame = {
    // NULL values are excluded up front: percentile/quantile_cont/
    // quantile_disc all aggregate the non-null multiset, and a null
    // histogram row would otherwise shift every cumulative position
    val h = df.filter(col(value).isNotNull)
      .groupBy(col(key), col(value)).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(key)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = h.groupBy(col(key)).agg(sum(col("cnt")).as("n"))
    h.select(col(key), col(value), col("cnt"), sum(col("cnt")).over(w).as("cum"))
      .join(broadcast(totals), key)
  }

  /** Interpolated (`quantile_cont`) exact quantiles per key over a
    * [[cumulativeHistogram]]: one row per key with a column per tag,
    * plus `min`/`max` of the value (free from the histogram).
    *
    * Rank arithmetic mirrors Spark's own `percentile` (and DuckDB's
    * `quantile_cont`): 0-based position p·(n−1); the value at 0-based
    * index i is the first histogram row with cum > i; the result
    * interpolates lo·(⌈pos⌉−pos) + hi·(pos−⌊pos⌋), collapsing to the
    * exact member when the position is integral. */
  def contQuantiles(hist: DataFrame, key: String, value: String,
      probs: Seq[(String, Double)]): DataFrame = {
    val aggs = probs.flatMap { case (tag, p) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      Seq(
        min(when(col("cum") > floor(pos), col(value))).as(s"__lo_$tag"),
        min(when(col("cum") > ceil(pos), col(value))).as(s"__hi_$tag"))
    } ++ Seq(first(col("n")).as("__n"),
      min(col(value)).as("__min"), max(col(value)).as("__max"))
    val g = hist.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    probs.foldLeft(g) { case (df, (tag, p)) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val lower = floor(pos).cast("double")
      val higher = ceil(pos).cast("double")
      df.withColumn(tag,
        when(lower === higher, col(s"__lo_$tag"))
          .otherwise(col(s"__lo_$tag") * (higher - pos)
            + col(s"__hi_$tag") * (pos - lower)))
    }
  }

  /** Discrete (`quantile_disc`) exact quantiles per key over a
    * [[cumulativeHistogram]]: exact data members, no interpolation —
    * the emitted VALUES carry no float-arithmetic parity risk.
    * Convention pinned to DuckDB's (probed empirically, round 5,
    * including sub-integer double products like 0.7·90): 1-based rank
    * ⌈p·n⌉ clamped to ≥ 1, i.e. the first histogram row with
    * cum ≥ that rank. The rank itself is computed as ceil over the
    * IEEE double product — the probed DuckDB behavior; if a future
    * oracle version computed the index with different float forms at
    * astronomically large n (≥1e9 rows/group), the divergence would be
    * one rank at exact decile boundaries and the gate would surface
    * it. */
  def discQuantiles(hist: DataFrame, key: String, value: String,
      probs: Seq[(String, Double)]): DataFrame = {
    val aggs: Seq[Column] = probs.map { case (tag, p) =>
      val rank = greatest(ceil(lit(p) * col("n")), lit(1L))
      min(when(col("cum") >= rank, col(value))).as(tag)
    }
    hist.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** The SQL spelling of [[discQuantiles]]' rank-⌈p·n⌉ selection —
    * interpolate THIS into oracle texts (never hand-copy the CASE) so
    * the convention every quantile oracle pins is written exactly
    * once; `cum`/`n` name the cumulative-histogram columns in scope
    * (r7 review: seven hand-copies of this line were one typo away
    * from reintroducing the quantile_disc version-drift class). */
  def discSelectSql(p: String, value: String,
      cum: String = "cum", n: String = "n"): String =
    s"min(CASE WHEN $cum >= greatest(ceil($p * $n), 1) THEN $value END)"

  /** The SQL spelling of [[contQuantiles]]' 0-based boundary picks:
    * (lo, hi) selections at floor/ceil of position `p·(n−1)`. */
  def contSelectSql(p: String, value: String,
      cum: String = "cum", n: String = "n"): (String, String) = (
    s"min(CASE WHEN $cum > floor($p * ($n - 1)) THEN $value END)",
    s"min(CASE WHEN $cum > ceil($p * ($n - 1)) THEN $value END)")
}
