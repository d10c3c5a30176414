package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-query invariants on the harness corpus (property-style checks
  * per SURVEY.md §5-2). */
class QueryInvariantsSpec extends SparkSpec {

  test("per-day shares sum to 1 (q06)") {
    val shares = CoreQueries.windowShare.run(spark, sf001)
      .groupBy("day").agg(sum("share").as("s"))
      .filter(abs(col("s") - 1.0) > 0.001)
    assert(shares.count() === 0)
  }

  test("grand-total pct sums to 100 (q07)") {
    val total = CoreQueries.shareOfTotal.run(spark, sf001)
      .agg(sum("pct")).collect().head.getDouble(0)
    assert(math.abs(total - 100.0) < 0.01)
  }

  test("unpivot(pivot(x)) preserves totals (q02/q10)") {
    val wideTotal = CoreQueries.pivotCounts.run(spark, sf001)
      .select(Seq("click", "error", "purchase", "signup", "view").map(c => sum(col(c))).reduce(_ + _))
      .collect().head.getLong(0)
    val longTotal = CoreQueries.unpivotCounts.run(spark, sf001)
      .agg(sum("counts")).collect().head.getLong(0)
    val raw = graft.Tables.events(spark, sf001).count()
    assert(wideTotal === raw)
    assert(longTotal === raw)
  }

  test("positivity rates within [0,1]; quantiles ordered (q01/q09)") {
    assert(CoreQueries.positivity.run(spark, sf001)
      .filter(col("positivity_rate") < 0 || col("positivity_rate") > 1).count() === 0)
    assert(CoreQueries.quantiles.run(spark, sf001)
      .filter(!(col("lo") <= col("q1") && col("q1") <= col("median") &&
        col("median") <= col("q3") && col("q3") <= col("hi"))).count() === 0)
  }

  test("dedup-first keeps exactly one row per key (q12)") {
    val out = CoreQueries.dedupFirst.run(spark, sf001)
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("rollup grand total equals table count (q20)") {
    val grand = CoreQueries.rollupCounts.run(spark, sf001)
      .filter(col("event_type").isNull && col("day").isNull)
      .select("counts").collect()
    assert(grand.length === 1)
    assert(grand.head.getLong(0) === graft.Tables.events(spark, sf001).count())
  }

  test("multimodal features: 16-dim, L1-normalized (m02)") {
    val f = MultimodalOps.featuresQ.run(spark, sf001)
    assert(f.filter(col("dim") =!= 16).count() === 0)
    assert(f.filter(abs(col("feature_sum") - 1.0) > 0.001).count() === 0)
  }

  test("entry point returns rows (driver smoke)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has matching column names in spark result and oracle") {
    // structural guard: every oracle key exists in queries
    val qs = graft.SparkEntry.queries.keySet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
