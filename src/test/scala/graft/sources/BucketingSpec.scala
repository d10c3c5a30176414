package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join with ZERO exchange in the physical plan") {
    val dir = Files.createTempDirectory("graft_buckets").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sf001),
        "graft_b_orders", s"$dir/orders", "o_custkey", 8)
      Bucketing.writeBucketed(Tables.customer(spark, sf001),
        "graft_b_customer", s"$dir/customer", "c_custkey", 8)

      val bucketed = spark.table("graft_b_orders")
        .join(spark.table("graft_b_customer"),
          col("o_custkey") === col("c_custkey"))
      val expected = Tables.orders(spark, sf001)
        .join(Tables.customer(spark, sf001),
          col("o_custkey") === col("c_custkey")).count()
      assert(bucketed.count() === expected, "bucketing must not change results")

      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join over bucketed scans:\n$plan")

      // the same scan satisfies a keyed aggregation's distribution too
      val agg = spark.table("graft_b_orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      agg.collect()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "aggregation on the bucket key must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }
}
