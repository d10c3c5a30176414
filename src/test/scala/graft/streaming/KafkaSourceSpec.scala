package graft.streaming

import graft.{GraftConfig, SparkSpec}

/** S1 plan-level smoke: no broker exists in the harness, and the
  * spark-sql-kafka connector jar is not in this container's Spark
  * distribution, so the furthest the Kafka path can execute here is the
  * DataSource lookup inside `load()`. This spec pins exactly that
  * boundary: with the connector on the classpath the streaming relation
  * must resolve lazily (no broker needed before `start()`) with the
  * standard Kafka schema; without it, the failure must be the connector
  * lookup — never an engine-side bug in the options/plan assembly. */
class KafkaSourceSpec extends SparkSpec {

  private val cfg = GraftConfig.fromJson(
    """{"kafka_servers": "fake-broker:9092",
      | "topic_list": "Zelensky,Putin,Biden,NATO,NoFlyZone",
      | "checkpoint_path": "/tmp/ckpt", "lake_path": "/tmp/lake",
      | "aggregates_path": "/tmp/agg"}""".stripMargin)

  test("kafka source builds a resolvable plan, or fails only at connector lookup") {
    try {
      val df = TweetIngest.readKafkaStream(spark, cfg.kafkaServers, cfg.topics)
      // connector present: lazy relation resolves without a broker
      val names = df.schema.fieldNames.toSet
      assert(Set("key", "value", "topic", "partition", "offset", "timestamp")
        .subsetOf(names), s"unexpected kafka schema: $names")
      // and the full config-driven ingest assembles end-to-end
      TweetIngest.fromConfig(spark, cfg)
    } catch {
      case e: Exception =>
        val msg = String.valueOf(e.getMessage).toLowerCase
        assert(msg.contains("kafka") &&
          (msg.contains("failed to find") || msg.contains("data source")),
          s"must fail only at connector lookup, got: $e")
    }
  }
}
