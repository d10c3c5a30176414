package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private val valid =
    """{
      |  "kafka_servers": "localhost:9092,localhost:9093,localhost:9094",
      |  "topic_list": "Zelensky,Putin,Biden,NATO,NoFlyZone",
      |  "checkpoint_path": "/data/ckpt",
      |  "lake_path": "/data/raw",
      |  "aggregates_path": "/data/agg"
      |}""".stripMargin

  test("parses the reference-shaped config with defaults") {
    val cfg = GraftConfig.fromJson(valid)
    assert(cfg.kafkaServers === "localhost:9092,localhost:9093,localhost:9094")
    assert(cfg.topics === Seq("Zelensky", "Putin", "Biden", "NATO", "NoFlyZone"))
    assert(cfg.topicPartitions === 3) // reference defaults
    assert(cfg.topicReplication === 3)
    assert(cfg.lakePath === "/data/raw")
  }

  test("loads from a file and honors explicit topic sizing") {
    val withSizing = valid.replace("\"topic_list\"",
      "\"topic_partitions\": 6, \"topic_replication\": 2, \"topic_list\"")
    val p = Files.createTempFile("graft_cfg", ".json")
    Files.writeString(p, withSizing)
    val cfg = GraftConfig.load(p)
    assert(cfg.topicPartitions === 6)
    assert(cfg.topicReplication === 2)
  }

  test("missing and malformed fields fail loudly") {
    val noServers = valid.replace("\"kafka_servers\"", "\"other\"")
    val e1 = intercept[IllegalArgumentException](GraftConfig.fromJson(noServers))
    assert(e1.getMessage.contains("kafka_servers"))
    val e2 = intercept[IllegalArgumentException](GraftConfig.fromJson("not json"))
    assert(e2.getMessage.contains("not valid JSON"))
    val e3 = intercept[IllegalArgumentException](
      GraftConfig.fromJson(valid.replace("Zelensky,Putin,Biden,NATO,NoFlyZone", " , ")))
    assert(e3.getMessage.contains("topic_list"))
    // toShort would silently wrap 65539 -> 3
    val overflow = valid.replace("\"topic_list\"",
      "\"topic_replication\": 65539, \"topic_list\"")
    val e4 = intercept[IllegalArgumentException](GraftConfig.fromJson(overflow))
    assert(e4.getMessage.contains("topic_replication"))
  }
}
