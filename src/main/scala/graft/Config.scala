package graft

import java.nio.file.{Files, Path}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Typed engine configuration — the reference's JSON config scan
  * (SURVEY.md §2.1 S8; spark_app/main.py:28-29,
  * streamlit/utilities/utilities.py:7-11) as a validated case class
  * instead of a raw dict. Field names mirror the reference's
  * config.json keys (spark_app/config.json) minus credentials, which
  * belong in the environment, never in config files the reference
  * committed them to.
  *
  * Parsed with json4s (ships with Spark) — no extra dependency.
  */
final case class GraftConfig(
    kafkaServers: String,
    topics: Seq[String],
    topicPartitions: Int,
    topicReplication: Short,
    checkpointPath: String,
    lakePath: String,
    aggregatesPath: String)

object GraftConfig {

  def load(path: Path): GraftConfig = fromJson(Files.readString(path))

  def fromJson(json: String): GraftConfig = {
    val j =
      try JsonMethods.parse(json)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"config is not valid JSON: ${e.getMessage}")
      }
    def str(field: String): String = j \ field match {
      case JString(s) if s.nonEmpty => s
      case JNothing => fail(field, "missing")
      case other => fail(field, s"expected non-empty string, got $other")
    }
    def intOr(field: String, default: Int): Int = j \ field match {
      case JInt(n) => n.toInt
      case JNothing => default
      case other => fail(field, s"expected integer, got $other")
    }
    val topics = str("topic_list").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (topics.isEmpty) fail("topic_list", "no topics")
    val replication = intOr("topic_replication", 3)
    if (replication < 1 || replication > Short.MaxValue)
      fail("topic_replication", s"out of range: $replication") // toShort would wrap silently
    GraftConfig(
      kafkaServers = str("kafka_servers"),
      topics = topics,
      topicPartitions = intOr("topic_partitions", 3),     // reference default
      topicReplication = replication.toShort,
      checkpointPath = str("checkpoint_path"),
      lakePath = str("lake_path"),
      aggregatesPath = str("aggregates_path"))
  }

  private def fail(field: String, why: String): Nothing =
    throw new IllegalArgumentException(s"config field '$field': $why")
}
