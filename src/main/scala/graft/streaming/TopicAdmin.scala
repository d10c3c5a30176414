package graft.streaming

import graft.GraftConfig

/** Kafka topic provisioning — the reference's `configure_create_topics`
  * (SURVEY.md §2.1 S7; tweepy_ingestion/utilities/functions.py:19-39:
  * 5 topics × 3 partitions × RF 3) split into a pure, testable planning
  * core and a thin client boundary.
  *
  * The planning functions are deterministic data → data: desired specs
  * from config, validation against the broker count, and an idempotent
  * create-plan diff (the reference calls create_topics unconditionally
  * and swallows per-topic failures; the diff makes re-runs explicit
  * no-ops instead). The actual broker call is one
  * `AdminClient.createTopics(plan.map(toNewTopic))` in the deployment
  * entry point — kafka-clients ships with the spark-sql-kafka connector
  * the ingest job already needs on its classpath, and is deliberately
  * not a compile-time dependency of the engine core.
  */
object TopicAdmin {

  final case class TopicSpec(name: String, partitions: Int, replicationFactor: Short)

  /** One spec per configured topic (reference: uniform 3×3). */
  def desiredTopics(cfg: GraftConfig): Seq[TopicSpec] =
    cfg.topics.map(TopicSpec(_, cfg.topicPartitions, cfg.topicReplication))

  /** Broker-side invariants the reference learns about at create time:
    * replication can't exceed the broker count, names must be legal. */
  def validate(spec: TopicSpec, brokerCount: Int): Either[String, TopicSpec] =
    if (spec.name.isEmpty || spec.name.length > 249 ||
      spec.name == "." || spec.name == ".." || // Kafka reserves both
      // Kafka's legal set is ASCII [a-zA-Z0-9._-]; Char.isLetterOrDigit
      // would wave through non-ASCII names the broker rejects
      !spec.name.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'))
      Left(s"illegal topic name '${spec.name}'")
    else if (spec.partitions < 1)
      Left(s"${spec.name}: partitions must be >= 1")
    else if (spec.replicationFactor < 1)
      Left(s"${spec.name}: replication factor must be >= 1")
    else if (spec.replicationFactor > brokerCount)
      Left(s"${spec.name}: replication factor ${spec.replicationFactor} " +
        s"exceeds broker count $brokerCount")
    else Right(spec)

  /** Idempotent create plan: only topics the cluster doesn't already
    * have. Existing topics with drifted partition counts are surfaced
    * separately — Kafka can't shrink partitions, so drift is a report,
    * not an auto-fix. */
  def createPlan(
      desired: Seq[TopicSpec],
      existing: Map[String, Int]): (Seq[TopicSpec], Seq[String]) = {
    val (present, absent) = desired.partition(s => existing.contains(s.name))
    val drifted = present.collect {
      case s if existing(s.name) != s.partitions =>
        s"${s.name}: has ${existing(s.name)} partitions, config wants ${s.partitions}"
    }
    (absent, drifted)
  }
}
