package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftConfig
import graft.streaming.TopicAdmin._

class TopicAdminSpec extends AnyFunSuite {

  private val cfg = GraftConfig.fromJson(
    """{"kafka_servers": "b:9092", "topic_list": "Zelensky,Putin,Biden,NATO,NoFlyZone",
      | "checkpoint_path": "/c", "lake_path": "/l", "aggregates_path": "/a"}""".stripMargin)

  test("desired topics mirror the reference's 5 x (3 partitions, RF 3)") {
    val specs = desiredTopics(cfg)
    assert(specs.map(_.name) ===
      Seq("Zelensky", "Putin", "Biden", "NATO", "NoFlyZone"))
    assert(specs.forall(s => s.partitions == 3 && s.replicationFactor == 3))
  }

  test("validation enforces broker-side invariants") {
    val ok = TopicSpec("Zelensky", 3, 3)
    assert(validate(ok, brokerCount = 3) === Right(ok))
    assert(validate(ok, brokerCount = 2).isLeft) // RF > brokers
    assert(validate(TopicSpec("bad topic!", 3, 1), 3).isLeft)
    assert(validate(TopicSpec("t", 0, 1), 3).isLeft)
    assert(validate(TopicSpec(".", 3, 1), 3).isLeft)  // Kafka reserves . and ..
    assert(validate(TopicSpec("..", 3, 1), 3).isLeft)
    val rf0 = validate(TopicSpec("t", 3, 0), 3)
    assert(rf0.isLeft && rf0.swap.toOption.get.contains(">= 1"),
      "rf<1 must get its own message, not 'exceeds broker count'")
  }

  test("create plan is an idempotent diff and reports partition drift") {
    val desired = desiredTopics(cfg)
    val (firstRun, noDrift) = createPlan(desired, existing = Map.empty)
    assert(firstRun === desired && noDrift.isEmpty)
    val cluster = Map("Zelensky" -> 3, "Putin" -> 12)
    val (plan, drift) = createPlan(desired, cluster)
    assert(plan.map(_.name) === Seq("Biden", "NATO", "NoFlyZone"))
    assert(drift === Seq("Putin: has 12 partitions, config wants 3"))
    // re-running after convergence creates nothing
    val converged = desired.map(s => s.name -> s.partitions).toMap
    assert(createPlan(desired, converged) === (Seq.empty, Seq.empty))
  }
}
