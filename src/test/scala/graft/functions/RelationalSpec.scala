package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("saltedJoin: identical results to the plain join under planted skew") {
    import spark.implicits._
    // 90% of the big side lands on one key — the classic hot-key shape
    val big = (0 until 5000)
      .map(i => (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
      .toDF("k", "payload")
    val small = Seq(("HOT", "hot_dim"), ("k0", "d0"), ("k3", "d3"), ("miss", "dx"))
      .toDF("k", "dim")

    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = Relational.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "payload", "dim").collect().toSet
    assert(salted === plain, "salting must be invisible in the result")
    assert(salted.nonEmpty)
  }

  test("saltedJoin spreads the hot key across salt groups") {
    import spark.implicits._
    val big = (0 until 5000).map(i => ("HOT", i.toLong)).toDF("k", "payload")
    // the salt column is internal; observe the spread through the same
    // construction the join uses
    val spread = big
      .withColumn("s", (rand(42L) * 8).cast("int"))
      .groupBy("s").count().collect()
    assert(spread.length === 8, "all salt values must be populated at this volume")
    val max = spread.map(_.getLong(1)).max
    assert(max < 5000 * 0.25,
      s"no salt bucket may hold a quarter of the hot key's rows, got $max")
  }

  test("q60 advisory drives q58's salt decision: flag set == joins where salting shrinks the hot reducer") {
    import spark.implicits._
    import graft.operators.CoreQueries
    // planted corpus: one group with a 90%-hot key, one uniform group
    val hot = (0 until 2000).map(i =>
      ("hot", if (i % 10 == 0) i.toLong else 0L))
    val uni = (0 until 2000).map(i => ("uni", (i % 400).toLong))
    val events = (hot ++ uni).toDF("event_type", "user_id")

    val report = CoreQueries.skewAdvisoryReport(events).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(report("hot").getAs[Boolean]("needs_salt_exact"),
      "the planted hot key must be flagged")
    assert(!report("uni").getAs[Boolean]("needs_salt_exact"),
      "the uniform group must stay quiet")
    assert(report.values.forall(_.getAs[Boolean]("advisory_agrees")),
      "sketch tier must reach the exact tier's decision")

    val dim = (0 until 400).map(i => (i.toLong, s"d$i")).toDF("user_id", "dim")
    Seq("hot", "uni").foreach { t =>
      val fact = events.filter(col("event_type") === t).select("user_id")
      val (joined, salted) =
        CoreQueries.advisedJoin(fact, dim, Seq("user_id"), saltFactor = 8)
      // the ACTED-ON decision equals the advisory flag
      assert(salted === report(t).getAs[Boolean]("needs_salt_est"),
        s"decision for '$t' must equal the advisory flag")
      // the join result is decision-invariant (q58's gate, both modes)
      val plain = fact.join(dim, Seq("user_id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(joined.collect().map(r => (r.getLong(0), r.getString(1))).toSet
        === plain, s"'$t': salting must be invisible in the result")

      val maxKey = fact.groupBy("user_id").count()
        .agg(max("count")).head().getLong(0)
      if (salted) {
        // the consequence the flag predicts: salting shrinks the max
        // per-(key, salt) reducer load by >= the advisory threshold
        val maxSalted = fact
          .withColumn("s", (rand(42L) * 8).cast("int"))
          .groupBy("user_id", "s").count()
          .agg(max("count")).head().getLong(0)
        assert(maxSalted * CoreQueries.SkewSaltThreshold <= maxKey,
          s"flagged '$t': salting must shrink the hot reducer " +
            s">= ${CoreQueries.SkewSaltThreshold}x (max $maxKey -> $maxSalted)")
      } else {
        // the quiet flag is correct: the max key load is already
        // within threshold of the mean — salting would buy nothing
        val meanKey = fact.groupBy("user_id").count()
          .agg(avg("count")).head().getDouble(0)
        assert(maxKey <= CoreQueries.SkewSaltThreshold * meanKey,
          s"unflagged '$t': no reducer is ${CoreQueries.SkewSaltThreshold}x the mean")
      }
    }
  }

  test("advisedJoin: empty probe side means no skew evidence -> plain join, no throw") {
    import spark.implicits._
    import graft.operators.CoreQueries
    val big = Seq.empty[(Long, String)].toDF("user_id", "payload")
    val dim = Seq((1L, "d1")).toDF("user_id", "dim")
    val (joined, salted) = CoreQueries.advisedJoin(big, dim, Seq("user_id"))
    assert(!salted, "an empty advisory relation must default to a plain join")
    assert(joined.count() === 0L)
  }

  test("graft_eq_count matches the HOF fold it replaces, incl. null semantics") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 9L, 3L)), // 2 equal
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)), // null != null
      (Seq[java.lang.Long](5L), Seq[java.lang.Long](5L, 5L)) // shorter side bounds
    ).toDF("a", "b")
    val native = df.select(call_function("graft_eq_count", col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    val hof = df.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x))
      .collect().map(_.getInt(0)).toSeq
    assert(native === Seq(2, 2, 1))
    assert(native === hof, "native kernel must agree with the HOF formulation")
    val withNullArr = Seq((null.asInstanceOf[Seq[Long]], Seq(1L))).toDF("a", "b")
      .select(call_function("graft_eq_count", col("a"), col("b")))
    assert(withNullArr.collect().head.isNullAt(0))
  }

  test("saltFactor=1 degenerates to the plain join") {
    import spark.implicits._
    val big = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val small = Seq(("a", "x")).toDF("k", "d")
    val out = Relational.saltedJoin(big, small, Seq("k"), saltFactor = 1).collect()
    assert(out.length === 1)
  }
}
