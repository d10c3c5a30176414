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

  test("saltFactor=1 degenerates to the plain join") {
    import spark.implicits._
    val big = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val small = Seq(("a", "x")).toDF("k", "d")
    val out = Relational.saltedJoin(big, small, Seq("k"), saltFactor = 1).collect()
    assert(out.length === 1)
  }
}
