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
