package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultiFormatSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Timestamp.valueOf("2022-03-01 10:00:00.123456"), 1.5e-7,
        """{"k": "quoted \"text\", with, commas"}"""),
      (2L, Timestamp.valueOf("2022-03-01 10:00:00.000001"), -0.0,
        "plain"),
      (3L, null.asInstanceOf[Timestamp], Double.MaxValue, null))
      .toDF("id", "ts", "v", "props")
  }

  test("csv/json round trip is row-exact: micros, extreme doubles, quoted JSON strings, nulls") {
    val dir = Files.createTempDirectory("graft_fmt_spec").toString
    val base = fixture
    for (fmt <- MultiFormat.Formats) {
      MultiFormat.write(base, s"$dir/$fmt", fmt)
      val back = MultiFormat.read(spark, s"$dir/$fmt", fmt, base.schema)
      assert(back.count() === 3, fmt)
      assert(base.exceptAll(back).isEmpty && back.exceptAll(base).isEmpty,
        s"$fmt round trip must be exact")
    }
  }

  test("a lossy writer is DETECTED: second-precision timestamps fail the parity check") {
    val dir = Files.createTempDirectory("graft_fmt_lossy").toString
    val base = fixture.filter(col("ts").isNotNull)
    // simulate the default-pattern mistake MultiFormat exists to prevent
    base.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(dir)
    val back = spark.read.schema(base.schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(dir)
    assert(!base.exceptAll(back).isEmpty,
      "micros truncation must surface as a parity failure, not pass silently")
  }

  test("roundTripStats: one-pass parity agrees with exceptAll on equal, surplus, deficit and perturbed sides") {
    val base = fixture
    // equal: exact, and the count is the BACK side's row count
    assert(MultiFormat.roundTripStats(base, base) === ((3L, true)))
    // deficit (a base row missing from back) — must flip exact
    val deficit = base.limit(2)
    assert(MultiFormat.roundTripStats(base, deficit) === ((2L, false)))
    // surplus (a duplicated back row) — multiset-sensitive, must flip
    val surplus = base.unionAll(base.limit(1))
    assert(MultiFormat.roundTripStats(base, surplus) === ((4L, false)))
    // value perturbation — must flip, and agree with the exceptAll oracle
    val perturbed = base.withColumn("v",
      when(col("id") === 1L, col("v") + 1.0).otherwise(col("v")))
    val (n, exact) = MultiFormat.roundTripStats(base, perturbed)
    assert(n === 3L && !exact)
    assert(!(base.exceptAll(perturbed).isEmpty && perturbed.exceptAll(base).isEmpty))
  }

  test("gate row q55: both formats round-trip exact on the corpus") {
    import graft.operators.CoreQueries
    val out = CoreQueries.sourceFormats.run(spark, sf001).collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.getAs[Boolean]("roundtrip_exact"), r.toString))
  }
}
