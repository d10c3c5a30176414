package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  test("FFD plan: groups respect the target, oversized isolate, compact files drop") {
    import Compaction.{plan, FileEntry}
    val files = Seq(
      FileEntry("a", 700), FileEntry("b", 300), FileEntry("c", 300),
      FileEntry("d", 200), FileEntry("e", 1500), FileEntry("f", 900))
    val p = plan(files, targetBytes = 1000, minKeepBytes = 800)
    val byGroup = p.groupBy(_.group).values.toSeq
    // every multi-file group fits the target
    byGroup.filter(_.size > 1).foreach { g =>
      assert(g.map(_.bytes).sum <= 1000, s"over-target group $g")
    }
    // the oversized file (1500) and the already-compact file (900)
    // are not rewritten: 1500 forms a single-file group >= minKeep,
    // 900 likewise — both dropped from the plan
    assert(!p.exists(_.path == "e"))
    assert(!p.exists(_.path == "f"))
    // the small files all get compacted
    assert(Seq("a", "b", "c", "d").forall(n => p.exists(_.path == n)))
    // deterministic: same input → same plan
    assert(p === plan(files, 1000, 800))
  }

  test("plan never proposes a 1:1 rewrite") {
    import Compaction.{plan, FileEntry}
    // a lone small file gains nothing from being rewritten alone
    assert(plan(Seq(FileEntry("x", 100)), 1000) === Seq.empty)
    // an already-compact file must not be dragged into a group by a
    // smaller neighbor (the neighbor then has no partner → dropped)
    assert(plan(Seq(FileEntry("big", 900), FileEntry("tiny", 90)),
      targetBytes = 1000, minKeepBytes = 800) === Seq.empty)
  }

  test("compact rewrites many small files into few, content-preserving") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    // 8 micro-batch-sized writes → 8+ small files
    (0 until 8).foreach { i =>
      (i * 100 until (i + 1) * 100).toDF("id")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val files = Compaction.listParquet(spark, dir)
    assert(files.size >= 8, s"expected one file per append, got ${files.size}")

    val assignments = Compaction.plan(files, targetBytes = 64 * 1024)
    val summary = Compaction.compact(spark, assignments, out)
    assert(summary.map(_._2).sum === files.size, "every file assigned exactly once")

    val rewritten = spark.read.parquet(s"$out/part_g*")
    assert(rewritten.count() === 800)
    assert(rewritten.agg(sum(col("id"))).head.getLong(0)
      === (0L until 800L).sum)
    val outFiles = new java.io.File(out).listFiles
      .flatMap(d => Option(d.listFiles).getOrElse(Array.empty))
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles < files.size,
      s"compaction must reduce file count: $outFiles vs ${files.size}")
  }
}
