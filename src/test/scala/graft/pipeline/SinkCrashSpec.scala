package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.serving.ChartQueries

/** Crash-window property over [[CompactingAggregateSink.compact]]'s
  * two-rename swap: a kill injected at EVERY state-changing point of
  * the compaction, in both dedup modes, must leave a store that the
  * next entry point (recover → readBack/append/compact) restores with
  * no history lost. EndToEndSpec covers the happy path; this spec is
  * the adversarial half the r5 verdict asked for — the "staged" label
  * is the window where `path` itself does not exist.
  */
class SinkCrashSpec extends SparkSpec {

  private final case class InjectedCrash(label: String)
    extends RuntimeException(s"injected kill at '$label'")

  private def batch(stamp: String, counts: Long): DataFrame = {
    import spark.implicits._
    Seq(("alpha", 0.5, counts, Timestamp.valueOf(stamp), 1L, 0L, 0L, 0L, 0L, 1L))
      .toDF((Seq("topic", "positivity_rate", "counts", "created_at")
        ++ ChartQueries.emotions): _*)
  }

  /** Raw store content as comparable rows (the lossless criterion for
    * a restored UNCOMPACTED generation is raw-row equality). */
  private def raw(sink: CompactingAggregateSink): Set[(Timestamp, Long)] =
    sink.readBack(spark).collect()
      .map(r => (r.getAs[Timestamp]("created_at"), r.getAs[Long]("counts"))).toSet

  private def served(sink: CompactingAggregateSink, latestWins: Boolean): Set[(Timestamp, Long)] =
    ChartQueries.processData(sink.readBack(spark), latestWins = latestWins)
      .collect()
      .map(r => (r.getAs[Timestamp]("created_at"), r.getAs[Long]("counts"))).toSet

  for {
    latestWins <- Seq(false, true)
    point <- Seq("written", "staged", "published")
  } test(s"kill at '$point' (latestWins=$latestWins) loses nothing") {
    val path = Files.createTempDirectory("sink_crash").toString + "/agg"
    val sink = new CompactingAggregateSink(path, latestWins = latestWins)
    sink.append(batch("2022-03-01 11:00:05", 3L))
    sink.append(batch("2022-03-01 11:40:00", 4L)) // replayed/corrected hour
    sink.append(batch("2022-03-01 12:00:10", 7L))
    val rawBefore = raw(sink)
    val servedBefore = served(sink, latestWins)
    assert(rawBefore.size === 3 && servedBefore.size === 2)

    val crash = intercept[InjectedCrash] {
      sink.compact(spark, label => if (label == point) throw InjectedCrash(label))
    }
    assert(crash.label === point)

    val dir = new java.io.File(path)
    point match {
      case "written" =>
        // store untouched; the complete new generation idles at tmp
        assert(dir.exists())
        assert(raw(sink) === rawBefore)
      case "staged" =>
        // THE window: path itself is gone, previous generation staged
        assert(!dir.exists() && new java.io.File(path + ".old").exists())
        // first touch self-heals: the UNCOMPACTED history is back, raw
        assert(raw(sink) === rawBefore, "staged generation restored losslessly")
        assert(dir.exists(), "recover() republished the store directory")
      case "published" =>
        // new generation live; old generation still staged (cleanup
        // was the killed step) — reads must already serve compacted
        assert(dir.exists())
        assert(raw(sink).size === 2, "compacted generation is what's live")
    }
    assert(served(sink, latestWins) === servedBefore,
      "the serving view survives every crash point")

    // recover() is idempotent, and the next full compaction both
    // completes and clears the staging area
    sink.recover(); sink.recover()
    sink.compact(spark)
    assert(served(sink, latestWins) === servedBefore)
    assert(raw(sink).size === 2)
    assert(!new java.io.File(path + ".old").exists(), "staging area cleared")
    assert(!new java.io.File(path + ".compacting").exists(),
      "tmp consumed by the follow-up compaction")

    // and appends keep working on the healed store
    sink.append(batch("2022-03-01 13:00:00", 9L))
    assert(raw(sink).size === 3)
  }

  test("interleaved append-compact-append keeps every window exactly once (c21's schedule)") {
    def ts(s: String) = Timestamp.valueOf(s)
    val path = Files.createTempDirectory("sink_interleave").toString + "/agg"
    val sink = new CompactingAggregateSink(path)

    // compact a PARTIAL store, then keep appending
    sink.append(batch("2022-03-01 11:00:05", 3L))
    sink.compact(spark)
    assert(raw(sink) === Set((ts("2022-03-01 11:00:05"), 3L)),
      "partial-store compaction must keep its one window")

    sink.append(batch("2022-03-01 12:00:10", 7L))          // new hour
    sink.append(batch("2022-03-01 11:20:00", 9L))          // replay of the COMPACTED hour, later → loses
    sink.compact(spark)
    assert(raw(sink) ===
      Set((ts("2022-03-01 11:00:05"), 3L), (ts("2022-03-01 12:00:10"), 7L)),
      "compacting a compacted-generation ∪ raw-batch store keeps each window once, " +
        "and the replay loses keep-first against the compacted winner")

    // a crash mid-interleave heals and the schedule continues
    intercept[InjectedCrash] {
      sink.append(batch("2022-03-01 13:00:00", 1L))
      sink.compact(spark, l => if (l == "staged") throw InjectedCrash(l))
    }
    sink.append(batch("2022-03-01 14:00:00", 2L)) // first touch recovers
    sink.compact(spark)
    assert(raw(sink).map(_._1) ===
      Set(ts("2022-03-01 11:00:05"), ts("2022-03-01 12:00:10"),
        ts("2022-03-01 13:00:00"), ts("2022-03-01 14:00:00")),
      "no window lost or double-kept across the crash-interrupted interleave")
  }

  for (point <- Seq("written", "staged", "published"))
    test(s"vacuum kill at '$point' self-heals; retention is all-or-nothing") {
      val path = Files.createTempDirectory("sink_vac").toString + "/agg"
      val sink = new CompactingAggregateSink(path)
      sink.append(batch("2022-03-01 11:00:05", 3L)) // pre-cutoff
      sink.append(batch("2022-03-01 12:00:10", 7L)) // survivor
      sink.append(batch("2022-03-01 13:00:00", 9L)) // survivor
      val rawBefore = raw(sink)

      val crash = intercept[InjectedCrash] {
        sink.vacuum(spark, "2022-03-01 12:00:00",
          label => if (label == point) throw InjectedCrash(label))
      }
      assert(crash.label === point)
      // a crashed vacuum leaves either the FULL history or the FULL
      // survivor set — never a partially-dropped store
      val healed = raw(sink)
      assert(healed === rawBefore ||
        healed === rawBefore.filter(_._1.after(Timestamp.valueOf("2022-03-01 11:59:59"))),
        s"crash at '$point' left a partial retention state: $healed")

      // the re-run completes the drop and clears the staging area
      sink.vacuum(spark, "2022-03-01 12:00:00")
      assert(raw(sink).map(_._2) === Set(7L, 9L))
      assert(!new java.io.File(path + ".old").exists())
    }

  for (point <- Seq("written", "staged", "published"))
    test(s"replaceHours kill at '$point' self-heals; the upsert is all-or-nothing") {
      val path = Files.createTempDirectory("sink_upsert").toString + "/agg"
      val sink = new CompactingAggregateSink(path)
      sink.append(batch("2022-03-01 11:00:05", 3L)) // hour being replaced
      sink.append(batch("2022-03-01 12:00:10", 7L)) // untouched hour
      val rawBefore = raw(sink)
      val recomputed = batch("2022-03-01 11:00:05", 5L) // corrected hour 11

      val crash = intercept[InjectedCrash] {
        sink.replaceHours(spark, recomputed,
          label => if (label == point) throw InjectedCrash(label))
      }
      assert(crash.label === point)
      // either the full pre-upsert store or the full post-upsert store —
      // never a store missing hour 11 or holding both versions
      val healed = raw(sink)
      val after = Set((Timestamp.valueOf("2022-03-01 11:00:05"), 5L),
        (Timestamp.valueOf("2022-03-01 12:00:10"), 7L))
      assert(healed === rawBefore || healed === after,
        s"crash at '$point' left a partial upsert: $healed")

      // the re-run lands the replacement exactly once
      sink.replaceHours(spark, recomputed)
      assert(raw(sink) === after)
      assert(!new java.io.File(path + ".old").exists())
    }
}
