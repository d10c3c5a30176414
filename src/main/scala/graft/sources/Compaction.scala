package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for a parquet lake — the maintenance job a
  * streaming ingest (TweetIngest writes one file per micro-batch per
  * partition) makes necessary at scale: scans over thousands of tiny
  * files pay per-file open/footer costs and defeat row-group-level
  * parallelism, so lakes are periodically rewritten into
  * target-sized files (the same job every table format ships —
  * OPTIMIZE / rewrite_data_files).
  *
  * Division of labor: the LISTING and the PLAN are driver-side —
  * bounded by the file count, which is exactly the quantity being
  * repaired, and the same shape every production compactor uses (the
  * catalog/manifest is a driver-side structure). The REWRITE is
  * distributed: one spark.read over each group's files, coalesced to
  * one output file per target-sized group.
  */
object Compaction {

  final case class FileEntry(path: String, bytes: Long)
  final case class Assignment(path: String, bytes: Long, group: Int)

  /** Non-recursive parquet listing of one lake directory (one
    * partition directory of a hive-layout lake, or a flat lake). */
  def listParquet(spark: SparkSession, dir: String): Seq[FileEntry] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => FileEntry(s.getPath.toString, s.getLen))
      .sortBy(_.path)
  }

  /** First-fit-decreasing packing into rewrite groups of at most
    * `targetBytes`. Files at or above `minKeepBytes` (default: the
    * target itself — which also covers oversized files, whose
    * splitting is the scan's job via maxPartitionBytes) are already
    * compact and excluded BEFORE packing, and any group that still
    * ends up with a single file is dropped — a 1:1 rewrite is pure
    * write amplification either way. Deterministic: sorted by
    * (bytes desc, path). */
  def plan(files: Seq[FileEntry], targetBytes: Long,
      minKeepBytes: Long = -1L): Seq[Assignment] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val keepAt = if (minKeepBytes >= 0) minKeepBytes else targetBytes
    val used = scala.collection.mutable.ArrayBuffer.empty[Long] // index = group id
    val out = Seq.newBuilder[Assignment]
    files.filter(_.bytes < keepAt)
      .sortBy(f => (-f.bytes, f.path)).foreach { f =>
        val fit = used.indexWhere(_ + f.bytes <= targetBytes)
        val g =
          if (fit < 0) { used += f.bytes; used.size - 1 }
          else { used(fit) += f.bytes; fit }
        out += Assignment(f.path, f.bytes, g)
      }
    val planned = out.result()
    val singles = planned.groupBy(_.group).collect {
      case (g, members) if members.size == 1 => g
    }.toSet
    planned.filterNot(a => singles.contains(a.group))
  }

  /** Execute a plan: each group's files are read as one scan (with
    * schema merging, so a group spanning a mid-stream schema change
    * cannot silently drop a column) and written as one file under
    * `outDir/part_g<group>`; row content is untouched. Group jobs are
    * submitted CONCURRENTLY — `coalesce(1)` collapses a group's read
    * to one task, so cross-group parallelism is where the cluster's
    * cores go. Returns (group, files_in, bytes_in) for audit.
    *
    * Contract: the INPUT files are not touched — a reader of the
    * original lake plus `outDir` would see every compacted row twice.
    * The caller owns the commit: atomically swap (or delete the
    * consumed inputs) only after this returns, the two-rename pattern
    * `AggregateSink`'s store uses. On failure the call waits for ALL
    * group jobs to settle (no orphan writer racing the caller's
    * cleanup), then rethrows the first error with the rest suppressed;
    * `outDir` may hold partial `part_g` dirs and must be discarded. A
    * hung job fails the call at `timeout` with a BOUNDED no-orphan-
    * writer guarantee: a cancelled flag (set before cancellation) is
    * checked both at future entry and again after job-group
    * registration, and the timeout path re-issues the job-group
    * cancel in a loop until every group job settles, so jobs on
    * either queue — still unstarted, or started but not yet
    * registered at the first cancel — are caught. The residual is
    * explicit: if a cancelled rewrite's teardown outlives the 30 s
    * grace, compact() rethrows anyway and the caller's outDir discard
    * may race that teardown's final writes — partial part_g dirs are
    * discard-only either way. */
  def compact(spark: SparkSession, assignments: Seq[Assignment],
      outDir: String,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(1, "hour")): Seq[(Int, Int, Long)] = {
    import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
    import scala.util.{Failure, Success}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val jobGroup = s"graft-compact-$outDir"
    // set BEFORE cancelJobGroup on timeout: a group job still queued on
    // the ExecutionContext at cancel time has no Spark job to cancel
    // yet — without this check it would start (and write into outDir)
    // after the TimeoutException was already rethrown
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val jobs = assignments.groupBy(_.group).toSeq.sortBy(_._1).map {
      case (g, members) => Future {
        if (cancelled.get)
          throw new TimeoutException(s"compaction cancelled before group $g started")
        // job-group membership is thread-local: set it on the future's
        // thread so a timeout can cancel all in-flight group rewrites
        spark.sparkContext.setJobGroup(jobGroup,
          s"compaction of ${members.size} files into part_g$g", true)
        try {
          // re-check AFTER joining the job group: a future that passed
          // the first check concurrently with cancellation either sees
          // the flag here (AtomicBoolean happens-before) or is now
          // cancellable by the timeout path's cancel LOOP below
          if (cancelled.get)
            throw new TimeoutException(s"compaction cancelled before group $g wrote")
          spark.read.option("mergeSchema", "true")
            .parquet(members.map(_.path): _*)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/part_g$g")
          (g, members.size, members.map(_.bytes).sum)
        } finally spark.sparkContext.clearJobGroup()
      }
    }
    val settledF = Future.sequence(jobs.map(_.transform(Success(_))))
    val settled =
      try Await.result(settledF, timeout)
      catch { case e: TimeoutException =>
        cancelled.set(true)
        // cancel in a LOOP until every job settles (bounded grace): a
        // job that passed both flag checks but had not yet registered
        // its job group at an earlier cancel is caught by a later
        // iteration; rethrowing while a writer is live would race the
        // caller's outDir cleanup
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        var settledOk = false
        while (!settledOk && System.nanoTime < deadline) {
          spark.sparkContext.cancelJobGroup(jobGroup)
          try {
            Await.ready(settledF, scala.concurrent.duration.Duration(2, "seconds"))
            settledOk = true
          } catch { case _: TimeoutException => () }
        }
        throw e
      }
    val failures = settled.collect { case Failure(e) => e }
    if (failures.nonEmpty) {
      failures.tail.foreach(failures.head.addSuppressed)
      throw failures.head
    }
    settled.collect { case Success(r) => r }
  }
}
