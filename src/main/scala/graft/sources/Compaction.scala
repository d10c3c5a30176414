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

  /** First-fit-decreasing packing of files into rewrite groups of at
    * most `targetBytes` (an already-oversized file gets its own group
    * — splitting it is the scan's job via maxPartitionBytes, not the
    * compactor's). Deterministic: sorted by (bytes desc, path). A
    * group with a single file at or above `minKeepBytes` is already
    * compact and is dropped from the plan (rewriting it would be pure
    * write amplification). */
  def plan(files: Seq[FileEntry], targetBytes: Long,
      minKeepBytes: Long = 0L): Seq[Assignment] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val out = Seq.newBuilder[Assignment]
    files.sortBy(f => (-f.bytes, f.path)).foreach { f =>
      val fit = groups.indexWhere { case (used, _) => used + f.bytes <= targetBytes }
      val g =
        if (f.bytes >= targetBytes || fit < 0) {
          groups += ((f.bytes, groups.size)); groups.size - 1
        } else {
          groups(fit) = (groups(fit)._1 + f.bytes, groups(fit)._2); fit
        }
      out += Assignment(f.path, f.bytes, g)
    }
    val planned = out.result()
    val singles = planned.groupBy(_.group).collect {
      case (g, members) if members.size == 1 && members.head.bytes >= minKeepBytes => g
    }.toSet
    planned.filterNot(a => singles.contains(a.group))
  }

  /** Execute a plan: each group's files are read as one distributed
    * scan and written as one file under `outDir/part_g<group>`. The
    * read-side schema is the lake's own; row content is untouched.
    * Returns (group, files_in, bytes_in) for audit. */
  def compact(spark: SparkSession, assignments: Seq[Assignment],
      outDir: String): Seq[(Int, Int, Long)] =
    assignments.groupBy(_.group).toSeq.sortBy(_._1).map { case (g, members) =>
      spark.read.parquet(members.map(_.path): _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/part_g$g")
      (g, members.size, members.map(_.bytes).sum)
    }
}
