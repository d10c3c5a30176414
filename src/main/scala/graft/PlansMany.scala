package graft

/** Dev tool: dump `explain("formatted")` for several registry queries in
  * one JVM — `runMain graft.PlansMany <name,name,...> <outDir> [suffix] [sfDir]`
  * writes `<outDir>/<name>_<suffix>.txt` per query (the optimization
  * round's before/after plan evidence, without one sbt launch per row).
  */
object PlansMany {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("").split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = args.lift(1).getOrElse(sys.error("usage: PlansMany <names> <outDir> [suffix] [sfDir]"))
    val suffix = args.lift(2).getOrElse("before")
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"[plans] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
