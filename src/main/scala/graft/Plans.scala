package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Plans <queryName> [sfDir]` prints the
  * formatted physical plan — used to confirm pushdown/pruning/broadcast
  * choices survive query edits. */
object Plans {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q04_pricing_summary")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.get(name) match {
      case Some(fn) => fn(spark, sfDir).explain("formatted")
      case None =>
        System.err.println(s"unknown query '$name'; available:\n  " +
          SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
    }
    spark.stop()
  }
}
