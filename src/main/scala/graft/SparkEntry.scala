package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.operators.*` as [[GraftQuery]] values;
  * this object only assembles the registry the driver consumes.
  */
object SparkEntry {

  private def registry: Seq[GraftQuery] =
    operators.CoreQueries.all ++
      operators.TextOps.all ++
      operators.CurationOps.all ++
      operators.DedupOps.all ++
      operators.SimilarityOps.all ++
      operators.TemporalOps.all ++
      operators.LayoutOps.all ++
      operators.VectorOps.all ++
      operators.MultimodalOps.all ++
      operators.ServingQueries.all ++
      operators.ChartRegistry.all ++
      streaming.StreamReplay.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full reference pipeline — classify → positivity ⋈
    * pivoted emotion histogram — exercises more of the engine than any
    * single aggregate. */
  def entry(spark: SparkSession): DataFrame =
    operators.ServingQueries.pipelineAggregateQ.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a name collision would silently shadow a row in this map — the
    // gate would then never run the shadowed query and the registry
    // count would still look right. Fail loudly instead.
    val dupes = registry.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate registry names: ${dupes.mkString(", ")}")
    registry.map(q => q.name -> q.run).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
