package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus (when SQL-expressible) its DuckDB oracle.
  *
  * The driver's correctness gate runs `run(spark, sfDir)`, dumps the
  * result to parquet, runs `oracle` in DuckDB over the same tables, and
  * hash-compares (columns sorted by name). Queries whose semantics are
  * not ANSI-SQL-expressible (hash-based LSH etc.) carry no oracle and
  * get a weaker rows-only check; those are covered by ScalaTest specs
  * with planted fixtures instead.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  /** Query with a DuckDB oracle. */
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))

  /** Query without an oracle (rows-only driver check + ScalaTest spec). */
  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}
