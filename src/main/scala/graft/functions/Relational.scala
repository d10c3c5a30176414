package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Small shared relational patterns. */
object Relational {

  /** Append a scalar aggregate of `df` (aliased Column) to every row —
    * the empty-frame-window (`… OVER ()`) alternative that avoids a
    * single-partition WindowExec: the one-row aggregate broadcasts and
    * cross-joins back. Used by every grand-total share / global-mean
    * query. */
  def withGlobal(df: DataFrame, agg: Column): DataFrame =
    df.crossJoin(broadcast(df.agg(agg)))
}
