package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table/column profiling — the preflight every training-data pipeline
  * runs before pointing a job at a new snapshot: per-column null
  * counts, EXACT distinct counts, and min/max (rendered as strings so
  * one report schema covers every column type). A key-column with
  * nulls, a dimension whose distinct count jumped 100×, or a date
  * range extending into the future is caught here, not three stages
  * into a curation DAG.
  *
  * Shape: ONE aggregation pass over the table (all columns' statistics
  * in a single `agg`; Catalyst plans the multiple exact DISTINCTs as
  * one Expand + two-phase aggregate), then a driver-free unpivot of
  * the single result row into the long report. Exact distinct counts
  * are the point of a correctness gate — at 100 TB swap in
  * `approx_count_distinct` per column where ±2% suffices; everything
  * else is identical. */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        // count(when(...)) not sum(when(...)): over ZERO input rows sum
        // aggregates to NULL while count stays 0, so the empty-snapshot
        // profile reports n_nulls = 0 like every other counter
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("e")).select("e.*")
  }
}
