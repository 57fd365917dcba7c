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
  * the single result row into the long report.
  *
  * The Expand is an AMPLIFIER, not free: N exact-DISTINCT columns make
  * Expand emit N+1 projections of every input row (one per distinct
  * group + one for the plain aggregates), so the first aggregate
  * consumes (N+1)× the row count — the p61 gate's 4-column profile
  * reads every `orders` row 5×. The rows are narrow (each projection
  * nulls out the other columns) and the partial aggregate collapses
  * them map-side, so no shuffle blowup — but the scan-side CPU is
  * genuinely (N+1)×. Exact distinct counts are the point of a
  * correctness gate; at 100 TB use [[profileApprox]] — the HLL++
  * sketch path has no Expand at all (single-pass accumulators), at
  * the cost of `n_distinct` carrying the sketch's rsd. */
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

  /** The documented 100 TB swap, callable (r12 verdict task 5): same
    * one-pass shape and same report schema as [[profile]], but
    * `approx_count_distinct(rsd)` (HyperLogLog++) instead of the exact
    * DISTINCTs. The exact path plans one Expand row per profiled
    * column (an N-column profile scans N× the rows into the first
    * aggregate — fine at gate scale, a real cost at 100 TB); the
    * sketch path has NO Expand at all — every counter is a plain
    * partial-aggregated accumulator, so the whole profile is one
    * map-side-combined pass regardless of column count. The trade is
    * `n_distinct` becoming an estimate with relative standard
    * deviation `rsd` (default 5%); null counts and min/max stay exact.
    * The correctness gate (p61) pins [[profile]] — the oracle needs
    * exact counts; this variant is spec-tested against it. */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profileApprox: need at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"__nd_$c"),
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
