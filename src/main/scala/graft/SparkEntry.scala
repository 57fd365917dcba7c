package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see SURVEY.md §7 + TESTDATA.md.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2) to a
  * DataFrame program over the driver's parquet tables; `oracleSql` holds the
  * value-identical DuckDB SQL for each (omitted => rows-only check).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_customer_nation_region")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ SparqlQueries.queries ++
      PipelineQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ SparqlQueries.oracles ++
      PipelineQueries.oracles
}
