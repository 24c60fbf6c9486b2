package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{EngineQueries, LlmQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): one entry
  * per implemented operator, each taking (session, sf-dir) and returning
  * a DataFrame the driver hash-compares against `oracleSql` run in
  * DuckDB over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ LlmQueries.queries ++ EngineQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ LlmQueries.oracleSql ++ EngineQueries.oracleSql
}
