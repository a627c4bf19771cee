package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2) demonstrated over the
  * driver testdata; `oracleSql` holds the DuckDB-equivalent SQL for each.
  * Column names and value representations are kept hash-identical between
  * the two engines (fixed-point integer sums, explicit sorts, unique keys).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q_b5_multi_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++ AdtLangQueries.queries ++
      PipelineQueries.queries ++ EventQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++ AdtLangQueries.oracles ++
      PipelineQueries.oracles ++ EventQueries.oracles
}
