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

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * an ADT-language query through the full parser → planner → Catalyst
    * path — two JOIN RELATED hops + inheritance-closure membership. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.adt.AdtPlanner
    import graft.graph.GraphViews
    new AdtPlanner(GraphViews.graph(spark, "/root/testdata/sf0.001")).run(
      "SELECT C.$dtId AS member_id, R.name AS region_name FROM DIGITALTWINS C " +
        "JOIN N RELATED C.located_in JOIN R RELATED N.in_region " +
        "WHERE R.name = 'ASIA' AND IS_OF_MODEL(C, 'dtmi:graft:Customer;1', exact)")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++ AdtLangQueries.queries ++
      PipelineQueries.queries ++ EventQueries.queries ++ StoreQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++ AdtLangQueries.oracles ++
      PipelineQueries.oracles ++ EventQueries.oracles ++ StoreQueries.oracles
}
