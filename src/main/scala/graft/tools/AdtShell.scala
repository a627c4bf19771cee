package graft.tools

import org.apache.spark.sql.SparkSession
import graft.adt.AdtPlanner
import graft.graph.GraphViews

/** CLI: run an ADT query against the testdata-derived place graph.
  *
  *   sbt "runMain graft.tools.AdtShell <sfDir> <adt query>"
  *
  * Prints the result rows (up to 20) and the formatted physical plan —
  * the quickest way to eyeball whether a query's plan broadcast/pruned the
  * way it should.
  */
object AdtShell {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val query = if (args.length > 1) args.drop(1).mkString(" ")
      else "SELECT COUNT() FROM DIGITALTWINS"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = new AdtPlanner(GraphViews.graph(spark, sfDir)).run(query)
      df.show(20, truncate = false)
      df.explain("formatted")
    } catch {
      case e: Exception => println(s"QUERY ERROR: ${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally spark.stop()
  }
}
