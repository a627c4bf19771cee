package graft.store

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraphViews

/** Storage layout: partition pruning on model_id, point-lookup pushdown on
  * dt_id, merge/delete semantics, bucketed traversal join without a
  * shuffle on the probe side. */
class GraphStoreSpec extends AnyFunSuite {

  lazy val warehouse: String = Files.createTempDirectory("graft-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val dir: String = Files.createTempDirectory("graft-store").toString
  lazy val graph = GraphViews.graph(spark, "/root/testdata/sf0.001")

  test("write/read round-trip preserves the graph") {
    GraphStore.write(graph, dir)
    val back = GraphStore.read(spark, dir)
    assert(back.twins.count() == graph.twins.count())
    assert(back.relationships.count() == graph.relationships.count())
    assert(back.twins.columns.toSeq ==
      Seq("dt_id", "model_id", "etag", "last_update_time", "properties"))
  }

  test("model filter prunes partitions; dt_id lookup pushes filters") {
    GraphStore.write(graph, dir)
    val back = GraphStore.read(spark, dir)
    val byModel = back.twins.filter(col("model_id") === GraphViews.Nation)
    val planText = byModel.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters") &&
      planText.contains("model_id"), s"no partition pruning in:\n$planText")
    val point = back.twins.filter(col("dt_id") === "N3")
    val pointPlan = point.queryExecution.executedPlan.toString
    assert(pointPlan.contains("PushedFilters") && pointPlan.contains("dt_id"))
    assert(point.count() == 1)
  }

  test("mergeTwins upserts; deleteTwins removes") {
    import spark.implicits._
    val upsert = Seq(
      ("N3", GraphViews.Nation, null: String, "2026-02-02T00:00:00Z", """{"name":"UPDATED"}"""),
      ("NEW1", GraphViews.Nation, null: String, "2026-02-02T00:00:00Z", """{"name":"New"}"""))
      .toDF("dt_id", "model_id", "etag", "last_update_time", "properties")
    val merged = GraphStore.mergeTwins(graph.twins, upsert)
    assert(merged.count() == graph.twins.count() + 1)
    assert(merged.filter($"dt_id" === "N3").select("properties")
      .collect()(0).getString(0).contains("UPDATED"))
    val afterDelete = GraphStore.deleteTwins(merged, Seq("N3", "NEW1").toDF("dt_id"))
    assert(afterDelete.count() == graph.twins.count() - 1)
  }

  test("B4 hop query over the bucketed store elides the first-join shuffles") {
    // The actual q_b4_single_hop pipeline (hop + groupBy agg), planned over
    // the bucketed catalog tables vs the plain parquet layout. The first
    // hop join (src_dt_id = rel_source_id) finds both scans already
    // hash-distributed on the join key — EnsureRequirements inserts no
    // Exchange under it; the parquet layout shuffles both sides. The
    // remaining Exchanges (second-join probe side, final aggregation) are
    // inherent to the query, so the assertion is relative: bucketed plan
    // carries at least two fewer Exchanges AND its scans are bucketed.
    val dbLoc = Files.createTempDirectory("graft-db-b4").toString
    spark.sql("DROP DATABASE IF EXISTS graftb4 CASCADE")
    spark.sql(s"CREATE DATABASE graftb4 LOCATION '$dbLoc'")
    GraphStore.writeBucketedTables(graph, "graftb4", buckets = 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def b4(g: graft.graph.TwinGraph) = g.hop(Seq("located_in"))
        .groupBy(col("dst_dt_id"), col("src_model_id"))
        .agg(count(lit(1)).as("n"))
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
      val bucketed = b4(GraphStore.readBucketedTables(spark, "graftb4"))
      val plain = b4(graph)
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(bPlan.contains("SelectedBucketsCount") || bPlan.contains("Bucketed"),
        s"scans not bucketed in:\n$bPlan")
      assert(exchanges(bucketed) <= exchanges(plain) - 2,
        s"bucketing saved no shuffles: bucketed=${exchanges(bucketed)} " +
          s"plain=${exchanges(plain)}\n$bPlan")
      // same answer through either layout
      assert(bucketed.count() == plain.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed tables join without shuffling either side") {
    // the suite may share a session whose warehouse conf differs — pin the
    // database (and so its managed tables) to a fresh temp location
    val dbLoc = Files.createTempDirectory("graft-db").toString
    spark.sql("DROP DATABASE IF EXISTS graftdb CASCADE")
    spark.sql(s"CREATE DATABASE graftdb LOCATION '$dbLoc'")
    GraphStore.writeBucketedTables(graph, "graftdb", buckets = 4)
    // force the sort-merge path (at real scale neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("graftdb.twins")
      val r = spark.table("graftdb.relationships")
      val joined = r.join(t, r("source_id") === t("dt_id"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides bucketed on the join key by the same count → no Exchange
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == graph.relationships.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
