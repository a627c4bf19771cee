package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality-aware dedup survivor rule: highest score wins its cluster,
  * ties break to the lowest id, singletons always survive. */
class KeepBestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("keepBest picks the max-score member per cluster, min id on ties") {
    // clusters: {1,2,3} (chain via pairs), {4,5}, singleton {6}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L), // 2 and 3 tie at 50 → 2 wins
      (4L, 7L), (5L, 9L),              // 5 wins
      (6L, 1L)                         // singleton survives
    ).toDF("doc_id", "score")
    val got = Dedup.keepBest(docs, "doc_id", "score", pairs)
      .select(col("doc_id"), col("component"))
      .orderBy(col("doc_id"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq(2L -> 1L, 5L -> 4L, 6L -> 6L), s"got $got")
  }

  test("keepBest output keeps score columns and is one row per cluster") {
    val pairs = Seq((10L, 11L)).toDF("doc_a", "doc_b")
    val docs = Seq((10L, 3L), (11L, 4L), (12L, 5L)).toDF("doc_id", "score")
    val out = Dedup.keepBest(docs, "doc_id", "score", pairs)
    assert(out.columns.toSeq == Seq("doc_id", "score", "component"))
    val comps = out.select("component").as[Long].collect().toSeq
    assert(comps.distinct.size == comps.size, "one survivor per cluster")
    assert(out.count() == 2)
  }
}
