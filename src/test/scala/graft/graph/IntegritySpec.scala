package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Referential-integrity audit: every defect class detected on a
  * deliberately broken fixture; all-zero on a healthy one. */
class IntegritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def graph(twinIds: Seq[String],
                    rels: Seq[(String, String, String)]): TwinGraph = {
    val s = spark; import s.implicits._
    val twins = twinIds.map(id => (id, "dtmi:x;1")).toDF("dt_id", "model_id")
    val relationships = rels
      .map { case (id, a, b) => (id, a, b, "knows") }
      .toDF("relationship_id", "source_id", "target_id", "relationship_name")
    TwinGraph(twins, relationships,
      Seq.empty[(String, String)].toDF("id", "display_name"))
  }

  private def report(g: TwinGraph): Map[String, Long] =
    g.integrityReport().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap

  test("healthy graph reports zeros beyond the edge count") {
    val m = report(graph(Seq("a", "b", "c"),
      Seq(("r1", "a", "b"), ("r2", "b", "c"))))
    assert(m == Map("n_rels" -> 2L, "n_dangling_source" -> 0L,
      "n_dangling_target" -> 0L, "n_self_loops" -> 0L,
      "n_duplicate_ids" -> 0L))
  }

  test("each defect class is counted: dangling ends, loop, duplicate id") {
    val m = report(graph(Seq("a", "b"), Seq(
      ("r1", "a", "b"),      // fine
      ("r2", "ghost", "b"),  // dangling source
      ("r3", "a", "gone"),   // dangling target
      ("r4", "a", "a"),      // self-loop
      ("r1", "b", "a"))))    // duplicate relationship id
    assert(m("n_rels") == 5L)
    assert(m("n_dangling_source") == 1L)
    assert(m("n_dangling_target") == 1L)
    assert(m("n_self_loops") == 1L)
    assert(m("n_duplicate_ids") == 1L)
  }
}
