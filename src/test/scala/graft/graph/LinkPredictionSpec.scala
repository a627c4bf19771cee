package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LinkPredictionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("jaccard of neighborhoods: wedge-only candidates, exact ratio") {
    // square 1-2-3-4-1 plus chord neighbor 5 of 1 and 3:
    // N(1)={2,4,5} N(3)={2,4,5} → common 3, union 3 → jaccard 10000
    // N(2)={1,3} N(4)={1,3} → common 2, union 2 → jaccard 10000
    val edges = Seq((1, 2), (2, 3), (3, 4), (4, 1), (1, 5), (5, 3))
      .toDF("src", "dst")
    val got = LinkPrediction.jaccardNeighbors(edges, "src", "dst")
      .orderBy("node_a", "node_b")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // pairs sharing ≥1 neighbor: (1,3) via 2,4,5; (2,4) via 1,3;
    // (2,5),(4,5) via 1 and 3 each; (1,3) NOT (1,2) — no shared neighbor
    assert(got.toSeq == Seq(
      (1, 3, 3L, 10000L),
      (2, 4, 2L, 10000L),
      (2, 5, 2L, 10000L),
      (4, 5, 2L, 10000L)))
  }

  test("duplicate directed edges do not inflate common counts") {
    val edges = Seq((1, 2), (2, 1), (1, 2), (3, 2)).toDF("src", "dst")
    // N(1)={2}, N(3)={2} → common 1 of union 1
    val got = LinkPrediction.jaccardNeighbors(edges, "src", "dst")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, 3, 1L, 10000L)))
  }

  test("maxDegree drops hub centers but keeps hub endpoints' scores exact") {
    // hub 9 connects 1..4; separately 1-2 share low-degree neighbor 7
    val edges = Seq((9, 1), (9, 2), (9, 3), (9, 4), (7, 1), (7, 2))
      .toDF("src", "dst")
    val got = LinkPrediction.jaccardNeighbors(edges, "src", "dst",
        minCommon = 1L, maxDegree = 2L)
      .orderBy("node_a", "node_b")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // wedges through hub 9 (deg 4 > cap) are gone: (1,2) survives only
    // via center 7, its common drops to 1 while degrees in the ratio stay
    // TRUE degrees (N(1)={9,7}, N(2)={9,7}; union 2+2-1 → 3333); pairs
    // like (3,4) whose ONLY shared neighbor was the hub vanish. (7,9)
    // is still found — its centers 1 and 2 are low-degree — with exact
    // score: common {1,2}, union 2+4-2 → 5000.
    assert(got.toSeq == Seq((1, 2, 1L, 3333L), (7, 9, 2L, 5000L)))
  }
}
