package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bipartite projection weights, hub-key cap semantics, and the
  * eccentricity probe's exact values. */
class ProjectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("projection: weights count distinct shared keys; minWeight filters") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("k1", "a"), ("k1", "b"), ("k1", "c"),
      ("k2", "a"), ("k2", "b"),
      ("k3", "a"), ("k3", "b"),
      ("k2", "a") // duplicate row: distinct-keys weight, not row count
    ).toDF("k", "item")
    val all = Projection.bipartite(df, "k", "item").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(all == Map(("a", "b") -> 3L, ("a", "c") -> 1L, ("b", "c") -> 1L))
    val w2 = Projection.bipartite(df, "k", "item", minWeight = 2L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(w2 == Seq(("a", "b")))
  }

  test("projection: hub keys above the cap drop entirely") {
    val s = spark; import s.implicits._
    val df = Seq(("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
      ("k", "a"), ("k", "b")).toDF("k", "item")
    val capped = Projection.bipartite(df, "k", "item",
        maxItemsPerKey = Some(3)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // hub (4 items) dropped: only k's pair survives, at weight 1
    assert(capped == Map(("a", "b") -> 1L))
  }

  test("relatedItems: top-k by weight desc then partner asc, per item") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("k1", "a"), ("k1", "b"), ("k2", "a"), ("k2", "b"), // a-b weight 2
      ("k3", "a"), ("k3", "c"),                           // a-c weight 1
      ("k4", "a"), ("k4", "d")                            // a-d weight 1
    ).toDF("k", "item")
    val got = Projection.relatedItems(df, "k", "item", k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got.filter(_._1 == "a") == Set(
      ("a", 1L, "b", 2L), ("a", 2L, "c", 1L)),
      s"a's shortlist wrong: ${got.filter(_._1 == "a")}")
    assert(got.filter(_._1 == "b") == Set(("b", 1L, "a", 2L)))
  }

  test("eccentricity: exact per-source depth and reach on a path + island") {
    val s = spark; import s.implicits._
    val rels = Seq(("r1", "a", "b"), ("r2", "b", "c"), ("r3", "c", "d"),
      ("r4", "x", "y"))
      .toDF("relationship_id", "source_id", "target_id")
    val got = Betweenness.eccentricity(rels, Seq("a", "c", "x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 3L, 4L), ("c", 2L, 4L), ("x", 1L, 2L)))
  }
}
