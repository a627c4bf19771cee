package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join: row-identical to the plain join for any hot list,
  * with the hot path actually spread over (key, salt). */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // skewed probe: key 1 carries most rows, N:M multiplicity on key 2
  lazy val probe = ((1 to 40).map(i => (1L, s"p$i")) ++
    Seq((2L, "x"), (2L, "y"), (3L, "z"))).toDF("k", "pv")
  lazy val build = Seq((1L, "b1"), (2L, "b2a"), (2L, "b2b"), (4L, "b4"))
    .toDF("j", "bv")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "pv", "j", "bv").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  lazy val plain = rows(probe.join(build, probe("k") === build("j")))

  test("equals the plain join, duplicates and multiplicity included") {
    val hot = SkewJoin.hotKeys(probe, "k", minCount = 10L)
    assert(hot.as[Long].collect().toSeq == Seq(1L), "only key 1 is hot")
    val got = rows(SkewJoin.join(probe, build, "k", "j", hot, salts = 4))
    assert(got == plain, s"salted join diverged")
  }

  test("any hot list gives the same rows — empty, exact, or wrong") {
    for (hotKeys <- Seq(Seq.empty[Long], Seq(1L, 2L), Seq(3L, 4L),
        Seq(1L, 2L, 3L, 4L, 99L))) {
      val got = rows(SkewJoin.join(probe, build, "k", "j",
        hotKeys.toDF("k"), salts = 3))
      assert(got == plain, s"hot=$hotKeys diverged")
    }
  }

  test("salts=1 degenerates to the plain join result") {
    val got = rows(SkewJoin.join(probe, build, "k", "j",
      Seq(1L).toDF("k"), salts = 1))
    assert(got == plain)
  }

  test("hot path hashes on (key, salt): the salt reaches the join keys") {
    val df = SkewJoin.join(probe, build, "k", "j", Seq(1L).toDF("k"), 4)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
  }

  test("salt is deterministic: reruns produce identical partitioned work") {
    val a = rows(SkewJoin.join(probe, build, "k", "j", Seq(1L).toDF("k"), 4))
    val b = rows(SkewJoin.join(probe, build, "k", "j", Seq(1L).toDF("k"), 4))
    assert(a == b)
  }

  // ---- the graph consumer: TwinGraph.hop with a hot-key spec ----

  /** A hub-shaped twin graph: every floor points at one site twin ("hub"),
    * so both hop legs funnel through a single join key — the shape AQE's
    * split can't rescue once one key exceeds a partition. */
  lazy val hubGraph: graft.graph.TwinGraph = {
    val twins = (Seq(("hub", "dtmi:t:Site;1")) ++
      (1 to 30).map(i => (s"f$i", "dtmi:t:Floor;1")))
      .map { case (id, m) =>
        (id, m, null: String, "2026-01-01T00:00:00Z", s"""{"$$dtId":"$id"}""") }
      .toDF("dt_id", "model_id", "etag", "last_update_time", "properties")
    val rels = ((1 to 30).map(i => (s"r$i", s"f$i", "hub", "located_in")) ++
      Seq(("rx", "hub", "f1", "manages"), ("ry", "f2", "f3", "adjacent")))
      .map { case (rid, s, t, n) => (rid, s, t, n, null: String, "{}") }
      .toDF("relationship_id", "source_id", "target_id",
        "relationship_name", "etag", "properties")
    val models = Seq(
      ("dtmi:t:Site;1", Seq.empty[String], Seq.empty[String], "Site"),
      ("dtmi:t:Floor;1", Seq.empty[String], Seq.empty[String], "Floor"))
      .toDF("id", "bases", "descendants", "display_name")
    graft.graph.TwinGraph(twins, rels, models)
  }

  private def hopRows(df: org.apache.spark.sql.DataFrame) =
    df.select("src_dt_id", "rel_relationship_id", "dst_dt_id").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("skew-aware hop: row- and column-identical to the plain hop") {
    val plain = hopRows(hubGraph.hop(Nil))
    val hot = hubGraph.hubTwinIds(minDegree = 10L)
    assert(hot.collect().map(_.getString(0)).toSeq == Seq("hub"),
      "only the site twin is a measured hub (degree 31)")
    val salted = hubGraph.hop(Nil, hot, salts = 4)
    assert(salted.columns.toSeq == hubGraph.hop(Nil).columns.toSeq,
      "the skew overload must be a drop-in: same columns, same order")
    assert(hopRows(salted) == plain)
    // filtered rel-name variant stays identical too
    assert(hopRows(hubGraph.hop(Seq("located_in"), hot, 4)) ==
      hopRows(hubGraph.hop(Seq("located_in"))))
    // and a stale/wrong hub list only moves rows between paths
    assert(hopRows(hubGraph.hop(Nil, Seq("f2", "nope").toDF("id"), 4)) == plain)
  }

  test("skew-aware hop plan: hub list broadcast, salt on both legs") {
    val df = hubGraph.hop(Nil, hubGraph.hubTwinIds(10L), salts = 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salted key missing:\n$plan")
    assert("BroadcastExchange".r.findAllIn(plan).nonEmpty,
      s"hot list must broadcast, not shuffle:\n$plan")
  }
}
