package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer micro-unit PageRank: hand-computed fixtures + invariants. */
class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(rows: (String, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("source_id", "target_id")
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    PageRank.ranks(df, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap

  test("star graph, one iteration, hand-computed micro-units") {
    // a, b, c all point at hub; hub points nowhere.
    val g = edges(("a", "hub"), ("b", "hub"), ("c", "hub"))
    val r = ranksOf(g, 1)
    // leaves receive no contributions: 150000 + 0
    assert(r("a") == 150000L && r("b") == 150000L && r("c") == 150000L)
    // hub: 150000 + 85% of (3 × 1000000 div 1) = 150000 + 2550000
    assert(r("hub") == 2700000L, s"hub ${r("hub")}")
  }

  test("out-degree splits contributions with integer division") {
    // a -> {b, c}: each gets 1000000 div 2 = 500000 in round 1.
    val g = edges(("a", "b"), ("a", "c"))
    val r = ranksOf(g, 1)
    assert(r("b") == 150000L + 85L * 500000L / 100L)
    assert(r("b") == r("c"))
    assert(r("a") == 150000L)
  }

  test("two-node cycle is a fixpoint of the damped update") {
    // a <-> b: each node always receives the other's full rank.
    val g = edges(("a", "b"), ("b", "a"))
    val r1 = ranksOf(g, 1)
    assert(r1("a") == 1000000L && r1("b") == 1000000L,
      s"cycle must self-reproduce: $r1")
    val r5 = ranksOf(g, 5)
    assert(r5 == r1, "fixpoint must be iteration-count independent")
  }

  test("iterations refine ranks deterministically; reruns are identical") {
    val g = edges(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"))
    val once = ranksOf(g, 3)
    val again = ranksOf(g, 3)
    assert(once == again, "bit-identical across runs")
    // hand-traced micro-units after 3 synchronous rounds: d's extra mass
    // enters at a in round 1 and pulses around the cycle to c by round 3
    assert(once == Map("a" -> 1127500L, "b" -> 1108375L,
      "c" -> 1614125L, "d" -> 150000L), s"got $once")
  }

  test("personalized: mass stays near the seed, off-seed islands score zero") {
    // chain s -> m -> f plus a disconnected island x -> y; seed = {s}.
    // N = 5, so seed init = 5,000,000 and per-round seed teleport 750,000.
    val g = edges(("s", "m"), ("m", "f"), ("x", "y"))
    def ppr(k: Int) = PageRank.personalizedRanks(g, Seq("s"), k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val r1 = ppr(1)
    // round 1: m gets 85% of s's 5,000,000; f and the island get nothing
    assert(r1("s") == 750000L, s"got $r1")
    assert(r1("m") == 85L * 5000000L / 100L)
    assert(r1("f") == 0L && r1("x") == 0L && r1("y") == 0L)
    val r2 = ppr(2)
    // round 2: the pulse reaches f (85% of m's round-1 mass); the island
    // still holds zero — self-endorsing spam cannot manufacture trust
    assert(r2("f") == 85L * r1("m") / 100L, s"got $r2")
    assert(r2("x") == 0L && r2("y") == 0L)
    // determinism + seed validation
    assert(ppr(2) == ppr(2))
    intercept[IllegalArgumentException](
      PageRank.personalizedRanks(g, Nil, 1))
  }
}
