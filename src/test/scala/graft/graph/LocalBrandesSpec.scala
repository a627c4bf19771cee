package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Parity spec for the Brandes-family driver bottom-out
  * ([[LocalBrandes]]): centrality / harmonic / eccentricity /
  * approximate over seeded pseudo-random graphs must be BIT-IDENTICAL
  * between the local solve (default cutoff) and the distributed rounds
  * (`spark.graft.graph.localSolveMaxEdges=0`) — micro-unit integers, so
  * equality is exact, not approximate. Also checks the strict-depth
  * guard fires on both paths. */
class LocalBrandesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Knob = "spark.graft.graph.localSolveMaxEdges"

  private def bothPaths[A](body: => A): (A, A) = {
    spark.conf.unset(Knob)
    val local = body
    spark.conf.set(Knob, "0")
    try { val dist = body; (local, dist) }
    finally spark.conf.unset(Knob)
  }

  private def rels(rows: Seq[(String, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("source_id", "target_id")
  }

  /** Seeded sparse graph with equal-shortest-path structure (rings +
    * chords), the shape that exercises sigma > 1. */
  private def fixture(n: Int, seed: Int): Seq[(String, String)] = {
    val ring = (0 until n).map(i => (f"v$i%02d", f"v${(i + 1) % n}%02d"))
    val chords = for {
      i <- 0 until n
      h = (i * 13 + seed * 5) % 7 if h == 0
    } yield (f"v$i%02d", f"v${(i * 3 + seed) % n}%02d")
    (ring ++ chords).filter(p => p._1 != p._2)
  }

  test("centrality: local == distributed on seeded graphs") {
    for (seed <- 1 to 3) {
      val g = fixture(16, seed)
      val sources = Seq("v00", "v05", "v11")
      val (local, dist) = bothPaths {
        Betweenness.centrality(rels(g), sources, maxDepth = 15)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      }
      assert(local == dist, s"seed $seed")
    }
  }

  test("harmonic: local == distributed") {
    for (seed <- 1 to 3) {
      val g = fixture(14, seed)
      val (local, dist) = bothPaths {
        Betweenness.harmonic(rels(g), Seq("v01", "v07"), maxDepth = 15)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      }
      assert(local == dist, s"seed $seed")
    }
  }

  test("eccentricity: local == distributed, incl. absent source") {
    val g = fixture(12, 2)
    val (local, dist) = bothPaths {
      Betweenness.eccentricity(rels(g), Seq("v00", "v06", "zz"), maxDepth = 15)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(local == dist)
    // the absent source reaches only itself on both paths
    assert(local.contains(("zz", 0L, 1L)))
  }

  test("approximate: local == distributed (same sampled sources)") {
    val g = fixture(15, 4)
    val (local, dist) = bothPaths {
      Betweenness.approximate(rels(g), k = 4, seed = "s", maxDepth = 15)
        .collect().map(r => (r.getString(0), r.get(1))).toSet
    }
    assert(local == dist)
  }

  test("disconnected pieces: harmonic zeros and per-component ecc agree") {
    val g = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    val (local, dist) = bothPaths {
      (Betweenness.harmonic(rels(g), Seq("a", "x"), maxDepth = 8)
         .collect().map(r => (r.getString(0), r.getLong(1))).toSet,
       Betweenness.eccentricity(rels(g), Seq("a", "x"), maxDepth = 8)
         .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
    }
    assert(local == dist)
  }

  test("strict depth-cap guard fires on both paths") {
    // a 10-chain from v0: BFS still has a non-empty frontier at depth 3
    val chain = (0 until 10).map(i => (s"c$i", s"c${i + 1}"))
    val (local, dist) = bothPaths {
      intercept[IllegalStateException](
        Betweenness.centrality(rels(chain), Seq("c0"), maxDepth = 3))
        .getMessage
    }
    assert(local.contains("still expanding") && local == dist)
  }
}
