package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** K-truss peeling against a JVM brute-force triangle counter: clique
  * survival, triangle-free death, cascade peeling, support values. */
class KTrussSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(rows: (String, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst")
  }

  private def peelSet(g: DataFrame, k: Int, rounds: Int): Set[(String, String)] =
    KTruss.peel(g, k, rounds).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  /** Brute-force k-truss to fixpoint. */
  private def oracle(rows: Seq[(String, String)], k: Int): Set[(String, String)] = {
    var e = rows.map { case (x, y) => if (x < y) (x, y) else (y, x) }
      .filter(p => p._1 != p._2).distinct.toSet
    var changed = true
    while (changed) {
      val adj = e.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
        .groupBy(_._1).map { case (n, v) => n -> v.map(_._2) }
      val kept = e.filter { case (a, b) =>
        (adj(a).intersect(adj(b))).size >= k - 2
      }
      changed = kept != e
      e = kept
    }
    e
  }

  test("a 4-clique is a 4-truss; a pendant edge peels off") {
    val g = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("d", "e"))
    assert(peelSet(edges(g: _*), k = 4, rounds = 3) == oracle(g, 4))
    assert(oracle(g, 4) == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
  }

  test("a triangle-free cycle dies entirely at k=3") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    assert(peelSet(edges(g: _*), k = 3, rounds = 1).isEmpty)
  }

  test("cascade: removing one edge's support peels its dependents next round") {
    // two triangles sharing edge (b,c) plus a tail triangle hanging off d:
    // at k=4 (support >= 2) only the shared edge has support 2 initially,
    // but its two triangles' outer edges have support 1 -> everything
    // cascades away at fixpoint
    val g = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"))
    assert(peelSet(edges(g: _*), k = 4, rounds = 3) == oracle(g, 4))
    assert(oracle(g, 4).isEmpty)
  }

  test("supports: exact per-edge triangle counts including zero") {
    val g = edges(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
    val sup = KTruss.supports(
        g.select(org.apache.spark.sql.functions.least(
          org.apache.spark.sql.functions.col("src"),
          org.apache.spark.sql.functions.col("dst")).as("a"),
          org.apache.spark.sql.functions.greatest(
            org.apache.spark.sql.functions.col("src"),
            org.apache.spark.sql.functions.col("dst")).as("b")))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(sup == Map(("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "c") -> 1L, ("c", "d") -> 0L))
  }

  test("seeded pseudo-random graph matches the fixpoint oracle") {
    val n = 12
    val g = for {
      i <- 0 until n; j <- (i + 1) until n
      if (i * 17 + j * 23 + i * j) % 4 == 0
    } yield (f"n$i%02d", f"n$j%02d")
    // enough rounds to reach fixpoint on 12 nodes
    assert(peelSet(edges(g: _*), k = 4, rounds = 6) == oracle(g, 4))
  }
}
