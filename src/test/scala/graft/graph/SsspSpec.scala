package graft.graph

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Bounded Bellman-Ford: exact distances on hand-weighted fixtures
  * (weights replayed JVM-side from the same md5-nibble formula),
  * round-bounded reach, monotone convergence, unreachable-node absence. */
class SsspSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rels(rows: (String, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.map { case (a, b) => (s"$a-$b", a, b) }
      .toDF("relationship_id", "source_id", "target_id")
  }

  /** JVM-side replay of the id-derived weight (1..8). */
  private def w(a: String, b: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$a-$b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    1L + "0123456789abcdef".indexOf(hex.head) % 8
  }

  private def dists(g: DataFrame, src: String, rounds: Int): Map[String, Long] =
    Sssp.distances(g, src, rounds).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap

  test("line graph: exact prefix sums of the id-derived weights") {
    val g = rels(("a", "b"), ("b", "c"), ("c", "d"))
    val d = dists(g, "a", rounds = 4)
    assert(d == Map("a" -> 0L, "b" -> w("a", "b"),
      "c" -> (w("a", "b") + w("b", "c")),
      "d" -> (w("a", "b") + w("b", "c") + w("c", "d"))))
  }

  test("cheaper two-hop detour beats a direct edge when weights say so") {
    // a-d direct vs a-b-d detour: whichever is cheaper per the formula,
    // the engine must agree with a JVM-side Dijkstra on the same weights
    val g = rels(("a", "d"), ("a", "b"), ("b", "d"), ("d", "e"))
    val d = dists(g, "a", rounds = 4)
    val best = math.min(w("a", "d"), w("a", "b") + w("b", "d"))
    assert(d("d") == best)
    assert(d("e") == best + w("d", "e"))
  }

  test("round budget bounds hop reach; more rounds only improve") {
    val g = rels(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val d1 = dists(g, "a", rounds = 1)
    assert(d1.keySet == Set("a", "b"))
    val d2 = dists(g, "a", rounds = 2)
    assert(d2.keySet == Set("a", "b", "c"))
    val d4 = dists(g, "a", rounds = 4)
    d2.foreach { case (n, dist) => assert(d4(n) <= dist) }
    assert(d4.keySet == Set("a", "b", "c", "d", "e"))
  }

  test("edges are undirected and other components stay absent") {
    val g = rels(("b", "a"), ("x", "y"))
    val d = dists(g, "a", rounds = 3)
    assert(d.keySet == Set("a", "b")) // reaches b against edge direction
    assert(d("b") == w("b", "a"))
  }

  test("source with distance zero even when isolated in-round") {
    val g = rels(("a", "b"))
    assert(dists(g, "a", rounds = 1)("a") == 0L)
  }
}
