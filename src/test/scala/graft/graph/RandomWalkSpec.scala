package graft.graph

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic walks: structural validity (every transition is an
  * edge), bit-determinism across runs, hand-replayed hash picks, and
  * skip-gram pair extraction. */
class RandomWalkSpec extends AnyFunSuite {

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

  /** JVM-side replay of the engine's pick arithmetic. */
  private def pick(walkId: String, step: Int, node: String, deg: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$walkId:$step:$node".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    hex.take(4).foldLeft(0)((acc, c) =>
      acc * 16 + "0123456789abcdef".indexOf(c)) % deg
  }

  private def walkRows(g: DataFrame, length: Int, perNode: Int = 1) =
    RandomWalk.walks(g, length, perNode).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))

  test("every transition follows an undirected edge; every node starts a walk") {
    val g = rels(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("b", "d"))
    val rows = walkRows(g, length = 5)
    val und = Set("ab", "ba", "bc", "cb", "cd", "dc", "da", "ad", "bd", "db")
    val byWalk = rows.groupBy(_._1).values
    assert(rows.count(_._2 == 0L) == 4) // one walk per node
    byWalk.foreach { w =>
      val path = w.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { p =>
        if (p.length == 2) assert(und(p(0) + p(1)), s"bad hop in ${path.toSeq}")
      }
      assert(path.length == 6) // no dead ends in an undirected graph
    }
  }

  test("walks are bit-deterministic across runs and replay the md5-nibble pick") {
    val g = rels(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"))
    val r1 = walkRows(g, length = 4).sorted
    val r2 = walkRows(g, length = 4).sorted
    assert(r1.sameElements(r2))
    // replay: neighbor lists are dst-sorted; degree from the undirected view
    val adj = Map("a" -> Vector("b", "c"), "b" -> Vector("a", "c", "d"),
      "c" -> Vector("a", "b"), "d" -> Vector("b"))
    r1.groupBy(_._1).foreach { case (wid, steps) =>
      val path = steps.sortBy(_._2).map(_._3)
      path.sliding(2).zipWithIndex.foreach { case (p, i) =>
        if (p.length == 2) {
          val nbrs = adj(p(0))
          assert(p(1) == nbrs(pick(wid, i + 1, p(0), nbrs.size)))
        }
      }
    }
  }

  test("walksPerNode multiplies starts with distinct ids and distinct trajectories allowed") {
    val g = rels(("a", "b"), ("b", "c"), ("c", "a"))
    val rows = walkRows(g, length = 3, perNode = 3)
    assert(rows.count(_._2 == 0L) == 9)
    assert(rows.map(_._1).distinct.length == 9)
  }

  test("skip-gram pairs: window-2 co-occurrence counts on a known corpus") {
    val s = spark; import s.implicits._
    // one fake walk a->b->c->d as explicit rows
    val w = Seq(("w0", 0L, "a"), ("w0", 1L, "b"), ("w0", 2L, "c"),
      ("w0", 3L, "d")).toDF("walk_id", "step", "node")
    val pairs = RandomWalk.skipGramPairs(w, window = 2).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // |i-j|<=2, i!=j: a sees b,c; b sees a,c,d; c sees a,b,d; d sees b,c
    assert(pairs == Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "a") -> 1L, ("b", "c") -> 1L, ("b", "d") -> 1L,
      ("c", "a") -> 1L, ("c", "b") -> 1L, ("c", "d") -> 1L,
      ("d", "b") -> 1L, ("d", "c") -> 1L))
  }
}
