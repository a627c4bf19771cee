package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling: hand-computed fixtures, fixpoint behavior, and the
  * cascade the fixed-round form must reproduce round by round. */
class KCoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(rows: (String, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst")
  }

  private def nodesOf(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val s = spark; import s.implicits._
    df.select("node").as[String].collect().toSet
  }

  test("triangle with a pendant: 2-core sheds only the pendant") {
    val g = edges(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    assert(nodesOf(KCore.kcore(g, "src", "dst", 2)) == Set("a", "b", "c"))
    assert(nodesOf(KCore.kcore(g, "src", "dst", 1)) == Set("a", "b", "c", "d"))
    assert(nodesOf(KCore.kcore(g, "src", "dst", 3)) == Set.empty[String])
  }

  test("chain cascade: peeling needs multiple rounds, fixpoint finds it") {
    // path a-b-c-d-e: every 2-core round removes the current endpoints;
    // the 2-core is empty, but only after ~|V|/2 rounds of cascade
    val g = edges(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert(nodesOf(KCore.peel(g, "src", "dst", 2, 1)) == Set("b", "c", "d"))
    assert(nodesOf(KCore.peel(g, "src", "dst", 2, 2)) == Set("c"))
    assert(nodesOf(KCore.peel(g, "src", "dst", 2, 3)) == Set.empty[String])
    assert(nodesOf(KCore.kcore(g, "src", "dst", 2)) == Set.empty[String])
  }

  test("K4 plus tail: the 3-core is exactly the clique") {
    val vs = Seq("a", "b", "c", "d")
    val k4 = for { x <- vs; y <- vs if x < y } yield (x, y)
    val g = edges(k4 ++ Seq(("d", "t1"), ("t1", "t2")): _*)
    assert(nodesOf(KCore.kcore(g, "src", "dst", 3)) == vs.toSet)
  }

  test("direction and duplicate edges do not change the core") {
    val g1 = edges(("a", "b"), ("b", "c"), ("c", "a"))
    val g2 = edges(("b", "a"), ("c", "b"), ("a", "c"), ("a", "b"), ("a", "a"))
    assert(nodesOf(KCore.kcore(g1, "src", "dst", 2)) ==
      nodesOf(KCore.kcore(g2, "src", "dst", 2)))
  }

  test("fixed rounds converge onto the fixpoint and stay there") {
    val g = edges(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
      ("e", "c"))
    val fix = nodesOf(KCore.kcore(g, "src", "dst", 2))
    assert(nodesOf(KCore.peel(g, "src", "dst", 2, 10)) == fix)
    assert(nodesOf(KCore.peel(g, "src", "dst", 2, 11)) == fix)
  }
}
