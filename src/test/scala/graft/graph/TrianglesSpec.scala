package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Degree-oriented triangle counting: hand-computed fixtures, direction /
  * duplicate / self-loop normalization, and the orientation-bound shape. */
class TrianglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(rows: (String, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst")
  }

  private def perNodeMap(df: org.apache.spark.sql.DataFrame) =
    Triangles.perNode(df, "src", "dst").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap

  test("single triangle counts once, every corner credited") {
    val g = edges(("a", "b"), ("b", "c"), ("c", "a"))
    assert(Triangles.total(g, "src", "dst") == 1L)
    assert(perNodeMap(g) == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("direction, duplicates, and self-loops are normalized away") {
    // same triangle stated with reversed edges, a duplicate, and a loop
    val g = edges(("b", "a"), ("b", "c"), ("a", "c"), ("c", "a"), ("a", "a"))
    assert(Triangles.total(g, "src", "dst") == 1L)
  }

  test("K4 has four triangles; each node sits in three") {
    val vs = Seq("a", "b", "c", "d")
    val g = edges((for { x <- vs; y <- vs if x < y } yield (x, y)): _*)
    assert(Triangles.total(g, "src", "dst") == 4L)
    assert(perNodeMap(g) == vs.map(_ -> 3L).toMap)
  }

  test("triangle-free graphs report zero rows for every node") {
    // a path and a star: bipartite pieces, no triangles
    val g = edges(("a", "b"), ("b", "c"), ("c", "d"), ("hub", "x"),
      ("hub", "y"), ("hub", "z"))
    assert(Triangles.total(g, "src", "dst") == 0L)
    val pn = perNodeMap(g)
    assert(pn.size == 8 && pn.values.forall(_ == 0L), s"got $pn")
  }

  test("hub sharing two cliques: counts stay per-triangle exact") {
    // two K3s glued at h (h-a-b, h-c-d) plus chord a-c, which closes a
    // third triangle {h,a,c} through the shared hub
    val g = edges(("h", "a"), ("h", "b"), ("a", "b"),
      ("h", "c"), ("h", "d"), ("c", "d"), ("a", "c"))
    assert(Triangles.total(g, "src", "dst") == 3L)
    val pn = perNodeMap(g)
    assert(pn == Map("h" -> 3L, "a" -> 2L, "c" -> 2L, "b" -> 1L, "d" -> 1L))
  }

  test("enumerate yields each triangle exactly once in orientation order") {
    val vs = Seq("a", "b", "c", "d", "e")
    val g = edges((for { x <- vs; y <- vs if x < y } yield (x, y)): _*)
    val tri = Triangles.enumerate(g, "src", "dst").collect()
      .map(r => Set(r.getString(0), r.getString(1), r.getString(2)))
    assert(tri.length == 10, s"K5 has C(5,3)=10 triangles, got ${tri.length}")
    assert(tri.distinct.length == 10, "no triangle may repeat")
  }
}
