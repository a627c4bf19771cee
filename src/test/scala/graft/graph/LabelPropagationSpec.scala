package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** LPA: two dense cliques bridged by one edge split into two
  * communities; determinism across runs; symmetrization; convergence
  * on a star. */
class LabelPropagationSpec extends AnyFunSuite {

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

  private def run(g: DataFrame, rounds: Int): Map[String, Long] =
    LabelPropagation.communities(g, rounds).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap

  private def clique(ids: Seq[String]): Seq[(String, String)] =
    for { a <- ids; b <- ids if a < b } yield (a, b)

  test("two cliques joined by a bridge resolve to two communities") {
    val left = Seq("a1", "a2", "a3", "a4")
    val right = Seq("b1", "b2", "b3", "b4")
    val g = rels(clique(left) ++ clique(right) :+ ("a1", "b1"): _*)
    val lab = run(g, rounds = 4)
    assert(left.map(lab).toSet.size == 1,
      s"left clique should share one label: ${left.map(lab)}")
    assert(right.map(lab).toSet.size == 1,
      s"right clique should share one label: ${right.map(lab)}")
    assert(lab("a1") != lab("b1"),
      "the bridge must not merge the two cliques")
  }

  test("deterministic: same labelling on repeated runs") {
    val g = rels(clique(Seq("x1", "x2", "x3")) ++
      clique(Seq("y1", "y2", "y3")) :+ ("x1", "y1"): _*)
    assert(run(g, 3) == run(g, 3))
  }

  test("edges are symmetrized: direction does not change communities") {
    val fwd = rels(("a", "b"), ("b", "c"))
    val rev = rels(("b", "a"), ("c", "b"))
    assert(run(fwd, 3) == run(rev, 3))
  }

  test("star (bipartite): synchronous rounds oscillate with period 2") {
    // round 1: every leaf's only neighbor is the hub → leaves take
    // stableId(hub), the hub takes the min leaf label; round 2 swaps
    // them back — the Raghavan et al. synchronous-update oscillation on
    // bipartite structure. A fixed round count is a deterministic
    // snapshot of that cycle, which is what the operator contracts.
    val leaves = (1 to 5).map(i => s"leaf$i")
    val g = rels(leaves.map(l => ("hub", l)): _*)
    val r1 = run(g, rounds = 1)
    val r2 = run(g, rounds = 2)
    val r3 = run(g, rounds = 3)
    assert(r1 == r3, "period-2 oscillation: rounds 1 and 3 agree")
    assert(r1 != r2, "bipartite star flips between rounds")
    assert(leaves.map(r2).toSet.size == 1, "leaves always agree")
  }

  test("one round over a single edge swaps the endpoint labels") {
    val g = rels(("p", "q"))
    val one = run(g, 1)
    val s = spark
    import org.apache.spark.sql.functions.col
    val init = s.createDataFrame(Seq(Tuple1("p"), Tuple1("q")))
      .toDF("node")
      .select(col("node"),
        graft.pipeline.TextAnalysis.stableId(col("node")).as("lab"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(one("p") == init("q") && one("q") == init("p"))
  }
}
