package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property checks for the round-13 graph operators — every
  * case compares the distributed result against an in-test brute-force
  * oracle on an arbitrary small graph, so correctness isn't pinned to
  * the handful of hand-built fixtures. Case counts are bounded (each
  * case runs real Spark rounds); the generator is a seeded LCG so
  * failures replay deterministically. */
class GraphPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic LCG: the same seeds generate the same graphs. */
  private def randomEdges(seed: Long, n: Int, pPercent: Int)
      : Seq[(String, String)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    for {
      i <- 0 until n; j <- 0 until n
      if i != j && math.floorMod(next(), 100) < pPercent
    } yield (f"n$i%02d", f"n$j%02d")
  }

  private def df(rows: Seq[(String, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst")
  }

  // ---- SCC vs Floyd-Warshall mutual reachability ----

  private def sccOracle(rows: Seq[(String, String)]): Map[String, String] = {
    val nodes = rows.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val reach = Array.fill(n, n)(false)
    for (i <- 0 until n) reach(i)(i) = true
    for ((a, b) <- rows) reach(idx(a))(idx(b)) = true
    for (k <- 0 until n; i <- 0 until n if reach(i)(k);
         j <- 0 until n if reach(k)(j)) reach(i)(j) = true
    nodes.map { v =>
      val i = idx(v)
      v -> nodes.filter(u => reach(i)(idx(u)) && reach(idx(u))(i)).min
    }.toMap
  }

  test("property: SCC == closure oracle on 12 random digraphs") {
    for (seed <- 1 to 12) {
      val rows = randomEdges(seed * 7919L, n = 8, pPercent = 18)
      if (rows.nonEmpty) {
        val got = Scc.components(df(rows)).collect()
          .map(r => (r.getString(0), r.getString(1))).toMap
        assert(got == sccOracle(rows), s"seed $seed rows $rows")
      }
    }
  }

  // ---- MIS vs greedy-by-priority ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("property: MIS == lexicographically-first greedy on 12 random graphs") {
    for (seed <- 1 to 12) {
      val rows = randomEdges(seed * 104729L, n = 9, pPercent = 15)
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      if (rows.nonEmpty) {
        val adj = rows.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .filter(p => p._1 != p._2).distinct
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val order = adj.keys.toSeq.sortBy(v => (md5hex(v), v))
        val sel = scala.collection.mutable.Set.empty[String]
        for (v <- order if !adj(v).exists(sel)) sel += v
        val got = Mis.independentSet(df(rows)).collect()
          .map(_.getString(0)).toSet
        assert(got == sel.toSet, s"seed $seed rows $rows")
      }
    }
  }

  // ---- k-truss vs fixpoint oracle ----

  private def trussOracle(rows: Seq[(String, String)], k: Int)
      : Set[(String, String)] = {
    var e = rows.map { case (x, y) => if (x < y) (x, y) else (y, x) }
      .filter(p => p._1 != p._2).distinct.toSet
    var changed = true
    while (changed) {
      val adj = e.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
        .groupBy(_._1).map { case (n, v) => n -> v.map(_._2) }
      val kept = e.filter { case (a, b) =>
        adj(a).intersect(adj(b)).size >= k - 2 }
      changed = kept != e
      e = kept
    }
    e
  }

  test("property: k-truss fixpoint == oracle on 8 random graphs") {
    for (seed <- 1 to 8) {
      val rows = randomEdges(seed * 31337L, n = 9, pPercent = 30)
      if (rows.nonEmpty) {
        val got = KTruss.peel(df(rows), k = 4, rounds = 8).collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
        assert(got == trussOracle(rows, 4), s"seed $seed rows $rows")
      }
    }
  }
}
