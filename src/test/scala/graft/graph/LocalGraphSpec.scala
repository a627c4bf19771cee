package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity spec for the driver-local bottom-outs ([[LocalGraph]]): every
  * operator that can solve a sub-cutoff subproblem serially must produce
  * BIT-IDENTICAL output to its distributed fixpoint. Each fixture runs
  * twice — once under the default cutoff (local path) and once with
  * `spark.graft.graph.localSolveMaxEdges=0` (fully distributed) — and the
  * row sets must match exactly. Fixtures include seeded pseudo-random
  * graphs and node ids with non-BMP code points, where Java's UTF-16
  * `String.compareTo` disagrees with Spark's unsigned-UTF-8 `min` order
  * (the exact trap [[LocalGraph.utf8Lt]] exists to avoid). */
class LocalGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Knob = "spark.graft.graph.localSolveMaxEdges"

  /** Run `body` once on the local path (default cutoff) and once fully
    * distributed (cutoff 0); return both results. */
  private def bothPaths[A](body: => A): (A, A) = {
    spark.conf.unset(Knob)
    val local = body
    spark.conf.set(Knob, "0")
    try { val dist = body; (local, dist) }
    finally spark.conf.unset(Knob)
  }

  // non-BMP / boundary ids: U+E000 (UTF-8 EE 80 80), U+FFFD (EF BF BD) and
  // U+1F600 (F0 9F 98 80) order differently in UTF-16 code units
  // (surrogate D83D sorts first) than in UTF-8 bytes (F0 sorts last)
  private val Tricky = Seq("a", "Z", "", "�", "😀", "é")

  private def strEdges(rows: Seq[(String, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst")
  }

  /** Seeded pseudo-random digraph over n nodes with ~density·n² edges —
    * arithmetic hash, no RNG, so both paths see the identical input. */
  private def randomDigraph(n: Int, seed: Int,
      names: Int => String): Seq[(String, String)] =
    for {
      i <- 0 until n; j <- 0 until n if i != j
      h = (i * 31 + j * 17 + seed * 7 + (i * j) % 13) % 9
      if h == 0
    } yield (names(i), names(j))

  test("utf8Lt matches Spark's StringType min on non-BMP strings") {
    val s = spark; import s.implicits._
    for (x <- Tricky; y <- Tricky if x != y) {
      val sparkMin = Seq(x, y).toDF("v").agg(min(col("v")))
        .collect()(0).getString(0)
      val localMin = if (LocalGraph.utf8Lt(x, y)) x else y
      assert(localMin == sparkMin,
        s"utf8Lt disagrees with Spark min on ${x.codePoints().toArray.toSeq} " +
          s"vs ${y.codePoints().toArray.toSeq}")
    }
    // and the UTF-16 order genuinely differs on the astral pair, so this
    // test would catch a regression to String.compareTo
    assert("😀".compareTo("�") < 0 &&
      LocalGraph.utf8Lt("�", "😀"))
  }

  test("SCC labels: local Tarjan == distributed FW-BW on random digraphs") {
    for (seed <- 1 to 3) {
      val rows = randomDigraph(14, seed,
        i => if (i < Tricky.size) Tricky(i) else f"n$i%02d")
      val (local, dist) = bothPaths {
        Scc.components(strEdges(rows)).collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      }
      assert(local == dist, s"seed $seed")
    }
  }

  test("components: local union-find == distributed stars, string keys") {
    val s = spark; import s.implicits._
    for (seed <- 1 to 3) {
      val rows = randomDigraph(12, seed,
        i => if (i < Tricky.size) Tricky(i) else f"d$i%02d")
      val pairs = rows.toDF("doc_a", "doc_b")
      val (local, dist) = bothPaths {
        graft.pipeline.Dedup.components(pairs).collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      }
      assert(local == dist, s"seed $seed")
    }
  }

  test("components: local union-find == distributed stars, long keys") {
    val s = spark; import s.implicits._
    val rows = randomDigraph(16, 5, _.toString).map {
      case (a, b) => (a.toLong * 7 % 17, b.toLong * 7 % 17)
    }.filter(p => p._1 != p._2)
    val pairs = rows.toDF("doc_a", "doc_b")
    val (local, dist) = bothPaths {
      graft.pipeline.Dedup.components(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(local == dist)
  }

  test("k-core peel: local == distributed, bounded and exact forms") {
    for (seed <- 1 to 2; k <- Seq(2, 3)) {
      val rows = randomDigraph(15, seed, i => f"v$i%02d")
      val (local, dist) = bothPaths {
        (KCore.peel(strEdges(rows), "src", "dst", k, rounds = 3).collect()
           .map(_.getString(0)).toSet,
         KCore.kcore(strEdges(rows), "src", "dst", k).collect()
           .map(_.getString(0)).toSet)
      }
      assert(local == dist, s"seed $seed k $k")
    }
  }

  test("k-truss peel: local == distributed") {
    for (seed <- 1 to 2) {
      val rows = randomDigraph(13, seed, i => f"t$i%02d")
      val (local, dist) = bothPaths {
        KTruss.peel(strEdges(rows), k = 3, rounds = 3).collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      }
      assert(local == dist, s"seed $seed")
    }
  }

  test("reachClosure: local BFS == distributed frontier loop") {
    val s = spark; import s.implicits._
    val rows = randomDigraph(14, 9, i => f"r$i%02d")
    val e = rows.toDF("u", "v").localCheckpoint(true)
    val seeds = Seq("r00", "r03").toDF("node").localCheckpoint(true)
    val (local, dist) = bothPaths {
      IncrementalAnalytics.reachClosure(e, seeds, 50, "spec")
        .collect().map(_.getString(0)).toSet
    }
    assert(local == dist)
  }

  test("binary key columns refuse the local path (reference equality)") {
    val s = spark; import s.implicits._
    val df = Seq(("x", "y")).toDF("a", "b")
      .select(encode(col("a"), "UTF-8").as("a"), encode(col("b"), "UTF-8").as("b"))
      .localCheckpoint(true)
    assert(LocalGraph.collectEdgesAny(df, 1000L).isEmpty)
  }

  test("kcoreSurvivors/ktrussSurvivors match the synchronous round rule") {
    // triangle + pendant: k=2 peel drops the pendant in round 1, keeps
    // the triangle forever — fixpoint after 1 round
    val sym: Array[(AnyRef, AnyRef)] = Array(
      ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c"))
      .map { case (x, y) => (x: AnyRef, y: AnyRef) }
    assert(LocalGraph.kcoreSurvivors(sym, 2, 10).toSet ==
      Set[AnyRef]("a", "b", "c"))
    val canon: Array[(AnyRef, AnyRef)] = Array(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
      .map { case (x, y) => (x: AnyRef, y: AnyRef) }
    assert(LocalGraph.ktrussSurvivors(canon, 3, 10).toSet ==
      Set[(AnyRef, AnyRef)](("a", "b"), ("a", "c"), ("b", "c")))
  }
}
