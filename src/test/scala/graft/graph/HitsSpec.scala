package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** HITS: hand-checked hub/authority separation, determinism, mass
  * conservation under the integer normalization, dangling handling. */
class HitsSpec extends AnyFunSuite {

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

  private def run(g: DataFrame, iters: Int): Map[String, (Long, Long)] =
    Hits.scores(g, iters).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap

  test("a directory page is the top hub; the shared destination the top authority") {
    // h1 and h2 both point at d; h1 also points at d2 → h1 best hub,
    // d best authority; d/d2 have no out-links → zero hub score
    val g = rels(("h1", "d"), ("h1", "d2"), ("h2", "d"))
    val sc = run(g, 3)
    assert(sc("h1")._1 > sc("h2")._1, "two-destination hub must outrank")
    assert(sc("d")._2 > sc("d2")._2, "shared destination must outrank")
    assert(sc("d")._1 == 0L && sc("d2")._1 == 0L, "sinks have zero hub score")
    assert(sc("h1")._2 == 0L && sc("h2")._2 == 0L, "sources have zero authority")
  }

  test("scores are bit-deterministic and each vector sums to ~1e6 (truncation only)") {
    val g = rels(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
    val s1 = run(g, 3)
    val s2 = run(g, 3)
    assert(s1 == s2)
    // two truncating divisions per node per normalize → ≤ 2·|V| mass loss
    val hubSum = s1.values.map(_._1).sum
    val authSum = s1.values.map(_._2).sum
    assert(hubSum <= 1000000L && hubSum >= 1000000L - 2L * s1.size,
      s"hub mass $hubSum out of truncation budget")
    assert(authSum <= 1000000L && authSum >= 1000000L - 2L * s1.size,
      s"auth mass $authSum out of truncation budget")
  }

  test("symmetric cycle gives uniform scores") {
    val g = rels(("a", "b"), ("b", "c"), ("c", "a"))
    val sc = run(g, 4)
    assert(sc.values.map(_._1).toSet.size == 1, "hub scores must be uniform")
    assert(sc.values.map(_._2).toSet.size == 1, "auth scores must be uniform")
  }

  test("empty relationship set yields an empty frame, not a crash") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(String, String, String)]
      .toDF("relationship_id", "source_id", "target_id")
    assert(Hits.scores(empty, 2).count() == 0L)
  }

  test("every endpoint appears exactly once in the output") {
    val g = rels(("a", "b"), ("c", "b"), ("c", "d"))
    val rows = Hits.scores(g, 2).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c", "d"))
  }

  test("each half-step's join+agg executes exactly once (r12 verdict #3)") {
    // Count executed actions whose physical plan contains a join: the
    // normalize contract is checkpoint-the-raw-frame FIRST, so the
    // scalar-sum collect and the normalized-output checkpoint both read
    // materialized blocks. Per half-step exactly ONE join-bearing action
    // (the raw checkpoint) may run; the pre-r13 shape ran the join+agg
    // twice per half-step (collect + re-computed checkpoint).
    val joinActions = new java.util.concurrent.atomic.AtomicInteger(0)
    val total = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        total.incrementAndGet()
        if (qe.executedPlan.toString.contains("Join")) joinActions.incrementAndGet()
      }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val g = rels(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
      val iters = 3
      Hits.scores(g, iters)
      // listener dispatch is async: poll until the count stabilizes
      var last = -1
      var spins = 0
      while (total.get() != last && spins < 40) {
        last = total.get(); Thread.sleep(250); spins += 1
      }
      // 2 half-steps per iteration, each ONE join-bearing action, plus the
      // final hub⋈auth output checkpoint. Setup (edges/nodes/init) has no
      // joins. Doubled half-steps would measure 2·iters·2 + 1 = 13.
      val expected = 2 * iters + 1
      assert(joinActions.get() == expected,
        s"join-bearing actions: got ${joinActions.get()}, want $expected " +
          s"(double-compute would be ${4 * iters + 1}); total actions ${total.get()}")
    } finally spark.listenerManager.unregister(l)
  }
}
