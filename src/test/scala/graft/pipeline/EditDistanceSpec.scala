package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** FastSS-blocked edit-distance pairs vs a JVM brute-force DP oracle:
  * completeness (no pair missed by blocking), exactness (no extra
  * pairs), d=1 and d=2, and the deletion-neighborhood contents. */
class EditDistanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "name")
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def oracle(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    EditDistance.nearPairs(docs(rows: _*), "id", "name", d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("d=1: substitutions, insertions, deletions all found; nothing extra") {
    val rows = Seq(1L -> "kitten", 2L -> "mitten", 3L -> "kitte",
      4L -> "kittens", 5L -> "sitting", 6L -> "mittens")
    assert(run(rows, 1) == oracle(rows, 1))
  }

  test("d=2: two-edit pairs surface through the depth-2 neighborhood") {
    val rows = Seq(1L -> "grafts", 2L -> "crafts", 3L -> "draft",
      4L -> "rafts", 5L -> "crust")
    assert(run(rows, 2) == oracle(rows, 2))
    // sanity: (grafts, draft) is distance 2 — must be present
    assert(run(rows, 2).contains((1L, 3L, 2L)))
  }

  test("identical strings pair at distance 0") {
    val rows = Seq(1L -> "same", 2L -> "same", 3L -> "other")
    assert(run(rows, 1) == oracle(rows, 1))
    assert(run(rows, 1).contains((1L, 2L, 0L)))
  }

  test("seeded corpus of digit-varied keys matches brute force at d=1") {
    val rows = (0 until 60).map(i => (i.toLong, f"Part#${(i * 37) % 100}%03d"))
    assert(run(rows, 1) == oracle(rows, 1))
  }
}
