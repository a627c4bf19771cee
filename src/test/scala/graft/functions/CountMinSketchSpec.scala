package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val w = 1024
  private val d = 4

  private def grid(keys: Seq[String], parts: Int): Seq[Long] =
    keys.toDF("k").repartition(parts)
      .select(CountMinSketch.countMin(w, d)(col("k")))
      .head.getSeq[Long](0)

  test("estimates dominate true counts and are exact for light buckets") {
    val keys = (1 to 50).flatMap(i => Seq.fill(i)(s"key-$i"))
    val g = grid(keys, 5)
    (1 to 50).foreach { i =>
      val est = CountMinSketch.estimate(g, w, d, s"key-$i")
      assert(est >= i, s"count-min error must be one-sided: key-$i est $est")
      // 50 keys in a 1024-wide, 4-deep grid: a collision in ALL four
      // rows is (50/1024)^4-unlikely — estimates should be exact here
      assert(est == i, s"key-$i est $est (4-row collision at 5% load?)")
    }
    assert(CountMinSketch.estimate(g, w, d, "absent") >= 0)
  }

  test("h2 step is never zero: depth rows always probe distinct sequences") {
    // h2 == 0 would collapse all depth rows onto bucket h1, voiding the
    // 1-2^-depth bound; the step is forced into [1, width-1].
    (1 to 2000).foreach { i =>
      val (h1, h2) = CountMinSketch.hashPair(s"probe-$i", w)
      assert(h1 >= 0 && h1 < w, s"h1 $h1 out of range for probe-$i")
      assert(h2 >= 1 && h2 <= w - 1, s"h2 $h2 must be in [1,${w - 1}]")
    }
  }

  test("grid is order- and partitioning-independent; nulls skipped") {
    val keys = (1 to 200).map(i => s"k${i % 37}")
    val a = grid(keys, 7)
    val b = grid(keys.reverse, 1)
    assert(a == b, "deterministic sketch state")
    val withNulls = (keys.map(Option(_)) ++ Seq.fill(30)(Option.empty[String]))
      .toDF("k").select(CountMinSketch.countMin(w, d)(col("k")))
      .head.getSeq[Long](0)
    assert(withNulls == a, "null keys must not touch the grid")
  }

  test("byte-arithmetic hashPair is bit-identical to the hex-parse formulation") {
    // the grid state is an oracle-checked contract — the fast path must
    // reproduce exactly what parsing hex digits [0,15)/[15,30) produced
    def hexParse(key: String, width: Int): (Long, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % width,
        java.lang.Long.parseLong(hex.substring(15, 30), 16) % (width - 1) + 1)
    }
    val keys = (1 to 3000).map(i => s"key-$i-${"x" * (i % 17)}") ++
      Seq("", "a", "élève", "日本語キー")
    for (key <- keys; width <- Seq(2, 7, 1024, 8192))
      assert(CountMinSketch.hashPair(key, width) == hexParse(key, width),
        s"mismatch for '$key' width $width")
  }
}
