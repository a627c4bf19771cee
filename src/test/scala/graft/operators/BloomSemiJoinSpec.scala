package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSemiJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val bits = 1 << 12
  private val k = 5

  test("semiJoin matches plain left_semi exactly, false positives removed") {
    val big = (1L to 2000L).map(i => (i, s"row$i")).toDF("key", "payload")
    val small = Seq(3L, 7L, 7L, 500L, 1999L, 4242L).toDF("skey") // dup + miss
    val got = BloomSemiJoin.semiJoin(big, small, "key", "skey", bits, k)
      .select("key").as[Long].collect().sorted
    val want = big.join(small, col("key") === col("skey"), "left_semi")
      .select("key").as[Long].collect().sorted
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
    assert(want.toSeq == Seq(3L, 7L, 500L, 1999L)) // no dup rows, no 4242
  }

  test("antiJoin matches plain left_anti, keeps null-keyed probe rows") {
    val big = ((1L to 50L).map(i => (Option(i), s"r$i")) :+
      (Option.empty[Long], "rnull")).toDF("key", "payload")
    val small = Seq(2L, 9L, 50L).toDF("skey")
    val got = BloomSemiJoin.antiJoin(big, small, "key", "skey", bits, k)
      .select("payload").as[String].collect().sorted
    val want = big.join(small, col("key") === col("skey"), "left_anti")
      .select("payload").as[String].collect().sorted
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
    assert(got.contains("rnull") && !got.contains("r9"))
  }

  test("builder bits and column-side probe agree: no false negatives ever") {
    val keys = (1 to 300).map(i => s"key-$i")
    val words = BloomSemiJoin.bloomBits(
      keys.toDF("s"), "s", bits, k)
    val hits = keys.toDF("s")
      .filter(BloomSemiJoin.mightContain(words, bits, k)(col("s")))
      .count()
    assert(hits == 300, "every inserted key must test positive")
  }

  test("bloom sketch bytes are order- and partitioning-independent") {
    val keys = (1 to 100).map(i => s"k$i")
    val a = BloomSemiJoin.bloomBits(
      keys.toDF("s").repartition(7), "s", bits, k)
    val b = BloomSemiJoin.bloomBits(
      keys.reverse.toDF("s").coalesce(1), "s", bits, k)
    assert(a.sameElements(b), "deterministic sketch state")
  }

  test("definitely-absent pruning actually prunes (fp rate sane)") {
    val words = BloomSemiJoin.bloomBits(
      (1 to 100).map(i => s"in-$i").toDF("s"), "s", bits, k)
    val probes = (1 to 2000).map(i => s"out-$i").toDF("s")
    val fp = probes
      .filter(BloomSemiJoin.mightContain(words, bits, k)(col("s"))).count()
    // m/n = 4096/100 → fp ≈ (1-e^{-5*100/4096})^5 ≈ 2e-5; 2000 probes
    // should see ~0; allow a loose bound so the test isn't flaky-by-math
    assert(fp <= 5, s"false-positive count $fp out of 2000 is way off")
  }
}
