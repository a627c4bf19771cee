package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries: exact-regime parity with groupBy under any partitioning,
  * the classic n/k error bound + guaranteed-survivor set under
  * truncation, and null hygiene. */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sketch(keys: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val s = spark; import s.implicits._
    keys.toDF("k").repartition(parts)
      .agg(HeavyHitters.heavyHitters(k)(col("k")).as("sk"))
      .collect()(0).getMap[String, Long](0).toMap
  }

  test("capacity above distinct-count: state is the exact count map, any partitioning") {
    val keys = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val exact = Map("a" -> 40L, "b" -> 25L, "c" -> 3L)
    assert(sketch(keys, k = 8, parts = 1) == exact)
    assert(sketch(keys, k = 8, parts = 7) == exact)
    assert(sketch(keys, k = 3, parts = 5) == exact) // boundary: size == k
  }

  test("truncation: counters undercount by at most n/k and heavy keys survive") {
    // 1000 rows: two heavy keys (400, 300) + 300 singletons; k = 10
    val keys = Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 300).map(i => s"cold$i")
    val n = keys.size
    val k = 10
    for (parts <- Seq(1, 4, 13)) {
      val sk = sketch(keys, k, parts)
      assert(sk.size <= k)
      // guaranteed survivors: true frequency > n/k = 100
      assert(sk.contains("hot1") && sk.contains("hot2"))
      val exact = keys.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      sk.foreach { case (key, est) =>
        assert(est <= exact(key), s"$key overcounted")
        assert(exact(key) - est <= n.toLong / k, s"$key error beyond n/k")
      }
    }
  }

  test("nulls are skipped like any SQL aggregate") {
    val s = spark; import s.implicits._
    val sk = Seq("a", null, "a", null, "b").toDF("k")
      .agg(HeavyHitters.heavyHitters(4)(col("k")).as("sk"))
      .collect()(0).getMap[String, Long](0).toMap
    assert(sk == Map("a" -> 2L, "b" -> 1L))
  }

  test("merge truncation rule keeps the top keys of combined partials") {
    // partition-skewed input where partials disagree; the PODS'12 merge
    // must still keep the global heavy key
    val keys = (1 to 60).map(i => s"u$i") ++ Seq.fill(50)("big")
    val sk = sketch(keys, k = 5, parts = 6)
    assert(sk.contains("big")) // freq 50 > n/k = 22
  }
}
