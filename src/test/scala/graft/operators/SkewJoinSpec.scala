package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join: row-identical to the plain join for any hot list,
  * with the hot path actually spread over (key, salt). */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // skewed probe: key 1 carries most rows, N:M multiplicity on key 2
  lazy val probe = ((1 to 40).map(i => (1L, s"p$i")) ++
    Seq((2L, "x"), (2L, "y"), (3L, "z"))).toDF("k", "pv")
  lazy val build = Seq((1L, "b1"), (2L, "b2a"), (2L, "b2b"), (4L, "b4"))
    .toDF("j", "bv")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "pv", "j", "bv").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  lazy val plain = rows(probe.join(build, probe("k") === build("j")))

  test("equals the plain join, duplicates and multiplicity included") {
    val hot = SkewJoin.hotKeys(probe, "k", minCount = 10L)
    assert(hot.as[Long].collect().toSeq == Seq(1L), "only key 1 is hot")
    val got = rows(SkewJoin.join(probe, build, "k", "j", hot, salts = 4))
    assert(got == plain, s"salted join diverged")
  }

  test("any hot list gives the same rows — empty, exact, or wrong") {
    for (hotKeys <- Seq(Seq.empty[Long], Seq(1L, 2L), Seq(3L, 4L),
        Seq(1L, 2L, 3L, 4L, 99L))) {
      val got = rows(SkewJoin.join(probe, build, "k", "j",
        hotKeys.toDF("k"), salts = 3))
      assert(got == plain, s"hot=$hotKeys diverged")
    }
  }

  test("salts=1 degenerates to the plain join result") {
    val got = rows(SkewJoin.join(probe, build, "k", "j",
      Seq(1L).toDF("k"), salts = 1))
    assert(got == plain)
  }

  test("hot path hashes on (key, salt): the salt reaches the join keys") {
    val df = SkewJoin.join(probe, build, "k", "j", Seq(1L).toDF("k"), 4)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
  }

  test("salt is deterministic: reruns produce identical partitioned work") {
    val a = rows(SkewJoin.join(probe, build, "k", "j", Seq(1L).toDF("k"), 4))
    val b = rows(SkewJoin.join(probe, build, "k", "j", Seq(1L).toDF("k"), 4))
    assert(a == b)
  }
}
