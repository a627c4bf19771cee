package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("half-open containment across bucket boundaries, per key") {
    // interval spans two 1-minute bins; one lies wholly inside one bin
    val intervals = Seq(
      (1L, "u1", ts("2026-01-01 10:00:30"), ts("2026-01-01 10:01:30")),
      (2L, "u1", ts("2026-01-01 10:05:00"), ts("2026-01-01 10:05:10")),
      (3L, "u2", ts("2026-01-01 10:00:00"), ts("2026-01-01 10:01:00")),
      (4L, "u1", ts("2026-01-01 10:07:00"), ts("2026-01-01 10:07:00")) // empty
    ).toDF("iid", "user", "st", "en")
    val points = Seq(
      (10L, "u1", ts("2026-01-01 10:00:30")), // == start → inclusive
      (11L, "u1", ts("2026-01-01 10:01:15")), // second bucket of ivl 1
      (12L, "u1", ts("2026-01-01 10:01:30")), // == end → exclusive
      (13L, "u2", ts("2026-01-01 10:00:45")), // ivl 3, other key
      (14L, "u1", ts("2026-01-01 10:00:45")), // ivl 1; key != u2's ivl 3
      (15L, "u1", ts("2026-01-01 10:07:00"))  // empty interval matches nothing
    ).toDF("pid", "user", "pts")

    val got = RangeJoin.pointInInterval(points, intervals, Seq("user"),
        "pts", "st", "en", binMs = 60000L)
      .select(col("pid"), col("ivl_iid")).as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (11L, 1L), (13L, 3L), (14L, 1L)), s"got $got")

    // overlapping intervals: a point matches every container exactly once
    val laps = Seq(
      (20L, "u1", ts("2026-01-01 10:00:00"), ts("2026-01-01 10:10:00")),
      (21L, "u1", ts("2026-01-01 10:04:00"), ts("2026-01-01 10:06:00"))
    ).toDF("iid", "user", "st", "en")
    val multi = RangeJoin.pointInInterval(
        Seq((30L, "u1", ts("2026-01-01 10:05:00"))).toDF("pid", "user", "pts"),
        laps, Seq("user"), "pts", "st", "en", binMs = 60000L)
      .select(col("ivl_iid")).as[Long].collect().toSeq.sorted
    assert(multi == Seq(20L, 21L), "one row per containing interval, no dups")
  }

  test("plan is an equi-join on the bin, not a nested-loop inequality join") {
    val intervals = Seq((1L, "u1", ts("2026-01-01 10:00:00"),
      ts("2026-01-01 11:00:00"))).toDF("iid", "user", "st", "en")
    val points = Seq((10L, "u1", ts("2026-01-01 10:30:00")))
      .toDF("pid", "user", "pts")
    val p = RangeJoin.pointInInterval(points, intervals, Seq("user"),
      "pts", "st", "en", binMs = 3600000L).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not plan as a nested loop:\n$p")
  }
}
