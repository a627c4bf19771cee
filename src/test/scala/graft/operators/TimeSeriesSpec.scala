package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample fills gaps, forward-fills sums, zero before first obs") {
    val ev = Seq(
      ("u1", ts("2026-01-01 10:15:00"), 1.0),
      ("u1", ts("2026-01-01 10:45:00"), 2.0),
      // 11:00 and 12:00 empty — grid rows with n=0, filled carries 300
      ("u1", ts("2026-01-01 13:05:00"), 4.0),
      ("u2", ts("2026-01-01 00:00:00"), 9.0) // single-slot key: 1-row grid
    ).toDF("user", "ets", "v")
    val got = TimeSeries.resample(ev, "user", "ets", "v", stepSec = 3600L)
      .orderBy("k", "slot")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("u1", "2026-01-01 10:00:00.0", 2L, 300L, 300L),
      ("u1", "2026-01-01 11:00:00.0", 0L, 0L, 300L),
      ("u1", "2026-01-01 12:00:00.0", 0L, 0L, 300L),
      ("u1", "2026-01-01 13:00:00.0", 1L, 400L, 400L),
      ("u2", "2026-01-01 00:00:00.0", 1L, 900L, 900L)))
  }

  test("maxSlotsPerKey truncates a pathological span to its recent window") {
    val ev = Seq(
      ("u1", ts("2020-01-01 00:00:00"), 1.0), // 6 years before the rest
      ("u1", ts("2026-01-01 00:00:00"), 2.0),
      ("u1", ts("2026-01-01 02:00:00"), 3.0)
    ).toDF("user", "ets", "v")
    val got = TimeSeries.resample(ev, "user", "ets", "v",
      stepSec = 3600L, maxSlotsPerKey = 4)
    // grid is clamped to the last 4 slots ending at the max slot
    assert(got.count() == 4L)
    val slots = got.orderBy("slot").select("slot").collect()
      .map(_.getTimestamp(0).toString)
    assert(slots.head == "2025-12-31 23:00:00.0" &&
      slots.last == "2026-01-01 02:00:00.0")
  }

  test("cohort retention: first-day cohorts count distinct per offset") {
    val ev = Seq(
      ("u1", ts("2026-01-01 08:00:00")), ("u1", ts("2026-01-01 09:00:00")),
      ("u1", ts("2026-01-03 08:00:00")),
      ("u2", ts("2026-01-01 23:59:59")), ("u2", ts("2026-01-02 00:00:01")),
      ("u3", ts("2026-01-02 12:00:00"))
    ).toDF("user", "ets")
    val got = TimeSeries.cohortRetention(ev, "user", "ets")
      .orderBy("cohort", "day_offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2026-01-01", 0L, 2L), // u1+u2 day 0
      ("2026-01-01", 1L, 1L), // u2 next day
      ("2026-01-01", 2L, 1L), // u1 two days later
      ("2026-01-02", 0L, 1L))) // u3's own cohort
  }
}
