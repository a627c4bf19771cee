package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap splits sessions; exact-gap stays joined; per-key numbering") {
    val ev = Seq(
      (1L, "u1", ts("2026-01-01 10:00:00")),
      (2L, "u1", ts("2026-01-01 10:10:00")), // 10 min gap, same session
      (3L, "u1", ts("2026-01-01 10:40:00")), // exactly 30 min: NOT greater → same
      (4L, "u1", ts("2026-01-01 11:20:01")), // 30min1s → new session
      (5L, "u2", ts("2026-01-01 10:00:00"))  // other key restarts at 1
    ).toDF("eid", "user", "ets")
    val got = Sessionize.byGap(ev, Seq("user"), "ets", gapMs = 1800000L)
      .select(col("eid"), col("session_idx")).as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L),
      s"got $got")

    val roll = Sessionize.sessions(ev, Seq("user"), "ets", 1800000L)
      .filter(col("user") === "u1" && col("session_idx") === 1)
      .collect()(0)
    assert(roll.getAs[Long]("n_events") == 3L)
    assert(roll.getAs[Long]("duration_us") == 2400000000L, "10:00 -> 10:40")
  }
}
