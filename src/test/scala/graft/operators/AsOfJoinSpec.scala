package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val quotes = Seq(
    (1L, "A", ts("2026-01-01 10:00:00"), 100.0),
    (2L, "A", ts("2026-01-01 10:00:05"), 101.0),
    (3L, "A", ts("2026-01-01 10:01:00"), 102.0),
    (4L, "B", ts("2026-01-01 10:00:02"), 50.0)
  ).toDF("qid", "sym", "qts", "px")

  lazy val trades = Seq(
    (10L, "A", ts("2026-01-01 10:00:03")), // after quote 1, before 2
    (11L, "A", ts("2026-01-01 10:00:05")), // exactly at quote 2 (inclusive)
    (12L, "A", ts("2026-01-01 09:59:00")), // before any quote → unmatched
    (13L, "B", ts("2026-01-01 10:30:00")), // stale match for tolerance test
    (14L, "C", ts("2026-01-01 10:00:00"))  // key with no quotes at all
  ).toDF("tid", "sym", "tts")

  test("latest-at-or-before match per key; unmatched probes null-extend") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
        carryCols = Seq("qid", "px"))
      .select(col("tid"), col("asof_qid"), col("asof_px"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(out(10L) == ((Some(1L), Some(100.0))), "strictly-before quote")
    assert(out(11L) == ((Some(2L), Some(101.0))), "equal timestamp is inclusive")
    assert(out(12L) == ((None, None)), "no preceding quote")
    assert(out(13L) == ((Some(4L), Some(50.0))), "old quote still matches untol'd")
    assert(out(14L) == ((None, None)), "unknown key")
  }

  test("toleranceMs expires stale matches; tie-break picks the last series row") {
    val tol = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
        carryCols = Seq("qid"), toleranceMs = Some(60000L))
      .select(col("tid"), col("asof_qid"), col("asof_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tol(10L).contains(1L), "fresh match survives tolerance")
    assert(tol(13L).isEmpty, "trade 30 min after the only B quote expires")

    // two quotes at the same instant: the tiebreak column's LAST wins
    val dup = Seq(
      (21L, "A", ts("2026-01-01 10:00:00"), 1.0),
      (22L, "A", ts("2026-01-01 10:00:00"), 2.0)
    ).toDF("qid", "sym", "qts", "px")
    val got = AsOfJoin.asOf(
        Seq((30L, "A", ts("2026-01-01 10:00:01"))).toDF("tid", "sym", "tts"),
        dup, Seq("sym"), "tts", "qts", carryCols = Seq("qid", "px"),
        seriesTiebreak = Some("qid"))
      .select(col("asof_qid"), col("asof_px")).collect()(0)
    assert(got.getLong(0) == 22L && got.getDouble(1) == 2.0)
  }

  test("a null-VALUED latest match carries its null, not an older value") {
    // the match is the 10:01 row whose px is legitimately NULL — the
    // carry must not reach back to 10:00's 100.0 (struct carry, not
    // per-column ignoreNulls)
    val q = Seq(
      (1L, "A", ts("2026-01-01 10:00:00"), Some(100.0)),
      (2L, "A", ts("2026-01-01 10:01:00"), None: Option[Double])
    ).toDF("qid", "sym", "qts", "px")
    val r = AsOfJoin.asOf(
        Seq((9L, "A", ts("2026-01-01 10:02:00"))).toDF("tid", "sym", "tts"),
        q, Seq("sym"), "tts", "qts", carryCols = Seq("qid", "px"))
      .select(col("asof_qid"), col("asof_px"), col("asof_ts")).collect()(0)
    assert(r.getLong(0) == 2L, "the 10:01 row is the match")
    assert(r.isNullAt(1), "its null px must carry through")
    assert(r.getAs[Timestamp]("asof_ts") == ts("2026-01-01 10:01:00"))
  }

  test("string tiebreak column stays typed (no silent cast-to-null)") {
    val dup = Seq(
      ("qa", "A", ts("2026-01-01 10:00:00"), 1.0),
      ("qb", "A", ts("2026-01-01 10:00:00"), 2.0)
    ).toDF("qid", "sym", "qts", "px")
    val got = AsOfJoin.asOf(
        Seq((30L, "A", ts("2026-01-01 10:00:01"))).toDF("tid", "sym", "tts"),
        dup, Seq("sym"), "tts", "qts", carryCols = Seq("qid"),
        seriesTiebreak = Some("qid"))
      .select(col("asof_qid")).collect()(0)
    assert(got.getString(0) == "qb", "lexicographically-last wins, not null-order chance")
  }

  test("probe columns survive untouched; asof_ts carries the matched time") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
        carryCols = Seq("px"))
    assert(out.columns.toSeq == Seq("tid", "sym", "tts", "asof_px", "asof_ts"))
    val r = out.filter(col("tid") === 11L).collect()(0)
    assert(r.getAs[Timestamp]("asof_ts") == ts("2026-01-01 10:00:05"))
    assert(r.getAs[Timestamp]("tts") == ts("2026-01-01 10:00:05"))
  }
}
