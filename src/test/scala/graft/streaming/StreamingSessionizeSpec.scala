package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming session_window rollup: exact boundary parity with the batch
  * Sessionize operator (an event exactly gapMs after its predecessor
  * stays in-session on both engines), cross-micro-batch session merging,
  * and kill/restart resume from the checkpoint. */
class StreamingSessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ev(rows: (Long, String, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("event_id", "ts_s", "user")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user"))
  }

  private def rollupSet(df: DataFrame): Set[(String, String, String, Long, Long)] =
    df.select(col("user"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"),
        col("duration_us"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet

  test("drained stream == batch; boundary event stays in-session; restart merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val batch1 = ev(
      (1L, "2026-01-01 10:00:00", "a"),
      (2L, "2026-01-01 10:00:30", "a"), // exactly gapMs later: SAME session
      (3L, "2026-01-01 10:01:30", "a"), // 60s > 30s gap: new session
      (4L, "2026-01-01 10:00:00", "b"))
    batch1.write.mode("append").parquet(s"$dir/in")
    def drain(): Unit = {
      val q = StreamingSessionize.sessions(
          spark.readStream.schema(batch1.schema).parquet(s"$dir/in"),
          Seq("user"), "ts", gapMs = 30000L, lateness = "10 seconds")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/cp")
        .format("parquet").option("path", s"$dir/out").start()
      q.awaitTermination(60000)
    }
    drain() // the kill: AvailableNow terminates after the backlog
    // batch 2 lands while the query is down: event 5 must MERGE into the
    // still-open second 'a' session; the zz sentinel pushes the
    // watermark past every real session so Append mode emits them
    val batch2 = ev(
      (5L, "2026-01-01 10:01:45", "a"),
      (6L, "2026-01-02 00:00:00", "zz"))
    batch2.write.mode("append").parquet(s"$dir/in")
    drain() // restart from the same checkpoint
    val got = rollupSet(
      spark.read.parquet(s"$dir/out").filter(col("user") =!= "zz"))
    val expect = rollupSet(
      graft.operators.Sessionize.sessions(
          batch1.unionByName(batch2).filter(col("user") =!= "zz"),
          Seq("user"), "ts", gapMs = 30000L))
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    // and the boundary semantics are what the batch operator promises:
    // events 1+2 are ONE session of 30s despite the exact-gap silence
    assert(got.contains(("a", "2026-01-01 10:00:00", "2026-01-01 10:00:30",
      2L, 30000000L)))
    // cross-batch merge: events 3+5 are one 15s session
    assert(got.contains(("a", "2026-01-01 10:01:30", "2026-01-01 10:01:45",
      2L, 15000000L)))
  }
}
