package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Funnel stages: greedy earliest-completion chains, strict ordering,
  * out-of-order events, and the stage-0 floor. */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def stagesOf(rows: (Long, String, Long)*): Map[Long, Long] =
    Funnel.stages(
      rows.map { case (u, e, t) => (u, e, ts(t)) }.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "buy"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("full conversion, partial prefixes, and never-started keys") {
    val got = stagesOf(
      (1L, "view", 10), (1L, "click", 20), (1L, "buy", 30),  // stage 3
      (2L, "view", 10), (2L, "click", 20),                   // stage 2
      (3L, "view", 10),                                      // stage 1
      (4L, "click", 10), (4L, "buy", 20))                    // stage 0: no view
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L), s"got $got")
  }

  test("order is strict: a step at-or-before the previous stage never counts") {
    // click arrives BEFORE the view; same-timestamp click doesn't count either
    val got = stagesOf(
      (1L, "click", 5), (1L, "view", 10),
      (2L, "view", 10), (2L, "click", 10))
    assert(got == Map(1L -> 1L, 2L -> 1L), s"got $got")
  }

  test("greedy earliest chain maximizes the reached stage") {
    // view@10, click@5 (dead), click@20, buy@25: chain 10 < 20 < 25 works
    val got = stagesOf(
      (1L, "click", 5), (1L, "view", 10), (1L, "click", 20), (1L, "buy", 25))
    assert(got == Map(1L -> 3L), s"got $got")
  }

  test("repeat steps use the earliest qualifying occurrence") {
    // two views: the EARLIER one anchors the chain, letting click@15 count
    val got = stagesOf(
      (1L, "view", 10), (1L, "view", 50), (1L, "click", 15))
    assert(got == Map(1L -> 2L), s"got $got")
  }

  test("streaming funnel: in-order stream matches the batch form across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import Funnel.Event
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      Event(1L, "view", 10), Event(1L, "click", 20), Event(1L, "buy", 30),
      Event(2L, "view", 10), Event(2L, "click", 5), // click too early
      Event(3L, "click", 10), Event(3L, "buy", 20))
    val tmp = java.nio.file.Files.createTempDirectory("funnel-stream").toString
    val in = MemoryStream[Event]
    val q = Funnel.stagesStream(in.toDS(), Seq("view", "click", "buy"))
      .writeStream.outputMode("update").foreachBatch {
        (b: org.apache.spark.sql.Dataset[(Long, Int)], id: Long) =>
          b.write.mode("overwrite").parquet(s"$tmp/batch=$id")
      }.start()
    try {
      in.addData(all.take(3)); q.processAllAvailable()
      in.addData(all.drop(3)); q.processAllAvailable()
    } finally q.stop()
    // latest stage per key across the update stream
    val got = spark.read.parquet(tmp)
      .groupBy($"_1").agg(org.apache.spark.sql.functions.max($"_2").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val batch = stagesOf(all.map(e => (e.key, e.eventType, e.tsUs)): _*)
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
  }

  test("report rolls stages into the conversion histogram") {
    val df = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)),
      (2L, "view", ts(1)),
      (3L, "buy", ts(1))).toDF("user_id", "event_type", "ts")
    val got = Funnel.report(df, "user_id", "event_type", "ts",
      Seq("view", "click", "buy")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"got $got")
  }
}
