package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Misra-Gries: readStream parity with exact counts, state
  * recovery across a kill/restart, bounded state, and batch-form parity
  * with the streaming form. */
class StreamingTopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import StreamingTopK.Snapshot

  /** Latest emission per shard = the current sketch; union the shards. */
  private def currentSketch(snaps: Seq[(Long, Snapshot)]): Map[String, Long] = {
    val latestBatchByShard = snaps.groupBy(_._2.shard)
      .map { case (sh, rows) => sh -> rows.map(_._1).max }
    snaps.filter { case (b, s) => latestBatchByShard(s.shard) == b }
      .map { case (_, s) => s.key -> s.est }.toMap
  }

  test("stream sketch equals exact counts across micro-batches (exact regime)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("stopk").toString
    val in = MemoryStream[String]
    val q = StreamingTopK.topKStream(in.toDS(), capacity = 16, shards = 4)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Snapshot], batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out/batch=$batchId")
      }
      .outputMode("update")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      in.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b"): _*)
      q.processAllAvailable()
      in.addData(Seq.fill(4)("a") ++ Seq.fill(7)("c"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val snaps = spark.read.option("basePath", s"$tmp/out")
      .parquet(s"$tmp/out")
      .selectExpr("CAST(batch AS BIGINT)", "shard", "key", "est")
      .collect().map(r => (r.getLong(0), Snapshot(r.getInt(1), r.getString(2), r.getLong(3))))
    assert(currentSketch(snaps.toSeq) == Map("a" -> 9L, "b" -> 3L, "c" -> 7L))
  }

  test("kill/restart recovers per-shard sketch state from the checkpoint") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("stopk-kill").toString
    val in = MemoryStream[String]
    def start() = StreamingTopK.topKStream(in.toDS(), capacity = 16, shards = 4)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Snapshot], batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out/batch=$batchId")
      }
      .outputMode("update")
      .option("checkpointLocation", s"$tmp/chk").start()
    val q1 = start()
    in.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b"): _*)
    q1.processAllAvailable()
    in.addData(Seq.fill(2)("a") ++ Seq.fill(6)("c"): _*) // pending at the kill
    q1.stop()
    val q2 = start()
    try {
      q2.processAllAvailable()
      in.addData(Seq.fill(1)("b") ++ Seq.fill(2)("c"): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val snaps = spark.read.option("basePath", s"$tmp/out")
      .parquet(s"$tmp/out")
      .selectExpr("CAST(batch AS BIGINT)", "shard", "key", "est")
      .collect().map(r => (r.getLong(0), Snapshot(r.getInt(1), r.getString(2), r.getLong(3))))
    // counts survive the restart: a=7, b=4, c=8 — no loss, no double count
    assert(currentSketch(snaps.toSeq) == Map("a" -> 7L, "b" -> 4L, "c" -> 8L))
  }

  test("state stays bounded and shards are key-disjoint under truncation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val keys = Seq.fill(300)("hot") ++ (1 to 200).map(i => s"cold$i")
    val in = MemoryStream[String]
    val q = StreamingTopK.topKStream(in.toDS(), capacity = 8, shards = 4)
      .writeStream.format("memory").queryName("stopk_bound")
      .outputMode("update").start()
    try {
      keys.grouped(100).foreach { g => in.addData(g: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("stopk_bound")
      .select("shard", "key", "est").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // each key only ever appears in its md5 shard
    rows.groupBy(_._2).foreach { case (key, occ) =>
      assert(occ.map(_._1).distinct.length == 1, s"$key crossed shards")
      assert(occ.head._1 == StreamingTopK.shardOf(key, 4))
    }
    // per-shard summaries are bounded by capacity in every emission
    assert(rows.groupBy(_._1).forall(_._2.map(_._2).distinct.size <= 8 + 8),
      "shard emitted more distinct keys than two truncation windows")
    // the heavy key survives with the n/k undercount bound in its shard
    val hotEst = rows.filter(_._2 == "hot").map(_._3).max
    assert(hotEst <= 300L && hotEst >= 300L - (500L / 8))
  }

  test("batch-driven incremental form matches the one-shot sketch (exact regime)") {
    val s = spark; import s.implicits._
    val df = (1 to 100).map(i =>
      (i.toLong, if (i % 3 == 0) "x" else if (i % 3 == 1) "y" else "z"))
      .toDF("id", "k")
    val got = StreamingTopK.topKBatches(df, "id", "k",
      numBatches = 5, capacity = 16, shards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("x" -> 33L, "y" -> 34L, "z" -> 33L))
  }

  test("id ranges spanning most of Long do not overflow the batch cuts") {
    val s = spark; import s.implicits._
    // lo near Long.MinValue, hi near Long.MaxValue: span and span*i
    // overflow 64-bit — the cuts must still cover every row
    val df = Seq((Long.MinValue + 3, "a"), (-7L, "a"), (0L, "b"),
      (42L, "a"), (Long.MaxValue - 5, "b")).toDF("id", "k")
    val got = StreamingTopK.topKBatches(df, "id", "k",
      numBatches = 4, capacity = 8, shards = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L), s"got $got")
  }
}
