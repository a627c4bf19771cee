package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic training-output shards: membership is a pure id hash,
  * the write is one exchange + a partition-local sort, every file is
  * internally ordered, and hot shards roll over under maxRecordsPerFile. */
class ShardingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  lazy val docs = (1L to 400L).map(i => (i, s"doc body $i"))
    .toDF("doc_id", "text")

  test("shard assignment is deterministic, total, and reasonably balanced") {
    val a = Sharding.assignShards(docs, "doc_id", 8)
    val b = Sharding.assignShards(docs, "doc_id", 8)
    val mapA = a.select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mapB = b.select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mapA == mapB, "re-runs must agree on membership")
    assert(mapA.values.toSet.subsetOf((0 until 8).toSet))
    val sizes = mapA.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 8, "400 docs over 8 hash shards should hit all")
    assert(sizes.values.max <= 3 * sizes.values.min + 10,
      s"md5 sharding should be roughly balanced: $sizes")
    // a different salt re-shuffles membership
    val salted = Sharding.assignShards(docs, "doc_id", 8, salt = "other")
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(salted != mapA)
  }

  test("write: directory per shard, files sorted within, rows complete") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Sharding.writeShards(docs, "doc_id", "doc_id", numShards = 4, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(shardDirs.toSeq ==
      Seq("shard_id=0", "shard_id=1", "shard_id=2", "shard_id=3"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 400, "no row lost in the round-trip")
    assert(back.select("doc_id").distinct().count() == 400)
    // membership on disk equals the pure assignment function
    val expected = Sharding.assignShards(docs, "doc_id", 4)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    back.select(col("doc_id"), col("shard_id").cast("int")).collect()
      .foreach(r => assert(expected(r.getLong(0)) == r.getInt(1)))
    // every physical file is internally sorted by the sort key
    val perFile = back
      .select(input_file_name().as("f"), col("doc_id"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    perFile.foreach { case (f, ids) =>
      assert(ids == ids.sorted, s"file $f not internally sorted")
    }
  }

  test("maxRecordsPerFile rolls a hot shard into bounded files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards-cap").toString
    // 1 shard -> everything is hot; cap at 100 records per file
    Sharding.writeShards(docs, "doc_id", "doc_id", numShards = 1, dir,
      maxRecordsPerFile = 100L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 400)
    val fileCounts = back.select(input_file_name().as("f"))
      .groupBy("f").count().collect().map(_.getLong(1))
    assert(fileCounts.length >= 4, s"expected >=4 rolled files, got ${fileCounts.length}")
    assert(fileCounts.forall(_ <= 100), s"file over cap: ${fileCounts.toSeq}")
  }

  test("plan: one hash exchange on shard_id, partition-local sort, no global sort") {
    val plan = Sharding.shardedFrame(docs, "doc_id", "doc_id", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard_id"),
      s"rows must exchange straight to their shard:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"no global sort barrier in the write path:\n$plan")
    assert("Sort \\[".r.findFirstIn(plan).isDefined &&
      plan.contains("false, 0"),
      s"expected a partition-local (global=false) sort:\n$plan")
  }
}
