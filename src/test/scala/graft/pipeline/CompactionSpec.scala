package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Seen-index compaction for the streaming near-dup dedup: merged state
  * must be decision-identical to the unmerged history, through every
  * crash window the commit protocol claims to survive. */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // near-dup structure spanning batches: 2 dups 0, 4 near-dups 0,
  // 6 dups 3, 8 dups 0 (arrives only after compaction in the tests)
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq((0L, "the quick brown fox jumps over the lazy dog today"),
        (1L, "completely different words about spark and scala engines")),
    Seq((2L, "the quick brown fox jumps over the lazy dog today"),
        (3L, "fresh sentences resembling nothing else in this corpus here")),
    Seq((4L, "the quick brown fox jumps over the lazy cat today"),
        (5L, "unrelated text mentioning neither animals nor engines at all")),
    Seq((6L, "fresh sentences resembling nothing else in this corpus here"),
        (7L, "seven distinct tokens assembled for the seventh document")),
    Seq((8L, "the quick brown fox jumps over the lazy dog today"),
        (9L, "a closing document unlike anything that came before it")))

  private def processUpTo(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      StreamingNearDedup.processBatch(batches(i).toDF("doc_id", "text"),
        i.toLong, s"$dir/state", s"$dir/out")
    }

  private def survivors(dir: String): Set[Long] =
    spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet

  private def batchDirs(dir: String, sub: String): Set[String] =
    new java.io.File(s"$dir/state/$sub").listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch=")).toSet

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  lazy val control: String = {
    val d = tmp("compact-ctl"); processUpTo(d, 5); d
  }

  test("compaction merges history without changing any later decision") {
    val d = tmp("compact-run")
    processUpTo(d, 4)
    StreamingNearDedup.compactState(spark, s"$d/state")
    // batches 0..2 and nothing else merged into gen -1; newest batch 3
    // stays replayable; per-band layout kept inside the generation
    assert(batchDirs(d, "sigs") == Set("batch=-1", "batch=3"),
      s"got ${batchDirs(d, "sigs")}")
    assert(batchDirs(d, "shingles") == Set("batch=-1", "batch=3"))
    assert(new java.io.File(s"$d/state/sigs/batch=-1/_SUCCESS").exists())
    assert(new java.io.File(s"$d/state/sigs/batch=-1").listFiles()
      .exists(_.getName.startsWith("band=")), "band partitioning preserved")
    // batch 4 carries a dup of doc 0, visible now only via the generation
    StreamingNearDedup.processBatch(batches(4).toDF("doc_id", "text"),
      4L, s"$d/state", s"$d/out")
    assert(survivors(d) == survivors(control),
      s"${survivors(d)} vs ${survivors(control)}")
    assert(!survivors(d).contains(8L), "dup of doc 0 must fall to the gen")
  }

  test("repeated compaction folds older generations into the next one") {
    val d = tmp("compact-twice")
    processUpTo(d, 3)
    StreamingNearDedup.compactState(spark, s"$d/state") // 0,1 -> gen -1
    processUpTo2(d, 3, 4)
    StreamingNearDedup.compactState(spark, s"$d/state") // -1,2 -> gen -2
    assert(batchDirs(d, "sigs") == Set("batch=-2", "batch=3"),
      s"got ${batchDirs(d, "sigs")}")
    StreamingNearDedup.processBatch(batches(4).toDF("doc_id", "text"),
      4L, s"$d/state", s"$d/out")
    assert(survivors(d) == survivors(control))
  }

  private def processUpTo2(dir: String, from: Int, until: Int): Unit =
    (from until until).foreach { i =>
      StreamingNearDedup.processBatch(batches(i).toDF("doc_id", "text"),
        i.toLong, s"$dir/state", s"$dir/out")
    }

  test("crash mid-delete: a source surviving beside the generation is harmless") {
    val d = tmp("compact-overlap")
    processUpTo(d, 4)
    StreamingNearDedup.compactState(spark, s"$d/state")
    // resurrect batch 0's rows as an undeleted source — the exact state a
    // crash between the gen commit and the source deletes leaves behind
    val inc0 = StreamingNearDedup.increment(
      batches(0).toDF("doc_id", "text"), "doc_id", "text", None)
    inc0.shingles.write.mode("overwrite")
      .parquet(s"$d/state/shingles/batch=0")
    inc0.sigs.write.partitionBy("band").mode("overwrite")
      .parquet(s"$d/state/sigs/batch=0")
    // doc 0's shingle rows now exist in BOTH gen -1 and batch 0; the
    // doubled rows must not distort batch 4's Jaccard verdicts
    StreamingNearDedup.processBatch(batches(4).toDF("doc_id", "text"),
      4L, s"$d/state", s"$d/out")
    assert(survivors(d) == survivors(control),
      s"overlap window distorted decisions: ${survivors(d)}")
    // and the next compaction absorbs the leftover
    StreamingNearDedup.compactState(spark, s"$d/state")
    assert(!batchDirs(d, "sigs").contains("batch=0"))
  }

  test("an uncommitted (half-written) generation is invisible to readers") {
    val d = tmp("compact-halfgen")
    processUpTo(d, 4)
    // a crashed compaction: gen dir with data files but no _SUCCESS —
    // poison rows that would drop every batch-4 doc if read
    val poison = StreamingNearDedup.increment(
      batches(4).toDF("doc_id", "text"), "doc_id", "text", None)
    poison.shingles.write.mode("overwrite")
      .parquet(s"$d/state/shingles/batch=-7")
    poison.sigs.write.partitionBy("band").mode("overwrite")
      .parquet(s"$d/state/sigs/batch=-7")
    assert(new java.io.File(s"$d/state/sigs/batch=-7/_SUCCESS").delete())
    StreamingNearDedup.processBatch(batches(4).toDF("doc_id", "text"),
      4L, s"$d/state", s"$d/out")
    assert(survivors(d) == survivors(control),
      s"uncommitted gen leaked into prior state: ${survivors(d)}")
  }

  test("replay of the newest batch still short-circuits after compaction") {
    val d = tmp("compact-replay")
    processUpTo(d, 4)
    StreamingNearDedup.compactState(spark, s"$d/state")
    val before = survivors(d)
    val sigRows = spark.read.parquet(s"$d/state/sigs").count()
    StreamingNearDedup.processBatch(batches(3).toDF("doc_id", "text"),
      3L, s"$d/state", s"$d/out")
    assert(survivors(d) == before, "replay must be a no-op")
    assert(spark.read.parquet(s"$d/state/sigs").count() == sigRows)
  }

  test("compaction is a no-op below two committed sources") {
    val d = tmp("compact-noop")
    processUpTo(d, 1)
    StreamingNearDedup.compactState(spark, s"$d/state")
    assert(batchDirs(d, "sigs") == Set("batch=0"), "nothing to merge")
  }
}
