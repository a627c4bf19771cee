package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring span removal: hand-computed coverage, within-doc
  * repeats, short-doc passthrough, and the md5 witness parity between
  * `exactSubstrRemove` and `cleaned`. */
class SpanDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e"),      // "a b c" shared with doc 2 → p0-2 covered
    (2L, "x a b c y"),      // → p1-3 covered
    (3L, "q r s t"),        // all unique → untouched
    (4L, "z z"),            // < 3 tokens → no shingles, untouched
    (5L, "m n o m n o m n o") // within-doc repeats → fully covered
  ).toDF("doc_id", "text")

  test("cross-doc repeated 3-grams are cut; survivors keep original order") {
    val got = SpanDedup.cleaned(docs, "doc_id", "text", n = 3)
      .orderBy(col("doc_id")).as[(Long, String)].collect().toSeq
    assert(got == Seq(
      1L -> "d e",
      2L -> "x y",
      3L -> "q r s t",
      4L -> "z z",
      5L -> ""), s"got $got")
  }

  test("n_removed counts covered positions; md5 witnesses the cleaned text") {
    val got = SpanDedup.exactSubstrRemove(docs, "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_removed"), col("clean_md5"))
      .as[(Long, Long, String)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq(1L -> 3L, 2L -> 3L, 3L -> 0L, 4L -> 0L, 5L -> 9L),
      s"got $got")
    // md5 parity with the cleaned text (DuckDB computes the same hex)
    val expectMd5 = Seq("d e", "x y", "q r s t", "z z", "")
      .map(s => java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got.map(_._3) == expectMd5)
  }

  test("overlapping duplicated spans collapse (no double-count)") {
    // "a b c d" repeated whole: shingles "a b c" and "b c d" both dup;
    // coverage is the union {0,1,2,3}, not 6
    val d = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = SpanDedup.exactSubstrRemove(d, "doc_id", "text", n = 3)
      .orderBy(col("doc_id")).as[(Long, Long, String)].collect().toSeq
    assert(got.map(_._2) == Seq(4L, 4L), s"got $got")
  }

  test("invariants on real corpus: token conservation and monotonicity") {
    // On the sf0.001 documents table: (kept + removed) tokens == original
    // tokens per doc, and appending an exact copy of a doc can only grow
    // the removed set (removal is monotone in corpus duplication).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100).cache()
    try {
      val before = SpanDedup.exactSubstrRemove(docs, "doc_id", "text", n = 3)
      val tokCounts = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      val kept = SpanDedup.cleaned(docs, "doc_id", "text", n = 3)
        .select(col("doc_id"),
          when(col("clean_text") === "", lit(0L))
            .otherwise(size(split(col("clean_text"), " ")).cast("long"))
            .as("n_kept"))
      val bad = before.join(tokCounts, "doc_id").join(kept, "doc_id")
        .filter(col("n_kept") + col("n_removed") =!= col("n_tok"))
      assert(bad.count() == 0,
        s"token conservation violated: ${bad.collect().take(3).toSeq}")
      // duplicate one doc under a fresh id: its spans all become repeated
      val dupSrc = docs.orderBy(col("doc_id")).limit(1)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val after = SpanDedup.exactSubstrRemove(docs.unionByName(dupSrc),
        "doc_id", "text", n = 3)
      val grew = before.withColumnRenamed("n_removed", "r0")
        .select(col("doc_id"), col("r0"))
        .join(after.select(col("doc_id"), col("n_removed").as("r1")), "doc_id")
        .filter(col("r1") < col("r0"))
      assert(grew.count() == 0, "duplication must never shrink removal")
    } finally { docs.unpersist(); () }
  }

  test("plan shape: no cartesian product, no pair enumeration") {
    val plan = SpanDedup.exactSubstrRemove(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
