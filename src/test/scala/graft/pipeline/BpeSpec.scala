package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeSegment

/** BPE merge induction + the native segmentation kernel, against the
  * hand-derived merge sequence of the Sennrich et al. (2016) reference
  * corpus {low×5, lower×2, newest×6, widest×3} (no end-of-word marker):
  * round-by-round pair weights give
  *   (e,s)=9 → (es,t)=9 → (l,o)=7 → (lo,w)=7 → (e,w)=6
  * with lexicographic tie-breaks at rounds 1 and 5. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def corpus = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread across docs to prove corpus-level (not per-doc) counting
    words.grouped(4).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
  }

  private val expectedMerges = Seq(
    "e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w", "e" -> "w")

  test("bpeTrain reproduces the reference merge sequence, tie-breaks and all") {
    val merges = TextAnalysis.bpeTrain(corpus, "text", numMerges = 5)
    assert(merges == expectedMerges, s"got $merges")
    // deterministic under any partitioning
    val repartitioned = TextAnalysis.bpeTrain(
      corpus.repartition(7), "text", numMerges = 5)
    assert(repartitioned == expectedMerges)
    // minFreq stops induction before degenerate single-occurrence merges
    val capped = TextAnalysis.bpeTrain(corpus, "text", numMerges = 50,
      minFreq = 6L)
    assert(capped.size < 50 && capped.take(2) == expectedMerges.take(2),
      s"got $capped")
  }

  test("segment kernel applies merges in rank order, all occurrences") {
    val got = Seq((1L, "newest lowest low zzz"))
      .toDF("id", "text")
      .select(BpeSegment.segment(
        TextAnalysis.tokens(col("text")), expectedMerges).as("p"))
      .as[Seq[String]].collect()(0)
    // newest → n|ew|est (es first, then est, then ew);
    // lowest → low|est; low → low; zzz has no merges → chars
    assert(got == Seq("n", "ew", "est", "low", "est", "low", "z", "z", "z"),
      s"got $got")
  }

  test("token count is monotone non-increasing in the number of merges") {
    val counts = (0 to 5).map { k =>
      corpus.select(size(BpeSegment.segment(
        TextAnalysis.tokens(col("text")), expectedMerges.take(k))).as("n"))
        .agg(sum(col("n"))).collect()(0).getLong(0)
    }
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
    assert(counts.last < counts.head, "merges must actually compress")
  }

  test("bpePairCounts: hand-computed first-round weights") {
    val got = TextAnalysis.bpePairCounts(corpus, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got(("e", "s")) == 9L && got(("s", "t")) == 9L)
    assert(got(("l", "o")) == 7L && got(("o", "w")) == 7L)
    assert(got(("w", "e")) == 8L, s"lower(2) + newest(6): got ${got(("w", "e"))}")
    assert(got(("e", "r")) == 2L)
  }
}
