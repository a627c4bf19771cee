package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aho-Corasick blocklist matcher: failure-link correctness on the
  * classic pattern sets, overlap handling, and exhaustive parity with
  * the naive one-contains-per-phrase formulation. */
class BlocklistSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(text: String, phrases: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(Blocklist.matched(col("t"), phrases).as("m"))
      .as[Seq[String]].collect()(0)

  test("the classic he/she/his/hers set: fail links find nested suffixes") {
    // "ushers" contains she, he, hers — and "his" is absent
    assert(run("ushers", Seq("he", "she", "his", "hers")) ==
      Seq("he", "hers", "she"))
    assert(run("this", Seq("he", "she", "his", "hers")) == Seq("his"))
    assert(run("xyz", Seq("he", "she", "his", "hers")) == Seq.empty)
  }

  test("overlapping and self-overlapping phrases all register") {
    assert(run("ababa", Seq("aba", "ab", "ba")) == Seq("ab", "aba", "ba"))
    assert(run("aaaa", Seq("aa", "aaa")) == Seq("aa", "aaa"))
    // a phrase equal to the whole text; one that overruns it
    assert(run("abc", Seq("abc", "abcd")) == Seq("abc"))
  }

  test("multi-word phrases match across token boundaries; output is distinct + sorted") {
    val got = run("the table scan hit the table scan again",
      Seq("table scan", "scan hit", "the table"))
    assert(got == Seq("scan hit", "table scan", "the table"))
    assert(run("", Seq("x")) == Seq.empty)
    // duplicate list entries collapse at build time — each text appears
    // once in the output, not once per duplicate automaton index
    assert(run("ushers", Seq("she", "he", "she", "she")) == Seq("he", "she"))
  }

  test("screen drops exactly the docs containing any phrase; filter stays scan-local") {
    val df = Seq((1L, "clean words only"), (2L, "contains bad phrase here"),
      (3L, "also fine")).toDF("id", "t")
    val kept = Blocklist.screen(df, "t", Seq("bad phrase", "zzz"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    val plan = Blocklist.screen(df, "t", Seq("bad phrase"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"screening must not shuffle:\n$plan")
  }

  test("parity with the naive contains formulation on generated texts") {
    val alphabet = "abc "
    val phrases = Seq("ab", "bc", "ca", "abc", "b c", "cab", "a", "bcbc")
    // deterministic text generation: every 7-char string over {a,b,c,' '}
    // indexed by a counter — covers boundaries, repeats, spaces
    val texts = (0 until 2000).map { n =>
      (0 until 7).map(i => alphabet((n / math.pow(4, i).toInt) % 4)).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val naive = df.select(col("id"), array_sort(filter(
      array(phrases.map(lit): _*),
      p => col("t").contains(p))).as("m"))
    val kernel = df.select(col("id"),
      Blocklist.matched(col("t"), phrases).as("m"))
    val diff = naive.join(kernel.withColumnRenamed("m", "k"), "id")
      .filter(col("m") =!= col("k"))
    assert(diff.count() == 0,
      s"mismatches: ${diff.limit(3).collect().toSeq}")
  }
}
