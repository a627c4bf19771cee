package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Greedy longest-match WordPiece: the BERT tokenizer semantics —
  * continuation prefixes, longest-wins, [UNK] on uncoverable remainders. */
class WordPieceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def pieces(text: String, vocab: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(WordPiece.tokenize(split(col("t"), " "), vocab).as("p"))
      .as[Seq[String]].collect()(0)

  test("the classic BERT example: unaffable → un ##aff ##able") {
    val v = Seq("un", "##aff", "##able", "aff", "able")
    assert(pieces("unaffable", v) == Seq("un", "##aff", "##able"))
    // standalone words prefer the un-prefixed entries
    assert(pieces("able", v) == Seq("able"))
  }

  test("longest match wins over shorter prefixes") {
    val v = Seq("the", "them", "##m", "t", "##h", "##e")
    assert(pieces("them", v) == Seq("them"),
      "must take the whole-word match, not the + ##m")
    assert(pieces("the", v) == Seq("the"))
    // greedy, not optimal: "thex" takes "the" first, then ##x is missing
    assert(pieces("thex", v) == Seq("[UNK]"))
  }

  test("uncoverable remainder collapses the whole word to [UNK]") {
    val v = Seq("ab", "##cd")
    assert(pieces("abcd", v) == Seq("ab", "##cd"))
    assert(pieces("abcdz", v) == Seq("[UNK]"))
    assert(pieces("zabcd", v) == Seq("[UNK]"))
  }

  test("multiple words stream their pieces in order; empties vanish") {
    val v = Seq("a", "b", "##b")
    assert(pieces("a  bb a", v) == Seq("a", "b", "##b", "a"),
      "double space contributes nothing")
  }

  test("over-long words short-circuit to [UNK]") {
    val v = ('a' to 'z').flatMap(c => Seq(c.toString, "##" + c))
    val long = "a" * 65
    assert(pieces(s"$long ok", v) == Seq("[UNK]", "o", "##k"))
  }

  test("char vocabulary closed form: one piece per char or [UNK]") {
    import graft.pipeline.TextAnalysis
    val got = Seq((1L, "Hello world x9"), (2L, "abc"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.wordPieceCount(col("text"), TextAnalysis.CharVocab)
          .as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // "Hello"(5) + "world"(5) + "x9"→[UNK](1) = 11; "abc" = 3
    assert(got == Map(1L -> 11L, 2L -> 3L), s"got $got")
  }

  test("kernel runs inside whole-stage codegen on non-foldable input") {
    // a literal input constant-folds away at plan time; a range-derived
    // column forces the generated path
    val df = spark.range(2)
      .select(WordPiece.tokenize(
        split(concat(lit("a b x"), col("id").cast("string")), " "),
        Seq("a", "b")).as("p"))
    // "*(n)" is the WholeStageCodegen marker in the executed-plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan:\n$plan")
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "b", "[UNK]"), Seq("a", "b", "[UNK]")),
      s"generated path must run the same greedy loop: $got")
  }
}
