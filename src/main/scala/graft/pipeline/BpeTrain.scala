package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Blocks

/** Distributed BPE merge-rule TRAINING (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * learning half of the tokenizer pipeline ([[graft.functions.Bpe]] is
  * the codegen'd applier).
  *
  * Classic formulation: represent each distinct word as a symbol
  * sequence (initially characters), weighted by corpus frequency; K
  * times pick the most frequent adjacent symbol pair and merge its
  * left-to-right non-overlapping occurrences everywhere. The merge rank
  * table IS the tokenizer.
  *
  * Spark-first shape: the heavy pass is ONE corpus scan (tokenize +
  * word count — combinable aggregation); iterations then run over the
  * word-frequency table, which is Heaps-bounded (vocabulary-sized, not
  * corpus-sized — ~100M rows for a 100 TB crawl, a perfectly good
  * DataFrame but never the raw corpus). Per iteration: one adjacent-pair
  * explode + combinable weighted count, a 1-row TakeOrdered collect (the
  * argmax pair — a bounded driver probe), and one map-only merge pass
  * over the symbol arrays. Lineage is truncated per iteration with eager
  * localCheckpoint and superseded blocks freed — the [[PageRank]]
  * discipline.
  *
  * Determinism: the argmax pair tie-breaks on (count DESC, left ASC,
  * right ASC) and the merge fold is position-deterministic, so the rule
  * table is bit-identical on any partitioning and mirrorable in oracle
  * SQL (run-parity marks reproduce the same left-to-right semantics
  * set-wise). Counts are exact integers.
  */
object BpeTrain {

  /** Whitespace tokens — the same tokenizer the text-analysis family
    * uses, so learned merges compose with [[TextAnalysis]] surfaces. */
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Learn `numMerges` BPE merge rules from the corpus. Returns
    * (step, lhs, rhs, cnt): 1-based merge rank, the merged pair, and its
    * weighted occurrence count at selection time. Stops early (fewer
    * rows) when no adjacent pair remains. */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "need at least one merge")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus pass: word frequencies (Heaps-bounded output)
    val wf = df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // initial symbol sequences: characters
    // split keeps a trailing "" (Spark's limit=-1 semantics, unlike
    // java.lang.String.split) — drop empties or a phantom ("t","") pair
    // wins a merge round
    var t = wf.select(col("word"), col("freq"),
        filter(split(col("word"), "(?!^)"), s => length(s) > 0).as("syms"))
      .localCheckpoint(eager = true)
    val rules = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      step += 1
      // weighted adjacent-pair counts: explode (sym_i, sym_i+1), one
      // combinable sum — then the argmax pair via TakeOrdered(1)
      val top = t
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b"))))
          .otherwise(array())).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        rules += ((step, a, b, c))
        // merge pass: left fold over each symbol array — append, except
        // when the running last symbol is `a` and the current is `b`,
        // which replaces the last with the merged symbol. Left-to-right
        // non-overlapping by construction (a freshly merged `ab` is
        // longer than `a`, so it can never immediately re-match as the
        // left side of the same rule).
        val merged = t.select(col("word"), col("freq"),
            aggregate(col("syms"),
              array().cast("array<string>"),
              (acc, x) => when(
                size(acc) > 0 &&
                  element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1),
                  array(lit(a + b))))
                .otherwise(concat(acc, array(x)))).as("syms"))
          .localCheckpoint(eager = true)
        Blocks.free(t)
        t = merged
      }
    }
    Blocks.free(t)
    rules.toSeq.toDF("step", "lhs", "rhs", "cnt")
      .select(col("step").cast("long").as("step"), col("lhs"), col("rhs"),
        col("cnt"))
  }
}
