package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-substring span REMOVAL — the surgical counterpart of
  * [[TextAnalysis.dupSpanCoverage]]'s scoring. Where near-dup dedup drops
  * whole documents, this cuts only the repeated spans and keeps the rest:
  * every token covered by an n-gram that occurs 2+ times anywhere in the
  * corpus (any doc, any position — within-doc repeats count) is removed,
  * and the survivors are re-joined in original order. This is the
  * practical form of exact-substring deduplication for training corpora
  * (boilerplate, license headers, navigation chrome) popularized by
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al., 2022) — expressed as joins over positional n-grams instead of a
  * suffix array, which Spark distributes naturally.
  *
  * Scale shape: O(corpus tokens), never O(docs²) —
  *  - positional n-grams are a pure projection (transform over a
  *    sequence, no join to build them);
  *  - "occurs 2+ times" is one map-side-combined groupBy(sid);
  *  - coverage expansion multiplies by n (a constant), then distincts on
  *    (doc, position) — partitioned by doc, no skew beyond doc length;
  *  - the final anti-join + per-doc rebuild shuffle on the doc key.
  * A hub n-gram repeated k times contributes k rows, not k² pairs.
  */
object SpanDedup {

  /** Documents with corpus-repeated n-gram spans cut out.
    *
    * Returns one row per input doc: `idCol`, `n_removed` (token positions
    * cut), and `clean_md5` (md5 of the surviving tokens joined by single
    * spaces — the compact equality witness for the cleaned text; use
    * [[cleaned]] when the text itself is needed downstream). */
  def exactSubstrRemove(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val parts = components(df, idCol, textCol, n)
    df.select(col(idCol))
      .join(parts.removedCounts, Seq(idCol), "left_outer")
      .join(parts.rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"))
  }

  /** Same computation, returning the cleaned text column itself
    * (`clean_text`) for pipeline composition. */
  def cleaned(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val parts = components(df, idCol, textCol, n)
    df.select(col(idCol))
      .join(parts.rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  private case class Parts(removedCounts: DataFrame, rebuilt: DataFrame)

  private def components(df: DataFrame, idCol: String, textCol: String,
      n: Int): Parts = {
    val toks: Column = TextAnalysis.tokens(col(textCol))
    // positional n-grams: (doc, start position p, shingle id) — a pure
    // projection; docs shorter than n produce no rows and fall through
    // the left joins untouched
    val positional = df
      .select(col(idCol).as("doc"),
        posexplode(
          when(size(toks) >= n,
            transform(sequence(lit(0), size(toks) - n),
              i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
            .otherwise(array())).as(Seq("p", "shingle")))
      .select(col("doc"), col("p"),
        (TextAnalysis.stableId(col("shingle")) % Dedup.P).as("sid"))
    // an n-gram is boilerplate when it occurs 2+ times anywhere —
    // position count, not distinct-doc count, so within-doc repetition
    // (the classic lorem-ipsum pathology) is cut too
    val dup = positional.groupBy(col("sid"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2).select("sid")
    // covered token positions: each duplicated start spreads over its n
    // tokens; distinct on (doc, position) collapses overlapping spans
    val covered = positional.join(dup, Seq("sid"))
      .select(col("doc"), explode(sequence(col("p"), col("p") + n - 1)).as("cp"))
      .distinct()
    val removedCounts = covered.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_removed"))
      .withColumnRenamed("doc", idCol)
    // rebuild: positional tokens minus covered positions, re-joined in
    // original order (array_sort on (p, tok) structs is the order-by)
    val tokPos = df.select(col(idCol).as("doc"),
      posexplode(toks).as(Seq("p", "tok")))
    val rebuilt = tokPos
      .join(covered, tokPos("doc") === covered("doc") &&
        tokPos("p") === covered("cp"), "left_anti")
      .groupBy(col("doc"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x("tok"))).as("clean_text"))
      .withColumnRenamed("doc", idCol)
    Parts(removedCounts, rebuilt)
  }
}
