package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training: lay every document's tokens end to end
  * in one deterministic global stream and chunk the stream into
  * fixed-length sequences — the concatenate-then-chunk packing used for
  * LLM pretraining batches. Each document gets its global token interval
  * `[start_tok, end_tok)` and the first/last sequence index it lands in
  * at a given sequence length.
  *
  * The global order is a salted md5 of the id (a deterministic shuffle of
  * the corpus — neighbors are unrelated docs, which is what packing
  * wants), so the layout is a pure function of (ids, salt): reproducible
  * on any engine and any partitioning.
  *
  * Scale shape: a naive global cumulative sum is one all-rows window —
  * a single-partition sort at 100 TB. Instead a two-level prefix sum:
  * the first `d` hex digits of the order key split the stream into 16^d
  * range-aligned buckets (the bucket id is a PREFIX of the sort key, so
  * bucket order == global order); per-bucket totals cumulate in one
  * 16^d-row window (tiny), and each row then needs only its
  * WITHIN-bucket running sum (a window partitioned by bucket — 16^d-way
  * parallel, each ~1/16^d of the data) plus its bucket's offset.
  */
object Packing {

  /** Per-document packed intervals: `(doc, tokens, start_tok, end_tok,
    * seq_first, seq_last)` at sequence length `seqLen`. Zero-token
    * documents occupy an empty interval (seq_first = seq_last = the
    * sequence their position falls in).
    *
    * `bucketHexDigits` sizes the prefix-sum fan-out: 16^d buckets, each
    * sorted by ONE task in the per-bucket window. Size so corpus/16^d
    * fits a task comfortably — 2 (256 buckets) suits test scales; a
    * 100 TB corpus wants 4-5 (65k-1M buckets of 100 MB-1.5 GB). The
    * result is IDENTICAL for any d (the bucket id is a prefix of the
    * sort key, so bucket order == global order); only parallelism
    * changes. The offsets side stays one small window (16^d rows). */
  def pack(docs: DataFrame, idCol: String, tokenCol: String, seqLen: Long,
      salt: String = "graft-pack", bucketHexDigits: Int = 2): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    // cap at 5 (1M buckets): beyond that the offsets side stops being
    // "one small window + broadcast" and becomes its own scale problem
    require(bucketHexDigits >= 1 && bucketHexDigits <= 5,
      s"bucketHexDigits $bucketHexDigits out of [1,5]")
    val keyed = docs.select(
      col(idCol).as("doc"),
      greatest(col(tokenCol).cast("long"), lit(0L)).as("tokens"),
      md5(concat(lit(salt), col(idCol).cast("string"))).as("__key"))
      .withColumn("__bucket", substring(col("__key"), 1, bucketHexDigits))

    // bucket offsets: 16^d rows, cumulated in one tiny window
    val offsets = keyed.groupBy(col("__bucket"))
      .agg(sum(col("tokens")).as("__btok"))
      .withColumn("__offset",
        coalesce(sum(col("__btok")).over(
          Window.orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__btok")

    // within-bucket running sum, 256-way parallel; ties broken by doc id
    // so the order is total even under (astronomically unlikely) key ties
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("__key"), col("doc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("start_tok",
        col("__offset") + coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("end_tok", col("start_tok") + col("tokens"))
      .withColumn("seq_first", floor(col("start_tok") / seqLen))
      .withColumn("seq_last",
        floor(greatest(col("end_tok") - 1, col("start_tok")) / seqLen))
      .select(col("doc"), col("tokens"), col("start_tok"), col("end_tok"),
        col("seq_first"), col("seq_last"))
  }

  /** Packing efficiency summary: total sequences, total padding-free
    * tokens, and how many documents cross a sequence boundary at
    * `seqLen` — the numbers a pretraining data engineer reads before
    * committing a layout. */
  def stats(packed: DataFrame, seqLen: Long): DataFrame =
    packed.agg(
      count(lit(1)).as("n_docs"),
      sum(col("tokens")).as("total_tokens"),
      (floor((max(col("end_tok")) - 1) / seqLen) + 1).as("n_seqs"),
      sum(when(col("seq_last") > col("seq_first"), 1L).otherwise(0L))
        .as("boundary_crossers"))
}
