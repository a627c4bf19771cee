package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Benchmark-contamination detection for training corpora: the fraction of
  * each training document's word n-grams that also occur in an
  * evaluation/benchmark set — the standard decontamination step before
  * training (an eval example whose n-grams leak into the corpus inflates
  * downstream scores).
  *
  * Scale shape: the benchmark side is eval-set sized (thousands of
  * documents, ≪ corpus), so its DISTINCT shingle-id set BROADCASTS; the
  * corpus side is then one scan + one `groupBy(doc)` aggregation with a
  * map-side-combinable conditional count. The 100 TB corpus is never
  * shuffled by shingle and never joined against itself — contrast the
  * dedup self-join, which this deliberately is not. Shingles reuse
  * [[Dedup.shingleIds]] (md5-derived ids, the codegen n-gram kernel), so
  * the DuckDB oracle reproduces them exactly.
  */
object Contamination {

  /** Per-document overlap against the benchmark's shingle set:
    * `(doc, n_shingles, n_hits, overlap_4)` with overlap fixed-point
    * ×10000. Documents with fewer than n tokens have no shingles and are
    * absent (nothing measurable — [[Dedup]]'s short-doc semantics). */
  def benchmarkOverlap(docs: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      n: Int = 3): DataFrame = {
    val corpus = Dedup.shingleIds(docs, idCol, textCol, n)
    val benchSids = Dedup.shingleIds(
        bench.select(lit(0L).as("__b"), col(benchTextCol)),
        "__b", benchTextCol, n)
      .select(col("sid")).distinct()
    corpus
      .join(broadcast(benchSids.withColumn("__hit", lit(1))), Seq("sid"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
      .withColumn("overlap_4",
        floor(col("n_hits") * 10000.0 / col("n_shingles") + 0.5).cast(LongType))
  }

  /** Contamination verdict column at `threshold` overlap (default: any
    * document sharing ≥80% of its shingles with the benchmark). */
  def contaminatedCol(threshold: Double = 0.8): Column =
    col("overlap_4") >= math.round(threshold * 10000)

  /** The decontaminated corpus: input docs minus those at or above the
    * overlap threshold — an anti-join on the flagged id set, the same
    * shape as [[Dedup.dedupedCorpus]]. */
  def decontaminated(docs: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val flagged = benchmarkOverlap(docs, bench, idCol, textCol, benchTextCol, n)
      .filter(contaminatedCol(threshold))
      .select(col("doc").as(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
