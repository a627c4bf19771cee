package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs over its raw crawl: language ID, quality gating and
  * exact-dedup survivor election in ONE DataFrame plan, with a per-doc
  * verdict instead of a silently shrunken corpus (rejected docs carry
  * their first failing check, so a curation run is auditable).
  *
  * Scale shape (the part that matters at 100 TB): the quality stats are
  * per-row expressions (zero shuffle), language ID is one
  * explode→broadcast-dict-join→groupBy (one shuffle keyed by doc),
  * survivor election is one hash-groupBy on md5(text) (one shuffle keyed
  * by content), and the final assembly joins on the doc id. Nothing is
  * ever collected to the driver and no stage is quadratic; the reject
  * policy is a column expression, so Catalyst folds it into the same
  * stage as the joins.
  */
object Curation {

  /** Verdict per document: (id, pred_lang, n_tokens, stopword_ratio_4,
    * is_survivor, reject_reason, keep). `reject_reason` is the FIRST
    * failing check in policy order — empty, duplicate, language,
    * too_short, low_quality — or null for kept docs. EVERY input row gets
    * a verdict: null/blank text is rejected as 'empty', never silently
    * dropped by a token explode. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      keepLang: String = "en", minTokens: Int = 5,
      maxStopwordRatio4: Long = 5000L,
      blocklist: Seq[String] = Nil): DataFrame = {
    // quality metrics are pure per-row column expressions — no token
    // shuffle, no discarded fingerprint work, and null text survives
    val stats = TextAnalysis.qualityMetrics(
        docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col(textCol), col("n_tokens"), col("stopword_ratio_4"))
    // blocklist verdict is another per-row projection (one Aho-Corasick
    // pass per doc, see functions.Blocklist) — folded into the same stage
    val blocked: org.apache.spark.sql.Column =
      if (blocklist.isEmpty) lit(false)
      else size(graft.functions.Blocklist.matched(
        coalesce(col(textCol), lit("")), blocklist)) > 0
    val lang = TextAnalysis.languageId(docs, idCol, textCol)
      .select(col(idCol), col("pred_lang"))
    val survivors = Dedup.exact(docs, idCol, textCol)
      .select(col("survivor_id"), lit(true).as("__is_surv"))
    stats
      .join(lang, Seq(idCol), "left_outer")
      .join(survivors, col(idCol) === col("survivor_id"), "left_outer")
      .select(col(idCol),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        col("n_tokens"), col("stopword_ratio_4"),
        coalesce(col("__is_surv"), lit(false)).as("is_survivor"),
        (col(textCol).isNull || trim(col(textCol)) === "").as("__empty"),
        blocked.as("__blocked"))
      .withColumn("reject_reason",
        when(col("__empty"), "empty")
          .when(col("__blocked"), "blocklisted")
          .when(!col("is_survivor"), "duplicate")
          .when(col("pred_lang") =!= keepLang, "language")
          .when(col("n_tokens") < minTokens, "too_short")
          .when(col("stopword_ratio_4") > maxStopwordRatio4, "low_quality"))
      .drop("__empty", "__blocked")
      .withColumn("keep", col("reject_reason").isNull)
  }

  /** The curated corpus itself: kept docs with their text, ready to feed
    * the next pipeline stage (near-dup, embedding, tokenization). */
  def curatedCorpus(docs: DataFrame, idCol: String, textCol: String,
      keepLang: String = "en", minTokens: Int = 5,
      maxStopwordRatio4: Long = 5000L): DataFrame =
    docs.join(
      curate(docs, idCol, textCol, keepLang, minTokens, maxStopwordRatio4)
        .filter(col("keep")).select(col(idCol)),
      Seq(idCol))

  /** STREAMING curation: the same policy applied to a document stream as
    * it arrives — the row-local checks (empty, language, length, quality)
    * run as pure projections via [[TextAnalysis.languageIdCol]] and
    * [[TextAnalysis.qualityMetrics]] (append-mode safe, per micro-batch),
    * and the duplicate check is [[StreamingDedup]]'s incremental
    * first-occurrence state. Emits kept documents once each; a copy of a
    * kept doc arriving in any later batch is dropped, exactly like the
    * batch pass's survivor election over the accumulated corpus. */
  def curateStream(docs: org.apache.spark.sql.Dataset[StreamingDedup.Doc],
      keepLang: String = "en", minTokens: Int = 5,
      maxStopwordRatio4: Long = 5000L)
      : org.apache.spark.sql.Dataset[StreamingDedup.Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kept = TextAnalysis.qualityMetrics(docs.toDF(), "text")
      .withColumn("__lang", TextAnalysis.languageIdCol(col("text")))
      .filter(col("text").isNotNull && trim(col("text")) =!= "" &&
        col("__lang") === keepLang &&
        col("n_tokens") >= minTokens &&
        col("stopword_ratio_4") <= maxStopwordRatio4)
      .select(col("docId"), col("text")).as[StreamingDedup.Doc]
    StreamingDedup.dedupStream(kept)
  }

  /** Streaming curation WITH near-dup coverage — the full parity of the
    * batch path (quality gate → exact dedup → near-dup dedup) over a
    * stream: [[curateStream]]'s row-local policy + exact first-occurrence
    * state feeds [[StreamingNearDedup.processBatch]] per micro-batch, so
    * a near-copy of anything previously ingested is dropped too (batch
    * MinHash-LSH semantics, exactly-once state under replay). Survivors
    * land under `outDir/batch=<id>`; the seen-index under `stateDir`.
    * Start with `.start()` on the returned writer. */
  def curateNearDupStream(docs: org.apache.spark.sql.Dataset[StreamingDedup.Doc],
      stateDir: String, outDir: String,
      keepLang: String = "en", minTokens: Int = 5,
      maxStopwordRatio4: Long = 5000L,
      p: StreamingNearDedup.Params = StreamingNearDedup.Params())
      : org.apache.spark.sql.streaming.DataStreamWriter[StreamingDedup.Doc] =
    curateStream(docs, keepLang, minTokens, maxStopwordRatio4)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[StreamingDedup.Doc], batchId: Long) =>
          StreamingNearDedup.processBatch(
            batch.toDF().select(col("docId").as("doc_id"), col("text")),
            batchId, stateDir, outDir, p)
      }
}
