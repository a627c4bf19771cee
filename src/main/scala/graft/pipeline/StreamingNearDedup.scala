package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Near-duplicate dedup over a document STREAM — the incremental-ingestion
  * form of [[Dedup.minhashLshPairs]]: documents arrive in micro-batches and
  * a document is dropped when it is a verified near-duplicate (exact
  * Jaccard ≥ threshold on candidates that share an LSH band bucket) of ANY
  * previously seen document — survivor or not — or of a lower-id document
  * in its own batch. The continuous-crawl counterpart of the batch LSH
  * pass (reference-need anchor: the events service is continuous ingestion;
  * reference src/AgeDigitalTwins.Events — the batch pass alone would
  * re-pair the whole corpus per crawl increment).
  *
  * Any-seen semantics (state grows by every document, dropped or kept) is
  * deliberate, for two reasons:
  *
  *  - it is MONOTONE: whether a bucket admits a new doc never depends on
  *    another bucket's verdict, so there is no cross-bucket coordination.
  *    A single `flatMapGroupsWithState` keyed by band bucket cannot match
  *    batch survivor-election semantics — a doc lands in `bands` buckets
  *    and the per-bucket verdicts would need a second stateful combine,
  *    which Structured Streaming disallows after arbitrary state.
  *  - when documents arrive in id order it is EXACTLY the batch rule
  *    "doc survives iff it never appears as doc_b in
  *    [[Dedup.minhashLshPairs]] over the full corpus" — which makes the
  *    operator oracle-checkable in plain SQL (gate `q_stream_neardedup`).
  *
  * Scale shape: the seen-index lives AT REST (parquet, band-partitioned),
  * not in executor state — 100 TB of crawl history cannot live in a state
  * store, but a banded signature index is exactly what an object store
  * holds well. Each increment does only equi-joins: batch sigs ⋈ index
  * sigs on (band, sig) for candidates, then the exact-Jaccard verify joins
  * restricted (semi-join) to candidate docs only. Per-batch work is
  * proportional to the batch and its collisions, never to history size —
  * except the candidate probe, which a real deployment prunes further by
  * bucketing the index files on `sig`.
  *
  * State writes are EXACTLY-ONCE under micro-batch replay: each batch
  * commits into its own `batch=<id>` directory with the signature
  * directory written last — its `_SUCCESS` file is the commit marker — and
  * prior-state reads exclude the in-flight batch's own partition, so a
  * retried batch either short-circuits on the marker or cleanly overwrites
  * its own half-written attempt (see [[processBatch]]).
  */
object StreamingNearDedup {

  /** Shingle/LSH parameters, matching [[Dedup.minhashLshPairs]] defaults.
    *
    * `waves`: like the batch pass's wave-sliced banding — process the
    * candidate probe in `waves` sequential band groups instead of one
    * monolithic (band, sig) join against the WHOLE at-rest index. The
    * index is band-partitioned parquet, so a wave's filter prunes to
    * bands/waves of the index files: the live shuffle footprint of one
    * increment divides by `waves`, which is what keeps a micro-batch
    * probe against a 100 TB-corpus index inside one executor tier's
    * shuffle capacity. Results are identical for every wave count (the
    * collision union is band-order-independent; cross-wave duplicate
    * pairs are distinct-ed away). waves=1 recovers the single-join plan. */
  case class Params(n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, waves: Int = 1)

  /** The at-rest seen-index: band signatures (doc, band, sig) for candidate
    * generation and full shingle-id sets (doc, sid) for exact verification. */
  case class SeenIndex(sigs: DataFrame, shingles: DataFrame)

  /** Result of one increment: `survivors` (the batch rows that are not
    * near-dups of anything seen), plus the batch's own index rows to append
    * to the seen-index (ALL batch docs — any-seen semantics). */
  case class Increment(survivors: DataFrame, sigs: DataFrame,
      shingles: DataFrame)

  /** One micro-batch against the prior seen-index. Pure function of its
    * inputs — the caller owns index persistence (see [[foreachBatchSink]]
    * for the streaming wiring and [[nearDedupBatches]] for the bounded
    * fold). `sigs`/`shingles` in the result are eagerly materialized
    * (localCheckpoint), so callers may fold them into the next increment's
    * index without re-running this batch's LSH pipeline. */
  def increment(batch: DataFrame, idCol: String, textCol: String,
      prior: Option[SeenIndex], p: Params = Params(),
      dedupPrior: Boolean = false): Increment = {
    val ids = Dedup.shingleIds(batch, idCol, textCol, p.n)
      .localCheckpoint(true)
    val sigs = Dedup.bandSignaturesFrom(ids, p.numHashes, p.bands)
      .localCheckpoint(true)
    // One probe join builds BOTH candidate kinds: the left side is the
    // prior index (tagged __prior) unioned with the batch's own sigs, the
    // right side is the batch. Intra-batch pairs keep the lower-id-first
    // tie-break (same as the batch pass / Dedup.exact); index hits drop
    // the new doc whatever its id — arrival order wins in a stream.
    val left = prior match {
      case Some(ix) => ix.sigs.withColumn("__prior", lit(true))
        .unionByName(sigs.withColumn("__prior", lit(false)))
      case None => sigs.withColumn("__prior", lit(false))
    }
    val probeL = left.select(col("doc").as("doc_a"), col("band"), col("sig"),
      col("__prior"))
    val probeR = sigs.select(col("doc").as("doc_b"), col("band"), col("sig"))
    def probe(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, Seq("band", "sig"))
        .filter(col("__prior") || col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
    require(p.waves >= 1 && p.waves <= p.bands,
      s"waves (${p.waves}) must be in [1, bands=${p.bands}]")
    val cand =
      if (p.waves == 1) probe(probeL, probeR)
      else {
        // sequential band-group joins: each wave reads only its bands of
        // the band-partitioned index (partition prune) and checkpoints its
        // (small) pair set, so only one wave's bucket join is live at a
        // time — the live shuffle footprint divides by `waves`
        val waveGroups = (0 until p.bands)
          .grouped(math.ceil(p.bands.toDouble / p.waves).toInt).toSeq
        val waveCands = waveGroups.map { bnds =>
          probe(probeL.filter(col("band").isin(bnds: _*)),
              probeR.filter(col("band").isin(bnds: _*)))
            .localCheckpoint(eager = true)
        }
        val merged = waveCands.reduce(_ unionByName _).distinct()
          .localCheckpoint(eager = true)
        waveCands.foreach(graft.core.Blocks.free)
        merged
      }
    // Verify on exact Jaccard over full shingle sets, restricted to docs
    // that actually appear in a candidate pair — per-batch verify cost is
    // O(candidates), not O(history).
    val candDocs = cand.select(col("doc_a").as("doc"))
      .unionByName(cand.select(col("doc_b").as("doc"))).distinct()
    // `dedupPrior`: distinct AFTER the semi-join restriction (bounded by
    // candidates) — shingle rows are set members, and during
    // [[compactState]]'s commit-then-delete window a doc's rows can
    // appear in BOTH the new compacted generation and a not-yet-deleted
    // source batch; row counting in verifyJaccard would double its set
    // size. Callers whose prior state cannot hold duplicates (no
    // compacted generation on disk) skip the extra shuffle.
    val restricted = prior.map(ix => ix.shingles.unionByName(ids))
      .getOrElse(ids)
      .join(candDocs, Seq("doc"), "left_semi")
    val idsAll = if (dedupPrior) restricted.distinct() else restricted
    val dropped = Dedup.verifyJaccard(cand, idsAll, p.threshold)
      .select(col("doc_b").as(idCol)).distinct()
    Increment(batch.join(dropped, Seq(idCol), "left_anti"), sigs, ids)
  }

  /** Bounded multi-batch simulation: split `docs` into `numBatches`
    * contiguous id ranges (id order = arrival order), fold [[increment]]
    * across them, return the surviving ids. With id-ordered arrival this
    * equals the batch rule "keep docs that never appear as doc_b in
    * [[Dedup.minhashLshPairs]]" — the `q_stream_neardedup` oracle. */
  def nearDedupBatches(docs: DataFrame, idCol: String, textCol: String,
      numBatches: Int, p: Params = Params()): DataFrame = {
    val bounds = docs.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).collect()(0)
    if (bounds.isNullAt(0)) return docs.select(col(idCol))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = hi - lo + 1
    val cuts = (0 to numBatches).map(i => lo + span * i / numBatches)
    var index: Option[SeenIndex] = None
    var out: Option[DataFrame] = None
    for (i <- 0 until numBatches) {
      val batch = docs.filter(col(idCol) >= cuts(i) && col(idCol) < cuts(i + 1))
      val inc = increment(batch, idCol, textCol, index, p)
      // Eager per-batch materialization, measured choice: a lazy fold
      // (letting the final action run all verify-join subtrees in one job)
      // was tried and is ~50% SLOWER at sf0.1 — the single mega-plan loses
      // more to AQE re-planning and stage re-execution than the four
      // blocking checkpoints cost.
      val surv = inc.survivors.select(col(idCol)).localCheckpoint(true)
      out = Some(out.map(_.unionByName(surv)).getOrElse(surv))
      index = Some(index match {
        case Some(ix) => SeenIndex(ix.sigs.unionByName(inc.sigs),
          ix.shingles.unionByName(inc.shingles))
        case None => SeenIndex(inc.sigs, inc.shingles)
      })
    }
    out.get
  }

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The dir can exist yet hold no committed parquet (a crashed first
    // batch leaves only _temporary debris) — schema inference then throws;
    // that state is indistinguishable from "no prior index", so map it
    // to None rather than failing the replay that would repair it.
    if (fs.exists(p))
      try Some(spark.read.parquet(path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    else None
  }

  /** One micro-batch against the at-rest state, EXACTLY-ONCE: every
    * artifact lands in a `batch=<id>` directory, written in dependency
    * order (shingles, survivors, sigs last — its `_SUCCESS` file is the
    * commit marker) with per-directory overwrite — so a replayed batch id
    * either short-circuits (marker present: the batch fully committed) or
    * cleanly rewrites a half-written attempt. State reads list the parent
    * directory but FILTER OUT this batch's own partition: batch ids are
    * monotone in Structured Streaming, so the only possibly-uncommitted
    * rows under the state dirs belong to a failed attempt of `batchId`
    * itself — including them would double the replayed docs' shingle sets
    * and distort every Jaccard the verify step computes. The `batch`
    * partition column is projected away after the filter. */
  def processBatch(df: DataFrame, batchId: Long, stateDir: String,
      outDir: String, p: Params = Params()): Unit = {
    val spark = df.sparkSession
    val marker = new Path(s"$stateDir/sigs/batch=$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // _SUCCESS, not the directory: the committer creates the directory at
    // write START, so a crash mid-write leaves it present but incomplete —
    // dir-existence would read that half-commit as done forever.
    if (fs.exists(new Path(marker, "_SUCCESS"))) return // replayed, committed
    // Positive partitions: the only possibly-uncommitted one is this
    // batch's own (ids are monotone). Negative partitions are compacted
    // generations written by [[compactState]] — those commit out-of-band,
    // so only generations whose sigs `_SUCCESS` exists may be read (a
    // crashed compaction leaves a half-written gen dir behind).
    val liveGens = committedGenerations(fs, stateDir)
    val genOk = if (liveGens.isEmpty) lit(false)
      else col("batch").isin(liveGens: _*)
    val keep = col("batch") =!= batchId && (col("batch") >= 0 || genOk)
    val prior = for {
      s <- readIfExists(spark, s"$stateDir/sigs")
      sh <- readIfExists(spark, s"$stateDir/shingles")
    } yield SeenIndex(
      s.filter(keep).select(col("doc"), col("band"), col("sig")),
      sh.filter(keep).select(col("doc"), col("sid")))
    // duplicates in prior state are only possible while a compacted
    // generation coexists with its not-yet-deleted sources
    val inc = increment(df, "doc_id", "text", prior, p,
      dedupPrior = liveGens.nonEmpty)
    inc.shingles.write.mode("overwrite")
      .parquet(s"$stateDir/shingles/batch=$batchId")
    inc.survivors.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // sigs last: its presence marks the batch committed (the skip above)
    inc.sigs.write.partitionBy("band").mode("overwrite")
      .parquet(marker.toString)
    graft.core.Blocks.free(inc.sigs)
    graft.core.Blocks.free(inc.shingles)
  }

  /** Batch partitions of the seen-index, split by sign: positives are
    * stream batches, negatives are compacted generations. Commit marker
    * for both is the sigs directory's `_SUCCESS`. */
  private def partitionIds(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String): Seq[Long] = {
    val root = new Path(s"$stateDir/sigs")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
  }

  private def committedGenerations(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String): Seq[Long] =
    partitionIds(fs, stateDir).filter(_ < 0).filter(g =>
      fs.exists(new Path(s"$stateDir/sigs/batch=$g/_SUCCESS")))

  /** Merge committed seen-index batches into one compacted generation.
    * Unbounded crawl history otherwise accumulates one `batch=<id>`
    * directory per micro-batch — at 100 TB of history the per-batch
    * candidate probe pays an ever-growing listing and a small-files read;
    * after compaction the index is one band-partitioned directory again.
    *
    * Crash-safety, same discipline as [[processBatch]]:
    *  - the new generation (`batch=-G`, G monotone) writes shingles first,
    *    then sigs — the sigs `_SUCCESS` is the generation commit marker;
    *    a crash mid-write leaves an uncommitted gen that readers skip
    *    (see `committedGenerations`) and the next compaction overwrites.
    *  - sources are deleted only AFTER the commit marker exists. A crash
    *    mid-delete leaves rows duplicated between the generation and the
    *    surviving sources; reads tolerate that window by construction
    *    (candidate pairs are `distinct`ed, shingle sets are `distinct`ed
    *    post-restriction in [[increment]]) and the next compaction
    *    re-merges whatever is left.
    *  - the NEWEST committed stream batch is never merged: it is the one
    *    batch Structured Streaming can still replay after a sink crash,
    *    and replay short-circuit needs its own marker directory intact.
    *    (Merging it would also put the replayed docs in `prior`, where
    *    they would self-match and silently drop the whole batch.) */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    val fs = new Path(stateDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ids = partitionIds(fs, stateDir)
    val pos = ids.filter(_ >= 0).sorted.filter(id =>
      fs.exists(new Path(s"$stateDir/sigs/batch=$id/_SUCCESS")))
    val sources = (if (pos.isEmpty) pos else pos.init) ++
      committedGenerations(fs, stateDir)
    if (sources.size < 2) return // nothing worth merging
    val newGen = -(committedGenerations(fs, stateDir).map(-_).maxOption
      .getOrElse(0L) + 1L)
    val sigs = spark.read.parquet(s"$stateDir/sigs")
      .filter(col("batch").isin(sources: _*))
      .select(col("doc"), col("band"), col("sig")).distinct()
    val shingles = spark.read.parquet(s"$stateDir/shingles")
      .filter(col("batch").isin(sources: _*))
      .select(col("doc"), col("sid")).distinct()
    shingles.write.mode("overwrite")
      .parquet(s"$stateDir/shingles/batch=$newGen")
    sigs.write.partitionBy("band").mode("overwrite")
      .parquet(s"$stateDir/sigs/batch=$newGen")
    sources.foreach { id =>
      fs.delete(new Path(s"$stateDir/sigs/batch=$id"), true)
      fs.delete(new Path(s"$stateDir/shingles/batch=$id"), true)
    }
  }

  /** Streaming wiring: `docs.writeStream` → foreachBatch over
    * [[processBatch]], with the seen-index at `$stateDir/sigs` (inner
    * band partitioning, so a band-bucketed probe reads one directory per
    * band) and `$stateDir/shingles`; survivors land under
    * `outDir/batch=<id>`. Start with `.start()` on the returned writer.
    * `compactEvery > 0` folds [[compactState]] into the cadence: every
    * N-th batch compacts the seen-index after committing — foreachBatch
    * is serial, so compaction never races a batch write. */
  def foreachBatchSink(docs: Dataset[StreamingDedup.Doc], stateDir: String,
      outDir: String, p: Params = Params(), compactEvery: Int = 0)
      : DataStreamWriter[StreamingDedup.Doc] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[StreamingDedup.Doc], batchId: Long) =>
        processBatch(batch.toDF().select(col("docId").as("doc_id"),
          col("text")), batchId, stateDir, outDir, p)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactState(batch.sparkSession, stateDir)
    }
}
