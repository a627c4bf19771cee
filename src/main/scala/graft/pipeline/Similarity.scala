package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * The distance kernels are pure Column expressions (`zip_with` +
  * `aggregate` fold in DOUBLE precision — sequential fold order, so any
  * engine evaluating left-to-right produces the identical IEEE result; no
  * UDF, stays inside codegen). This is the Spark-first replacement for the
  * reference's pgvector `l2_distance` ordering
  * (/root/reference/src/AgeDigitalTwins/AgeDigitalTwinsClient.DigitalTwins.cs:1242-1248).
  *
  * Scale design: brute-force top-k is one broadcast of the (small) query
  * set against a full scan of the corpus — embarrassingly parallel, no
  * shuffle until the final per-query top-k (partial TakeOrdered). The IVF
  * variant prunes the scan to the query's coarse cell, trading recall for a
  * K-fold scan reduction; cells are just a partition key, so at 100 TB the
  * corpus can be written bucketed by cell and the probe becomes partition
  * pruning.
  */
object Similarity {

  import graft.functions.VectorFunctions

  def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def l2sq(a: Column, b: Column): Column = VectorFunctions.l2sq(a, b)

  /** Brute-force top-k cosine neighbors for each query vector.
    * Output: (query id, rank 1..k, neighbor id). Rank output (not raw
    * floats) keeps results hash-stable across engines. Norms are computed
    * once per vector (not per pair), so each pair costs a single
    * codegen'd dot-product loop. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("n_norm", norm(col("n_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cs",
        dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cs").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** The `nprobe` nearest centroids (L2) per vector. Centroids are a small
    * broadcast table (cell_id, cell_vec); ties break to the smaller cell. */
  def assignProbes(vectors: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, nprobe: Int): DataFrame = {
    val c = vectors.select(col(idCol).as("v_id"), col(vecCol).as("v_vec"))
    val cells = centroids.select(col("cell_id"), col("cell_vec"))
    val w = Window.partitionBy(col("v_id")).orderBy(col("d2").asc, col("cell_id").asc)
    c.crossJoin(broadcast(cells))
      .withColumn("d2", l2sq(col("v_vec"), col("cell_vec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("v_id"), col("v_vec"), col("cell_id"))
  }

  /** Coarse quantization: assign every vector to its single nearest
    * centroid — the cell that becomes its bucket/partition key at rest. */
  def assignCells(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    assignProbes(corpus, centroids, idCol, vecCol, nprobe = 1)

  /** Deterministic Lloyd's k-means over the embedding column — the
    * centroid bootstrap so IVF doesn't assume externally-given centroids.
    * Init = the k smallest-id vectors (reproducible, no RNG); each round is
    * one assign (broadcast nested-loop over the k centroids) + one
    * element-wise mean (posexplode → per-(cell,pos) avg → re-assembled
    * array): two shuffles per round, all map-side-combinable. Cells that
    * lose every member drop out (k may shrink on degenerate data). */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5): DataFrame = {
    // cell_id = rank of the seed vector in id order, NOT a cast of the raw
    // id: for non-numeric ids (e.g. "doc1") every cast-to-long yields null,
    // silently collapsing all k seeds into one degenerate cell
    var cents = corpus.orderBy(col(idCol).asc).limit(k)
      .select(row_number().over(Window.orderBy(col(idCol).asc)).cast("long")
        .as("cell_id"), col(vecCol).as("cell_vec"))
      .localCheckpoint(eager = true)
    for (_ <- 0 until iters) {
      val assigned = assignCells(corpus, cents, idCol, vecCol)
      val prev = cents
      cents = assigned
        .select(col("cell_id"), posexplode(col("v_vec")).as(Seq("pos", "x")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell_id"),
          expr("transform(pm, e -> cast(e.m as float))").as("cell_vec"))
        .localCheckpoint(eager = true)
      graft.core.Blocks.free(prev) // superseded round, don't wait for GC
    }
    cents
  }

  /** Shared IVF scoring tail: broadcast the probed queries, equi-join on
    * cell, rank by cosine per query. `cellAssigned` carries
    * (n_id, n_vec, cell_id) — from [[assignCells]] in memory or from an
    * at-rest index. */
  private def scoreProbes(cellAssigned: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int): DataFrame = {
    val q = assignProbes(queries, centroids, idCol, vecCol, nprobe)
      .select(col("v_id").as("q_id"), col("v_vec").as("q_vec"), col("cell_id"))
    val scored = cellAssigned
      .join(broadcast(q), Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cs", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cs").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** IVF top-k: each query searches only the corpus vectors in its
    * `nprobe` nearest cells. Corpus vectors live in exactly one cell (so
    * no pair is scored twice); at rest the corpus is written bucketed by
    * cell_id and a probe becomes partition pruning. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame =
    scoreProbes(
      assignCells(corpus, centroids, idCol, vecCol)
        .select(col("v_id").as("n_id"), col("v_vec").as("n_vec"), col("cell_id")),
      queries, centroids, idCol, vecCol, k, nprobe)

  /** Materialize the IVF index at rest: the corpus with its cell
    * assignment, written as parquet PARTITIONED BY cell_id — one
    * directory per coarse cell. This is the layout the ivfTopK scaladoc
    * promises: once cells are directories, a probe touches only its
    * cells' files and the other ~K-1/K of a 100 TB corpus is never read. */
  def writeIvfIndex(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, path: String): Unit =
    assignCells(corpus, centroids, idCol, vecCol)
      .select(col("v_id").as(idCol), col("v_vec").as(vecCol), col("cell_id"))
      .write.partitionBy("cell_id").mode("overwrite").parquet(path)

  /** Incremental maintenance of an at-rest IVF index: assign the new
    * vectors to their cells against the SAME frozen centroids and append
    * into the cell directories — continuous embedding ingestion without
    * rebuilding the index (the streaming counterpart of
    * [[writeIvfIndex]]; wire into `foreachBatch` for a vector stream).
    * Append is per-cell-directory and the assignment is deterministic,
    * so replaying a batch at worst duplicates rows, which ranking
    * tolerates (n_id ties) but production sinks would guard with
    * per-batch subdirs as [[StreamingNearDedup.processBatch]] does.
    * Centroids stay frozen between rebuilds — the standard IVF
    * trade-off: recall drifts only as far as the data distribution does,
    * and a periodic [[kMeans]] + [[writeIvfIndex]] re-clusters. */
  def appendToIvfIndex(newVectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, path: String): Unit =
    assignCells(newVectors, centroids, idCol, vecCol)
      .select(col("v_id").as(idCol), col("v_vec").as(vecCol), col("cell_id"))
      .write.partitionBy("cell_id").mode("append").parquet(path)

  /** IVF top-k against an at-rest index from [[writeIvfIndex]]. Same
    * scoring and output as [[ivfTopK]], but the corpus side arrives
    * pre-assigned from disk and the broadcast probe join runs on the
    * PARTITION column — Spark's dynamic partition pruning turns the
    * probe into directory skipping (the plan carries a `dynamicpruning`
    * partition filter; PipelineSpec asserts it), so scan cost is
    * O(probed cells), not O(corpus). */
  def ivfTopKIndexed(index: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 1): DataFrame =
    scoreProbes(
      index.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
        col("cell_id")),
      queries, centroids, idCol, vecCol, k, nprobe)

  /** Symmetric int8 quantization of an embedding column: per-vector
    * max-abs scale, each component rounded to [-127, 127] — 4× less
    * storage/bandwidth than float32, the standard compression for
    * billion-vector corpora (dot products on int8 + one scale multiply
    * reconstruct scores to ~1e-2). All arithmetic in DOUBLE with
    * away-from-zero rounding, so any engine reproduces the exact bytes.
    * Zero vectors keep scale 0 and an all-zero code. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // two projections: the scale must be a MATERIALIZED column before the
    // per-element lambda references it — higher-order functions evaluate
    // interpreted with no common-subexpression elimination, so an inline
    // array_max would re-scan the whole vector for every element (O(d²))
    df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("q_scale",
        array_max(transform(col("__v"), x => abs(x.cast("double")))))
      .select(col(idCol), col("q_scale"),
        transform(col("__v"), x =>
          when(col("q_scale") === 0d, lit(0))
            .otherwise(round(x.cast("double") / col("q_scale") * 127))
            .cast("byte")).as("q_vec"))
  }

  /** Dequantize back to doubles: component * scale / 127. */
  def dequantizeInt8(qVec: Column, qScale: Column): Column =
    transform(qVec, q => q.cast("double") * qScale / 127d)

  /** Embedding near-dup: each vector's nearest neighbor (cosine) WITHIN its
    * coarse IVF cell — the argmax formulation avoids float-threshold
    * boundary effects, and the cell bucketing is what makes it a 100 TB
    * plan: the former full-corpus `crossJoin(broadcast(corpus))` was
    * all-pairs O(n²) behind an unbounded broadcast (OOM before the n² even
    * starts). Now the only broadcast is the `numCells`-row centroid table;
    * candidates meet through an equi-join on `cell_id` (shuffle hash /
    * sort-merge — at rest the corpus can be written bucketed by cell so
    * even that shuffle disappears), and k=1 uses map-side-combinable
    * max_by with ties broken to the smaller id.
    *
    * Centroids default to the `numCells` smallest-id vectors — a
    * deterministic, training-free rule any replica (incl. the SQL oracle)
    * reproduces; pass a k-means table via `centroids` for real recall. */
  def nearestNeighbor(corpus: DataFrame, idCol: String, vecCol: String,
      numCells: Int = 8, centroids: Option[DataFrame] = None): DataFrame = {
    val cells = centroids.getOrElse(
      corpus.orderBy(col(idCol).asc).limit(numCells)
        .select(col(idCol).as("cell_id"), col(vecCol).as("cell_vec")))
    val assigned = assignCells(corpus, cells, idCol, vecCol)
    val l = assigned.select(col("cell_id"), col("v_id").as("q_id"),
        col("v_vec").as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val r = assigned.select(col("cell_id"), col("v_id").as("n_id"),
        col("v_vec").as("n_vec"))
      .withColumn("n_norm", norm(col("n_vec")))
    val best = l.join(r, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cs",
        dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .groupBy(col("q_id"))
      .agg(max_by(col("n_id"),
        struct(col("cs"), (-col("n_id")).cast("double"))).as("nn_id"))
      .select(col("q_id").as("v_id"), col("nn_id"))
    // one row per corpus vector, always: a vector alone in its cell has no
    // in-cell candidate and surfaces with a null nn_id rather than
    // silently vanishing from the output
    corpus.select(col(idCol).as("v_id"))
      .join(best, Seq("v_id"), "left_outer")
  }

  /** Semantic (embedding-space) dedup, the SemDeDup shape (Abbas et al.
    * 2023, arXiv:2303.09540): cluster coarsely, then drop any vector whose
    * CLUSTER contains a lower-id vector with cosine ≥ `threshold` —
    * keep-first-occurrence, the same survivor rule as the text dedup
    * family, so the verdict needs no transitive closure and every engine
    * reproduces it independently. Output `(v_id, keep_i)`, one row per
    * corpus vector.
    *
    * Scale shape: pairwise comparison happens only INSIDE a cell (that is
    * SemDeDup's own design point — semantic dups land in the same
    * cluster), met through an equi-join on `cell_id` with the codegen'd
    * dot-product; cells come from the broadcast-sized centroid table.
    * Production sizes `numCells ∝ n` so the per-cell population — and the
    * per-cell quadratic term — stays bounded while total work stays
    * O(n²/numCells); the default 8 matches [[nearestNeighbor]]'s
    * deterministic smallest-id centroid rule for oracle parity. */
  def embeddingDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.4, numCells: Int = 8,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cells = centroids.getOrElse(
      corpus.orderBy(col(idCol).asc).limit(numCells)
        .select(col(idCol).as("cell_id"), col(vecCol).as("cell_vec")))
    val assigned = assignCells(corpus, cells, idCol, vecCol)
    val l = assigned.select(col("cell_id"), col("v_id").as("a_id"),
      col("v_vec").as("a_vec"))
    val r = assigned.select(col("cell_id"), col("v_id").as("b_id"),
      col("v_vec").as("b_vec"))
    val dropped = l.join(r, Seq("cell_id"))
      .filter(col("a_id") < col("b_id"))
      .filter(cosine(col("a_vec"), col("b_vec")) >= lit(threshold))
      .select(col("b_id").as("v_id")).distinct()
      .withColumn("__d", lit(1L))
    corpus.select(col(idCol).as("v_id"))
      .join(dropped, Seq("v_id"), "left_outer")
      .select(col("v_id"),
        when(col("__d").isNotNull, 0L).otherwise(1L).as("keep_i"))
  }

  // -------- product quantization (PQ) --------

  /** Sampled PQ codebook: `size` codewords per subspace, taken from the
    * `size` smallest-id corpus vectors (deterministic, training-free — the
    * same rule as [[nearestNeighbor]]'s default centroids, so every
    * replica including the SQL oracle rebuilds the identical table; swap
    * in per-subspace k-means for production recall). Output
    * (subspace, cb_id, cb_vec) — m·size rows, always broadcast-sized. */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 4, size: Int = 32): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    // the un-partitioned window runs on <= size rows (post-limit) — bounded
    val src = corpus.orderBy(col(idCol).asc).limit(size)
      .withColumn("cb_id",
        (row_number().over(Window.orderBy(col(idCol).asc)) - 1).cast("int"))
    (0 until m).map { s =>
      src.select(lit(s).as("subspace"), col("cb_id"),
        slice(col(vecCol), s * sub + 1, sub).as("cb_vec"))
    }.reduce(_.unionByName(_))
  }

  private def subspaces(vec: Column, dim: Int, m: Int): Column = {
    val sub = dim / m
    explode(array((0 until m).map(s => struct(lit(s).as("subspace"),
      slice(vec, s * sub + 1, sub).as("sub_vec"))): _*))
  }

  /** PQ encoding: each vector compresses to `m` codebook indices (argmin
    * squared L2 per subspace, ties to the smaller codeword id) — m bytes
    * instead of dim floats, the storage layout of billion-vector corpora.
    * One broadcast join against the codebook + one map-side-combinable
    * argmin; no shuffle touches the full vectors. Output (id, codes). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, dim: Int, m: Int = 4): DataFrame =
    corpus.select(col(idCol), subspaces(col(vecCol), dim, m).as("sp"))
      .select(col(idCol), col("sp.subspace").as("subspace"),
        col("sp.sub_vec").as("sub_vec"))
      .join(broadcast(codebook), Seq("subspace"))
      .withColumn("d2", l2sq(col("sub_vec"), col("cb_vec")))
      .groupBy(col(idCol), col("subspace"))
      .agg(min(struct(col("d2"), col("cb_id"))).as("best"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("subspace"),
        col("best.cb_id").as("code")))).as("sc"))
      .select(col(idCol),
        transform(col("sc"), x => x.getField("code")).as("codes"))

  /** PQ top-k with exact re-ranking — the asymmetric-distance (ADC) search
    * pattern: queries stay full-precision, the corpus is scanned as codes.
    *
    *  1. LUT: per (query, subspace, codeword) squared L2 — |q|·m·size
    *    rows, broadcast (queries are the small side, as in
    *    [[bruteForceTopK]]).
    *  2. ADC scan: exploded codes equi-join the LUT on (subspace, code);
    *    per-(query, doc) sum approximates the distance. The corpus-sized
    *    side moves once, carrying only ids + codes — never the vectors.
    *  3. Shortlist k·`rerank` docs per query by ADC, then re-rank the
    *    shortlist with EXACT distances — the full-precision read is
    *    semi-join-bounded to shortlist rows, so recall comes back without
    *    a full-precision scan.
    *
    * Output (q_id, rank, n_id) — rank-only, hash-stable. */
  def pqTopK(queries: DataFrame, codes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, codebook: DataFrame, k: Int,
      dim: Int, m: Int = 4, rerank: Int = 4): DataFrame = {
    val lut = adcLut(queries, codebook, idCol, vecCol, dim, m)
    val codeRows = codes
      .select(col(idCol).as("n_id"), posexplode(col("codes")).as(Seq("subspace", "code")))
    val adc = codeRows.join(broadcast(lut), Seq("subspace", "code"))
      .filter(col("q_id") =!= col("n_id"))
      .groupBy(col("q_id"), col("n_id")).agg(sum(col("d2")).as("adc"))
    rerankExact(adc, queries, corpus, idCol, vecCol, k, rerank)
  }

  /** Shared ADC tail: shortlist k·`rerank` per query by approximate
    * distance, then re-rank the shortlist with exact squared L2 — the
    * full-precision read is semi-join-bounded to shortlist rows. */
  private def rerankExact(adc: DataFrame, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      rerank: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("n_id").asc)
    val shortlist = adc.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= k * rerank).select(col("q_id"), col("n_id"))
    val wExact = Window.partitionBy(col("q_id"))
      .orderBy(col("d2").asc, col("n_id").asc)
    shortlist
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")),
        Seq("n_id"))
      .join(broadcast(queries.select(col(idCol).as("q_id"),
        col(vecCol).as("q_vec"))), Seq("q_id"))
      .withColumn("d2", l2sq(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(wExact).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** IVF+PQ — the billion-vector composition (FAISS IVFPQ): the coarse
    * quantizer prunes the scan to each query's `nprobe` cells, the ADC
    * scan inside those cells reads only m-byte codes, and the final
    * ranking re-checks exact distances on the k·`rerank` shortlist. At
    * rest the index is codes partitioned by `cell_id` (the
    * [[ivfTopKIndexed]] layout with vectors swapped for codes), so the
    * probe step becomes partition pruning and per-query cost is
    * (corpus/cells)·nprobe·m bytes — independent of full-precision corpus
    * size. Queries/probes/LUT/codebook all broadcast; the corpus-sized
    * side moves once, as codes. */
  /** The in-memory IVF+PQ index frame (id, codes, cell_id) — the encode +
    * cell-assignment pass [[ivfpqTopK]] runs and [[writeIvfPqIndex]]
    * persists. Exposed so a parameter sweep (several nprobe/rerank
    * settings over one corpus, e.g. the recall-dial gate) encodes the
    * corpus ONCE and probes the shared index per setting instead of
    * re-encoding per call (r19; guide §1.2 — don't recompute what you
    * throw away). */
  def buildIvfPqIndex(corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 16): DataFrame =
    pqEncode(corpus, idCol, vecCol, codebook, dim, m)
      .withColumnRenamed(idCol, "n_id")
      .join(assignCells(corpus, centroids, idCol, vecCol)
        .select(col("v_id").as("n_id"), col("cell_id")), Seq("n_id"))
      .select(col("n_id").as(idCol), col("codes"), col("cell_id"))

  def ivfpqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, k: Int, dim: Int,
      m: Int = 16, nprobe: Int = 4, rerank: Int = 4): DataFrame = {
    val index = buildIvfPqIndex(corpus, centroids, codebook, idCol, vecCol,
      dim, m)
    ivfpqTopKIndexed(index, queries, corpus, centroids, codebook,
      idCol, vecCol, k, dim, m, nprobe, rerank)
  }

  /** Per-(query, subspace, codeword) squared L2 — the ADC lookup table;
    * |q|·m·codebook rows, always broadcast-sized. */
  private def adcLut(queries: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int): DataFrame =
    queries
      .select(col(idCol).as("q_id"), subspaces(col(vecCol), dim, m).as("sp"))
      .select(col("q_id"), col("sp.subspace").as("subspace"),
        col("sp.sub_vec").as("q_sub"))
      .join(broadcast(codebook), Seq("subspace"))
      .select(col("q_id"), col("subspace"), col("cb_id").as("code"),
        l2sq(col("q_sub"), col("cb_vec")).as("d2"))

  /** Materialize the IVF+PQ index at rest: m-byte codes partitioned by
    * cell_id — the layout where a probe is DIRECTORY pruning and the
    * bytes read per probed cell are codes, not vectors: per-query scan
    * cost is (corpus/cells)·nprobe·m bytes regardless of full-precision
    * corpus size. Incremental append works exactly as
    * [[appendToIvfIndex]] (assign + encode against frozen
    * centroids/codebook, append per cell directory). */
  def writeIvfPqIndex(corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, path: String,
      dim: Int, m: Int = 16): Unit =
    buildIvfPqIndex(corpus, centroids, codebook, idCol, vecCol, dim, m)
      .write.partitionBy("cell_id").mode("overwrite").parquet(path)

  /** Incremental append to an at-rest [[writeIvfPqIndex]] index: new
    * vectors are assigned and PQ-encoded against the FROZEN centroids and
    * codebook, then appended into their cell directories — continuous
    * embedding ingestion without touching existing codes. Same trade-off
    * as [[appendToIvfIndex]]: quantization error drifts only as far as
    * the data distribution does; a periodic rebuild re-trains both
    * quantizers. */
  def appendToIvfPqIndex(newVectors: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, path: String,
      dim: Int, m: Int = 16): Unit =
    buildIvfPqIndex(newVectors, centroids, codebook, idCol, vecCol, dim, m)
      .write.partitionBy("cell_id").mode("append").parquet(path)

  /** IVF+PQ against an index frame carrying (id, codes, cell_id) — built
    * in memory by [[ivfpqTopK]] or read from [[writeIvfPqIndex]] output,
    * where the broadcast probe join runs on the PARTITION column and
    * dynamic partition pruning turns probing into directory skipping
    * (plan-asserted in PipelineSpec). Exact re-ranking stays semi-join-
    * bounded to the shortlist — the only full-precision reads. */
  def ivfpqTopKIndexed(index: DataFrame, queries: DataFrame,
      corpus: DataFrame, centroids: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, m: Int = 16,
      nprobe: Int = 4, rerank: Int = 4): DataFrame = {
    val probes = assignProbes(queries, centroids, idCol, vecCol, nprobe)
      .select(col("v_id").as("q_id"), col("cell_id"))
    val lut = adcLut(queries, codebook, idCol, vecCol, dim, m)
    val adc = index
      .select(col(idCol).as("n_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("subspace", "code")))
      .join(broadcast(probes), Seq("cell_id")) // prune to probed cells
      .filter(col("q_id") =!= col("n_id"))
      .join(broadcast(lut), Seq("q_id", "subspace", "code"))
      .groupBy(col("q_id"), col("n_id")).agg(sum(col("d2")).as("adc"))
    rerankExact(adc, queries, corpus, idCol, vecCol, k, rerank)
  }
}
