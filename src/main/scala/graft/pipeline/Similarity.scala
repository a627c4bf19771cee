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

  /** Coarse quantization: assign every vector to its nearest centroid
    * (L2). Centroids are a small broadcast table (cell_id, cell_vec). */
  def assignCells(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("v_id"), col(vecCol).as("v_vec"))
    val cells = centroids.select(col("cell_id"), col("cell_vec"))
    val w = Window.partitionBy(col("v_id")).orderBy(col("d2").asc, col("cell_id").asc)
    c.crossJoin(broadcast(cells))
      .withColumn("d2", l2sq(col("v_vec"), col("cell_vec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("v_id"), col("v_vec"), col("cell_id"))
  }

  /** IVF top-k: search only the corpus vectors in the query's own cell.
    * nprobe=1 variant — the scale path where each cell is a bucketed
    * partition. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val assigned = assignCells(corpus, centroids, idCol, vecCol)
    val q = assigned.join(
      queries.select(col(idCol).as("v_id")), Seq("v_id"), "left_semi")
      .select(col("v_id").as("q_id"), col("v_vec").as("q_vec"), col("cell_id"))
    val scored = assigned
      .select(col("v_id").as("n_id"), col("v_vec").as("n_vec"), col("cell_id"))
      .join(broadcast(q), Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cs", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cs").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** Embedding near-dup: each vector's single nearest neighbor (cosine) —
    * the argmax formulation avoids float-threshold boundary effects.
    * k=1 uses max_by aggregation (map-side combinable — no global sort
    * window over the n² score table); ties break to the smaller id,
    * matching the row_number ORDER BY cs DESC, n_id form. */
  def nearestNeighbor(corpus: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val q = corpus.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("n_norm", norm(col("n_vec")))
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cs",
        dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .groupBy(col("q_id"))
      .agg(max_by(col("n_id"),
        struct(col("cs"), (-col("n_id")).cast("double"))).as("nn_id"))
      .select(col("q_id").as("v_id"), col("nn_id"))
  }
}
