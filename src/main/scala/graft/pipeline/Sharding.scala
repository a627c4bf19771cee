package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-output sharding — the last stage of a curation pipeline: the
  * corpus leaves the engine as N deterministic shards that trainers read
  * independently (one shard ↔ one data-loader worker). Properties that
  * matter at 100 TB, all held here:
  *
  *  - membership is a pure function of the document id (salted md5, the
  *    same integer idiom as [[Sampling.shuffleOrder]]), so re-runs,
  *    engines, and resumed jobs agree on which shard owns a doc — no
  *    sampling, no round-robin nondeterminism;
  *  - one shuffle total: rows hash-exchange straight to their shard's
  *    writer, then sort WITHIN partitions (no global sort barrier) so each
  *    shard file is internally ordered for reproducible iteration;
  *  - `maxRecordsPerFile` bounds file size without extra stages — a hot
  *    shard rolls over into numbered files, cold shards stay single-file.
  *
  * The reference has no bulk-output stage (its exports are row-at-a-time
  * API reads, /root/reference/src/AgeDigitalTwins/AgeDigitalTwinsClient
  * .DigitalTwins.cs); this is the Spark-native form a training pipeline
  * needs. */
object Sharding {

  /** Deterministic shard id in [0, numShards): top 60 bits of
    * md5(salt || id) mod N — reproducible in any engine with md5 (the
    * DuckDB oracle recomputes it verbatim). */
  def shardId(idCol: String, numShards: Int, salt: String): org.apache.spark.sql.Column =
    (conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long") % numShards).cast("int")

  /** The corpus with its `shard_id` column attached. */
  def assignShards(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "graft-shard"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.withColumn("shard_id", shardId(idCol, numShards, salt))
  }

  /** The frame `writeShards` writes, exposed for plan assertions: one
    * hash exchange on shard_id, then a partition-local sort — no global
    * sort, no second shuffle. */
  def shardedFrame(df: DataFrame, idCol: String, sortCol: String,
      numShards: Int, salt: String = "graft-shard"): DataFrame =
    assignShards(df, idCol, numShards, salt)
      .repartition(numShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col(sortCol))

  /** Write `df` as `numShards` deterministic shards under `path`
    * (directory per shard: `shard_id=K/`), each file internally sorted by
    * `sortCol`. `maxRecordsPerFile > 0` caps file size so one hot shard
    * cannot produce an unsplittable giant file. */
  def writeShards(df: DataFrame, idCol: String, sortCol: String,
      numShards: Int, path: String, maxRecordsPerFile: Long = 0L,
      salt: String = "graft-shard"): Unit = {
    val w = shardedFrame(df, idCol, sortCol, numShards, salt)
      .write.partitionBy("shard_id").mode("overwrite")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }
}
