package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.HeavyHitters

/** Streaming heavy hitters — the incremental-ingestion form of
  * [[graft.functions.HeavyHitters]]: keys arrive in micro-batches and a
  * BOUNDED sketch of the running top vocabulary is maintained as
  * `flatMapGroupsWithState` state, the continuous-crawl counterpart of
  * the one-pass batch sketch (same relationship [[StreamingDedup]] has
  * to [[Dedup.exact]]).
  *
  * Scale shape: the key space is hash-partitioned into `shards` state
  * groups, each holding ONE Misra-Gries summary of ≤ `capacity`
  * counters, so total state is shards × capacity entries — constant in
  * stream length — and the shards spread across executors like any
  * keyed state. Shards own DISJOINT key sets, so the global answer is
  * the plain union of shard summaries (no cross-shard merge error), and
  * each key's counter carries the per-shard MG guarantee:
  * `true - n_shard/capacity ≤ counter ≤ true`.
  *
  * Determinism: with capacity ≥ the shard's distinct-key count the
  * state is the exact count map on any partitioning/replay — the regime
  * the oracle gate pins; the truncating regime keeps the ε-bound but
  * its exact counter values depend on arrival order (spec-asserted).
  */
object StreamingTopK {

  case class ShardCounts(counts: Map[String, Long])
  case class Snapshot(shard: Int, key: String, est: Long)

  /** Stable shard of a key: first 4 md5 nibbles mod `shards` — the same
    * arithmetic as [[graft.graph.RandomWalk.nibbleValueSql]], so the
    * SQL-side batch form lands every key in the same shard. */
  def shardOf(key: String, shards: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    hex.take(4).foldLeft(0)((acc, c) =>
      acc * 16 + "0123456789abcdef".indexOf(c)) % shards
  }

  /** The streaming form: Update-mode per-shard snapshots — every batch
    * that touches a shard re-emits that shard's full (bounded) summary,
    * so the latest emission per shard IS the current sketch. Works under
    * `readStream` with a checkpoint (state recovers on restart). */
  def topKStream(keys: Dataset[String], capacity: Int,
                 shards: Int): Dataset[Snapshot] = {
    require(capacity >= 1 && shards >= 1)
    import keys.sparkSession.implicits._
    keys.filter(_ != null)
      .groupByKey(shardOf(_, shards))
      .flatMapGroupsWithState[ShardCounts, Snapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[ShardCounts]) =>
          var m = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
          it.foreach(k => m = HeavyHitters.mgReduce(m, k, capacity))
          state.update(ShardCounts(m))
          m.iterator.map { case (key, c) => Snapshot(shard, key, c) }
      }
  }

  /** Batch-driven incremental form (the oracle-gate shape, mirroring
    * [[StreamingNearDedup.nearDedupBatches]]): the rows are split into
    * `numBatches` id-range micro-batches, each batch is sketched
    * per-shard with the one-pass Aggregator, and batch summaries fold
    * into the running per-shard state with the PODS'12 merge. Only the
    * bounded sketch (shards × capacity counters) ever reaches the
    * driver — never rows. Returns (key, est) of the final sketch. */
  def topKBatches(df: DataFrame, idCol: String, keyCol: String,
                  numBatches: Int, capacity: Int, shards: Int): DataFrame = {
    require(numBatches >= 1 && capacity >= 1 && shards >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val bounds = df.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).collect()(0)
    if (bounds.isNullAt(0)) return Seq.empty[(String, Long)].toDF("key", "est")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // BigInt arithmetic: ids spanning most of the Long range (epoch-nano
    // ids) overflow `span * i`, which would silently produce empty
    // batches and an empty sketch
    val span = BigInt(hi) - BigInt(lo) + 1
    val cuts = (0 to numBatches)
      .map(i => BigInt(lo) + span * i / numBatches)
    val shardExpr = expr(
      s"${graft.graph.RandomWalk.nibbleValueSql("__h")} % $shards")
    var stateByShard = Map.empty[Int, Map[String, Long]]
    for (i <- 0 until numBatches) {
      // the last upper cut is hi+1, which has no Long representation when
      // hi == Long.MaxValue — the final batch closes with <= hi instead
      val upper =
        if (i == numBatches - 1) col(idCol) <= lit(hi)
        else col(idCol) < lit(cuts(i + 1).toLong)
      val batch = df
        .filter(col(idCol) >= lit(cuts(i).toLong) && upper)
        .filter(col(keyCol).isNotNull)
        .withColumn("__h", md5(col(keyCol)))
        .withColumn("__shard", shardExpr)
      val partials = batch.groupBy(col("__shard"))
        .agg(HeavyHitters.heavyHitters(capacity)(col(keyCol)).as("sk"))
        .collect() // bounded: ≤ shards rows × capacity entries
      partials.foreach { r =>
        val shard = r.getInt(0)
        val sk = r.getMap[String, Long](1).toMap
        stateByShard = stateByShard.updated(shard,
          HeavyHitters.mgMerge(
            stateByShard.getOrElse(shard, Map.empty), sk, capacity))
      }
    }
    // shards are key-disjoint → global sketch = union of shard summaries
    stateByShard.iterator
      .flatMap { case (_, m) => m.iterator }
      .toSeq.toDF("key", "est")
  }
}
