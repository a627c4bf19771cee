package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a typed Spark [[Aggregator]]
  * (Misra & Gries, "Finding repeated elements", 1982; merge rule from
  * Agarwal et al., "Mergeable summaries", PODS 2012). State is at most
  * `k` (key, counter) pairs regardless of stream length, partials merge
  * map-side for free, and every key with true frequency > n/k is
  * guaranteed to survive with `true_count - n/k ≤ counter ≤ true_count`.
  * This is the bounded-memory "top vocabulary / dominant sources" scan a
  * 100-TB corpus profile runs instead of a full groupBy.
  *
  * Determinism: counters are commutative integer sums as long as the
  * sketch never overflows (distinct keys ≤ k), which is the regime the
  * oracle gate pins (the state then IS the exact count map, on any
  * engine, any partitioning). Above k the classic ε-bound holds but the
  * exact counter values depend on merge order — that regime is
  * spec-asserted (error bound + guaranteed-survivor set), not
  * hash-compared.
  */
object HeavyHitters {

  /** Decrement-all step: subtract `d` from every counter, drop zeros. */
  private def spend(m: Map[String, Long], d: Long): Map[String, Long] =
    m.flatMap { case (key, c) => if (c > d) Some(key -> (c - d)) else None }

  /** One MG arrival (nulls skipped by the callers). Shared by the batch
    * Aggregator and [[graft.pipeline.StreamingTopK]]'s per-shard state. */
  private[graft] def mgReduce(b: Map[String, Long], key: String,
                              k: Int): Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1)
      case None if b.size < k => b.updated(key, 1L)
      case None => spend(b, 1L) // the arriving key and one unit of
      // every counter annihilate (classic MG step)
    }

  /** Mergeable-summaries combine (Agarwal et al., PODS 2012): sum, then
    * subtract the (k+1)-th largest counter from all. */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long],
                             k: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else spend(sum, sum.valuesIterator.toVector.sorted(Ordering[Long].reverse)(k))
  }

  case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k $k must be >= 1")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      if (key == null) b else mgReduce(b, key, k)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(a, b, k)
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** DataFrame-facing aggregate column: `heavyHitters(64)(keyCol)` →
    * map<string,long> of surviving keys and their (under-)counts. */
  def heavyHitters(k: Int)(keys: Column): Column =
    udaf(MisraGries(k), Encoders.STRING).apply(keys)
}
