package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{array_intersect, array_sort,
  array_union, size, slice, udaf}
import org.apache.spark.sql.types.LongType

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * [[Aggregator]] — the brief "custom aggregate" case: the state is the
  * k SMALLEST distinct 60-bit hashes seen, so each partial is bounded at
  * k longs no matter how many rows flow through it, partials merge by
  * set-union-and-trim (map-side combine for free), and the k-th minimum
  * estimates the distinct count as (k-1)·2^60 / h_k.
  *
  * Everything is deterministic — the hash is [[graft.pipeline
  * .TextAnalysis.stableId]]'s md5-derived 60-bit integer, and bottom-k of
  * a set does not depend on arrival order — so unlike
  * `approx_count_distinct` (HLL++, whose registers are
  * implementation-defined), the SKETCH STATE itself is reproducible on
  * any engine and can be oracle-checked exactly; only the final
  * float estimate is engine-side arithmetic.
  */
object KmvSketch {

  /** 2^60 — the hash domain of stableId's 15 hex digits. */
  val HashDomain: Double = math.pow(2.0, 60)

  /** Insert keeping `b` sorted, distinct, and at most k long. */
  private def insert(k: Int)(b: Seq[Long], h: Long): Seq[Long] =
    if (b.contains(h) || (b.size >= k && h >= b.last)) b
    else {
      val (lo, hi) = b.span(_ < h)
      (lo ++ (h +: hi)).take(k)
    }

  /** The Aggregator: Long hash in (nulls skipped, like every SQL
    * aggregate — a primitive encoder would instead coerce NULL to 0 and
    * poison the sketch minimum), bottom-k sorted hash list out. */
  case class Kmv(k: Int)
      extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
    require(k >= 2, s"k $k must be >= 2")
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], h: java.lang.Long): Seq[Long] =
      if (h == null) b else insert(k)(b, h.longValue)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert(k))
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** DataFrame-facing aggregate column: `kmv(16)(hashCol)`. */
  def kmv(k: Int)(hashes: Column): Column =
    udaf(Kmv(k), Encoders.LONG).apply(hashes)

  /** KMV set-operation surface — the reason KMV beats HLL for corpus
    * overlap audits: because the state is the bottom-k HASH SET itself,
    * sketches compose under set algebra. `bottom-k(bottom-k(A) ∪
    * bottom-k(B)) = bottom-k(A ∪ B)` (any hash excluded from both
    * bottom-k's exceeds both k-th minima, hence exceeds the union's),
    * so a union sketch — and from it union cardinality, Jaccard, and
    * intersection estimates (Beyer et al., "On synopses for
    * distinct-value estimation under multiset operations", SIGMOD 2007)
    * — is computed from two finished sketches without re-touching the
    * data. Engine-exact and order-independent like the sketch itself. */
  def merge(k: Int)(a: Column, b: Column): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Jaccard numerator: merged-sketch hashes seen in BOTH inputs —
    * `|A ∩ B ∩ U_k|` for the estimator `J ≈ |A∩B∩U_k| / |U_k|`. */
  def commonInMerged(merged: Column, a: Column, b: Column): Column =
    size(array_intersect(merged, array_intersect(a, b))).cast(LongType)

  /** Jaccard estimate from two finished sketches. */
  def jaccardEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val merged = (a ++ b).distinct.sorted.take(k)
    if (merged.isEmpty) 0.0
    else {
      val as = a.toSet; val bs = b.toSet
      merged.count(h => as(h) && bs(h)).toDouble / merged.size
    }
  }

  /** Intersection-cardinality estimate: `J · |A ∪ B|` with the union
    * cardinality taken from the merged sketch. */
  def intersectionEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val merged = (a ++ b).distinct.sorted.take(k)
    jaccardEstimate(a, b, k) * estimate(merged, k)
  }

  /** Distinct-count estimate from a finished sketch: exact below k
    * (the sketch saw every distinct hash), (k-1)/u_k above it, where
    * u_k is the k-th minimum normalized into (0,1]. */
  def estimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    // h_k == 0 would divide to Infinity; a full sketch whose k-th minimum
    // is 0 degenerates to "at least k distinct" — report k.
    else if (sketch.last == 0L) k.toDouble
    else (k - 1) * HashDomain / sketch.last.toDouble
}
