package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter semi/anti join — pre-filter a huge probe side with a
  * compact bitset built from the build side's keys BEFORE any shuffle.
  *
  * The 100 TB shape: a selective dimension filter (say 0.5% of orders)
  * semi-joined against a petabyte fact table normally shuffles the WHOLE
  * fact side on the join key. A Bloom filter of the surviving build keys
  * is a few MB — broadcast it and probe-side rows that are DEFINITELY
  * absent die at scan speed inside whole-stage codegen, so only the tiny
  * residual (true matches + false positives, rate ≈ (1-e^{-kn/m})^k)
  * reaches the shuffle. The residual then finishes with a real
  * semi/anti join, so results are EXACT — the bloom only cuts volume.
  *
  * Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects the same
  * idea opportunistically; this operator makes it explicit, REUSABLE
  * across queries (build once, probe many), and deterministic: the bits
  * derive from xxhash64 double-hashing and bit-OR is commutative, so the
  * sketch bytes are identical for any partitioning and any row order —
  * unlike `bloom_filter_agg`, whose serialized form is
  * implementation-defined. xxhash64 rather than the repo's usual md5
  * scheme because the membership test runs per probe-side ROW inside a
  * Filter, where codegen does no common-subexpression elimination: k=5
  * probes evaluate the hash 10×/row, and a native long hash keeps that
  * at ~ns instead of md5+hex-parse string machinery (~µs). The builder
  * reproduces the Column-side value through the same catalyst
  * [[XxHash64Function]] fold (seed 42, then the probe index).
  */
object BloomSemiJoin {

  import org.apache.spark.sql.catalyst.expressions.XxHash64Function
  import org.apache.spark.sql.types.{LongType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  /** Deterministic double hash of a key's canonical string form, each
    * value reduced into [0, numBits). h1 = xxhash64(key), h2 =
    * xxhash64(key, 1) — exactly Spark's `xxhash64(col)` and
    * `xxhash64(col, lit(1))` folds, so builder and probe agree. Bit i of
    * the filter is h1 + i*h2 (Kirsch-Mitzenmacher double hashing). */
  private def hashPair(key: String, numBits: Int): (Long, Long) = {
    val s = UTF8String.fromString(key)
    val h1 = XxHash64Function.hash(s, StringType, 42L)
    val h2 = XxHash64Function.hash(1L, LongType, h1)
    (((h1 % numBits) + numBits) % numBits,
      ((h2 % numBits) + numBits) % numBits)
  }

  /** The bitset builder as a typed aggregate: state = numBits/64 longs,
    * reduce sets numHashes bits, merge ORs word-wise. Nulls skipped
    * (nullable-boxed input for the same reason as
    * [[graft.functions.KmvSketch.Kmv]]). */
  case class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](numBits / 64)
    def reduce(b: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        val (h1, h2) = hashPair(key, numBits)
        var i = 0
        while (i < numHashes) {
          val pos = ((h1 + i * h2) % numBits).toInt
          b(pos >> 6) |= 1L << (pos & 63)
          i += 1
        }
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build the filter from `df`'s key column: one distributed pass with
    * map-side combine, numBits/8 bytes landing on the driver — size it
    * like any broadcast (2^23 bits = 1 MiB holds ~1M keys at k=5 under
    * 1% false positives). */
  def bloomBits(df: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits $numBits must be a positive multiple of 64")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes $numHashes out of [1,16]")
    df.select(udaf(BloomAgg(numBits, numHashes), Encoders.STRING)
        .apply(col(keyCol).cast("string")))
      .head.getSeq[Long](0).toArray
  }

  /** Membership test as a pure-codegen Column over the same xxhash64
    * double hash the builder used: false ⇒ key DEFINITELY absent, true ⇒
    * present or false positive. Null keys test null (falsy in a filter).
    * The words ride along as a single array literal — constant-folded
    * per task, no join, no shuffle. */
  def mightContain(words: Array[Long], numBits: Int, numHashes: Int)(
      key: Column): Column = {
    val w = lit(words)
    val ks = key.cast("string")
    val h1 = pmod(xxhash64(ks), lit(numBits.toLong))
    val h2 = pmod(xxhash64(ks, lit(1L)), lit(numBits.toLong))
    (0 until numHashes).map { i =>
      val pos = (h1 + lit(i.toLong) * h2) % numBits
      element_at(w, (shiftright(pos, 6) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Exact `big LEFT SEMI JOIN small ON big(bigKey) = small(smallKey)`:
    * bloom-negative probe rows never reach the shuffle; the residual
    * finishes with a real left_semi, which also removes false
    * positives. Keys compare by canonical string form (how the hash is
    * built), so keep both sides the same type. */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, numBits: Int = 1 << 22,
      numHashes: Int = 5): DataFrame = {
    val words = bloomBits(small, smallKey, numBits, numHashes)
    big.filter(mightContain(words, numBits, numHashes)(col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** Exact `big LEFT ANTI JOIN small`: here the bloom short-circuits the
    * OTHER way — a bloom-negative row is definitely unmatched and skips
    * the join entirely; only bloom-positive rows anti-join for real.
    * Null-keyed probe rows are kept (SQL anti join semantics: null never
    * equals anything) via the explicit isNull branch, since the bloom
    * test itself is null for them. Two probe-side scans (miss branch +
    * residual branch); at scale the scan is the cheap part — the shuffle
    * this avoids is the expensive one. */
  def antiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, numBits: Int = 1 << 22,
      numHashes: Int = 5): DataFrame = {
    val words = bloomBits(small, smallKey, numBits, numHashes)
    val maybe = mightContain(words, numBits, numHashes)(col(bigKey))
    val misses = big.filter(col(bigKey).isNull || !maybe)
    val residual = big.filter(maybe)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_anti")
    misses.unionByName(residual)
  }
}
