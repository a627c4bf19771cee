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
  * derive from md5 double-hashing (same scheme as
  * [[graft.pipeline.TextAnalysis.stableId]]), and bit-OR is commutative,
  * so the sketch bytes are identical on any engine, any partitioning,
  * any row order — unlike `bloom_filter_agg`, whose serialized form is
  * implementation-defined.
  */
object BloomSemiJoin {

  /** Deterministic double hash of a key's canonical string form: the two
    * 60-bit halves of md5 hex, each reduced mod numBits. Bit i of the
    * filter is h1 + i*h2 (Kirsch-Mitzenmacher double hashing). */
  private def hashPair(key: String, numBits: Int): (Long, Long) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % numBits,
      java.lang.Long.parseLong(hex.substring(15, 30), 16) % numBits)
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

  /** Membership test as a pure-codegen Column over the same md5 double
    * hash the builder used: false ⇒ key DEFINITELY absent, true ⇒
    * present or false positive. Null keys test null (falsy in a filter).
    * The words ride along as a single array literal — constant-folded
    * per task, no join, no shuffle. */
  def mightContain(words: Array[Long], numBits: Int, numHashes: Int)(
      key: Column): Column = {
    val w = lit(words)
    val hex = md5(key.cast("string"))
    val h1 = conv(substring(hex, 1, 15), 16, 10).cast("long") % numBits
    val h2 = conv(substring(hex, 16, 15), 16, 10).cast("long") % numBits
    (0 until numHashes).map { i =>
      val pos = (h1 + lit(i.toLong) * h2) % numBits
      element_at(w, floor(pos / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (pos % 64).cast("int"))) =!= lit(0L)
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
