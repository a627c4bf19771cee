package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min frequency sketch as a typed [[Aggregator]] — the frequency
  * sibling of [[KmvSketch]]: fixed `depth × width` counter grid, each row
  * increments one counter per depth row, estimate = min over rows. State
  * is bounded (depth·width longs) no matter the input size, partials
  * merge by element-wise sum (map-side combine for free), and the error
  * is one-sided: est ≥ true count, est ≤ true + 2n/width w.p. 1-2^-depth.
  *
  * Like KMV — and unlike `count_min_sketch`'s opaque binary — the state
  * is DETERMINISTIC: positions come from md5 double hashing (the
  * [[graft.operators.BloomSemiJoin]] scheme) and integer addition
  * commutes, so the grid is identical on any engine, any row order, any
  * partitioning, and an oracle can reproduce the exact estimates.
  */
object CountMinSketch {

  /** (h1, h2) = 60-bit md5 hex halves of the key; depth-row i uses
    * bucket (h1 + i·h2) % width. h2 is forced into [1, width-1]: a zero
    * step would collapse every depth row onto bucket h1 for that key,
    * voiding the depth-wise independence behind the 1-2^-depth bound. */
  private[graft] def hashPair(key: String, width: Int): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    // Bit-identical to parsing hex digits [0,15) and [15,30) of the md5
    // hex string — i.e. digest bits [0,60) and [60,120) big-endian —
    // without materializing the hex string (the "%02x".format round-trip
    // was ~3µs/row, the dominant cost of a sketch update).
    var h1 = 0L
    var i = 0
    while (i < 8) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    h1 >>>= 4 // drop hex digit 15 → digits [0,15)
    var h2 = d(7) & 0xfL // hex digit 15 leads digits [15,30)
    i = 8
    while (i < 15) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    (h1 % width, h2 % (width - 1) + 1)
  }

  case class CmAgg(width: Int, depth: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(width >= 2 && depth >= 1 && depth <= 16,
      s"count-min grid ${depth}x$width out of range")
    def zero: Array[Long] = new Array[Long](width * depth)
    def reduce(b: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        val (h1, h2) = hashPair(key, width)
        var i = 0
        while (i < depth) {
          b(i * width + ((h1 + i * h2) % width).toInt) += 1L
          i += 1
        }
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate column: `countMin(8192, 4)(keyCol)` → the counter grid. */
  def countMin(width: Int, depth: Int)(key: Column): Column =
    udaf(CmAgg(width, depth), Encoders.STRING).apply(key)

  /** Point estimate for one key from a finished grid. */
  def estimate(grid: Seq[Long], width: Int, depth: Int, key: String): Long = {
    val (h1, h2) = hashPair(key, width)
    (0 until depth).map(i => grid(i * width + ((h1 + i * h2) % width).toInt)).min
  }
}
