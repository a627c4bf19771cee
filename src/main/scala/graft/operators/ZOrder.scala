package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the physical-layout lever for
  * multi-column file skipping at 100 TB. Sorting a table by the
  * interleaved bits of its two hottest filter columns gives every data
  * file a tight min/max envelope on BOTH columns simultaneously, so a
  * scan with predicates on either (or both) prunes files the way a
  * single-column sort only prunes for its one column — the same layout
  * Delta's OPTIMIZE ZORDER BY and the classic UB-tree literature use
  * (Morton 1966; Markl, MISTRAL 1999).
  *
  * The key is pure integer bit arithmetic (no floats, no hashing), built
  * from `shiftright`/`shiftleft`/`bitwiseAND` Column expressions — fully
  * whole-stage-codegen'd, and bit-identical in any engine with the same
  * operators, which is what makes it oracle-checkable. Values must
  * already be non-negative ints that fit `bits`; real deployments first
  * rank/quantize each dimension (e.g. `hashBucket` or percentile bins),
  * which keeps the interleave balanced under skew.
  *
  * Usage at scale: `df.repartitionByRange(N, zkey).sortWithinPartitions
  * (zkey).write...` — range partitioning on the key gives each output
  * file a contiguous Z-curve segment, i.e. a small rectangle in
  * (a, b)-space.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. */
  def zkey2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** N-column generalization: bit i of column k lands at position
    * i*n + k, so the n columns' bits interleave round-robin — the layout
    * lever for three or four filter dimensions (time × tenant × model is
    * the common trio). `bits * n` must stay ≤ 62 so the key fits a signed
    * long; more total bits than that add no pruning power at realistic
    * file counts anyway (a 32-file layout distinguishes only ~5 high
    * bits). zkey2 is the n=2 special case (kept: its fixed shape
    * generates slightly tighter code and is the oracle-gated form). */
  def zkeyN(cols: Seq[Column], bits: Int = 8): Column = {
    val n = cols.size
    require(n >= 2, s"zkeyN needs at least 2 columns, got $n")
    require(bits >= 1 && bits * n <= 62,
      s"bits*n must be in [$n,62], got ${bits * n}")
    val terms = (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, k) =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + k)
      }
    }
    terms.reduce(_ + _)
  }

  /** The matching SQL text for an oracle / external engine, same bit math:
    * Σ ((x >> i) & 1) << 2i  +  ((y >> i) & 1) << (2i+1). */
  def zkey2Sql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Materialize `df` physically clustered on the Z-curve of
    * (`aCol`, `bCol`): range-partition on the interleaved key — each
    * output file owns a contiguous curve segment, i.e. a small rectangle
    * in (a, b)-space — and sort within partitions so parquet row-group
    * min/max stats stay tight inside every file too. A scan filtering on
    * EITHER column (or both) then prunes whole files from the footer
    * stats; ZOrderSpec measures the effect against a hash-scattered
    * layout. Boundaries come from range-partitioning's sampling — they
    * shift a little run to run, which moves file cut points, never the
    * bounding-box property. */
  def writeClustered(df: org.apache.spark.sql.DataFrame, aCol: String,
      bCol: String, path: String, numFiles: Int = 32, bits: Int = 16)
      : Unit =
    df.withColumn("__zk", zkey2(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__zk"))
      .sortWithinPartitions(col("__zk"))
      .drop("__zk")
      .write.mode("overwrite").parquet(path)
}
