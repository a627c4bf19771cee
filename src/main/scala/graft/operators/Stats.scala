package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at corpus scale. The reference exposes
  * aggregation (AVG/MIN/MAX/SUM/COUNT — reference
  * src/AgeDigitalTwins/AdtQueryHelpers.cs aggregate rewrite) but no exact
  * percentile; a training-data pipeline needs one constantly (length
  * caps, score cutoffs, contamination thresholds are all "value at
  * quantile q" decisions, and an approximate sketch cannot back a
  * reproducible filter).
  *
  * Scale shape: selection-by-rank, never a global sort. A global
  * `row_number() OVER (ORDER BY v)` collapses 100 TB onto one task; here
  * the value space is cut into range buckets (boundaries from a one-pass
  * `approx_percentile` probe — only bucket SIZES depend on its accuracy,
  * never the answer), bucket counts (a driver-sized aggregate) turn into
  * running offsets, each target rank lands in exactly one bucket, and
  * only the buckets that contain a target get a within-bucket sort — a
  * window PARTITIONED by bucket over ~n/B rows. Two scans + one bounded
  * window; the heavy shuffle is one hash partition on the bucket id of a
  * B-th of the data. Ties concentrate mass into one bucket in the worst
  * case (all-equal column) — then that bucket's window is the data, which
  * is the information-theoretic floor for an exact answer on ties.
  */
object Stats {

  /** Exact discontinuous quantiles (inverse empirical CDF: the value at
    * 1-based rank `max(1, ceil(q·n))` in sort order). Returns
    * `(q_bp, value)` — q in integer basis points, so the row set is
    * hash-comparable cross-engine. Null values are excluded (SQL
    * aggregate semantics); an all-null or empty input returns no rows. */
  def exactQuantiles(df: DataFrame, valueCol: String, qsBp: Seq[Long],
      numBuckets: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).as("v")).filter(col("v").isNotNull)
    val n = v.count()
    if (n == 0L) return Seq.empty[(Long, Double)].toDF("q_bp", "value")
      .select(col("q_bp"), col("value").cast(df.schema(valueCol).dataType))
    // Integer ceil — (q·n + 9999) div 10⁴ — NOT float ceil: when q_bp·n is
    // a multiple of 10⁴ the double quotient can land an ulp above the
    // integer and ceil would select the next rank.
    val targets = qsBp.distinct.map(q =>
      (q, math.max(1L, (q * n + 9999L) / 10000L)))
    // Range boundaries from an approximate probe; dedup handles heavy
    // ties (duplicate boundaries just leave some buckets empty).
    val bounds: Seq[Double] =
      if (numBuckets < 2) Seq.empty
      else v.agg(expr(
          s"approx_percentile(v, array(${
            (1 until numBuckets).map(i => s"${i.toDouble / numBuckets}d")
              .mkString(",")}), 1000)").as("bs"))
        .collect()(0).getSeq[Any](0)
        .map(_.toString.toDouble).distinct.sorted
    // bucket id = number of boundaries strictly below the value: a fold of
    // B-1 codegen'd comparisons, no UDF, no join.
    def bucketOf(c: Column): Column =
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(c > lit(b).cast(df.schema(valueCol).dataType), 1)
          .otherwise(0)
      }
    val bucketed = v.withColumn("__qb", bucketOf(col("v")))
    val counts = bucketed.groupBy(col("__qb"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // running offsets locate each target rank's bucket + within-rank
    val offsets = counts.scanLeft((0, 0L, 0L)) {
      case ((_, _, acc), (b, c)) => (b, acc, acc + c)
    }.tail // (bucket, offsetBefore, offsetAfter)
    val located = targets.map { case (q, r) =>
      val (b, off, _) = offsets.find { case (_, off, end) =>
        off < r && r <= end
      }.get
      (q, b, r - off)
    }
    val need = located.map { case (q, b, wr) => (q, b, wr) }
      .toDF("q_bp", "__qb", "__wr")
    val neededBuckets = located.map(_._2).distinct
    // within-bucket rank: the only sort in the plan, partitioned by bucket
    // and restricted to buckets that actually contain a target
    val ranked = bucketed.filter(col("__qb").isin(neededBuckets: _*))
      .withColumn("__wr", row_number().over(
        Window.partitionBy(col("__qb")).orderBy(col("v"))))
    ranked.join(broadcast(need), Seq("__qb", "__wr"))
      .select(col("q_bp"), col("v").as("value"))
  }

  /** ONE-PASS approximate quantiles over a non-negative numeric column
    * via a decimal-prefix histogram: values (in the house fixed-point
    * cents) bucket by their first `prefixLen` decimal digits + digit
    * count, one map-side-combinable groupBy produces a BOUNDED bucket
    * table (≤ 9·10^(prefixLen-1) buckets per decimal magnitude — a few
    * thousand rows for any input size), and each requested quantile is
    * answered with the bucket bracketing its rank. Relative bracket
    * width ≤ 10^(1-prefixLen) (≤1% at the default 3), values below
    * 10^prefixLen cents land in singleton buckets (exact).
    *
    * This is the profile-scan form: [[exactQuantiles]] needs a probe
    * pass + a per-bucket sort; this needs ONE scan and is mergeable
    * (bucket counts are plain integer sums), which is what a 100-TB
    * table profiler runs. All bucket arithmetic is integer/string ops
    * with identical semantics in DuckDB, so the bracket output is
    * hash-comparable cross-engine. Only the bounded bucket table
    * reaches the driver. Output: (q_bp, lo_c, hi_c). */
  def decHistQuantiles(df: DataFrame, valueCol: String, qsBp: Seq[Long],
      prefixLen: Int = 3): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 6,
      s"prefixLen $prefixLen out of [1,6]")
    require(qsBp.forall(q => q >= 1L && q <= 10000L),
      s"quantiles must be basis points in [1,10000], got $qsBp")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df
      .select(expr(s"CAST(floor($valueCol * 100 + 0.5) AS BIGINT)").as("c"))
      .filter(col("c").isNotNull)
    // 10^k is exact in binary64 up to 10^22, so the power() round-trip
    // through double is deterministic for every reachable scale (≤ 17)
    val buckets = v
      .withColumn("d", length(col("c").cast("string")))
      .withColumn("divd",
        expr(s"CAST(power(10, greatest(d - $prefixLen, 0)) AS BIGINT)"))
      .groupBy(expr("(c div divd) * divd").as("lo_c"),
        expr("(c div divd) * divd + divd - 1").as("hi_c"))
      .agg(count(lit(1)).as("n"), min(col("c")).as("mn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    if (buckets.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("q_bp", "lo_c", "hi_c")
    // the negativity guard rides the SAME scan (a per-bucket min(c) on
    // the one aggregation) — no separate min() pass, keeping the
    // one-scan contract honest
    require(buckets.iterator.map(_._4).min >= 0L,
      "decHistQuantiles: negative values unsupported (sign would corrupt " +
        "the decimal-prefix bucket key)")
    val total = buckets.iterator.map(_._3).sum
    val cums = buckets.scanLeft(0L)(_ + _._3).tail
    qsBp.distinct.sorted.map { q =>
      val rank = math.max(1L, (q * total + 9999L) / 10000L)
      val i = cums.indexWhere(_ >= rank)
      (q, buckets(i)._1, buckets(i)._2)
    }.toDF("q_bp", "lo_c", "hi_c")
  }

  /** Stratified [[decHistQuantiles]]: the same one-scan decimal-prefix
    * histogram PER GROUP — one map-side-combinable groupBy on
    * (group, bucket), bounded bucket count per group, rank walk per
    * group on the driver over only the bucket table. The per-source
    * length/score profile a corpus report runs without a per-group
    * sort. Output: (group, q_bp, lo_c, hi_c). */
  def decHistQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, qsBp: Seq[Long], prefixLen: Int = 3): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 6,
      s"prefixLen $prefixLen out of [1,6]")
    require(qsBp.forall(q => q >= 1L && q <= 10000L),
      s"quantiles must be basis points in [1,10000], got $qsBp")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df
      .select(col(groupCol).cast("string").as("g"),
        expr(s"CAST(floor($valueCol * 100 + 0.5) AS BIGINT)").as("c"))
      .filter(col("c").isNotNull && col("g").isNotNull)
    val buckets = v
      .withColumn("d", length(col("c").cast("string")))
      .withColumn("divd",
        expr(s"CAST(power(10, greatest(d - $prefixLen, 0)) AS BIGINT)"))
      .groupBy(col("g"), expr("(c div divd) * divd").as("lo_c"),
        expr("(c div divd) * divd + divd - 1").as("hi_c"))
      .agg(count(lit(1)).as("n"), min(col("c")).as("mn"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    if (buckets.isEmpty)
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("g", "q_bp", "lo_c", "hi_c")
        .withColumnRenamed("g", groupCol)
    require(buckets.iterator.map(_._5).min >= 0L,
      "decHistQuantilesByGroup: negative values unsupported")
    val out = buckets.groupBy(_._1).toSeq.flatMap { case (g, bs) =>
      val sorted = bs.sortBy(_._2)
      val total = sorted.iterator.map(_._4).sum
      val cums = sorted.scanLeft(0L)(_ + _._4).tail
      qsBp.distinct.sorted.map { q =>
        val rank = math.max(1L, (q * total + 9999L) / 10000L)
        val i = cums.indexWhere(_ >= rank)
        (g, q, sorted(i)._2, sorted(i)._3)
      }
    }
    out.toDF("g", "q_bp", "lo_c", "hi_c").withColumnRenamed("g", groupCol)
  }

  /** Per-group exact quantiles: the stratified form of
    * [[exactQuantiles]] — value at 1-based rank `max(1, ceil(q·n_g))`
    * inside each group. One count aggregate + one window PARTITIONED BY
    * the group column (groups distribute across the cluster; a single
    * pathologically-large group sorts within its partition — for that
    * shape, filter the group out and use [[exactQuantiles]]'s bucketed
    * selection). Output `(group, q_bp, value)`. */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qsBp: Seq[Long]): DataFrame = {
    val v = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
    val counts = v.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val qs = qsBp.distinct.map(q => lit(q))
    val targets = counts.select(col("g"), col("n"),
        explode(array(qs: _*)).as("q_bp"))
      .select(col("g"), col("q_bp"),
        greatest(lit(1L), expr("(q_bp * n + 9999) div 10000")).as("__rk"))
    val ranked = v.withColumn("__rk", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"))).cast("long"))
    ranked.join(targets, Seq("g", "__rk"))
      .select(col("g").as(groupCol), col("q_bp"), col("v").as("value"))
  }

  /** ANALYZE-style column profile: per column, row count, null count,
    * distinct count, and min/max (as strings, so one schema fits every
    * column type). The statistics pass behind layout decisions — skew
    * detection for [[SkewJoin.hotKeys]] thresholds, Z-order column
    * selection, partition sizing.
    *
    * One scan: every column's aggregates run in a single `agg` (multiple
    * exact distinct counts plan as one expand — the scan is read once,
    * expanded k ways before the aggregation; `exact = false` swaps in
    * HyperLogLog `approx_count_distinct`, collapsing the expand for very
    * wide tables). The result is column-count-sized — driver-safe by
    * construction. */
  def tableProfile(df: DataFrame, columns: Seq[String] = Seq.empty,
      exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val names = if (columns.isEmpty) df.columns.toSeq else columns
    val aggs: Seq[Column] = names.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null__$c"),
      (if (exact) count_distinct(col(c))
       else approx_count_distinct(col(c))).as(s"ndv__$c"),
      min(col(c)).cast("string").as(s"min__$c"),
      max(col(c)).cast("string").as(s"max__$c")) }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    names.map { c => (c, n, row.getAs[Long](s"null__$c"),
        row.getAs[Long](s"ndv__$c"),
        Option(row.getAs[String](s"min__$c")),
        Option(row.getAs[String](s"max__$c")))
    }.toDF("col_name", "n_rows", "n_null", "ndv", "min_s", "max_s")
  }
}
