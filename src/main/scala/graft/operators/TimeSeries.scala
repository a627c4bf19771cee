package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators over an event stream: per-key
  * resampling with gap fill + forward fill, and cohort retention — the
  * telemetry-rollup shapes the reference's data-history consumers build
  * downstream of the flattened property stream (reference
  * `src/AgeDigitalTwins.Events/Models/DataHistory.cs` rows are exactly the
  * (id, timestamp, value) triples these operators regularize).
  *
  * Scale shape: everything is keyed. The grid is generated per key with
  * `sequence()` (bounded by that key's own time span — no global calendar
  * table join), the fill window is `partitionBy(key)` (distributes across
  * the cluster; no single-partition window anywhere), and the one shuffle
  * per stage is the groupBy/window hash exchange on the key. A key whose
  * span is pathological (years of hourly slots for one device) produces a
  * long — but single-key — explode; cap with `maxSlotsPerKey`.
  */
object TimeSeries {

  /** Per-key regular-grid resample: one row per (key, slot) for every
    * `stepSec`-aligned slot between the key's first and last event, with
    * that slot's aggregate (`n_events`, `sum_c`) — zero-filled on count,
    * null-preserved then forward-filled on the sum (`filled_c` carries the
    * last observed slot aggregate across gaps, 0 until the first
    * observation).
    *
    * `maxSlotsPerKey` guards the explode: a key spanning more than that
    * many slots is truncated to its LAST `maxSlotsPerKey` slots (recent
    * window), which bounds per-key memory at 100-TB scale where one
    * stuck device could otherwise span years.
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSec: Long = 3600L,
      maxSlotsPerKey: Int = 100000): DataFrame = {
    val cents: Column => Column = c => floor(c * 100 + 0.5).cast("long")
    // epoch seconds stay < 2^33, so the double division in floor() is
    // exact; the floor-multiply realigns to the step boundary
    val slotOf: Column => Column = ts =>
      timestamp_seconds(floor(unix_timestamp(ts) / stepSec).cast("long") * stepSec)
    val slotted = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), slotOf(col(tsCol)).as("slot"),
        cents(col(valueCol)).as("v_c"))
    val perSlot = slotted.groupBy(col("k"), col("slot"))
      .agg(count(lit(1)).as("n_events"), sum(col("v_c")).as("sum_c"))
    // per-key span → slot grid; truncate to the most recent maxSlotsPerKey
    val grid = perSlot.groupBy(col("k"))
      .agg(min(col("slot")).as("mn"), max(col("slot")).as("mx"))
      .select(col("k"),
        explode(sequence(
          greatest(col("mn"),
            col("mx") - expr(s"INTERVAL ${(maxSlotsPerKey - 1).toLong * stepSec} SECOND")),
          col("mx"),
          expr(s"INTERVAL $stepSec SECOND"))).as("slot"))
    val w = Window.partitionBy(col("k")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perSlot, Seq("k", "slot"), "left_outer")
      .select(col("k"), col("slot"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_c"), lit(0L)).as("sum_c"),
        coalesce(last(col("sum_c"), ignoreNulls = true).over(w), lit(0L))
          .as("filled_c"))
  }

  /** Rolling k-sigma anomaly flags over the trailing `window` events per
    * key — the standard telemetry spike detector, in EXACT integer
    * arithmetic: values go to fixed-point cents, the rolling mean/variance
    * ride one window pass as (count, sum, sum-of-squares), and the
    * k-sigma test cross-multiplies instead of taking a square root:
    *   (v·n − Σ)² > k² · (n·Σx² − Σ²)
    * (both sides in cents²·n² — no float, no sqrt, bit-identical on any
    * engine, so the oracle replays it verbatim). Rows without a full
    * trailing window report `is_anomaly = false` (cold start — matching
    * the detector a streaming consumer would run).
    *
    * Scale shape: ONE window pass partitioned by key (count/sum/sumsq
    * share the frame), no self-join; per-key skew is ordinary window
    * skew. */
  def rollingAnomaly(events: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, window: Int, kSigma: Int,
      tiebreakCol: String): DataFrame = {
    require(window >= 2, s"window $window must be >= 2")
    require(kSigma >= 1, s"kSigma $kSigma must be >= 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col(tiebreakCol).asc)
      .rowsBetween(-window, -1)
    val dev = col("__vc") * col("n_prev") - col("__sum")
    events
      .withColumn("__vc",
        floor(col(valueCol) * 100 + lit(0.5)).cast("long"))
      .withColumn("n_prev", count(col("__vc")).over(w))
      .withColumn("__sum", coalesce(sum(col("__vc")).over(w), lit(0L)))
      .withColumn("__ssq",
        coalesce(sum(col("__vc") * col("__vc")).over(w), lit(0L)))
      .withColumn("is_anomaly",
        col("n_prev") === window &&
          dev * dev > lit(kSigma.toLong * kSigma) *
            (col("n_prev") * col("__ssq") - col("__sum") * col("__sum")))
      .drop("__vc", "__sum", "__ssq")
  }

  /** Cohort retention: users bucketed by their first-activity day, then
    * counted per (cohort day, day offset) — `n_users` distinct actives at
    * each offset. Two keyed aggregations + one broadcast-size join per
    * user (first-day table is |users| rows, joined on the user key — an
    * equi-join that AQE broadcasts when the user dimension fits).
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val firstDay = days.groupBy(col("u")).agg(min(col("day")).as("cohort"))
    days.join(firstDay, Seq("u"))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("day_offset").cast("long").as("day_offset"), col("n_users"))
  }
}
