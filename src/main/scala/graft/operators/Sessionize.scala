package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session until a silence longer than `gapMs` splits them — the
  * standard clickstream/telemetry session definition (and the batch twin
  * of Structured Streaming's `session_window`, which handles the same
  * semantics incrementally; this operator is for at-rest corpora).
  *
  * One shuffle on the key + a per-partition sort: lag() marks each
  * session head (gap exceeded or first event), a running sum of head
  * flags numbers the sessions per key. No self-join, no interval logic —
  * the window machinery Spark already scales (per-key skew is ordinary
  * window skew, AQE territory).
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key, in time order) to every event
    * row. Ties on the timestamp stay in one session (zero gap); pass a
    * `tiebreakCol` to make the within-session event order total. */
  def byGap(events: DataFrame, keyCols: Seq[String], timeCol: String,
      gapMs: Long, tiebreakCol: Option[String] = None): DataFrame = {
    require(gapMs > 0, s"gapMs $gapMs must be positive")
    val keys = keyCols.map(col)
    val order = col(timeCol).asc +: tiebreakCol.map(col(_).asc).toSeq
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    // µs arithmetic (Spark timestamp resolution): an ms re-truncation
    // can disagree by 1 with engines flooring from nanos when the gap
    // sits exactly on the threshold
    val gap = unix_micros(col(timeCol)) -
      unix_micros(lag(col(timeCol), 1).over(w))
    events
      .withColumn("__head",
        when(gap.isNull || gap > gapMs * 1000, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__head")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__head")
  }

  /** Per-session rollup: bounds, event count, and duration in MICROseconds
    * (Spark timestamp resolution — ms would re-truncate and disagree with
    * engines that floor from nanos directly). */
  def sessions(events: DataFrame, keyCols: Seq[String], timeCol: String,
      gapMs: Long): DataFrame =
    byGap(events, keyCols, timeCol, gapMs)
      .groupBy((keyCols :+ "session_idx").map(col): _*)
      .agg(min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(timeCol))) -
          unix_micros(min(col(timeCol)))).as("duration_us"))
}
