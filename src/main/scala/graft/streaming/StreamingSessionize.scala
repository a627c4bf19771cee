package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the incremental counterpart of
  * [[graft.operators.Sessionize.sessions]], built on Structured
  * Streaming's native `session_window` (dynamic-gap session state with
  * watermark-driven eviction; Spark-first — no hand-rolled
  * `flatMapGroupsWithState` when the built-in operator already holds,
  * merges and expires session state at scale).
  *
  * Boundary parity: the batch operator starts a NEW session only when a
  * silence is STRICTLY greater than `gapMs` (`gap_us > gapMs·1000`),
  * while `session_window` closes a session when the next event is ≥ the
  * window end. Passing the gap as `gapMs·1000 + 1` microseconds makes
  * the two split on exactly the same boundary — an event landing
  * precisely `gapMs` after its predecessor stays in-session in both
  * engines, so a drained stream is row-identical to the batch rollup.
  *
  * Output matches the batch rollup: (key…, session_start, session_end,
  * n_events, duration_us) with start/end from min/max event times (the
  * window's own end extends `gap` past the last event — an
  * implementation detail callers should not see).
  *
  * Scale shape: per-key session state is bounded by the watermark —
  * closed sessions emit (Append mode) and their state is dropped once
  * the watermark passes; an unbounded-lateness batch replay of the same
  * frames produces the identical rows.
  */
object StreamingSessionize {

  def sessions(events: DataFrame, keyCols: Seq[String], timeCol: String,
      gapMs: Long, lateness: String): DataFrame = {
    require(gapMs > 0, s"gapMs $gapMs must be positive")
    val keys = keyCols.map(col)
    events
      .withWatermark(timeCol, lateness)
      .groupBy(keys :+
        session_window(col(timeCol), s"${gapMs * 1000 + 1} microseconds"): _*)
      .agg(
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(timeCol))) -
          unix_micros(min(col(timeCol)))).as("duration_us"))
      .drop("session_window")
  }
}
