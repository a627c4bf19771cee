package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: how far along a required event sequence
  * (view → click → purchase) each key travels, with greedy
  * earliest-completion semantics — stage i's timestamp is the EARLIEST
  * event of step i strictly after stage i−1's timestamp. The classic
  * product-analytics operator; in a data-engine context it is also the
  * shape of multi-stage pipeline progress tracking (ingested → deduped →
  * curated per document).
  *
  * Greedy-earliest is the standard unambiguous semantics: it maximizes
  * the reachable stage (if ANY increasing chain exists, the earliest
  * chain exists), and every per-stage timestamp is a `min` aggregate —
  * deterministic, order-independent, and exactly reproducible in plain
  * SQL, one CTE per step.
  *
  * Scale shape: k steps = k equi-join + min-aggregate passes over the
  * (filtered) event stream, each shuffling only on the key column, all
  * map-side combinable. No windows over the full stream, no per-key
  * event-list collection — a hot key costs one aggregation bucket per
  * step, never a task-sized sort.
  */
object Funnel {

  /** Per-key funnel progress: `(key, stage)` where stage ∈ [0, steps.size]
    * counts the completed prefix of `steps`. Every distinct key in
    * `events` gets a row (stage 0 = never did step 1). */
  def stages(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(keyCol).as("key"), col(typeCol).as("et"),
      col(tsCol).as("ts"))
    val keys = base.select(col("key")).distinct()
    // reached(i) = (key, t_i): earliest completion time of step prefix i
    var reached = base.filter(col("et") === steps.head)
      .groupBy(col("key")).agg(min(col("ts")).as("t"))
    var out = keys.join(reached.select(col("key"), lit(1).as("s")),
      Seq("key"), "left_outer")
      .select(col("key"), coalesce(col("s"), lit(0)).as("stage"))
    steps.tail.foreach { step =>
      reached = base.filter(col("et") === step)
        .join(reached.select(col("key"), col("t").as("t_prev")), Seq("key"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("key")).agg(min(col("ts")).as("t"))
      val idx = out // capture
      out = idx.join(reached.select(col("key"), lit(1).as("s")),
        Seq("key"), "left_outer")
        .select(col("key"),
          (col("stage") + coalesce(col("s"), lit(0))).as("stage"))
    }
    out.select(col("key").as(keyCol), col("stage").cast("long").as("stage"))
  }

  /** Funnel histogram: `(stage, n_keys)` — the conversion report. */
  def report(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame =
    stages(events, keyCol, typeCol, tsCol, steps)
      .groupBy(col("stage")).agg(count(lit(1)).as("n_keys"))

  /** Streaming event for [[stagesStream]]: micros timestamps keep the
    * state bit-comparable with the batch form. */
  case class Event(key: Long, eventType: String, tsUs: Long)

  /** Per-key funnel automaton state: completed prefix length + the
    * timestamp that completed it. */
  case class FunnelState(stage: Int, tUs: Long)

  /** Continuous funnel over a stream: per-key automaton state in the
    * state store (`mapGroupsWithState`), one `(key, stage)` row per key
    * per micro-batch (update mode). Within a batch the key's events fold
    * in timestamp order; across batches events are consumed in arrival
    * order — when the stream delivers events in event-time order this is
    * EXACTLY the batch [[stages]] semantics (parity-tested), and a
    * late-arriving earlier event cannot retroactively improve a chain
    * (the standard streaming-funnel trade-off; re-run the batch form for
    * a corrected report). State is two numbers per key — a 100 TB event
    * history costs the store one (int, long) per distinct key. */
  def stagesStream(events: org.apache.spark.sql.Dataset[Event],
      steps: Seq[String]): org.apache.spark.sql.Dataset[(Long, Int)] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    events.groupByKey(_.key)
      .mapGroupsWithState[FunnelState, (Long, Int)](
        GroupStateTimeout.NoTimeout()) { (key, it, state) =>
        var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
        it.toSeq.sortBy(e => (e.tsUs, e.eventType)).foreach { e =>
          if (s.stage < steps.size && e.eventType == steps(s.stage) &&
              e.tsUs > s.tUs)
            s = FunnelState(s.stage + 1, e.tsUs)
        }
        state.update(s)
        (key, s.stage)
      }
  }
}
