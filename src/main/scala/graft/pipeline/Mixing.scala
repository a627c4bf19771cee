package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixture assembly: sample each source at a rate that realizes a
  * target mixture (per-source weights) under a total token budget — the
  * step that turns curated per-source corpora into one training mix with
  * controlled proportions.
  *
  * Rates are solved driver-side by water-filling over the PER-SOURCE
  * aggregate (one row per source — catalog-sized at any corpus scale):
  * a source whose weight asks for more tokens than it has saturates at
  * rate 1.0 and the shortfall is redistributed over the unsaturated
  * sources by weight, iterating until stable (≤ #sources rounds).
  * Membership is then [[Sampling.hashBucket]] — a salted content hash,
  * so the mix is reproducible on any engine and any partitioning, and
  * the corpus-side plan is one broadcast join of #sources rate rows plus
  * a per-row filter: the 100 TB side is never shuffled.
  *
  * No-repetition contract: a rate never exceeds 1.0. If the budget
  * exceeds the total available tokens, every source saturates and the
  * mix is simply the whole corpus (callers wanting multi-epoch
  * repetition handle that above this operator).
  */
object Mixing {

  /** Water-filled per-source sampling rates.
    *
    * @param available per-source token counts
    * @param weights   target mixture weights (relative; needn't sum to 1);
    *                  sources absent from the map get weight 0 (dropped)
    * @param budget    total token budget for the mix
    * @return per-source rate in [0,1], quantized to 1e-4 (floor) so the
    *         same rates are exactly representable in any engine
    */
  def waterfillRates(available: Map[String, Long], weights: Map[String, Double],
      budget: Long): Map[String, Double] = {
    // the no-repetition fill IS the epoch fill with a 1.0 cap; 0-token
    // eligible sources saturate trivially (nothing to sample) instead of
    // being dropped, preserving "everything from an exhausted source"
    epochRates(available, weights, budget, maxEpochs = 1.0) ++
      available.keySet
        .filter(s => weights.getOrElse(s, 0.0) > 0 && available(s) == 0L)
        .map(_ -> 1.0).toMap
  }

  /** Per-source MULTI-EPOCH rates: like [[waterfillRates]] but a source
    * whose target exceeds its availability repeats (rate > 1.0, capped at
    * `maxEpochs`) instead of saturating — how real training mixes
    * up-weight small high-quality sources. Redistribution only happens
    * when the epoch cap truncates a source's target. */
  def epochRates(available: Map[String, Long], weights: Map[String, Double],
      budget: Long, maxEpochs: Double = 4.0): Map[String, Double] = {
    require(budget >= 0, s"budget $budget must be >= 0")
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    require(maxEpochs >= 1.0, s"maxEpochs $maxEpochs must be >= 1")
    var capped = Set.empty[String]
    var rates = Map.empty[String, Double]
    var remaining = budget.toDouble
    var stable = false
    val eligible = available.keySet
      .filter(s => weights.getOrElse(s, 0.0) > 0 && available(s) > 0)
    while (!stable) {
      val open = eligible -- capped
      val wsum = open.toSeq.map(weights(_)).sum
      if (open.isEmpty || wsum <= 0) stable = true
      else {
        val newlyCapped = open.filter { s =>
          remaining * weights(s) / wsum >= available(s).toDouble * maxEpochs
        }
        if (newlyCapped.isEmpty) {
          rates = open.map { s =>
            val t = remaining * weights(s) / wsum
            s -> math.floor(t / available(s).toDouble * 10000) / 10000
          }.toMap
          stable = true
        } else {
          capped ++= newlyCapped
          remaining -= newlyCapped.toSeq
            .map(available(_).toDouble * maxEpochs).sum
          if (remaining < 0) remaining = 0
        }
      }
    }
    (capped.map(_ -> maxEpochs) ++ rates).toMap
  }

  /** The repeated mix: every document appears `floor(rate)` times in full
    * epochs plus once more when its salted hash admits it to the
    * fractional epoch, with an `epoch` column (0-based) distinguishing
    * the copies so downstream packing/shuffling treats them as rows.
    * The copy fan-out is a per-row `explode(sequence(...))` — no joins
    * beyond the broadcast rate table, no corpus shuffle. */
  /** Per-source token totals, null-safe (see [[mix]]'s contract notes). */
  private def availableTokens(docs: DataFrame, tokenCol: String,
      sourceCol: String): Map[String, Long] =
    docs.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(coalesce(sum(col(tokenCol)), lit(0L)).cast("long").as("__atok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  def mixWithRepetition(docs: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, weights: Map[String, Double], budget: Long,
      maxEpochs: Double = 4.0, salt: String = "graft-mix"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = epochRates(availableTokens(docs, tokenCol, sourceCol),
      weights, budget, maxEpochs)
    val rateDf = rates.toSeq.map { case (s, r) =>
      (s, math.round(r * 10000)) }.toDF(sourceCol, "__rate4")
    docs.join(broadcast(rateDf), Seq(sourceCol))
      .withColumn("__full", (col("__rate4") / 10000).cast("long"))
      .withColumn("__frac",
        when(Sampling.hashBucket(col(idCol), salt) < col("__rate4") % 10000,
          1L).otherwise(0L))
      // guard zero-copy docs BEFORE the explode: sequence(0, -1) would
      // generate a DESCENDING [0, -1] rather than an empty array
      .filter(col("__full") + col("__frac") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__full") + col("__frac") - 1)))
      .drop("__rate4", "__full", "__frac")
  }

  /** The mixed corpus: per-source deterministic hash sample at the
    * water-filled rates. One tiny aggregate (collected: #sources rows),
    * one broadcast join, zero corpus shuffle. */
  def mix(docs: DataFrame, idCol: String, tokenCol: String, sourceCol: String,
      weights: Map[String, Double], budget: Long,
      salt: String = "graft-mix"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null-safety contract: an all-null token column sums to null (→ 0,
    // the source saturates trivially), and a null source key can't carry
    // a weight — those docs are excluded from the mix, the same as a
    // source absent from the weight map
    val rates = waterfillRates(
      availableTokens(docs, tokenCol, sourceCol), weights, budget)
    val rateDf = rates.toSeq.map { case (s, r) =>
      (s, math.round(r * 10000)) }.toDF(sourceCol, "__rate4")
    docs.join(broadcast(rateDf), Seq(sourceCol))
      .filter(Sampling.hashBucket(col(idCol), salt) < col("__rate4"))
      .drop("__rate4")
  }
}
