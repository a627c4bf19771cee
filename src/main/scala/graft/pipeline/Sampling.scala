package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the mixture-assembly step between
  * curation and training. Production pipelines need samples that are
  * REPRODUCIBLE (same inputs → same corpus, on any engine, any
  * partitioning), so randomness here is a salted content hash, never
  * `rand()`:
  *
  *  - [[hashSample]]: keep a p-fraction by hashing the id — the standard
  *    deterministic Bernoulli sample. Changing the salt draws an
  *    independent sample; the same salt always draws the same one.
  *  - [[stratifiedCap]]: at most k rows per stratum (cap the
  *    over-represented language/source/domain before training) — one
  *    row_number window per stratum, one shuffle keyed by the stratum.
  *
  * Scale shape: hashSample is a pure per-row filter (zero shuffle,
  * pushed into the scan stage); stratifiedCap is one hash-partition
  * shuffle on the stratum key + a windowed rank — no global sort, no
  * driver state. Skewed strata are bounded BY CONSTRUCTION: only k rows
  * per stratum survive the window, and Spark's rank-limit pushdown stops
  * accumulating past k per partition group.
  */
object Sampling {

  /** Salted uniform hash of `id` in [0, 10000): the first 15 md5 hex
    * digits (60 bits, exact in a long) mod 10^4 — identical arithmetic on
    * any SQL engine, no float rounding. */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10000

  /** Deterministic p-fraction sample: keeps rows whose salted hash falls
    * below p×10000. E[kept] = p×n with concentration like any Bernoulli
    * sample, but membership is a pure function of (id, salt). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "graft"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    df.filter(hashBucket(col(idCol), salt) < lit((fraction * 10000).toInt))
  }

  /** Deterministic weight-proportional thinning — Bernoulli-by-weight with
    * no RNG: a row survives iff its salted hash bucket falls below its OWN
    * weight×10000 (clamped to [0,1]). This is the per-row generalization
    * of [[hashSample]]'s global fraction and of Mixing's per-source rates:
    * quality-proportional sampling ("keep high-quality docs with
    * probability ∝ score") expressed as a pure projection — zero shuffle,
    * growth-stable (a doc's fate never changes as the corpus grows), and
    * engine-reproducible (same salted-md5 arithmetic as every sampler
    * here). Weights are quantized to 1e-4 like all fixed-point gates. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      salt: String = "graft-weight"): DataFrame =
    df.filter(hashBucket(col(idCol), salt) <
      least(lit(10000L), greatest(lit(0L),
        round(weight * 10000).cast("long"))))

  /** Deterministic train/val/test assignment: each row lands in the split
    * whose cumulative hash range covers its salted bucket — disjoint and
    * exhaustive by construction, a pure per-row projection (zero
    * shuffle), and stable under corpus growth: adding documents never
    * moves an existing one between splits (the property rand()-based
    * splitting lacks, and the reason eval sets stay uncontaminated
    * across corpus versions). Fractions are quantized to 1e-4; the last
    * split absorbs the remainder. */
  def split(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      salt: String = "graft-split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "fractions must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000) }.tail
    val b = hashBucket(col(idCol), salt)
    val assign = splits.init.zip(cuts.init)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), cut), rest) => when(b < cut, name).otherwise(rest)
      }
    df.withColumn("split", assign)
  }

  /** Eval-set hygiene: near-dup pairs that CROSS split boundaries. A test
    * doc with a near-duplicate in train is leakage — the eval score
    * partly measures memorization of training text. Feed it the pair set
    * any dedup family produces ([[Dedup.minhashLshPairs]] et al.) and the
    * same split spec used for [[split]]; the survivors are the pairs to
    * quarantine (typically: drop the eval-side doc). Two equi-joins on
    * the doc id against the split assignment — the pair set is the small
    * side, the corpus is never self-joined here. */
  def splitLeakage(docs: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], salt: String = "graft-split")
      : DataFrame = {
    val assigned = split(docs, idCol, splits, salt)
      .select(col(idCol), col("split"))
    pairs
      .join(assigned.select(col(idCol).as("doc_a"), col("split").as("split_a")),
        Seq("doc_a"))
      .join(assigned.select(col(idCol).as("doc_b"), col("split").as("split_b")),
        Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"))
  }

  /** Deterministic global shuffle: the training-order permutation. Every
    * row gets `shuffle_rank` (1-based) = its position when the corpus is
    * sorted by the salted 60-bit md5 hash of its id, ties broken by id.
    * Same salt → same permutation on any engine; a new salt is a fresh
    * epoch order — the reproducible replacement for `orderBy(rand())`.
    *
    * Scale shape: NO single-partition global window (the naive
    * `row_number over (order by hash)` formulation collapses 100 TB onto
    * one task). Instead the same two-level prefix sum as [[Packing]]:
    * the 60-bit key space is cut into 1024 ordered buckets (uniform by
    * hash uniformity, so no skew), bucket row-counts (1024 rows, a
    * driver-sized aggregate) turn into running offsets with a cheap
    * window over the tiny count table, and each row's rank = its
    * bucket's offset + its row_number within the bucket — a window
    * PARTITIONED by bucket, which distributes. */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String = "graft-shuffle")
      : DataFrame = {
    val key = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
      1, 15), 16, 10).cast("long")
    // 2^60 key space / 1024 ordered buckets. shiftright, not `/ 2^50`:
    // SQL `/` is double division and 60-bit keys exceed double's 2^53
    // exact range, so boundary keys would round into the adjacent bucket
    // (rank stays correct only by a fragile monotonicity argument).
    val keyed = df.withColumn("__sk", key)
      .withColumn("__sb", shiftright(col("__sk"), 50))
    val offsets = keyed.groupBy(col("__sb")).agg(count(lit(1)).as("__bn"))
      .withColumn("__boff",
        coalesce(sum(col("__bn")).over(
          Window.orderBy(col("__sb")).rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__sb"), col("__boff"))
    keyed
      .join(broadcast(offsets), Seq("__sb"))
      .withColumn("shuffle_rank", col("__boff") +
        row_number().over(Window.partitionBy(col("__sb"))
          .orderBy(col("__sk"), col(idCol))))
      .drop("__sk", "__sb", "__boff")
  }

  /** At most `k` rows per stratum, chosen deterministically: rank by the
    * salted hash (an unbiased draw within the stratum), ties broken by
    * id. One shuffle on the stratum key. */
  def stratifiedCap(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, salt: String = "graft"): DataFrame = {
    require(k > 0, s"cap $k must be positive")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic negative-pair sampling for contrastive training: for
    * every row, `k` pseudo-uniform "negative" partners drawn from the
    * whole corpus by salted hash — reproducible on any engine or
    * partitioning (same inputs → same pairs), unlike `rand()`-based
    * draws.
    *
    * Mechanics: [[shuffleOrder]] assigns every row a dense 1..N rank (its
    * two-level prefix sum — no single-partition window), then probe t of
    * row i targets rank `H(salt, id, t) mod N + 1` and an equi-join on
    * the rank resolves the partner id. The corpus is never cross-joined
    * with itself: cost is one rank assignment + one k·N-row equi-join.
    * Self-pairs (a row drawing its own rank, expected k rows total) are
    * dropped rather than re-probed, so a doc occasionally yields k−1
    * negatives — acceptable for training, and it keeps the plan one
    * deterministic pass with no iteration.
    *
    * Output: (doc_id, t, neg_id) with t ∈ [0, k). */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
      salt: String = "graft-neg"): DataFrame = {
    require(k > 0, s"negatives-per-row $k must be positive")
    val ranks = shuffleOrder(df.select(col(idCol)), idCol)
      .select(col(idCol), col("shuffle_rank"))
    val n = ranks.agg(count(lit(1)).as("__n"))
    val probeHash = conv(substring(md5(concat(lit(salt),
        col(idCol).cast("string"), lit(":"), col("t").cast("string"))),
      1, 15), 16, 10).cast("long")
    ranks.crossJoin(broadcast(n))
      .select(col(idCol), col("shuffle_rank"),
        explode(array((0 until k).map(lit): _*)).as("t"), col("__n"))
      .withColumn("neg_rank", pmod(probeHash, col("__n")) + 1)
      .filter(col("neg_rank") =!= col("shuffle_rank"))
      .join(ranks.select(col("shuffle_rank").as("neg_rank"),
        col(idCol).as("neg_id")), Seq("neg_rank"))
      .select(col(idCol).as("doc_id"), col("t").cast("long").as("t"),
        col("neg_id"))
  }
}
