package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted one-mode projection of a bipartite (key, item) relation —
  * the co-occurrence graph construction (Newman, "Scientific
  * collaboration networks", Phys. Rev. E 2001): items sharing a key
  * become an edge weighted by the number of shared keys. This is how
  * the co-purchase / co-click / co-citation graphs every one of the
  * graph gates consumes are built; promoted to an operator so the cap
  * discipline lives in one place.
  *
  * Scale shape: candidate pairs arise ONLY through a shared key — one
  * self-equi-join on the key plus one combinable count, never an
  * all-pairs product. The quadratic risk is a hub key (one key with a
  * huge item list contributes |items|² pairs); `maxItemsPerKey` DROPS
  * such keys before the join — the same df-cap discipline as the
  * shingle index ([[graft.pipeline.Dedup]]): a key shared by everything
  * carries no co-occurrence signal, exactly like a stopword shingle.
  * Dropped keys are gone from the projection, loudly documented here
  * rather than silently exploding the join.
  */
object Projection {

  /** (item_a, item_b, weight) with item_a < item_b and weight = number
    * of distinct shared keys ≥ `minWeight`. */
  def bipartite(df: DataFrame, keyCol: String, itemCol: String,
      minWeight: Long = 1L,
      maxItemsPerKey: Option[Int] = None): DataFrame = {
    require(minWeight >= 1, s"minWeight $minWeight must be >= 1")
    val pairs0 = df.select(col(keyCol).as("k"), col(itemCol).as("item"))
      .distinct()
    val pairs = maxItemsPerKey match {
      case None => pairs0
      case Some(cap) =>
        require(cap >= 2, s"maxItemsPerKey $cap must be >= 2")
        val keep = pairs0.groupBy(col("k"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= cap)
          .select(col("k"))
        pairs0.join(keep, Seq("k"), "left_semi")
    }
    pairs.select(col("k"), col("item").as("item_a"))
      .join(pairs.select(col("k"), col("item").as("item_b")), Seq("k"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("weight"))
      .filter(col("weight") >= minWeight)
  }

  /** "Related items": the top `k` co-occurrence partners per item by
    * (weight desc, partner asc) — the classic recommender shortlist over
    * the [[bipartite]] projection. Symmetrizes the canonical pair list
    * and ranks with ONE window partitioned by the item (per-item groups
    * are bounded by the item's co-occurrence degree — distributed by
    * item key, never a global sort). */
  def relatedItems(df: DataFrame, keyCol: String, itemCol: String,
      k: Int, minWeight: Long = 1L,
      maxItemsPerKey: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val proj = bipartite(df, keyCol, itemCol, minWeight, maxItemsPerKey)
    val sym = proj
      .select(col("item_a").as("item"), col("item_b").as("related"),
        col("weight"))
      .unionByName(proj.select(col("item_b").as("item"),
        col("item_a").as("related"), col("weight")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("weight").desc, col("related").asc)
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("related"), col("weight"))
  }
}
