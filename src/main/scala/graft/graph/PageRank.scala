package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over the relationship graph — the classic
  * link-quality signal a web-scale training-data pipeline uses to weight
  * or filter documents by site authority (Page et al., "The PageRank
  * Citation Ranking", 1999). The reference has no equivalent operator;
  * this belongs to the pipeline-extension surface (SURVEY §2.F), next to
  * degree statistics (`TwinGraph.degrees`).
  *
  * All arithmetic is INTEGER, in rank micro-units (1.0 ≡ 1,000,000):
  * per-edge contribution is `rank div outdeg`, damping is
  * `(85 · Σcontrib) div 100 + 150000`. Integer sums are
  * order-independent, so the result is bit-identical on any engine and
  * any partitioning — float PageRank cannot be hash-compared across
  * engines because summation order perturbs the low bits. Truncation
  * leaks a bounded sliver of mass per iteration (standard for the
  * no-dangling-redistribution formulation); ranks remain a correct
  * relative ordering, which is all the curation signal needs.
  *
  * Scale shape: the loop is K joins/aggregations — contributions shuffle
  * on the edge's source (co-partitioned with the rank table), the sum
  * shuffles on target, both map-side combinable. Per-iteration
  * `localCheckpoint` truncates the iterative-join lineage and frees the
  * superseded rank table, same discipline as [[Vle]] and
  * [[graft.pipeline.Dedup.componentsStars]]. No driver-side state, no
  * adjacency lists — hub nodes cost one aggregation bucket, not a task.
  */
object PageRank {

  /** (node, rank_m) after `iterations` synchronous rounds, nodes = every
    * endpoint of `relationships` (source_id/target_id columns). */
  def ranks(relationships: DataFrame, iterations: Int = 3): DataFrame = {
    import graft.core.Blocks
    val hist = ranksHistory(relationships, iterations)
    hist.dropRight(1).foreach(Blocks.free)
    hist.last
  }

  /** Like [[ranks]] but returns EVERY iteration's rank table r¹..r^K
    * (each an eager localCheckpoint; the caller frees them) — the
    * maintained state an incremental refresh
    * ([[IncrementalAnalytics.refreshRanks]]) splices unaffected nodes
    * from. Same loop, same integer arithmetic: `ranksHistory(e, k).last`
    * is bit-identical to `ranks(e, k)`. */
  def ranksHistory(relationships: DataFrame, iterations: Int)
      : IndexedSeq[DataFrame] = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    import graft.core.Blocks
    val edges = relationships.select(col("source_id"), col("target_id"))
      .distinct()
    val nodes = edges.select(col("source_id").as("node"))
      .unionByName(edges.select(col("target_id").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    val outdeg = edges.groupBy(col("source_id"))
      .agg(count(lit(1)).as("outdeg"))
    // edge list annotated with its source's out-degree, materialized once:
    // every iteration re-reads it
    val e = edges.join(outdeg, Seq("source_id")).localCheckpoint(eager = true)
    val init = nodes.withColumn("rank_m", lit(1000000L))
      .localCheckpoint(eager = true)
    var ranks = init
    val hist = Vector.newBuilder[DataFrame]
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("source_id"), col("rank_m")),
          Seq("source_id"))
        .select(col("target_id").as("node"),
          expr("rank_m div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      val next = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(contrib, 0L)) div 100"))
            .as("rank_m"))
        .localCheckpoint(eager = true)
      hist += next
      ranks = next
    }
    Blocks.free(init)
    Blocks.free(e)
    Blocks.free(nodes)
    hist.result()
  }

  /** Weighted PageRank — rank flows in proportion to edge weight
    * (Xing & Ghorbani, "Weighted PageRank Algorithm", CNSR 2004): the
    * per-edge contribution is `(rank_m · w) div sw` with `sw` the
    * source's total out-weight, every other step identical to [[ranks]].
    * Weights are the [[Sssp.weightSql]] id-derived 1..8 integers so the
    * oracle rebuilds the exact weighted multigraph (parallel
    * relationships each carry their own weight); a caller with a real
    * weight column projects it as `w` on the input instead. Same integer
    * determinism and per-iteration checkpoint discipline as [[ranks]]. */
  def weightedRanks(relationships: DataFrame, iterations: Int = 3)
      : DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    import graft.core.Blocks
    val hasW = relationships.columns.contains("w")
    val edges = (if (hasW) relationships
        .select(col("source_id"), col("target_id"), col("w").cast("long").as("w"))
      else relationships.select(col("source_id"), col("target_id"),
        expr(Sssp.weightSql("relationship_id")).cast("long").as("w")))
      .distinct()
    val nodes = edges.select(col("source_id").as("node"))
      .unionByName(edges.select(col("target_id").as("node")))
      .distinct().localCheckpoint(eager = true)
    val outw = edges.groupBy(col("source_id")).agg(sum(col("w")).as("sw"))
    val e = edges.join(outw, Seq("source_id")).localCheckpoint(eager = true)
    var ranks = nodes.withColumn("rank_m", lit(1000000L))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("source_id"), col("rank_m")),
          Seq("source_id"))
        .select(col("target_id").as("node"),
          expr("(rank_m * w) div sw").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      val next = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(contrib, 0L)) div 100"))
            .as("rank_m"))
        .localCheckpoint(eager = true)
      Blocks.free(ranks)
      ranks = next
    }
    Blocks.free(e); Blocks.free(nodes)
    ranks
  }

  /** Personalized PageRank — teleports land on a SEED SET instead of
    * uniformly (Haveliwala, "Topic-Sensitive PageRank", WWW 2002; the
    * TrustRank corpus-curation pattern of Gyöngyi et al., VLDB 2004):
    * ranks measure proximity to trusted seeds, so spam farms that
    * self-endorse score near zero no matter their internal link mass.
    * Same integer micro-unit contract as [[ranks]] — total teleport mass
    * is the uniform formulation's `0.15·N·1e6` concentrated on the
    * seeds (`teleport = 150000·N div |S|` each), initial mass likewise,
    * so the two variants are directly comparable and the result stays
    * bit-identical on any engine.
    *
    * Scale shape: identical join/agg loop to [[ranks]] plus one bounded
    * driver scalar (the node count) and a seed-membership `isin` over a
    * small broadcast list — seeds are a curated handful by construction. */
  def personalizedRanks(relationships: DataFrame, sources: Seq[String],
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(sources.nonEmpty, "personalization needs at least one seed")
    import graft.core.Blocks
    val edges = relationships.select(col("source_id"), col("target_id"))
      .distinct()
    val nodes = edges.select(col("source_id").as("node"))
      .unionByName(edges.select(col("target_id").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count()
    val seedInit = 1000000L * n / sources.length
    val teleport = 150000L * n / sources.length
    val isSeed = col("node").isin(sources.map(lit): _*)
    val outdeg = edges.groupBy(col("source_id"))
      .agg(count(lit(1)).as("outdeg"))
    val e = edges.join(outdeg, Seq("source_id")).localCheckpoint(eager = true)
    var ranks = nodes
      .withColumn("rank_m", when(isSeed, seedInit).otherwise(0L))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("source_id"), col("rank_m")),
          Seq("source_id"))
        .select(col("target_id").as("node"),
          expr("rank_m div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      val next = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (when(isSeed, teleport).otherwise(0L) +
            expr("(85 * coalesce(contrib, 0L)) div 100")).as("rank_m"))
        .localCheckpoint(eager = true)
      Blocks.free(ranks)
      ranks = next
    }
    Blocks.free(e)
    Blocks.free(nodes)
    ranks
  }
}
