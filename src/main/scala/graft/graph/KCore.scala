package graft.graph

import graft.core.Blocks.CompactCheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the cohesion signal that
  * separates densely embedded nodes from peripheral ones (Seidman,
  * "Network structure and minimum degree", 1983). In a curation pipeline
  * the k-core of a link/co-occurrence graph is the "established
  * community" filter: spam farms and drive-by pages fall out of low
  * cores while organically interlinked content survives. Sibling of
  * [[PageRank]] and [[Triangles]] on the pipeline-extension surface
  * (SURVEY §2.F).
  *
  * Peeling round = drop every node whose degree in the CURRENT subgraph
  * is below k; the k-core is the fixpoint. All set/count logic — exact
  * integers, bit-identical on any engine, so the fixed-round form is
  * oracle-checkable with unrolled SQL (the [[PageRank]] discipline).
  *
  * Scale shape: each round is two semi-joins (restrict the symmetric
  * edge list to surviving endpoints) and one map-side-combinable degree
  * count — all equi-joins on node keys. The symmetric edge list is
  * materialized once and re-read per round; survivor sets checkpoint per
  * round and free their predecessor (lineage stays flat across any
  * number of rounds). No adjacency lists, no driver state; peeling a
  * 100 TB graph is K passes of join+count.
  */
object KCore {

  private def symmetric(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
  }

  /** One peeling round as an UNMATERIALIZED plan: survivors of `nodes`
    * with ≥ k neighbors inside the `nodes`-restricted subgraph — two
    * semi-joins plus a combinable count. Exposed for plan-quality
    * assertions; the loops below materialize it per round. */
  private[graft] def peelRound(sym: DataFrame, nodes: DataFrame, k: Int)
      : DataFrame =
    sym.join(nodes.select(col("node").as("u")), Seq("u"), "left_semi")
      .join(nodes.select(col("node").as("v")), Seq("v"), "left_semi")
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).select(col("u").as("node"))

  /** The symmetric simple edge view, for [[peelRound]] callers. */
  private[graft] def symmetricView(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = symmetric(edges, srcCol, dstCol)

  /** Surviving nodes after `rounds` synchronous peeling rounds at
    * threshold `k` (every node starts alive; round r drops nodes with
    * fewer than k surviving neighbors). With enough rounds this IS the
    * k-core; the bounded form exists for oracle parity and for
    * incremental monitoring. */
  /** Survivors of a driver-side synchronous peel as a (node) frame —
    * the sub-cutoff bottom-out ([[LocalGraph]] doc): one serial pass
    * replaces O(cascade length) Spark jobs, with bit-identical output
    * (the survivor SET needs no ordering, only equality). */
  private def localPeel(sym: DataFrame, k: Int,
      rounds: Int): Option[DataFrame] = {
    val spark = sym.sparkSession
    LocalGraph.collectEdgesAny(sym, LocalGraph.maxEdges(spark)).map { es =>
      val dt = sym.schema.fields(0).dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", dt)))
      // coalesce(1): LocalRelations otherwise scan as one-row tasks
      // (see Scc.localDf)
      spark.createDataFrame(
        java.util.Arrays.asList(LocalGraph.kcoreSurvivors(es, k, rounds)
          .map(n => org.apache.spark.sql.Row(n)): _*), schema).coalesce(1)
    }
  }

  def peel(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.core.Blocks
    val sym = symmetric(edges, srcCol, dstCol).compactCheckpoint()
    localPeel(sym, k, rounds).foreach { out =>
      Blocks.free(sym)
      return out
    }
    var nodes = sym.select(col("u").as("node")).distinct()
      .compactCheckpoint()
    for (_ <- 1 to rounds) {
      val next = peelRound(sym, nodes, k).compactCheckpoint()
      Blocks.free(nodes)
      nodes = next
    }
    Blocks.free(sym)
    nodes
  }

  /** The exact k-core: peel until the survivor set stops shrinking.
    * Terminates in at most |V| rounds; each round costs one count-check
    * on a checkpointed survivor set (driver sees only the count). */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 1000): DataFrame = {
    import graft.core.Blocks
    val sym = symmetric(edges, srcCol, dstCol).compactCheckpoint()
    localPeel(sym, k, maxRounds).foreach { out =>
      Blocks.free(sym)
      return out
    }
    var nodes = sym.select(col("u").as("node")).distinct()
      .compactCheckpoint()
    var prev = nodes.count()
    var rounds = 0
    var converged = prev == 0L
    while (!converged && rounds < maxRounds) {
      val next = peelRound(sym, nodes, k).compactCheckpoint()
      val n = next.count()
      Blocks.free(nodes)
      nodes = next
      converged = n == prev
      prev = n
      rounds += 1
    }
    Blocks.free(sym)
    nodes
  }
}
