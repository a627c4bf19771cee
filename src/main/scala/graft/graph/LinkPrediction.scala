package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction: score unlinked node pairs by the
  * Jaccard similarity of their neighbor sets — the classic
  * common-neighbors signal (Liben-Nowell & Kleinberg, CIKM'03) used for
  * edge-suggestion and graph-densification passes over a twin graph
  * (reference relationship scans `AgeDigitalTwinsClient.Relationships`
  * are the input surface; the reference itself leaves scoring to the
  * caller).
  *
  * Scale shape: candidate pairs are enumerated ONLY through shared
  * neighbors (a wedge join — two equi-joins on the center node), never by
  * an all-pairs product. Per-center fanout is deg², so hubs are the skew
  * risk: `maxDegree` drops centers above the cap before the wedge join
  * (the df-cap discipline of [[graft.pipeline.Dedup.shingleJaccardPairs]]
  * — a node connected to everything predicts nothing anyway). All
  * arithmetic is integer (counts, fixed-point ratio), so results are
  * hash-stable across engines and partitionings.
  */
object LinkPrediction {

  /** Jaccard-of-neighborhoods for every node pair with ≥ `minCommon`
    * common neighbors. Output: (node_a, node_b, n_common, jaccard_4)
    * with node_a < node_b, jaccard_4 = ⌊10000·|N(a)∩N(b)| /
    * |N(a)∪N(b)| + 0.5⌋. Existing edges are NOT excluded — callers that
    * want only new-edge suggestions anti-join the input afterwards (kept
    * separate so the score table is reusable for both densification and
    * edge QA).
    */
  def jaccardNeighbors(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Long = 1L, maxDegree: Long = Long.MaxValue): DataFrame = {
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
    // undirected neighbor relation, deduplicated once up front: the wedge
    // join must not double-count a neighbor reachable by both directions
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // hub cap on the CENTER of the wedge only — a high-degree endpoint is
    // fine (its own wedges are enumerated from its low-degree neighbors)
    val capped = sym.join(
      deg.filter(col("deg") <= maxDegree).select(col("u")), Seq("u"))
    val common = capped.select(col("u").as("w"), col("v").as("a"))
      .join(capped.select(col("u").as("w"), col("v").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    common
      .join(deg.select(col("u").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a").as("node_a"), col("b").as("node_b"), col("n_common"),
        floor(col("n_common") * lit(10000L)
          / (col("da") + col("db") - col("n_common")) + lit(0.5))
          .cast("long").as("jaccard_4"))
  }
}
