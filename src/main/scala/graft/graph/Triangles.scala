package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the local-clustering / community-density
  * signal for graph-shaped curation (SURVEY §2.F), sibling of
  * [[PageRank]]'s link-quality rank. On a co-occurrence graph (documents
  * sharing a source, parts sharing an order) the per-node triangle count
  * separates tight boilerplate cliques from organic link structure.
  *
  * Scale shape: the classic degree-ordered orientation (Suri &
  * Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
  * WWW'11). Each undirected edge is oriented from its lower-(degree, id)
  * endpoint to the higher one, so every out-neighborhood has size
  * O(sqrt(m)) on any graph — the wedge join that enumerates two-paths is
  * bounded O(m^1.5) TOTAL regardless of hub skew, where the naive
  * adjacency self-join explodes on the highest-degree vertex. Everything
  * is an equi-join on a node column: wedges meet closing edges through a
  * shuffle-hash/sort-merge join, never a cartesian, and the per-node
  * rollup is a map-side-combinable count.
  */
object Triangles {

  /** Canonical undirected simple edge list (`a < b`, self-loops dropped,
    * duplicates and reverse duplicates collapsed). */
  private def undirected(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()

  /** Every triangle, once: rows (x, y, z) where x→y→z is the
    * degree-orientation order. Building block for [[perNode]]/[[total]];
    * exposed for spec-level verification against hand-built graphs. */
  def enumerate(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // Orient each edge from the endpoint with the smaller (degree, id)
    // pair to the larger — a total order, so orientation is unambiguous
    // and every triangle has exactly one "apex" x with both out-edges.
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    // identical field names on both struct operands — struct comparison
    // and CASE branches require matching types, not just shapes
    val ao = struct(col("da").as("d"), col("a").as("i"))
    val bo = struct(col("db").as("d"), col("b").as("i"))
    val fwd = ao < bo
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, ao).otherwise(bo).as("uo"),
      when(fwd, col("b")).otherwise(col("a")).as("v"),
      when(fwd, bo).otherwise(ao).as("vo"))
    // Wedges from each apex: pairs of out-neighbors ordered by the same
    // (degree, id) order; the closing edge check is an equi-join against
    // the oriented edge list (u→v with vo order), never a scan.
    val wedges = oriented.select(col("u"), col("v").as("y"), col("vo").as("yo"))
      .join(oriented.select(col("u"), col("v").as("z"), col("vo").as("zo")),
        Seq("u"))
      .filter(col("yo") < col("zo"))
      .select(col("u").as("x"), col("y"), col("z"))
    wedges.join(oriented.select(col("u").as("y"), col("v").as("z")),
        Seq("y", "z"), "left_semi")
      .select(col("x"), col("y"), col("z"))
  }

  /** Per-node triangle membership count over the undirected simple graph
    * induced by `edges`; every node that appears in an edge gets a row,
    * triangle-free nodes report 0. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    val nodes = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node"))).distinct()
    val tri = enumerate(edges, srcCol, dstCol)
    val perCorner = tri.select(explode(array(col("x"), col("y"), col("z")))
        .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    nodes.join(perCorner, Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Total distinct triangles in the graph. */
  def total(edges: DataFrame, srcCol: String, dstCol: String): Long =
    enumerate(edges, srcCol, dstCol).count()

  /** Per-node local clustering coefficient (Watts & Strogatz 1998) in
    * micro-units: `lcc_m = (2·tri(v)·1e6) div (deg(v)·(deg(v)−1))` — the
    * closed share of the wedges centered at v, the standard
    * tight-clique-vs-organic-structure signal; deg < 2 reports 0 (no
    * wedge to close). Exact integers end to end: the triangle counts are
    * exact, the degree product is exact, and the single `div` matches
    * the oracle's `//`. One [[perNode]] pass + one degree aggregation +
    * one equi-join. */
  def localClustering(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    perNode(edges, srcCol, dstCol)
      .join(deg, Seq("node"))
      .select(col("node"), col("triangles"), col("deg"),
        when(col("deg") >= 2,
          expr("(2 * triangles * 1000000L) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("lcc_m"))
  }
}
