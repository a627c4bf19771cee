package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Blocks

/** Deterministic DeepWalk-style random walks over the relationship graph
  * (Perozzi et al., "DeepWalk: Online Learning of Social Representations",
  * KDD 2014) — the standard way to turn a graph into a skip-gram training
  * corpus for node embeddings. The reference has no equivalent operator;
  * this belongs to the pipeline-extension surface (SURVEY §2.F), next to
  * [[PageRank]] and [[LinkPrediction]].
  *
  * The "random" draw is a reproducible hash: at step k, walk w standing on
  * node u moves to the neighbor at index `H4(w:k:u) mod degree(u)` in u's
  * dst-sorted adjacency list, where H4 is the integer value of the first
  * four hex nibbles of md5. That makes every walk bit-identical on any
  * engine (the DuckDB oracle replays the same arithmetic), while still
  * scattering walks uniformly enough to serve as an embedding corpus.
  *
  * Scale shape: each step is TWO equi-joins per live walk — one against
  * the degree table (keyed by node) and one against the indexed adjacency
  * (keyed by (node, idx)) — i.e. O(1) work per walk-step. The naive
  * formulation (join all neighbors, argmin a hash per walk) is O(degree)
  * per step and melts on hubs; the index-pick shape is what survives a
  * graph with 10^8-degree hubs. The adjacency index itself is built once
  * with one window (`row_number` per src); per-iteration
  * `localCheckpoint` truncates the iterative-join lineage and frees the
  * superseded frontier, same discipline as [[Vle]] and [[PageRank]].
  */
object RandomWalk {

  /** SQL text for the integer value of hex nibbles `1..n` of column
    * `hexCol` — deliberately restricted to functions DuckDB and Spark SQL
    * evaluate identically (`instr`, `substr`), so the oracle can inline
    * the exact same expression. */
  def nibbleValueSql(hexCol: String, n: Int = 4): String =
    (1 to n)
      .map(i => s"(instr('0123456789abcdef', substr($hexCol, $i, 1)) - 1)")
      .reduce((a, b) => s"(($a) * 16 + $b)")

  /** Undirected edge view (both directions of every relationship),
    * deduplicated: (src, dst). */
  def undirectedEdges(relationships: DataFrame): DataFrame = {
    val fwd = relationships
      .select(col("source_id").as("src"), col("target_id").as("dst"))
    fwd.unionByName(
        relationships.select(col("target_id").as("src"),
          col("source_id").as("dst")))
      .distinct()
  }

  /** `walksPerNode` walks of at most `length` steps from every node of
    * the (undirected) relationship graph. Output rows: (walk_id, step,
    * node) with step 0 = the start node; a walk that reaches a node with
    * no neighbors simply ends early. walk_id = start || '#' || rep. */
  def walks(relationships: DataFrame, length: Int,
            walksPerNode: Int = 1): DataFrame = {
    require(length >= 1, s"length must be >= 1, got $length")
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    val edges = undirectedEdges(relationships)
    // dst-sorted per-src index; dsts are distinct within a src, so the
    // ordering (hence the index) is total and engine-independent.
    // distinct column names per derived table — adj/deg/frontier all
    // descend from `edges`, and shared names would trip the ambiguous
    // self-join analyzer when the step joins chain them
    val adj = edges
      .withColumn("idx",
        row_number().over(Window.partitionBy(col("src")).orderBy(col("dst")))
          - lit(1))
      .select(col("src").as("a_src"), col("idx").as("a_idx"),
        col("dst").as("a_dst"))
      .localCheckpoint(eager = true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("d_src"), col("deg"))
      .localCheckpoint(eager = true)
    val nodes = edges.select(col("src").as("node")).distinct()
    var frontier = nodes
      .select(col("node"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("rep"))
      .select(concat(col("node"), lit("#"), col("rep")).as("walk_id"),
        col("node"))
      .localCheckpoint(eager = true)
    var out = frontier.select(col("walk_id"),
      lit(0).cast("long").as("step"), col("node"))
    for (k <- 1 to length) {
      val picked = frontier
        .join(deg, col("node") === col("d_src"))
        .withColumn("h", expr(s"md5(walk_id || ':$k:' || node)"))
        .withColumn("pick", expr(s"${nibbleValueSql("h")} % deg"))
      // NOT freed: every step's frontier is part of the result (the
      // checkpoint doubles as the output block), unlike PageRank where
      // the superseded table is dead. Total footprint = the walk corpus
      // itself, walks × (length+1) rows.
      frontier = picked
        .join(adj, col("node") === col("a_src") && col("pick") === col("a_idx"))
        .select(col("walk_id"), col("a_dst").as("node"))
        .localCheckpoint(eager = true)
      out = out.unionByName(frontier.select(col("walk_id"),
        lit(k).cast("long").as("step"), col("node")))
    }
    // every frontier is eagerly materialized, so the adjacency/degree
    // tables are dead once the loop ends
    Blocks.free(adj)
    Blocks.free(deg)
    out
  }

  /** Skip-gram training pairs from walk rows: every (center, context)
    * co-occurrence within `window` steps on the same walk, aggregated to
    * pair counts. One self-equi-join on walk_id (walks are short, so the
    * join groups are bounded by length+1 rows) + one combinable count. */
  def skipGramPairs(walkRows: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val a = walkRows.select(col("walk_id"), col("step").as("step_a"),
      col("node").as("center"))
    val b = walkRows.select(col("walk_id"), col("step").as("step_b"),
      col("node").as("context"))
    a.join(b, Seq("walk_id"))
      .filter(col("step_a") =!= col("step_b") &&
        abs(col("step_a") - col("step_b")) <= window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
  }
}
