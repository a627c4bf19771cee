package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Unbounded variable-length path expansion (SURVEY §2 B7) — Cypher
  * `-[*]->` / `-[:name*1..]->`, which the reference passes through to AGE's
  * recursive VLE executor (Query.cs:122-129).
  *
  * Spark-first design: frontier-based BFS as iterative DataFrame joins.
  * Per-iteration `localCheckpoint` truncates the exploding lineage — the
  * classic iterative-algorithm failure mode on Spark — and persistence is
  * MEMORY_AND_DISK so a 100 TB frontier spills instead of OOMing. The loop
  * converges when the frontier empties (transitive closure) or at maxIter.
  */
object Vle {

  private def filtered(edges: DataFrame, relNames: Seq[String]): DataFrame = {
    val e0 =
      if (relNames.isEmpty) edges
      else if (relNames.size == 1)
        edges.filter(col("relationship_name") === relNames.head)
      else edges.filter(col("relationship_name").isin(relNames: _*))
    e0.select(col("source_id"), col("target_id")).distinct()
  }

  /** Transitive reachability (start_id, end_id, depth = minimal hops).
    * `maxIter` bounds pathological cycles; Int.MaxValue = run to fixpoint.
    * Minimal-depth pruning (the visited anti-join) is sound here because a
    * pair is "reachable" iff it is reachable at its minimal depth. */
  def reachability(edges: DataFrame, relNames: Seq[String] = Nil,
      maxIter: Int = 100, checkpointEvery: Int = 3): DataFrame = {
    val e = filtered(edges, relNames).persist(StorageLevel.MEMORY_AND_DISK)

    var visited = e.select(col("source_id").as("start_id"),
      col("target_id").as("end_id"), lit(1).as("depth"))
      .localCheckpoint(eager = true)
    var frontier = visited
    var depth = 1
    var done = false
    while (!done && depth < maxIter) {
      // localCheckpoint every iteration: lineage of an iterative join grows
      // multiplicatively and both planning time and driver memory blow up
      // without truncation.
      val next = frontier.join(e, col("end_id") === col("source_id"))
        .select(col("start_id"), col("target_id").as("end_id"),
          lit(depth + 1).as("depth"))
        .distinct()
        .join(visited.select(col("start_id").as("vs"), col("end_id").as("ve")),
          col("start_id") === col("vs") && col("end_id") === col("ve"), "left_anti")
        .localCheckpoint(eager = true)
      if (next.isEmpty) done = true
      else {
        val grown = visited.unionByName(next)
        visited =
          if (depth % checkpointEvery == 0) grown.localCheckpoint(eager = true)
          else grown.persist(StorageLevel.MEMORY_AND_DISK)
        frontier = next
        depth += 1
      }
    }
    visited
  }

  /** Bounded range form `-[*min..max]->` with Cypher/AGE *exists-a-trail*
    * semantics (openCypher relationship uniqueness: no edge traversed twice
    * in one path; nodes MAY repeat): a pair qualifies when SOME trail of
    * length d ∈ [min,max] connects it, even if a shorter out-of-range trail
    * also exists. `depth` is the minimal in-range trail length per pair.
    *
    * Two regimes:
    *  - min <= 1: every reachable pair's minimal depth is in range, and a
    *    shortest walk never repeats a vertex (hence never an edge), so
    *    exists-trail ≡ exists-walk and the linear minimal-depth BFS applies.
    *  - min > 1: a pair reached by a short out-of-range trail may or may not
    *    be reachable by a longer in-range one, and edge re-use must be
    *    excluded (moon1→earth→moon1→earth reuses the same edge — AGE rejects
    *    it). The frontier therefore carries the *set of traversed edge ids*,
    *    like AGE's own VLE executor enumerating paths. Rows are deduped on
    *    (start, end, sorted edge-set) — trails differing only in edge order
    *    are interchangeable for any future expansion — which keeps the
    *    enumeration bounded by edge-subsets rather than edge-sequences.
    *    Worst-case cost is inherent to trail semantics; iterations are
    *    bounded by `max` (typical queries use 2..6).
    */
  def range(edges: DataFrame, minDepth: Int, maxDepth: Int,
      relNames: Seq[String] = Nil): DataFrame = {
    require(maxDepth >= minDepth, s"VLE range $minDepth..$maxDepth is empty")
    if (minDepth <= 1)
      reachability(edges, relNames, maxIter = maxDepth)
        .filter(col("depth") <= maxDepth)
    else {
      val named =
        if (relNames.isEmpty) edges
        else edges.filter(col("relationship_name").isin(relNames: _*))
      // Relationship uniqueness is per edge *identity*: parallel edges are
      // distinct traversals. Use the real id when the graph has one; else a
      // (source, target, name) composite is the closest stable identity.
      val withId =
        if (named.columns.contains("relationship_id"))
          named.withColumn("__eid", col("relationship_id"))
        else if (named.columns.contains("relationship_name"))
          named.withColumn("__eid", concat_ws("\u0001",
            col("source_id"), col("target_id"), col("relationship_name")))
        else named.withColumn("__eid",
          concat_ws("\u0001", col("source_id"), col("target_id")))
      val e = withId.select(col("source_id"), col("target_id"), col("__eid"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)

      var frontier = e.select(col("source_id").as("start_id"),
        col("target_id").as("end_id"), array(col("__eid")).as("eset"))
        .localCheckpoint(eager = true)
      var result: DataFrame = null
      var depth = 1
      var emptied = frontier.isEmpty
      while (!emptied && depth < maxDepth) {
        val next = frontier.join(e, col("end_id") === col("source_id"))
          .filter(!array_contains(col("eset"), col("__eid")))
          .select(col("start_id"), col("target_id").as("end_id"),
            array_sort(concat(col("eset"), array(col("__eid")))).as("eset"))
          .distinct()
          .localCheckpoint(eager = true)
        depth += 1
        if (next.isEmpty) emptied = true
        else {
          frontier = next
          if (depth >= minDepth) {
            val pairs = frontier.select(col("start_id"), col("end_id"))
              .distinct().withColumn("depth", lit(depth))
            // anti-join so each pair keeps its first (minimal) in-range depth
            result =
              (if (result == null) pairs
               else result.unionByName(pairs.join(
                 result.select(col("start_id").as("rs"), col("end_id").as("re")),
                 col("start_id") === col("rs") && col("end_id") === col("re"),
                 "left_anti")))
                .localCheckpoint(eager = true)
          }
        }
      }
      if (result == null)
        e.select(col("source_id").as("start_id"),
          col("target_id").as("end_id"), lit(0).as("depth")).limit(0)
      else result
    }
  }
}
