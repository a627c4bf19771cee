package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Unbounded variable-length path expansion (SURVEY §2 B7) — Cypher
  * `-[*]->` / `-[:name*1..]->`, which the reference passes through to AGE's
  * recursive VLE executor (Query.cs:122-129).
  *
  * Spark-first design: frontier-based BFS as iterative DataFrame joins with
  * a visited-set anti-join (each pair reached once, at minimal depth).
  * Per-iteration `localCheckpoint` truncates the exploding lineage — the
  * classic iterative-algorithm failure mode on Spark — and persistence is
  * MEMORY_AND_DISK so a 100 TB frontier spills instead of OOMing. The loop
  * converges when the frontier empties (transitive closure) or at maxIter.
  */
object Vle {

  /** Transitive reachability (start_id, end_id, depth = minimal hops).
    * `maxIter` bounds pathological cycles; Int.MaxValue = run to fixpoint. */
  def reachability(edges: DataFrame, relName: Option[String] = None,
      maxIter: Int = 100, checkpointEvery: Int = 3): DataFrame = {
    val e = relName.fold(edges)(n =>
        edges.filter(col("relationship_name") === n))
      .select(col("source_id"), col("target_id"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

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

  /** Bounded range form `-[*min..max]->`. */
  def range(edges: DataFrame, minDepth: Int, maxDepth: Int,
      relName: Option[String] = None): DataFrame =
    reachability(edges, relName, maxIter = maxDepth)
      .filter(col("depth") >= minDepth && col("depth") <= maxDepth)
}
