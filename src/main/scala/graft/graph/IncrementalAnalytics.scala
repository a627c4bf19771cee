package graft.graph

import graft.core.Blocks.CompactCheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Blocks

/** Incremental maintenance of graph analytics over the store's CDC
  * surface (SURVEY §2.A9 mutation log → §2.F analytics): instead of
  * recomputing degrees / PageRank from the full edge set after every
  * mutation batch, fold the batch's relationship mutations into the
  * previously-computed result. The reference implies exactly this shape —
  * its replication consumer (AgeDigitalTwinsReplication.cs:194-573) feeds
  * a continuously-correct graph from the WAL; here the same log keeps
  * derived ANALYTICS continuously correct.
  *
  * Scale contract: every method's expensive work is proportional to the
  * MUTATION BATCH (and, for PageRank, the K-hop forward cone of the
  * touched nodes), never to the full edge set. The only full-width
  * operations are linear merges of the previous result table (broadcast
  * semi/anti joins + arithmetic — one scan, no shuffle of the big side
  * beyond its existing layout). On a 100 TB graph with a trickle of
  * mutations, a refresh touches the delta cone; the batch recompute it
  * replaces touches everything, every time.
  *
  * The COMMIT obeys the same contract (r19): maintainer state is
  * hash-bucketed and versioned behind per-version manifests
  * ([[StateStore]]), so each micro-batch WRITES only the buckets its
  * dirty cone touched and carries every clean bucket forward by
  * reference — the r18 SLO attributed ~99% of the per-batch floor to the
  * previous full state rewrite, a cost bounded by state size rather than
  * batch size. Reads assemble a table from the manifest (one pruned
  * parquet relation per owning version); retention sweeps versions and
  * bucket dirs nothing references, with a one-commit grace for in-flight
  * lazy readers.
  *
  * Equality contract: all arithmetic matches the batch operators
  * bit-for-bit (integer micro-units, same div/order-independent sums), so
  * `refresh* == full recompute` is exact hash equality, which is how the
  * oracle gates check it.
  */
object IncrementalAnalytics {

  private val RelKey = Seq("source_id", "relationship_id")

  /** Last-writer-wins fold of relationship mutation-log rows
    * (Tables.mutationsSchema: RelationshipCreate/Update/Delete with the
    * stamped rel doc in new_json/old_json) into one row per touched
    * relationship key: (source_id, relationship_id, target_id,
    * relationship_name, alive). Intermediate flip-flops (create→delete
    * within the window) collapse to their final state — one combinable
    * max_by aggregation over the batch, nothing else. */
  def latestRelMutations(mutations: DataFrame): DataFrame = {
    val doc = coalesce(col("new_json"), col("old_json"))
    mutations.filter(col("entity_kind") === "Relationship")
      .select(
        col("seq"),
        get_json_object(doc, "$['$sourceId']").as("source_id"),
        get_json_object(doc, "$['$relationshipId']").as("relationship_id"),
        get_json_object(doc, "$['$targetId']").as("target_id"),
        get_json_object(doc, "$['$relationshipName']").as("relationship_name"),
        (col("event_type") =!= "RelationshipDelete").as("alive"))
      .groupBy(col("source_id"), col("relationship_id"))
      .agg(max_by(
        struct(col("target_id"), col("relationship_name"), col("alive")),
        col("seq")).as("last"))
      .select(col("source_id"), col("relationship_id"),
        col("last.target_id").as("target_id"),
        col("last.relationship_name").as("relationship_name"),
        col("last.alive").as("alive"))
  }

  /** Same fold for twin lifecycle rows: (dt_id, alive). */
  def latestTwinMutations(mutations: DataFrame): DataFrame =
    mutations.filter(col("entity_kind") === "Twin")
      .groupBy(col("entity_id").as("dt_id"))
      .agg(max_by(col("event_type") =!= "TwinDelete", col("seq")).as("alive"))

  /** The maintained relationship table: base rows whose key was not
    * touched, plus the final state of every touched-and-alive key.
    * Normalized to the 4 analytic columns. */
  def applyRelationshipMutations(baseRels: DataFrame,
      mutations: DataFrame): DataFrame = {
    val latest = latestRelMutations(mutations)
    val cols4 = Seq("relationship_id", "source_id", "target_id",
      "relationship_name").map(col)
    baseRels.select(cols4: _*)
      .join(latest.select(RelKey.map(col): _*), RelKey, "left_anti")
      .unionByName(latest.filter(col("alive")).select(cols4: _*))
      .select(cols4: _*) // a using-columns join reorders; restore the shape
  }

  /** Incremental refresh of [[TwinGraph.degrees]]: per-node degree deltas
    * come from the base→final transition of TOUCHED relationship keys
    * only (−1 for each base row, +1 for each surviving final row), merged
    * into the previous degrees table with one linear pass. Twin
    * create/delete mutations grow/shrink the node universe. The base
    * relationship table is only semi-joined on the touched keys — at
    * rest, a partition-prunable point read, never a scan-wide aggregate. */
  def refreshDegrees(baseDegrees: DataFrame, baseRels: DataFrame,
      mutations: DataFrame): DataFrame = {
    val latest = latestRelMutations(mutations)
    val oldRows = baseRels
      .select(col("source_id"), col("relationship_id"), col("target_id"))
      .join(latest.select(RelKey.map(col): _*), RelKey, "left_semi")
    def contrib(rows: DataFrame, sign: Int): DataFrame =
      rows.select(explode(array(
        struct(col("source_id").as("dt_id"),
          lit(sign.toLong).as("d_out"), lit(0L).as("d_in")),
        struct(col("target_id").as("dt_id"),
          lit(0L).as("d_out"), lit(sign.toLong).as("d_in")))).as("c"))
        .select(col("c.dt_id"), col("c.d_out"), col("c.d_in"))
    val delta = contrib(oldRows, -1)
      .unionByName(contrib(latest.filter(col("alive")), +1))
      .groupBy(col("dt_id"))
      .agg(sum(col("d_out")).as("d_out"), sum(col("d_in")).as("d_in"))

    val twinDelta = latestTwinMutations(mutations)
    val universe = baseDegrees.select(col("dt_id"))
      .join(twinDelta.filter(!col("alive")).select(col("dt_id")),
        Seq("dt_id"), "left_anti")
      .unionByName(twinDelta.filter(col("alive")).select(col("dt_id"))
        .join(baseDegrees.select(col("dt_id")), Seq("dt_id"), "left_anti"))

    universe
      .join(baseDegrees, Seq("dt_id"), "left_outer")
      .join(delta, Seq("dt_id"), "left_outer")
      .select(col("dt_id"),
        (coalesce(col("out_degree"), lit(0L)) + coalesce(col("d_out"), lit(0L)))
          .as("out_degree"),
        (coalesce(col("in_degree"), lit(0L)) + coalesce(col("d_in"), lit(0L)))
          .as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  private def pairs(rels: DataFrame): DataFrame =
    rels.select(col("source_id"), col("target_id")).distinct()

  /** Seed closure over a directed (u, v) edge frame — the region-reach
    * primitive every splice maintainer uses. `e` must be materialized
    * (checkpointed) with string columns `u`, `v`; `seeds` carries one
    * string column `node`. Returns the visited set (incl. edge-free
    * seeds) as a checkpointed (node) frame the CALLER frees; never frees
    * its inputs.
    *
    * Sub-cutoff inputs ([[LocalGraph.maxEdges]]) resolve in one serial
    * BFS — the mutation cone a maintainer chases is batch-sized by
    * contract, so at any corpus scale this is the common case, and the
    * per-hop Spark-job tax (the r19 profile measured ~40 ms/job × 3
    * jobs × diameter) vanishes. Above the cutoff: frontier BFS, one
    * checkpoint + one count per hop, visited kept as a lazy union of the
    * per-hop checkpoints (no third per-hop materialization). */
  private[graft] def reachClosure(e: DataFrame, seeds: DataFrame,
      maxRounds: Int, what: String): DataFrame = {
    val spark = e.sparkSession
    val cutoff = LocalGraph.maxEdges(spark)
    // The cutoff gates the SEED frame too (r19 advice): the edge probe
    // alone would let a huge seed set over a tiny edge frame collect
    // unbounded rows to the driver. Seeds are collected through a
    // limit(cutoff+1) probe — over-cutoff falls back to the distributed
    // branch instead of relying on spark.driver.maxResultSize.
    val localSolve = LocalGraph.collectEdges(e, cutoff).flatMap { es =>
      val lim = if (cutoff >= Int.MaxValue - 1) Int.MaxValue
        else cutoff.toInt + 1
      val seedRows = seeds.select(col("node")).distinct()
        .limit(lim).collect()
      if (seedRows.length > cutoff) None
      else Some((es, seedRows.map(_.getString(0))))
    }
    localSolve match {
      case Some((es, seedArr)) =>
        import spark.implicits._
        LocalGraph.reachNodes(es, seedArr).toSeq.toDF("node")
          .compactCheckpoint()
      case None =>
        var parts = List(seeds.select(col("node")).distinct()
          .compactCheckpoint())
        var frontier = parts.head
        var alive = frontier.count()
        var round = 0
        while (alive > 0) {
          round += 1
          if (round > maxRounds)
            throw new IllegalStateException(
              s"$what reachability still expanding after $maxRounds " +
                "rounds — raise the round cap")
          val visited = parts.reduce(_ unionByName _)
          val nxt = e.join(frontier.withColumnRenamed("node", "u"),
              Seq("u"), "left_semi")
            .select(col("v").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .compactCheckpoint()
          alive = nxt.count()
          parts ::= nxt
          frontier = nxt
        }
        val out = parts.reduce(_ unionByName _).compactCheckpoint()
        parts.foreach(Blocks.free)
        out
    }
  }

  private def endpoints(p: DataFrame): DataFrame =
    p.select(col("source_id").as("node"))
      .unionByName(p.select(col("target_id").as("node"))).distinct()

  /** Affected-cone refresh of fixed-K integer PageRank
    * ([[PageRank.ranks]]): given the NEW relationship table, the set of
    * CHANGED pairs (added or dropped (source,target) edges — derivable
    * from a mutation batch via [[latestRelMutations]], so its size is
    * bounded by the batch, not the graph), and the per-iteration rank
    * history of the previous run ([[PageRank.ranksHistory]]), recompute
    * only the nodes whose rank can differ and splice everything else from
    * history.
    *
    * Affected-set propagation (exact over-approximation): a mutation at
    * pair (s→t) perturbs t's in-edge set and s's out-degree — so round 1
    * recomputes every endpoint of a changed pair plus every current
    * out-neighbor of a changed source; each later round adds the
    * out-neighbors of the previous affected set (a changed rank only
    * propagates along out-edges). Recomputing an unaffected node is
    * harmless (same formula, same inputs ⇒ same value), so
    * over-approximation never breaks the bit-equality contract.
    *
    * Per-round cost: contributions are computed ONLY for in-edges of
    * affected targets (edge table semi-joined on the affected set before
    * the rank join); the splice of untouched ranks is a linear
    * semi+anti+union pass over the previous round's table with the small
    * affected set broadcast. K rounds of cone-growth, never a full-graph
    * join-aggregate. */
  def refreshRanks(newRels: DataFrame, changedPairs: DataFrame,
      history: IndexedSeq[DataFrame]): DataFrame = {
    val hist = refreshRanksHistory(newRels, changedPairs, history)
    hist.dropRight(1).foreach(Blocks.free)
    hist.last
  }

  /** [[refreshRanks]] returning EVERY refreshed iteration (the new
    * per-iteration history) — what a continuously-maintained PageRank
    * needs to carry forward so the NEXT batch can splice against it. The
    * caller owns the returned checkpoints. */
  def refreshRanksHistory(newRels: DataFrame, changedPairs: DataFrame,
      history: IndexedSeq[DataFrame]): IndexedSeq[DataFrame] = {
    // needDirty=false: this entry point discards the dirty key sets, so
    // skip their per-iteration materialization jobs outright (r19)
    val (hist, _) = refreshRanksHistoryParts(newRels, changedPairs,
      history, needDirty = false)
    hist
  }

  /** [[refreshRanksHistory]] plus, per iteration, the key set whose rows
    * can differ from the previous history — iteration i's affected cone
    * plus the nodes the batch removed from the edge universe. A delta
    * commit rewrites only the state buckets those keys hash into. Caller
    * owns BOTH returned checkpoint sequences. */
  private[graft] def refreshRanksHistoryParts(newRels: DataFrame,
      changedPairs: DataFrame, history: IndexedSeq[DataFrame],
      needDirty: Boolean = true)
      : (IndexedSeq[DataFrame], IndexedSeq[DataFrame]) = {
    require(history.nonEmpty, "need the previous run's per-iteration ranks")
    val iterations = history.size
    val newPairs = pairs(newRels)
    val nodes = endpoints(newPairs).compactCheckpoint()
    val outdeg = newPairs.groupBy(col("source_id"))
      .agg(count(lit(1)).as("outdeg"))
    val e = newPairs.join(outdeg, Seq("source_id")).compactCheckpoint()

    def outNeighbors(a: DataFrame): DataFrame =
      e.join(a.select(col("node").as("source_id")), Seq("source_id"), "left_semi")
        .select(col("target_id").as("node")).distinct()

    val changed = changedPairs.select(col("source_id"), col("target_id"))
      .distinct().compactCheckpoint()
    // round-1 affected set: endpoints of changed pairs (covers added /
    // dropped edges and brand-new nodes) + out-neighbors of changed
    // sources (their out-degree shifted every surviving contribution);
    // intersected with the live universe so dropped nodes vanish
    var affected = changed.select(col("source_id").as("node"))
      .unionByName(changed.select(col("target_id").as("node")))
      .distinct()
      .join(nodes, Seq("node"), "left_semi")
      .unionByName(outNeighbors(
        changed.select(col("source_id").as("node")).distinct()))
      .distinct()
      .compactCheckpoint()

    // nodes the batch dropped from the edge universe: their history rows
    // vanish via the semi-join below, so their buckets are dirty too.
    // Only materialized when the caller keeps the dirty sets.
    val removed =
      if (!needDirty) null
      else changed
        .select(explode(array(col("source_id"), col("target_id"))).as("node"))
        .distinct()
        .join(nodes, Seq("node"), "left_anti")
        .compactCheckpoint()
    // r⁰ is the constant init — exact for every node, including new ones
    var blend = nodes.withColumn("rank_m", lit(1000000L))
      .compactCheckpoint()
    val outHist = IndexedSeq.newBuilder[DataFrame]
    val outDirty = IndexedSeq.newBuilder[DataFrame]
    for (i <- 1 to iterations) {
      val contribs = e
        .join(affected.select(col("node").as("target_id")),
          Seq("target_id"), "left_semi")
        .join(blend.select(col("node").as("source_id"), col("rank_m")),
          Seq("source_id"))
        .select(col("target_id").as("node"),
          expr("rank_m div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      val recomputed = affected.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(contrib, 0L)) div 100"))
            .as("rank_m"))
      val spliced = history(i - 1)
        .join(nodes, Seq("node"), "left_semi")   // drop removed nodes
        .join(affected, Seq("node"), "left_anti") // affected: recomputed
        .unionByName(recomputed)
        .compactCheckpoint()
      if (i == 1) Blocks.free(blend) // the r⁰ init; later blends ARE history
      blend = spliced
      outHist += spliced
      if (needDirty)
        outDirty += affected.unionByName(removed).distinct()
          .compactCheckpoint()
      if (i < iterations) {
        val grown = affected.unionByName(outNeighbors(affected)).distinct()
          .compactCheckpoint()
        Blocks.free(affected)
        affected = grown
      }
    }
    Blocks.free(affected); Blocks.free(e); Blocks.free(nodes)
    Blocks.free(changed)
    if (removed != null) Blocks.free(removed)
    (outHist.result(), outDirty.result())
  }

  /** Affected-component refresh of [[TwinGraph.components]] (weakly
    * connected components, label = lexicographic-min member): recompute
    * ONLY the components a mutation batch can change, splice every other
    * label through verbatim.
    *
    * Affected set (exact over-approximation, closed in one step): the
    * base components of every node touched by the batch — endpoints of
    * created/deleted/updated relationships and created/deleted twins. An
    * added edge can only merge the components of its own endpoints (both
    * touched ⇒ both comps affected); a dropped edge can only split its
    * own component; so the subgraph induced on affected-component members
    * (plus created twins) contains every node whose label can move, and
    * an untouched edge never crosses out of it (its endpoints share a
    * base component). Labels are canonical (min member), so recomputing
    * the subgraph with the same star-contraction operator reproduces
    * exactly what a full batch recompute would assign — bit-equal splice.
    *
    * Cost: ∝ the touched components' sizes + one linear anti-join pass
    * over the base label table, never a full-graph contraction.
    *
    * Log-consistency contract: a deleted twin's relationships must carry
    * their own delete rows in the batch (the store's DETACH discipline —
    * reference JobService delete jobs sweep relationships first); a
    * dangling edge would otherwise keep the dead id as a component
    * member on the batch side too. */
  def refreshComponents(baseComponents: DataFrame, baseRels: DataFrame,
      mutations: DataFrame): DataFrame = {
    val p = componentsParts(baseComponents, baseRels, mutations)
    baseComponents
      .join(p.affected, Seq("component"), "left_anti")
      .select(col("dt_id"), col("component"))
      .unionByName(p.recomputed)
  }

  /** The two splice ingredients of [[refreshComponents]] — the affected
    * COMPONENT ids and the recomputed labels for their members — exposed
    * so a delta commit can rewrite only the state buckets those members
    * hash into instead of the full label table. */
  private[graft] case class ComponentsParts(affected: DataFrame,
      recomputed: DataFrame)

  private[graft] def componentsParts(baseComponents: DataFrame,
      baseRels: DataFrame, mutations: DataFrame): ComponentsParts = {
    val latest = latestRelMutations(mutations).compactCheckpoint()
    val twinDelta = latestTwinMutations(mutations).compactCheckpoint()
    val oldTouched = baseRels
      .select(col("source_id"), col("relationship_id"), col("target_id"))
      .join(latest.select(RelKey.map(col): _*), RelKey, "left_semi")
      .select(col("source_id"), col("target_id"))
    val newTouched = latest.filter(col("alive"))
      .select(col("source_id"), col("target_id"))
    val touchedNodes = oldTouched.unionByName(newTouched)
      .select(explode(array(col("source_id"), col("target_id"))).as("dt_id"))
      .unionByName(twinDelta.select(col("dt_id")))
      .distinct()
    val affected = baseComponents
      .join(touchedNodes, Seq("dt_id"), "left_semi")
      .select(col("component")).distinct()
      .compactCheckpoint()
    val deadTwins = twinDelta.filter(!col("alive")).select(col("dt_id"))
    val subNodes = baseComponents
      .join(affected, Seq("component"), "left_semi").select(col("dt_id"))
      .unionByName(twinDelta.filter(col("alive")).select(col("dt_id")))
      .unionByName(newTouched.select(
        explode(array(col("source_id"), col("target_id"))).as("dt_id")))
      .distinct()
      .join(deadTwins, Seq("dt_id"), "left_anti")
      .compactCheckpoint()
    // maintained edges with source inside the subgraph — for untouched
    // edges "source in" implies "both in" (same base component), for
    // touched edges both endpoints were added explicitly
    val subPairs = applyRelationshipMutations(baseRels, mutations)
      .join(subNodes.withColumnRenamed("dt_id", "source_id"),
        Seq("source_id"), "left_semi")
      .select(col("source_id").as("doc_a"), col("target_id").as("doc_b"))
    val recomputed = subNodes
      .join(graft.pipeline.Dedup.components(subPairs)
        .withColumnRenamed("doc", "dt_id"), Seq("dt_id"), "left_outer")
      .select(col("dt_id"),
        coalesce(col("component"), col("dt_id")).as("component"))
    Blocks.free(latest); Blocks.free(twinDelta)
    ComponentsParts(affected, recomputed)
  }

  // ---------------- streaming maintenance (§2.A9 composition) ----------------

  private val RelsCols =
    Seq("relationship_id", "source_id", "target_id", "relationship_name")

  /** Initialize a maintainer state: every table lands fully at v0,
    * hash-bucketed by its first key column ([[StateStore]]), with the
    * manifest, schema + key sidecars, bucket count, and the v0 pointer. */
  private def initState(stateDir: String, buckets: Int,
      tables: Seq[(String, DataFrame, Seq[String])]): Unit = {
    StateStore.writeBucketCount(stateDir, buckets)
    StateStore.clearVersion(stateDir, 0L)
    val man = tables.map { case (t, df, keys) =>
      t -> StateStore.writeFull(df, col(keys.head), buckets, stateDir, 0L, t)
    }.toMap
    StateStore.writeManifest(stateDir, 0L, man)
    StateStore.writeSchemas(stateDir,
      tables.map { case (t, df, _) => t -> df.schema.toDDL }.toMap)
    StateStore.writeKeys(stateDir,
      tables.map { case (t, _, keys) => t -> keys }.toMap)
    StateStore.writePointer(stateDir, 0L)
  }

  /** Initialize the at-rest maintenance state: version 0 holds the base
    * relationship table (4 analytic columns) and its degrees.
    * @param buckets state hash-bucket count, fixed for the state's life.
    *   The default keeps fixture overheads tiny; size it on a real
    *   deployment so ONE bucket's rewrite is a comfortable task fan-out. */
  def initDegreesState(stateDir: String, baseDegrees: DataFrame,
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets, Seq(
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")),
      ("degrees", baseDegrees, Seq("dt_id"))))

  /** One maintainer micro-batch commit over the delta-encoded state
    * ([[StateStore]]): read tables (chain-folded) as of the committed
    * version, append per-table merge-on-read deltas (upserts +
    * tombstones, O(dirty rows) — never a function of state size) or
    * carry-forwards at `target`, then commit = manifest + small-file
    * compaction + atomic pointer move + manifest-aware retention. When a
    * table's chain reaches `spark.graft.state.maxchain` (default 8), the
    * commit folds it back into the hash-bucketed base, rewriting only
    * the buckets the chain's keys touch. Construction clears any torn
    * `v{target}` a crashed prior attempt left (the pointer never moved,
    * so it is garbage and the recompute is deterministic). */
  private final class StateCommit(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, target: Long) {
    val v: Long = StateStore.readPointer(stateDir)
    val k: Int = StateStore.bucketCount(stateDir)
    // free the PREVIOUS batch's folded blocks now, not at its commit: a
    // short-circuiting action (isEmpty under AQE) can leave a detached
    // broadcast sub-job still materializing when the batch's work is
    // done, and an unpersist racing that thread logs a scary (harmless —
    // nothing awaits the zombie) CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND abort.
    // By the next StateCommit on this state dir every execution of the
    // previous batch is long gone. One batch's blocks linger per stream;
    // the session close reaps the last.
    StateCommit.pendingFree.synchronized {
      StateCommit.pendingFree.remove(stateDir)
    }.foreach(_.foreach(graft.core.Blocks.free))
    private val prev = StateStore.readManifest(stateDir, v)
    private val next =
      scala.collection.mutable.Map[String, StateStore.TableState]()
    // Default 8: the chain fold on reads is cheap (deltas are cone-sized)
    // while every compaction pays a rewrite of all chain-touched buckets,
    // so a longer chain amortizes the spike better. Measured at sf1
    // (SCALING.md r19): maxchain 4 put an all-bucket rewrite in every 4th
    // batch of a 200-scattered-key feed; 8 halves that share.
    private val maxChain =
      spark.conf.get("spark.graft.state.maxchain", "8").toInt
    StateStore.clearVersion(stateDir, target)
    // Memoized EAGER materialization of chain-folded reads: the splice
    // recompute touches each state table in many downstream actions, and
    // a lazy fold (delta union + max_by + anti-join) would re-run per
    // action — the first sf1 SLO of the merge-on-read design measured
    // that re-fold tax at several seconds per batch. One localCheckpoint
    // per table per batch pays the fold once; commit() parks the blocks
    // for the NEXT batch's StateCommit to free (constructor note).
    private val folded = scala.collection.mutable.Map[String, DataFrame]()
    def table(name: String): DataFrame =
      folded.getOrElseUpdate(name,
        StateStore.readTable(spark, stateDir, v, name)
          .compactCheckpoint())
    def tableBuckets(name: String, buckets: Seq[Int]): DataFrame =
      StateStore.readTableBuckets(spark, stateDir, v, name, buckets)
    def dirty(keys: DataFrame, keyCol: String): Seq[Int] =
      StateStore.dirtyBuckets(keys, col(keyCol), k)
    /** Append `upserts` + `tombstoneKeys` as this table's delta (zero
      * delta rows → pure carry, decided from the written footers, not
      * from two extra isEmpty jobs); fold the chain into buckets when it
      * reaches maxChain OR when this delta alone is a large fraction of
      * the base (`spark.graft.state.compactfrac`, default 0.3): a
      * state-sized cone (the WCC hub shape) gains nothing from chaining
      * — it would pay the old full-rewrite cost AND make every read fold
      * chain rows comparable to the state. Point cones stay pure-delta. */
    def chainDelta(name: String, upserts: DataFrame,
        tombstoneKeys: DataFrame): Unit = {
      val keys = StateStore.tableKeys(stateDir, name)
      StateStore.writeChainDelta(spark, stateDir, target,
        name, upserts, tombstoneKeys, keys, prev(name)) match {
        case None => carry(name)
        case Some((appended, deltaRows)) =>
          val frac = spark.conf
            .get("spark.graft.state.compactfrac", "0.3").toDouble
          next(name) =
            if (appended.chain.size >= maxChain ||
                deltaRows >= frac * math.max(
                  StateStore.baseRowCount(spark, stateDir, v, name), 1L))
              StateStore.compactIntoBuckets(spark, stateDir, v, target,
                name, k, appended)
            else appended
      }
    }
    def carry(name: String): Unit = next(name) = prev(name)
    def commit(): Unit = {
      require(next.keySet == prev.keySet,
        s"state commit must delta or carry every table: " +
          s"got ${next.keySet}, state has ${prev.keySet}")
      StateStore.writeManifest(stateDir, target, next.toMap)
      compactVersion(spark, s"$stateDir/v$target")
      StateStore.writePointer(stateDir, target)
      StateStore.prune(stateDir, target)
      StateCommit.pendingFree.synchronized {
        StateCommit.pendingFree(stateDir) = folded.values.toSeq
      }
      folded.clear()
    }
  }

  private object StateCommit {
    /** Folded-table blocks parked at commit, freed by the NEXT commit on
      * the same state dir (see the constructor note on zombie AQE
      * sub-jobs). Keyed by state dir: concurrent maintainers on different
      * states must not reap each other's in-flight blocks. */
    private val pendingFree =
      scala.collection.mutable.Map[String, Seq[DataFrame]]()
  }

  /** Fold the batch into the carried relationship table: upserts = the
    * touched keys' surviving rows, tombstones = the deleted keys —
    * exactly the mutation cone, no state-sized work at all. */
  private def relsDelta(c: StateCommit, latest: DataFrame): Unit =
    c.chainDelta("rels",
      latest.filter(col("alive")).select(RelsCols.map(col): _*),
      latest.filter(!col("alive"))
        .select(col("source_id"), col("relationship_id")))

  /** Small-file hygiene for a freshly-written state version (every
    * maintainer commit calls this before the pointer move): each
    * parquet leaf under the version dir — incl. partitioned history
    * subdirs like `hist/i=N` — gets coalesced to ceil(bytes/target)
    * files when it fragmented past `maxSmallFiles`. At 100 TB cadence
    * the FILE COUNT, not the byte count, is what kills a long-running
    * maintainer (every downstream open lists the directory; metadata
    * stores charge per object), and a refresh output's partition count
    * reflects its join topology, not its size — a 2 KB degrees table can
    * land as 32 half-empty files. Crash-safe: the pointer has not moved
    * yet, so a crash anywhere in the rewrite/swap is repaired by the
    * idempotent batch replay (recompute + overwrite of the whole
    * uncommitted version). */
  private[graft] def compactVersion(
      spark: org.apache.spark.sql.SparkSession, versionDir: String,
      targetBytes: Long = 128L << 20, maxSmallFiles: Int = 4): Unit = {
    def leafTables(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
      if (kids.exists(k => k.isFile && k.getName.startsWith("part-"))) Seq(f)
      else kids.filter(_.isDirectory).flatMap(leafTables)
    }
    leafTables(new java.io.File(versionDir)).foreach { t =>
      val parts = t.listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-"))
      if (parts.length > maxSmallFiles) {
        val want = math.max(1,
          math.ceil(parts.map(_.length).sum.toDouble / targetBytes).toInt)
        if (want < parts.length) {
          val tmp = new java.io.File(t.getParentFile, t.getName + ".compact")
          spark.read.parquet(t.getPath).coalesce(want)
            .write.mode("overwrite").parquet(tmp.getPath)
          val walk = java.nio.file.Files.walk(t.toPath)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally walk.close()
          if (!tmp.renameTo(t))
            throw new IllegalStateException(s"compaction swap failed for $t")
        }
      }
    }
  }

  /** The maintained degrees table as of the last committed batch. */
  def currentDegrees(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
      "degrees")

  /** Continuously-maintained degrees over the mutation-log STREAM (A9):
    * `foreachBatch` folds each micro-batch of CDC rows into the at-rest
    * state — refreshDegrees for the analytics, applyRelationshipMutations
    * for the carried relationship table — written as version v(batch+1)
    * and committed by an atomic pointer move. Crash contract: a batch
    * replayed after a crash either finds the pointer still at its
    * predecessor (recompute, same deterministic output, overwrite) or
    * already advanced (skip — the fold is NOT applied twice). Restart
    * resumes from the streaming checkpoint; state versions are keyed by
    * batch id, so resume and replay compose. */
  def maintainDegreesStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          // every touched key's rows live in its source bucket, so the
          // bucket-pruned probe is the complete old-row set
          val relsProbe = c.tableBuckets("rels",
            c.dirty(latest.select(col("source_id")), "source_id"))
          val twinDelta = latestTwinMutations(m)
          val oldRows = relsProbe
            .select(col("source_id"), col("relationship_id"),
              col("target_id"))
            .join(latest.select(RelKey.map(col): _*), RelKey, "left_semi")
          def ends(df: DataFrame): DataFrame = df.select(
            explode(array(col("source_id"), col("target_id"))).as("dt_id"))
          val dirtyNodes = ends(oldRows)
            .unionByName(ends(latest.filter(col("alive"))))
            .unionByName(twinDelta.select(col("dt_id")))
            .distinct().compactCheckpoint()
          // per-node locality: refreshDegrees over the base RESTRICTED to
          // the dirty keys yields exactly their new rows (the upserts);
          // dirty keys it drops (dead twins) are the tombstones
          val up = refreshDegrees(
            c.table("degrees").join(dirtyNodes, Seq("dt_id"), "left_semi"),
            relsProbe, m).compactCheckpoint()
          val tomb = dirtyNodes
            .join(up.select(col("dt_id")), Seq("dt_id"), "left_anti")
          c.chainDelta("degrees", up, tomb)
          relsDelta(c, latest)
          graft.core.Blocks.free(m); graft.core.Blocks.free(latest)
          graft.core.Blocks.free(dirtyNodes); graft.core.Blocks.free(up)
          c.commit()
        }
      }
      .start()
  }

  /** Affected-cone refresh of [[Triangles.perNode]]: a mutation batch can
    * change the triangle count ONLY of (a) endpoints of changed pairs and
    * (b) their base-or-final neighbors — every created or destroyed
    * triangle contains a changed pair, and each of its corners is either
    * an endpoint of that pair or adjacent to both endpoints. That closes
    * the affected set in one step. Counts for affected nodes are
    * recomputed exactly by running the batch operator on the 2-hop cone
    * (all triangles of an affected node live inside its closed
    * neighborhood, so cone edges suffice); every other node's count
    * splices through verbatim. Cost ∝ the changed pairs' neighborhood
    * volume, never the graph.
    *
    * Same DETACH log-consistency contract as [[refreshComponents]]: a
    * deleted twin's relationships carry their own delete rows, so the
    * dead node leaves the endpoint universe on both the incremental and
    * batch sides. */
  def refreshTriangles(baseTriangles: DataFrame, baseRels: DataFrame,
      mutations: DataFrame): DataFrame = {
    val p = trianglesParts(baseRels, mutations)
    baseTriangles
      .join(p.affected, Seq("node"), "left_anti")
      .select(col("node"), col("triangles"))
      .unionByName(p.recomputed)
  }

  /** A node-keyed splice: `affected` keys drop out of the base table and
    * `recomputed` rows (keys ⊆ affected) replace them. Shared shape of the
    * triangle / k-core maintainers' delta commits. */
  private[graft] case class NodeSpliceParts(affected: DataFrame,
      recomputed: DataFrame)

  private[graft] def trianglesParts(baseRels: DataFrame,
      mutations: DataFrame): NodeSpliceParts = {
    def sym(rels: DataFrame): DataFrame =
      rels.select(col("source_id").as("u"), col("target_id").as("v"))
        .unionByName(rels.select(col("target_id").as("u"),
          col("source_id").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    val newRels = applyRelationshipMutations(baseRels, mutations)
      .compactCheckpoint()
    val changed = changedPairs(baseRels, mutations)
      .compactCheckpoint()
    val basePairs = sym(baseRels)
    val newPairs = sym(newRels).compactCheckpoint()
    val ends = changed
      .select(explode(array(col("source_id"), col("target_id"))).as("node"))
      .distinct()
    def neighborsOf(pairs: DataFrame, of: DataFrame): DataFrame =
      pairs.join(of.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .select(col("v").as("node"))
    val affected = ends
      .unionByName(neighborsOf(basePairs, ends))
      .unionByName(neighborsOf(newPairs, ends))
      .distinct().compactCheckpoint()
    val cone = affected
      .unionByName(neighborsOf(newPairs, affected))
      .distinct().compactCheckpoint()
    val coneEdges = newPairs
      .join(cone.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
      .join(cone.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      .select(col("u"), col("v"))
    val recomputed = Triangles.perNode(coneEdges, "u", "v")
      .join(affected, Seq("node"), "left_semi")
    Blocks.free(changed); Blocks.free(newRels)
    NodeSpliceParts(affected, recomputed)
  }

  /** Initialize the components maintenance state: version 0 holds the
    * base relationship table and its WCC labels. */
  def initComponentsState(stateDir: String, baseComponents: DataFrame,
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets, Seq(
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")),
      ("components", baseComponents, Seq("dt_id"))))

  /** The maintained component labeling as of the last committed batch. */
  def currentComponents(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
      "components")

  /** Continuously-maintained WCC labels over the mutation-log STREAM —
    * the [[maintainDegreesStream]] machinery with [[refreshComponents]]
    * as the fold: each micro-batch recomputes only its affected
    * components against the carried state, commits v(batch+1) via the
    * same atomic pointer move, and replays idempotently after a crash
    * (pointer behind → deterministic recompute; ahead → skip). */
  def maintainComponentsStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String,
      readOptions: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .options(readOptions)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val baseRels = c.table("rels")
          val baseComp = c.table("components")
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          val p = componentsParts(baseComp, baseRels, m)
          // upserts = the recomputed labels (they cover every surviving
          // member of an affected component plus every new node);
          // tombstones = affected-component members with no recomputed
          // row — the batch's dead twins
          val recomputed = p.recomputed.compactCheckpoint()
          val tomb = baseComp
            .join(p.affected, Seq("component"), "left_semi")
            .select(col("dt_id"))
            .join(recomputed.select(col("dt_id")), Seq("dt_id"),
              "left_anti")
          c.chainDelta("components", recomputed, tomb)
          relsDelta(c, latest)
          graft.core.Blocks.free(m); graft.core.Blocks.free(recomputed)
          graft.core.Blocks.free(latest)
          c.commit()
        }
      }
      .start()
  }

  /** Initialize the PageRank maintenance state: version 0 holds the base
    * relationship table and the per-iteration rank history of the last
    * full run ([[PageRank.ranksHistory]]). */
  def initRanksState(stateDir: String, history: IndexedSeq[DataFrame],
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets,
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")) +:
        history.zipWithIndex.map { case (h, i) =>
          (s"hist/i=$i", h, Seq("node"))
        })

  /** The maintained final ranks as of the last committed batch. */
  def currentRanks(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, iterations: Int): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
      s"hist/i=${iterations - 1}")

  /** Continuously-maintained fixed-K PageRank over the mutation-log
    * STREAM — the affected-cone refresh ([[refreshRanksHistory]]) as the
    * per-batch fold, carrying the full per-iteration history forward so
    * every batch splices against its predecessor exactly the way the
    * batch operator would recompute. Same versioned-state + atomic
    * pointer machinery as [[maintainDegreesStream]]; crash replay is
    * idempotent. */
  def maintainRanksStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String,
      iterations: Int, readOptions: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .options(readOptions)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val baseRels = c.table("rels")
          val hist = (0 until iterations).map(i => c.table(s"hist/i=$i"))
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          val newRels = applyRelationshipMutations(baseRels, m)
            .compactCheckpoint()
          // the changed-pair probe only touches rows of touched keys, all
          // of which live in the dirty source buckets — pruned probe
          val changed = changedPairs(c.tableBuckets("rels",
            c.dirty(latest.select(col("source_id")), "source_id")), m)
          val (newHist, dirtyKeys) =
            refreshRanksHistoryParts(newRels, changed, hist)
          newHist.zipWithIndex.foreach { case (h, i) =>
            // h is checkpointed in memory: the key-restricted upsert scan
            // reads the cache; the parquet WRITE is cone-sized
            val up = h.join(dirtyKeys(i), Seq("node"), "left_semi")
            val tomb = dirtyKeys(i)
              .join(h.select(col("node")), Seq("node"), "left_anti")
            c.chainDelta(s"hist/i=$i", up, tomb)
          }
          relsDelta(c, latest)
          newHist.foreach(graft.core.Blocks.free)
          dirtyKeys.foreach(graft.core.Blocks.free)
          graft.core.Blocks.free(newRels); graft.core.Blocks.free(m)
          graft.core.Blocks.free(latest)
          c.commit()
        }
      }
      .start()
  }

  /** Affected-cone refresh of [[LabelPropagation.communities]]: round-1
    * perturbation reaches only changed-pair endpoints (the r⁰ labels are
    * pure node-id functions, exact for every node including new ones);
    * each later round grows the affected set one undirected hop, exactly
    * the [[refreshRanks]] cone discipline. Affected nodes re-vote over
    * the blended previous round (history splice + recomputed), so the
    * result is bit-identical to a full batch rerun of the same
    * deterministic argmax. */
  def refreshCommunities(newRels: DataFrame, changedPairs: DataFrame,
      history: IndexedSeq[DataFrame]): DataFrame = {
    val hist = refreshCommunitiesHistory(newRels, changedPairs, history)
    val out = hist.last.select(col("node"), col("lab").as("community"))
      .compactCheckpoint()
    hist.foreach(Blocks.free)
    out
  }

  /** [[refreshCommunities]] returning EVERY refreshed round's (node, lab)
    * table — the new history a continuously-maintained LPA carries
    * forward. Caller owns the returned checkpoints. */
  def refreshCommunitiesHistory(newRels: DataFrame, changedPairs: DataFrame,
      history: IndexedSeq[DataFrame]): IndexedSeq[DataFrame] = {
    // needDirty=false: the dirty key sets would be freed unread — skip
    // their per-round materialization jobs (r19)
    val (hist, _) = refreshCommunitiesHistoryParts(newRels, changedPairs,
      history, needDirty = false)
    hist
  }

  /** [[refreshCommunitiesHistory]] plus per-round dirty key sets, the
    * [[refreshRanksHistoryParts]] contract at label granularity. Caller
    * owns both returned checkpoint sequences. */
  private[graft] def refreshCommunitiesHistoryParts(newRels: DataFrame,
      changedPairs: DataFrame, history: IndexedSeq[DataFrame],
      needDirty: Boolean = true)
      : (IndexedSeq[DataFrame], IndexedSeq[DataFrame]) = {
    require(history.nonEmpty, "need the previous run's per-round labels")
    val rounds = history.size
    val fwd = newRels.select(col("source_id").as("node"),
      col("target_id").as("nbr"))
    val edges = fwd
      .unionByName(fwd.select(col("nbr").as("node"), col("node").as("nbr")))
      .distinct().compactCheckpoint()
    val nodes = edges.select(col("node")).distinct()
      .compactCheckpoint()
    def nbrsOf(a: DataFrame): DataFrame =
      edges.join(a.select(col("node").as("nbr")), Seq("nbr"), "left_semi")
        .select(col("node")).distinct()
    val changed = changedPairs.select(col("source_id"), col("target_id"))
      .distinct().compactCheckpoint()
    var affected = changed
      .select(explode(array(col("source_id"), col("target_id"))).as("node"))
      .distinct()
      .join(nodes, Seq("node"), "left_semi")
      .compactCheckpoint()
    // nodes the batch dropped from the edge universe (dirty: their rows
    // vanish from every round via the semi-join); materialized only when
    // the caller keeps the dirty sets
    val removed =
      if (!needDirty) null
      else changed
        .select(explode(array(col("source_id"), col("target_id"))).as("node"))
        .distinct()
        .join(nodes, Seq("node"), "left_anti")
        .compactCheckpoint()
    var blend = nodes
      .select(col("node"),
        graft.pipeline.TextAnalysis.stableId(col("node")).as("lab"))
      .compactCheckpoint()
    val outHist = IndexedSeq.newBuilder[DataFrame]
    val outDirty = IndexedSeq.newBuilder[DataFrame]
    for (i <- 1 to rounds) {
      val votes = edges
        .join(affected, Seq("node"), "left_semi")
        .join(blend.select(col("node").as("nbr"), col("lab")), Seq("nbr"))
        .groupBy(col("node"), col("lab")).agg(count(lit(1)).as("c"))
      val recomputed = votes.groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("lab"))).as("m"))
        .select(col("node"), col("m.lab").as("lab"))
      val spliced = history(i - 1)
        .join(nodes, Seq("node"), "left_semi")
        .join(affected, Seq("node"), "left_anti")
        .unionByName(recomputed)
        .compactCheckpoint()
      if (i == 1) Blocks.free(blend) // the r⁰ init; later blends ARE history
      blend = spliced
      outHist += spliced
      if (needDirty)
        outDirty += affected.unionByName(removed).distinct()
          .compactCheckpoint()
      if (i < rounds) {
        val grown = affected.unionByName(nbrsOf(affected)).distinct()
          .compactCheckpoint()
        Blocks.free(affected)
        affected = grown
      }
    }
    Blocks.free(affected)
    Blocks.free(edges); Blocks.free(nodes); Blocks.free(changed)
    if (removed != null) Blocks.free(removed)
    (outHist.result(), outDirty.result())
  }

  /** Initialize the triangle maintenance state: version 0 holds the base
    * relationship table and its per-node triangle counts. */
  def initTrianglesState(stateDir: String, baseTriangles: DataFrame,
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets, Seq(
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")),
      ("triangles", baseTriangles, Seq("node"))))

  /** The maintained triangle counts as of the last committed batch. */
  def currentTriangles(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
      "triangles")

  /** Continuously-maintained per-node triangle counts over the
    * mutation-log STREAM — [[refreshTriangles]] as the per-batch fold on
    * the shared versioned-state + atomic-pointer machinery; crash replay
    * is idempotent like the other maintainers. */
  def maintainTrianglesStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val baseRels = c.table("rels")
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          val p = trianglesParts(baseRels, m)
          // upserts = recomputed counts (they cover every affected node
          // still in the edge universe); tombstones = affected nodes the
          // cone recompute no longer sees (left the universe)
          val rec = p.recomputed.compactCheckpoint()
          val tomb = p.affected
            .join(rec.select(col("node")), Seq("node"), "left_anti")
          c.chainDelta("triangles", rec, tomb)
          relsDelta(c, latest)
          graft.core.Blocks.free(m); graft.core.Blocks.free(rec)
          graft.core.Blocks.free(latest)
          c.commit()
        }
      }
      .start()
  }

  /** Initialize the LPA maintenance state: version 0 holds the base
    * relationship table and the per-round label history. */
  def initCommunitiesState(stateDir: String, history: IndexedSeq[DataFrame],
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets,
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")) +:
        history.zipWithIndex.map { case (h, i) =>
          (s"lpa/i=$i", h, Seq("node"))
        })

  /** The maintained community labels as of the last committed batch. */
  def currentCommunities(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, rounds: Int): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
        s"lpa/i=${rounds - 1}")
      .select(col("node"), col("lab").as("community"))

  /** Continuously-maintained LPA communities over the mutation-log
    * STREAM — [[refreshCommunities]] needs the NEW per-round history to
    * carry forward, so the fold recomputes each round's spliced label
    * table and persists all of them per version (the
    * [[maintainRanksStream]] shape). Crash replay idempotent. */
  def maintainCommunitiesStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String,
      rounds: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val baseRels = c.table("rels")
          val hist = (0 until rounds).map(i => c.table(s"lpa/i=$i"))
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          val newRels = applyRelationshipMutations(baseRels, m)
            .compactCheckpoint()
          val changed = changedPairs(c.tableBuckets("rels",
            c.dirty(latest.select(col("source_id")), "source_id")), m)
          val (newHist, dirtyKeys) =
            refreshCommunitiesHistoryParts(newRels, changed, hist)
          newHist.zipWithIndex.foreach { case (h, i) =>
            val up = h.join(dirtyKeys(i), Seq("node"), "left_semi")
            val tomb = dirtyKeys(i)
              .join(h.select(col("node")), Seq("node"), "left_anti")
            c.chainDelta(s"lpa/i=$i", up, tomb)
          }
          relsDelta(c, latest)
          newHist.foreach(graft.core.Blocks.free)
          dirtyKeys.foreach(graft.core.Blocks.free)
          graft.core.Blocks.free(newRels); graft.core.Blocks.free(m)
          graft.core.Blocks.free(latest)
          c.commit()
        }
      }
      .start()
  }

  /** The changed (source,target) pair set a mutation batch induces,
    * computed against the BASE relationship table but touching only the
    * touched keys / touched pairs — a pair is "changed" when its
    * existence flips between base and final state. Over-approximation
    * (e.g. a pair both dropped and re-added via different rel ids) is
    * harmless for [[refreshRanks]]. */
  def changedPairs(baseRels: DataFrame, mutations: DataFrame): DataFrame =
    changedPairsSigned(baseRels, mutations)
      .select(col("source_id"), col("target_id"))

  /** [[changedPairs]] with the flip direction kept: `added` is true for
    * pairs absent in the base edge set and present after the batch, false
    * for the reverse. Directed-graph maintenance ([[refreshScc]]) needs
    * the sign — an added edge can only MERGE strongly connected
    * components, a removed one can only SPLIT its own. */
  def changedPairsSigned(baseRels: DataFrame,
      mutations: DataFrame): DataFrame = {
    val latest = latestRelMutations(mutations)
    val base4 = baseRels.select(col("source_id"), col("relationship_id"),
      col("target_id"))
    // pairs whose supporting rel rows were touched, before and after
    val oldTouched = base4
      .join(latest.select(RelKey.map(col): _*), RelKey, "left_semi")
      .select(col("source_id"), col("target_id"))
    val newTouched = latest.filter(col("alive"))
      .select(col("source_id"), col("target_id"))
    val candidates = oldTouched.unionByName(newTouched).distinct()
    // presence before: any base rel with the pair; after: any surviving
    // rel with the pair = (base rels not touched) ∪ latest-alive —
    // restricted to candidate pairs, so both probes are key lookups
    val pairCols = Seq("source_id", "target_id")
    val before = pairs(base4.join(candidates, pairCols, "left_semi"))
    val untouchedBase = base4
      .join(latest.select(RelKey.map(col): _*), RelKey, "left_anti")
    val after = pairs(untouchedBase.join(candidates, pairCols, "left_semi")
      .select(col("source_id"), col("target_id"))
      .unionByName(newTouched))
    before.join(after, pairCols, "left_anti")
      .withColumn("added", lit(false))
      .unionByName(after.join(before, pairCols, "left_anti")
        .withColumn("added", lit(true)))
  }

  // ---------------- incremental SCC (the last fixpoint operator) --------

  /** Affected-region refresh of [[Scc.components]] — the one maintainer
    * whose affected set is NOT local to the mutation cone: an added edge
    * u→v can merge SCCs arbitrarily far apart in the condensation (every
    * SCC on any v ⇝ u path joins the new cycle). The exact region is
    * still computable without touching the whole graph:
    *
    *  1. Contract every base SCC to a supernode (its label), EXCEPT
    *     "dirty" SCCs — those that lost an internal edge, the only ones
    *     that can split — whose members stay individual nodes. Sound
    *     because a clean SCC lost no internal edge, so it is still
    *     strongly connected in the new graph.
    *  2. Region = fwdReach(T ∪ D) ∩ bwdReach(S ∪ D) over the NEW edge
    *     set at supernode granularity, where T/S are the groups of added
    *     edges' targets/sources and D the dirty members. Any cycle that
    *     merges two groups either uses an added edge (so every group on
    *     it is reachable from T and reaches S) or witnesses mutual
    *     reachability inside a dirty SCC (so every group on it is
    *     reachable from and reaches a dirty member) — the region is
    *     cycle-closed, and groups outside it provably keep their label.
    *  3. Re-run the batch FW-BW-Trim on the region-induced quotient and
    *     splice every other node's label through verbatim. Labels stay
    *     bit-identical to full recompute: a clean supernode's id IS its
    *     SCC's min member id, so a min over merged group ids equals the
    *     min over all merged members.
    *
    * Cost: the pair delta and dirty probe are batch-keyed lookups; the
    * two reachability BFS runs touch only the frontier's members and
    * their edges per round (the [[Sssp]] shape); the quotient recompute
    * is region-sized. The only full-width operations are the one-pass
    * group-table build and the final splice — linear merges, the same
    * class every other maintainer pays.
    *
    * @param maxRounds loud cap on each reachability BFS (condensation
    *                  diameter); a frontier still alive past it throws —
    *                  a truncated region could splice stale labels. */
  def refreshScc(baseScc: DataFrame, baseRels: DataFrame,
      mutations: DataFrame, maxRounds: Int = 200): DataFrame = {
    val p = sccParts(baseScc, baseRels, mutations, maxRounds)
    // splice: base labels for clean out-of-region nodes still in the edge
    // universe; recomputed labels for region nodes; fresh singletons for
    // first-edge nodes the region didn't touch
    baseScc
      .join(p.universe, Seq("node"), "left_semi")
      .join(p.regionNodes.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("scc"))
      .unionByName(p.regionNodes
        .join(p.universe, Seq("node"), "left_semi")
        .join(p.regionLabels, Seq("grp"))
        .select(col("node"), col("scc")))
      .unionByName(p.universe
        .join(baseScc, Seq("node"), "left_anti")
        .join(p.regionNodes.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("scc")))
  }

  /** [[refreshScc]]'s splice ingredients. Every node whose row can differ
    * from the base labeling is in `regionNodes` ∪ `deltaEnds`: region
    * members get recomputed labels, and universe entries/exits (first-edge
    * singletons, fully-disconnected drops) are always endpoints of a
    * changed pair. */
  private[graft] case class SccParts(universe: DataFrame,
      regionNodes: DataFrame, regionLabels: DataFrame, deltaEnds: DataFrame)

  private[graft] def sccParts(baseScc: DataFrame, baseRels: DataFrame,
      mutations: DataFrame, maxRounds: Int = 200): SccParts = {
    val newRels = applyRelationshipMutations(baseRels, mutations)
      .compactCheckpoint()
    val delta = changedPairsSigned(baseRels, mutations)
      .filter(col("source_id") =!= col("target_id")) // self-loops are inert
      .compactCheckpoint()
    val added = delta.filter(col("added"))
    val removed = delta.filter(!col("added"))
    // dirty SCCs: lost an internal (same-label) edge — the only splits
    val dirty = removed
      .join(baseScc.select(col("node").as("source_id"), col("scc").as("ls")),
        Seq("source_id"))
      .join(baseScc.select(col("node").as("target_id"), col("scc").as("lt")),
        Seq("target_id"))
      .filter(col("ls") === col("lt"))
      .select(col("ls").as("scc")).distinct()
      .compactCheckpoint()
    // group(n): base label for clean members, the node itself for dirty
    // members and for nodes the base labeling never saw (created now)
    val universe = endpoints(pairs(newRels)
      .filter(col("source_id") =!= col("target_id")))
      .compactCheckpoint()
    val grpAll = baseScc
      .join(dirty.withColumn("__dirty", lit(true)), Seq("scc"), "left_outer")
      .select(col("node"),
        when(col("__dirty"), col("node")).otherwise(col("scc")).as("grp"))
      .unionByName(universe.join(baseScc, Seq("node"), "left_anti")
        .select(col("node"), col("node").as("grp")))
      .compactCheckpoint()
    val dirtyMembers = baseScc.join(dirty, Seq("scc"), "left_semi")
      .select(col("node"))
    def seedGroups(nodes: DataFrame): DataFrame =
      nodes.unionByName(dirtyMembers)
        .join(grpAll, Seq("node")).select(col("grp")).distinct()
        .compactCheckpoint()
    val fwdSeeds = seedGroups(added.select(col("target_id").as("node")))
    val bwdSeeds = seedGroups(added.select(col("source_id").as("node")))
    // group-granularity reachability: project the new edges to group
    // pairs ONCE (g1 → g2 iff any member edge crosses — the same closure
    // the old per-round member expansion walked, without re-joining
    // grpAll every hop), then run the shared seed-closure primitive on
    // the projected graph in each direction.
    val ge = newRels
      .join(grpAll.select(col("node").as("source_id"), col("grp").as("gs")),
        Seq("source_id"))
      .join(grpAll.select(col("node").as("target_id"), col("grp").as("gt")),
        Seq("target_id"))
      .filter(col("gs") =!= col("gt"))
      .select(col("gs").as("u"), col("gt").as("v")).distinct()
      .compactCheckpoint()
    def reach(seeds: DataFrame, reversed: Boolean): DataFrame = {
      val e = if (reversed) ge.select(col("v").as("u"), col("u").as("v"))
        else ge
      reachClosure(e, seeds.withColumnRenamed("grp", "node"), maxRounds,
        "SCC region").withColumnRenamed("node", "grp")
    }
    val fwd = reach(fwdSeeds, reversed = false)
    val bwd = reach(bwdSeeds, reversed = true)
    val region = fwd.join(bwd, Seq("grp"), "left_semi")
      .compactCheckpoint()
    Blocks.free(ge)
    val regionNodes = grpAll.join(region, Seq("grp"), "left_semi")
      .compactCheckpoint() // (node, grp)
    // quotient recompute: new edges with both endpoint groups in-region
    val q = newRels
      .join(regionNodes.select(col("node").as("source_id"),
        col("grp").as("gs")), Seq("source_id"))
      .join(regionNodes.select(col("node").as("target_id"),
        col("grp").as("gt")), Seq("target_id"))
      .filter(col("gs") =!= col("gt"))
      .select(col("gs").as("src"), col("gt").as("dst"))
    val resolved = Scc.components(q)
    val regionLabels = region
      .join(resolved.withColumnRenamed("node", "grp"), Seq("grp"),
        "left_outer")
      .select(col("grp"), coalesce(col("scc"), col("grp")).as("scc"))
    val deltaEnds = delta
      .select(explode(array(col("source_id"), col("target_id"))).as("node"))
      .distinct().compactCheckpoint()
    // the parts reference only checkpointed frames (universe, regionNodes,
    // region, deltaEnds, Scc's internal resolved parts) — everything else
    // is freeable now
    Blocks.free(delta); Blocks.free(dirty)
    Blocks.free(fwdSeeds); Blocks.free(bwdSeeds)
    Blocks.free(fwd); Blocks.free(bwd)
    Blocks.free(grpAll); Blocks.free(newRels)
    SccParts(universe, regionNodes, regionLabels, deltaEnds)
  }

  // ---------------- incremental k-core ----------------

  /** Affected-component refresh of the exact k-core survivor set
    * ([[KCore.kcore]]): peeling never crosses connected components, so
    * the k-core of the new graph is the union of per-component k-cores —
    * recompute ONLY the components a mutation touched and splice every
    * other node's survivor status verbatim.
    *
    * The affected region is the undirected reach of the changed pairs'
    * endpoints over the UNION of old and new edges: a node is affected
    * iff its old-or-new component contains a touched node (the union
    * closure covers both splits and merges), and everything outside the
    * region sits in a component whose edge set is bit-identical before
    * and after — its peeling replays unchanged. Region reach is a
    * frontier BFS (per round: the frontier's edges only, the [[Sssp]]
    * shape); the recompute runs the batch operator on the region-induced
    * new edges; the splice is one anti-join. Cost ∝ the touched
    * components, never the graph.
    *
    * An endpoint-preserving relationship Update yields no changed pair
    * and passes the base set through untouched. */
  def refreshKcore(baseCore: DataFrame, baseRels: DataFrame,
      mutations: DataFrame, k: Int, maxRounds: Int = 200): DataFrame = {
    val p = kcoreParts(baseRels, mutations, k, maxRounds) match {
      case Some(parts) => parts
      case None => return baseCore // no changed pair: base passes through
    }
    baseCore.join(p.affected, Seq("node"), "left_anti")
      .unionByName(p.recomputed)
  }

  /** [[refreshKcore]]'s splice ingredients (None when the batch changes no
    * pair): affected = the component-closed region, recomputed = the batch
    * k-core of the region-induced new edges. */
  private[graft] def kcoreParts(baseRels: DataFrame, mutations: DataFrame,
      k: Int, maxRounds: Int = 200): Option[NodeSpliceParts] = {
    val newRels = applyRelationshipMutations(baseRels, mutations)
      .compactCheckpoint()
    val touched = changedPairs(baseRels, mutations)
      .select(explode(array(col("source_id"), col("target_id"))).as("node"))
      .distinct().compactCheckpoint()
    if (touched.count() == 0) {
      Blocks.free(newRels); Blocks.free(touched)
      return None
    }
    // undirected union edge set: old ∪ new pairs, both directions
    val unionPairs = pairs(baseRels).unionByName(pairs(newRels)).distinct()
    val e = unionPairs
      .select(col("source_id").as("u"), col("target_id").as("v"))
      .unionByName(unionPairs.select(col("target_id").as("u"),
        col("source_id").as("v")))
      .filter(col("u") =!= col("v"))
      .compactCheckpoint()
    val region = reachClosure(e, touched, maxRounds, "k-core region")
    Blocks.free(touched)
    // region is component-closed in the new graph, so restricting the
    // source endpoint restricts both — keep both semi-joins for shape
    val regionEdges = newRels
      .join(region.withColumnRenamed("node", "source_id"),
        Seq("source_id"), "left_semi")
      .join(region.withColumnRenamed("node", "target_id"),
        Seq("target_id"), "left_semi")
    // KCore.kcore materializes eagerly (internal checkpoints), so the
    // newRels input is safe to free once it returns
    val recomputed = KCore.kcore(regionEdges, "source_id", "target_id", k)
    Blocks.free(newRels); Blocks.free(e)
    Some(NodeSpliceParts(region, recomputed))
  }

  /** Initialize the k-core maintenance state: version 0 holds the base
    * relationship table and the k-core survivor set. */
  def initKcoreState(stateDir: String, baseCore: DataFrame,
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets, Seq(
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")),
      ("kcore", baseCore, Seq("node"))))

  /** The maintained k-core survivor set as of the last committed batch. */
  def currentKcore(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
      "kcore")

  /** Continuously-maintained k-core over the mutation-log STREAM — the
    * [[maintainComponentsStream]] machinery with [[refreshKcore]] as the
    * fold. */
  def maintainKcoreStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String,
      k: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val baseRels = c.table("rels")
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          kcoreParts(baseRels, m, k) match {
            case None => c.carry("kcore")
            case Some(p) =>
              // upserts = the region's recomputed survivors; tombstones =
              // region nodes peeled out of the core
              val rec = p.recomputed.compactCheckpoint()
              val tomb = p.affected
                .join(rec.select(col("node")), Seq("node"), "left_anti")
              c.chainDelta("kcore", rec, tomb)
              graft.core.Blocks.free(rec)
          }
          relsDelta(c, latest)
          graft.core.Blocks.free(m); graft.core.Blocks.free(latest)
          c.commit()
        }
      }
      .start()
  }

  // ---------------- incremental k-truss ----------------

  /** Affected-component refresh of the k-truss edge set ([[KTruss.peel]])
    * — the maintainer family's eighth operator. Truss peeling, like
    * k-core peeling, never crosses connected components: an edge's
    * triangle support counts common neighbors, all of which live in its
    * own component, and removing an edge can only lower supports inside
    * that component. So the k-truss of the new graph is the union of
    * per-component k-trusses, and the [[refreshKcore]] recipe applies
    * verbatim at edge granularity: affected region = undirected reach of
    * the changed pairs' endpoints over old ∪ new edges (component-closed
    * in BOTH graphs, covering splits and merges); recompute the batch
    * peel on the region-induced NEW edges only; splice every base truss
    * edge whose component the mutations never touched (an edge is inside
    * the region iff its canonical `a` endpoint is — closure makes the
    * two endpoint tests equivalent). Cost ∝ the touched components'
    * wedge counts, never the graph's.
    *
    * `rounds` must cover the longest peel cascade, exactly as in the
    * batch operator (a converged round is a no-op, so overshooting is
    * safe, undershooting is wrong — same contract both sides of the
    * splice). */
  def refreshKtruss(baseTruss: DataFrame, baseRels: DataFrame,
      mutations: DataFrame, k: Int, rounds: Int,
      maxReachRounds: Int = 200): DataFrame = {
    val p = ktrussParts(baseRels, mutations, k, rounds,
      maxReachRounds) match {
      case Some(parts) => parts
      case None => return baseTruss // no changed pair: base passes through
    }
    // base truss edges are canonical (a < b) and the region is
    // component-closed, so a ∈ region ⟺ b ∈ region — one anti-join
    baseTruss
      .join(p.affected.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
      .unionByName(p.recomputed)
  }

  /** [[refreshKtruss]]'s splice ingredients (None when the batch changes
    * no pair): affected = the region's NODES (the anti-join key is the
    * canonical `a` endpoint), recomputed = the batch peel of the
    * region-induced new edges. */
  private[graft] def ktrussParts(baseRels: DataFrame, mutations: DataFrame,
      k: Int, rounds: Int,
      maxReachRounds: Int = 200): Option[NodeSpliceParts] = {
    val newRels = applyRelationshipMutations(baseRels, mutations)
      .compactCheckpoint()
    val touched = changedPairs(baseRels, mutations)
      .select(explode(array(col("source_id"), col("target_id"))).as("node"))
      .distinct().compactCheckpoint()
    if (touched.count() == 0) {
      Blocks.free(newRels); Blocks.free(touched)
      return None
    }
    val unionPairs = pairs(baseRels).unionByName(pairs(newRels)).distinct()
    val e = unionPairs
      .select(col("source_id").as("u"), col("target_id").as("v"))
      .unionByName(unionPairs.select(col("target_id").as("u"),
        col("source_id").as("v")))
      .filter(col("u") =!= col("v"))
      .compactCheckpoint()
    val region = reachClosure(e, touched, maxReachRounds, "k-truss region")
    Blocks.free(touched)
    val regionEdges = newRels
      .join(region.withColumnRenamed("node", "source_id"),
        Seq("source_id"), "left_semi")
      .join(region.withColumnRenamed("node", "target_id"),
        Seq("target_id"), "left_semi")
      .select(col("source_id").as("src"), col("target_id").as("dst"))
    // KTruss.peel materializes eagerly (internal checkpoints), so the
    // newRels input is safe to free once it returns
    val recomputed = KTruss.peel(regionEdges, k, rounds)
    Blocks.free(newRels); Blocks.free(e)
    Some(NodeSpliceParts(region, recomputed))
  }

  /** Initialize the k-truss maintenance state: version 0 holds the base
    * relationship table and the k-truss edge set. */
  def initKtrussState(stateDir: String, baseTruss: DataFrame,
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets, Seq(
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")),
      // truss edges are canonical (a < b); a's bucket is the edge's home
      ("ktruss", baseTruss, Seq("a", "b"))))

  /** The maintained k-truss edge set as of the last committed batch. */
  def currentKtruss(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
      "ktruss")

  /** Continuously-maintained k-truss over the mutation-log STREAM — the
    * [[maintainKcoreStream]] machinery with [[refreshKtruss]] as the
    * fold: versioned at-rest state, atomic pointer commit, idempotent
    * crash replay, post-commit version pruning. */
  def maintainKtrussStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String,
      k: Int, rounds: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val baseRels = c.table("rels")
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          ktrussParts(baseRels, m, k, rounds) match {
            case None => c.carry("ktruss")
            case Some(p) =>
              // upserts = the region's recomputed truss edges; tombstones
              // = base truss edges inside the region that did not survive
              // the re-peel. Region nodes bucket exactly like the
              // canonical `a` endpoints, so the probe is bucket-pruned.
              val rec = p.recomputed.compactCheckpoint()
              val tomb = c.tableBuckets("ktruss", c.dirty(p.affected, "node"))
                .join(p.affected.withColumnRenamed("node", "a"),
                  Seq("a"), "left_semi")
                .select(col("a"), col("b"))
                .join(rec.select(col("a"), col("b")), Seq("a", "b"),
                  "left_anti")
              c.chainDelta("ktruss", rec, tomb)
              graft.core.Blocks.free(rec)
          }
          relsDelta(c, latest)
          graft.core.Blocks.free(m); graft.core.Blocks.free(latest)
          c.commit()
        }
      }
      .start()
  }

  /** Initialize the SCC maintenance state: version 0 holds the base
    * relationship table and its SCC labeling. */
  def initSccState(stateDir: String, baseScc: DataFrame,
      baseRels: DataFrame,
      buckets: Int = StateStore.DefaultBuckets): Unit =
    initState(stateDir, buckets, Seq(
      ("rels", baseRels.select(RelsCols.map(col): _*),
        Seq("source_id", "relationship_id")),
      ("scc", baseScc, Seq("node"))))

  /** The maintained SCC labeling as of the last committed batch. */
  def currentScc(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    StateStore.readTable(spark, stateDir, StateStore.readPointer(stateDir),
      "scc")

  /** Continuously-maintained SCC labels over the mutation-log STREAM —
    * the [[maintainComponentsStream]] machinery with [[refreshScc]] as
    * the fold: same versioned at-rest state, atomic pointer commit,
    * idempotent crash replay, post-commit version pruning. */
  def maintainSccStream(spark: org.apache.spark.sql.SparkSession,
      mutationsDir: String, stateDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(graft.core.Tables.mutationsSchema)
      .parquet(mutationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = batchId + 1
        if (StateStore.readPointer(stateDir) < target) {
          val spark2 = batch.sparkSession
          val c = new StateCommit(spark2, stateDir, target)
          val baseRels = c.table("rels")
          val baseScc = c.table("scc")
          val m = batch.compactCheckpoint()
          val latest = latestRelMutations(m).compactCheckpoint()
          val p = sccParts(baseScc, baseRels, m)
          // every row that can change: region members get recomputed
          // labels; universe entries/exits (first-edge singletons, drops)
          // are endpoints of changed pairs. Upserts = the full splice
          // restricted to those keys (unchanged delta-end rows ride along
          // harmlessly); tombstones = dirty keys the splice dropped.
          val dirtyNodes = p.regionNodes.select(col("node"))
            .unionByName(p.deltaEnds).distinct().compactCheckpoint()
          val newTable = baseScc
            .join(p.universe, Seq("node"), "left_semi")
            .join(p.regionNodes.select(col("node")), Seq("node"),
              "left_anti")
            .select(col("node"), col("scc"))
            .unionByName(p.regionNodes
              .join(p.universe, Seq("node"), "left_semi")
              .join(p.regionLabels, Seq("grp"))
              .select(col("node"), col("scc")))
            .unionByName(p.universe
              .join(baseScc, Seq("node"), "left_anti")
              .join(p.regionNodes.select(col("node")), Seq("node"),
                "left_anti")
              .select(col("node"), col("node").as("scc")))
          val up = newTable.join(dirtyNodes, Seq("node"), "left_semi")
            .compactCheckpoint()
          val tomb = dirtyNodes
            .join(up.select(col("node")), Seq("node"), "left_anti")
          c.chainDelta("scc", up, tomb)
          relsDelta(c, latest)
          graft.core.Blocks.free(m); graft.core.Blocks.free(latest)
          graft.core.Blocks.free(dirtyNodes); graft.core.Blocks.free(up)
          c.commit()
        }
      }
      .start()
  }
}
