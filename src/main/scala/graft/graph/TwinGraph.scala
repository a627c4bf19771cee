package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The property-graph view the engine queries: twins (vertices),
  * relationships (edges), models (DTDL metadata with precomputed
  * inheritance closure).
  *
  * Operator mapping (SURVEY §2.A/§2.B of /root/repo/SURVEY.md, citing
  * /root/reference):
  *  - A1/A2 scans  — `MATCH (T:Twin)` / `MATCH (:Twin)-[R]->(:Twin)`
  *    (AdtQueryHelpers.cs:160-187, 50-78) → plain DataFrame scans.
  *  - A3-A6 point lookups — filters on promoted key columns.
  *  - B4/B5 hop joins — (AdtQueryHelpers.cs:82-159) → equi-joins; the
  *    twins side of each hop is joined on `dt_id`, edges on
  *    `source_id`/`target_id`. At scale these are shuffle hash joins on
  *    co-bucketed keys; model/dimension sides are broadcast.
  *  - C1 IS_OF_MODEL — (GraphInitialization.cs:50-121) → broadcast
  *    semi-join against the precomputed descendants closure.
  */
final case class TwinGraph(twins: DataFrame, relationships: DataFrame, models: DataFrame) {

  import TwinGraph._

  // -------- A3-A6: point lookups / adjacency --------

  def twinById(dtId: String): DataFrame = twins.filter(col("dt_id") === dtId)

  def relationshipById(sourceId: String, relId: String): DataFrame =
    relationships.filter(col("source_id") === sourceId && col("relationship_id") === relId)

  def outgoing(dtId: String, name: Option[String] = None): DataFrame = {
    val base = relationships.filter(col("source_id") === dtId)
    name.fold(base)(n => base.filter(col("relationship_name") === n))
  }

  def incoming(dtId: String): DataFrame = relationships.filter(col("target_id") === dtId)

  // -------- B4-B6: hop joins --------

  /** One directed hop: returns (source twin cols prefixed src_, edge cols
    * rel_, target twin cols dst_). Edge-name disjunction (B6) is a plain
    * IN filter because relationship_name is a column, not a label.
    *
    * Skew decision rule: a hop shuffles edges on source_id then
    * target_id, so a hub twin (a site twin every asset points at, the
    * reference's `$metadata.$model`-indexed pressure point,
    * GraphInitialization.cs:16-18) lands its whole edge set on one
    * reducer. AQE's skew split rescues moderate sort-merge skew
    * automatically; when a known hub exceeds what one partition split can
    * absorb (rule of thumb: a single key's edges > a few x
    * spark.sql.files.maxPartitionBytes worth of rows), pass the hub list
    * to the `hotTwinIds` overload below, which salts exactly those keys
    * and leaves the cold path untouched. */
  def hop(relNames: Seq[String] = Nil): DataFrame = {
    val rels0 = if (relNames.isEmpty) relationships
      else relationships.filter(col("relationship_name").isin(relNames: _*))
    val src = prefixed(twins, "src_")
    val dst = prefixed(twins, "dst_")
    val rels = prefixed(rels0, "rel_")
    src.join(rels, col("src_dt_id") === col("rel_source_id"))
      .join(dst, col("rel_target_id") === col("dst_dt_id"))
  }

  /** [[hop]] with explicit hub-key salting — same rows, same columns.
    * `hotTwinIds` is a 1-column frame of dt_ids measured (or known) to be
    * hubs: each leg routes edges touching a listed twin through
    * [[graft.operators.SkewJoin]] (deterministic content-hash salt, twin
    * row replicated `salts` ways) and everything else through the plain
    * co-partitioned equi-join. A stale or over-broad hub list moves rows
    * between the two paths but never changes the result. */
  def hop(relNames: Seq[String], hotTwinIds: DataFrame, salts: Int): DataFrame = {
    import graft.operators.SkewJoin
    val rels0 = if (relNames.isEmpty) relationships
      else relationships.filter(col("relationship_name").isin(relNames: _*))
    val src = prefixed(twins, "src_")
    val dst = prefixed(twins, "dst_")
    val rels = prefixed(rels0, "rel_")
    val hot = hotTwinIds.toDF("__hot_id")
    // Edges are the skewed (probe) side of both legs; the twin row for a
    // hub is single, so replicating it `salts` times is cheap.
    val srcLeg = SkewJoin.join(rels, src, "rel_source_id", "src_dt_id",
      hot, salts)
    val full = SkewJoin.join(srcLeg, dst, "rel_target_id", "dst_dt_id",
      hot, salts)
    // Restore [[hop]]'s column order (src_, rel_, dst_).
    full.select((src.columns ++ rels.columns ++ dst.columns).map(col): _*)
  }

  /** Measured hub list for [[hop]]'s skew overload: twins whose degree
    * (either direction) reaches `minDegree`. Two map-side-combinable
    * counts — broadcast-sized by construction for any sane threshold. */
  def hubTwinIds(minDegree: Long): DataFrame = {
    import graft.operators.SkewJoin
    SkewJoin.hotKeys(relationships, "source_id", minDegree)
      .union(SkewJoin.hotKeys(
        relationships.select(col("target_id").as("source_id")),
        "source_id", minDegree))
      .distinct()
  }

  /** B17 neighborhood: 1-hop, both directions, bounded. */
  def neighborhood(dtId: String, limit: Int = 50): DataFrame = {
    val out = relationships.filter(col("source_id") === dtId)
      .select(col("relationship_id"), col("relationship_name"),
        col("target_id").as("neighbor_id"), lit("out").as("direction"))
    val in = relationships.filter(col("target_id") === dtId)
      .select(col("relationship_id"), col("relationship_name"),
        col("source_id").as("neighbor_id"), lit("in").as("direction"))
    out.unionByName(in).limit(limit)
  }

  /** Degree statistics: per-twin out/in/total degree over the
    * relationship table — the first graph-health query run on any large
    * graph (hub detection, skew planning for traversal joins). Two
    * map-side-combined aggregations + outer joins back onto the twin
    * set, so isolated twins report zero instead of vanishing. */
  def degrees(): DataFrame = {
    val outD = relationships.groupBy(col("source_id").as("dt_id"))
      .agg(count(lit(1)).as("out_degree"))
    val inD = relationships.groupBy(col("target_id").as("dt_id"))
      .agg(count(lit(1)).as("in_degree"))
    twins.select(col("dt_id"))
      .join(outD, Seq("dt_id"), "left_outer")
      .join(inD, Seq("dt_id"), "left_outer")
      .select(col("dt_id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** The model graph the reference materializes alongside the twin graph
    * (AgeDigitalTwinsClient.Models.cs:402-425 creates `_extends` and
    * `_hasComponent` edges between `:Model` nodes; GraphInitialization.cs:31-38
    * provisions and indexes the `_extends` label): models become nodes in
    * the twin-graph SHAPE, so the ADT/Cypher executor, VLE expansion and
    * the graph analytics run over model inheritance unchanged —
    * `MATCH (m:Model)-[e:_extends]->(parent:Model) RETURN m, parent` is
    * the reference's own inheritance query (QueryTests.cs:1201).
    *
    * Direct `extends` and component references come from each stored DTDL
    * doc; models without a stored doc fall back to `bases`, whose head is
    * the direct parent by construction. The catalog pass is driver-side
    * and bounded: a model catalog is small by design — the reference
    * loads it whole into its ModelCache — so this is a point read, not a
    * data scan. */
  def modelGraph: TwinGraph = {
    val spark = twins.sparkSession
    import spark.implicits._
    val have = models.columns.toSet
    val padded = Seq("display_name" -> "string", "decommissioned" -> "boolean",
      "upload_time" -> "string", "dtdl" -> "string")
      .foldLeft(models) { case (df, (c, t)) =>
        if (have(c)) df else df.withColumn(c, lit(null).cast(t))
      }
    val rows = padded.select(col("id"), col("bases"), col("display_name"),
      col("decommissioned"), col("upload_time"), col("dtdl")).collect()
    val nodes = rows.toSeq.map { r =>
      val id = r.getString(0)
      val doc = graft.json.Json.obj()
      doc.put("$dtId", id)
      doc.put("id", id)
      if (!r.isNullAt(2)) doc.put("displayName", r.getString(2))
      doc.put("decommissioned", !r.isNullAt(3) && r.getBoolean(3))
      if (!r.isNullAt(4)) doc.put("uploadTime", r.getString(4))
      (id, "Model", null: String,
        if (r.isNullAt(4)) null else r.getString(4),
        graft.json.Json.render(doc))
    }.toDF("dt_id", "model_id", "etag", "last_update_time", "properties")
    val edges = rows.toSeq.flatMap { r =>
      val id = r.getString(0)
      val parsed = Option(if (r.isNullAt(5)) null else r.getString(5))
        .flatMap(j => graft.dtdl.Dtdl.parseInterface(j).toOption)
      val ext: Seq[String] = parsed.map(_.extendsIds).getOrElse {
        val bases = if (r.isNullAt(1)) Nil else r.getSeq[String](1).toSeq
        bases.headOption.toList
      }
      val comps: Seq[String] = parsed
        .map(_.components.values.toSeq.filter(_.nonEmpty).distinct)
        .getOrElse(Nil)
      ext.map(b => (s"$id-_extends-$b", id, b, "_extends")) ++
        comps.map(c => (s"$id-_hasComponent-$c", id, c, "_hasComponent"))
    }.map { case (rid, s0, t0, n0) => (rid, s0, t0, n0, null: String, "{}") }
      .toDF("relationship_id", "source_id", "target_id",
        "relationship_name", "etag", "properties")
    TwinGraph(nodes, edges, models)
  }

  /** Weakly connected components over the twin graph — every twin is a
    * node, every relationship an undirected edge: (dt_id, component)
    * with component = the lexicographic-min member id (canonical, so any
    * correct algorithm produces the identical labeling). Isolated twins
    * are their own singleton component. Runs the star-contraction
    * components ([[graft.pipeline.Dedup.components]]) — O(log n)
    * contraction rounds of equi-joins + combinable mins, no n² stage —
    * then one left join reattaches edge-free twins. */
  def components(): DataFrame = {
    val pairs = relationships.select(col("source_id").as("doc_a"),
      col("target_id").as("doc_b"))
    val comp = graft.pipeline.Dedup.components(pairs)
      .withColumnRenamed("doc", "dt_id")
    twins.select(col("dt_id"))
      .join(comp, Seq("dt_id"), "left_outer")
      .select(col("dt_id"),
        coalesce(col("component"), col("dt_id")).as("component"))
  }

  /** Referential-integrity audit of the graph — the invariants the
    * reference's delete path protects (DETACH DELETE removes edges with
    * the twin, JobService.cs delete jobs sweep relationships first):
    * dangling endpoints (edge references a twin id that does not exist),
    * duplicate relationship ids, and self-loops. One anti-join per
    * endpoint + two combinable aggregations; output is a fixed metric →
    * count table, all-zeros (beyond n_rels) on a healthy graph. */
  def integrityReport(): DataFrame = {
    val spark = twins.sparkSession
    import spark.implicits._
    val ids = twins.select(col("dt_id"))
    def cnt(df: DataFrame): Long = df.count()
    val nRels = cnt(relationships)
    val danglingSrc = cnt(relationships
      .join(ids.withColumnRenamed("dt_id", "source_id"), Seq("source_id"),
        "left_anti"))
    val danglingTgt = cnt(relationships
      .join(ids.withColumnRenamed("dt_id", "target_id"), Seq("target_id"),
        "left_anti"))
    val selfLoops = cnt(relationships
      .filter(col("source_id") === col("target_id")))
    val dupIds = relationships.groupBy(col("relationship_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    Seq(("n_rels", nRels), ("n_dangling_source", danglingSrc),
      ("n_dangling_target", danglingTgt), ("n_self_loops", selfLoops),
      ("n_duplicate_ids", dupIds)).toDF("metric", "n")
  }

  // -------- C1: IS_OF_MODEL --------

  /** Twins whose model equals `modelId` or (unless exact) inherits from it.
    * Uses the write-time-precomputed `descendants` closure — the same
    * optimization the reference materializes (Models.cs:263-324) — via a
    * broadcast of one tiny row, so the twin scan stays a single pass with a
    * pushable IN filter. */
  def ofModel(modelId: String, exact: Boolean = false): DataFrame = {
    if (exact) twins.filter(col("model_id") === modelId)
    else {
      val fam = modelFamily(modelId)
      twins.filter(col("model_id").isin(fam: _*))
    }
  }

  /** modelId + its descendants, collected driver-side at PLAN time (a
    * catalog-metadata lookup, like resolving a table — models are bounded
    * and cached; the reference's equivalent is `model_and_descendants`,
    * GraphInitialization.cs:239-257). The literal family list lets Catalyst
    * constant-fold the membership test per partition/union branch. */
  def modelFamily(modelId: String): Seq[String] = {
    val rows = models.filter(col("id") === modelId)
      .select(col("descendants")).collect()
    val desc = rows.headOption.flatMap(r => Option(r.getSeq[String](0))).getOrElse(Nil)
    modelId +: desc
  }

  /** Fully-distributed IS_OF_MODEL: broadcast semi-join against the
    * exploded closure — no driver collect; use when the model set is not
    * driver-resident (e.g. models maintained as a stream). */
  def ofModelDistributed(modelId: String): DataFrame = {
    val family = models.filter(col("id") === modelId)
      .select(explode(concat(array(col("id")), coalesce(col("descendants"),
        array()))).as("fam_id"))
    twins.join(broadcast(family), col("model_id") === col("fam_id"), "left_semi")
  }

  /** Lexical model search (Models.cs:911-931 of /root/reference:
    * `toLower(id|displayName) CONTAINS q`), C14 toLower/toString. */
  def searchModels(q: String, limit: Int = 10): DataFrame = {
    val needle = q.toLowerCase
    models.filter(lower(col("id")).contains(needle) ||
        lower(coalesce(col("display_name"), lit(""))).contains(needle))
      .orderBy(col("id"))
      .limit(limit)
  }

  /** Hybrid lexical+vector model search over the `models` table — the
    * reference's SearchModelsAsync vector branch (Models.cs:883-931:
    * lexical WHERE filter, `ORDER BY l2_distance(m.embedding, [..])
    * LIMIT n`). Squared L2 via the codegen'd
    * [[graft.pipeline.Similarity.l2sq]] kernel (same ranking as L2);
    * models without an embedding sort last, ties break on id.
    * TakeOrdered plan — one scan, no shuffle beyond the top-k. */
  def searchModelsSemantic(query: Option[String], vector: Seq[Double],
      limit: Int = 10): DataFrame = {
    val base = query.map(_.toLowerCase).filter(_.nonEmpty) match {
      case Some(needle) =>
        models.filter(lower(col("id")).contains(needle) ||
          lower(coalesce(col("display_name"), lit(""))).contains(needle))
      case None => models
    }
    val qv = array(vector.map(lit): _*)
    base.withColumn("l2sq", graft.pipeline.Similarity.l2sq(col("embedding"), qv))
      .orderBy(col("l2sq").asc_nulls_last, col("id").asc)
      .limit(limit)
  }

  /** B16/C15: ordered vector top-k over a JSON embedding property —
    * `ORDER BY l2_distance(t.emb, [..]) LIMIT k` (DigitalTwins.cs:1242-1248)
    * as a TakeOrdered over an L2 Column kernel (no UDF). */
  def vectorSearch(embeddingProp: String, queryVec: Seq[Double], k: Int,
      modelFilter: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types._
    val emb = from_json(TwinGraph.prop(col("properties"), Seq(embeddingProp)),
      ArrayType(DoubleType))
    val qv = array(queryVec.map(lit): _*)
    // exact-model filter before ranking (HybridSearchAsync's WHERE
    // t.$metadata.$model = '...', DigitalTwins.cs:1238-1240)
    modelFilter.fold(twins)(m => twins.filter(col("model_id") === m))
      .withColumn("l2sq", graft.pipeline.Similarity.l2sq(emb, qv))
      .filter(col("l2sq").isNotNull)
      .orderBy(col("l2sq").asc, col("dt_id").asc)
      .limit(k)
      .select(col("dt_id"), col("model_id"), col("l2sq"), col("properties"))
  }

  /** B7: bounded variable-length expansion src -[name*1..max]-> reachable.
    * Returns (start_id, end_id, depth) with minimal depth per pair.
    * Delegates to [[graft.graph.Vle.range]] so bounded expansion shares the
    * same early-exit (stop when the frontier empties) and per-iteration
    * lineage-checkpoint discipline as unbounded VLE — the previous
    * hand-rolled loop built a `max`-deep plan even on an empty frontier. */
  def expand(relName: Option[String], max: Int): DataFrame =
    Vle.range(relationships, 1, max, relName.toSeq)
}

object TwinGraph {
  def prefixed(df: DataFrame, p: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(p + c)): _*)

  /** Property access inside the JSON doc: `T.a.b` → properties $.a.b.
    * `$`-prefixed system keys are promoted columns when available. */
  def prop(docCol: Column, path: Seq[String]): Column =
    get_json_object(docCol, "$" + path.map(p => s"['$p']").mkString)

  /** Variant-backed property access (r17; SURVEY §1.2/§1.3 names
    * VariantType as the target mapping): `parse_json` once, `variant_get`
    * per property. A query touching k properties of one document pays ONE
    * parse per row per operator — identical deterministic `parse_json`
    * subtrees are subexpression-eliminated inside whole-stage codegen —
    * where k `get_json_object`s re-parse the full document k times.
    * String-rendering parity with get_json_object is spec-verified for
    * every scalar/array shape (VariantPropSpec). Whole-OBJECT extraction
    * would render keys name-sorted (the variant binary form orders
    * fields), so any rendered value that may embed an object (contains
    * '{') falls back per row to [[prop]]'s verbatim raw-text echo — the
    * access route must never change user-visible output (ADVICE r17).
    * Scalar rows skip the fallback branch entirely (lazy when()). */
  def propVariant(docCol: Column, path: Seq[String]): Column = {
    // try_parse_json: a malformed document answers null, like
    // get_json_object — parse_json would ANSI-throw mid-scan
    val v = variant_get(try_parse_json(docCol),
      "$" + path.map(p => s"['$p']").mkString, "string")
    when(v.contains("{"), prop(docCol, path)).otherwise(v)
  }
}
