package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.graph.TwinGraph

/** Bulk storage layout + merge semantics for cluster scale — the columnar
  * counterpart of the reference's indexes (SURVEY §1.4:
  * unique($dtId) / btree($model) / GIN(props) at
  * /root/reference/src/AgeDigitalTwins/GraphInitialization.cs:13-39):
  *
  *  - `twins` partitioned by `model_id` (the $model btree becomes partition
  *    pruning) and sorted by `dt_id` within files (the unique index becomes
  *    min/max file skipping for point lookups);
  *  - `relationships` bucketed by `source_id` (traversals join
  *    shuffle-free against co-bucketed twins) when written as tables;
  *    plain parquet falls back to sorted-by-source files;
  *  - MERGE expressed as anti-join + union — the exact logical form Delta's
  *    MERGE INTO executes with file pruning on a real deployment.
  */
object GraphStore {

  def write(graph: TwinGraph, dir: String): Unit = {
    // Page sizing for the SERVING path (r17): the driver-side point
    // reader prunes to pages via the column index, then decodes whole
    // pages — with the 1 MB/20k-row defaults a single getTwin decodes
    // thousands of rows' worth of documents. Bounding pages at ~1k rows /
    // 128 KB makes a point read decode ~one-thousandth of a row group,
    // the btree-leaf trade (slightly larger footers, same scan speed:
    // scans are bandwidth-bound, not page-count-bound).
    // 256-row key pages (r18, was 1024): the point read decodes every
    // projected column across the key page's full row span — with ~1 KB
    // docs the VALUE column splits into ~128-row byte-bound pages anyway,
    // so the KEY page's row-count limit is what sets the assembly span.
    // 1024→256 cut per-lookup decode ~4× (measured: the sf10 point leg
    // was assembly-bound, not seek-bound); footer/page-index overhead is
    // ~32 B/page on the driver and scans stay bandwidth-bound.
    val pageOpts = Map(
      "parquet.page.size" -> (128 * 1024).toString,
      "parquet.page.row.count.limit" -> "256")
    graph.twins
      // RANGE partition on (model_id, dt_id): hash-by-model put every
      // row of a large model in ONE task (a 1.5 M-row single-task write
      // dominated sf10 ingest), and each model's files now carry
      // DISJOINT dt_id ranges — the point reader's footer index prunes
      // to one file. model_id FIRST in the sort: partitionBy requires
      // ordering by the partition columns, and when the incoming order
      // doesn't satisfy it the writer inserts its own NON-STABLE sort by
      // model_id alone — which silently destroyed the dt_id order
      // (measured: 32 interleaved sorted runs per file, every point
      // lookup decoding 32 pages instead of 1).
      .repartitionByRange(col("model_id"), col("dt_id"))
      .sortWithinPartitions(col("model_id"), col("dt_id"))
      .write.mode(SaveMode.Overwrite)
      .options(pageOpts)
      .partitionBy("model_id")
      .parquet(s"$dir/twins")
    graph.relationships
      // RANGE partitioning (r17): hash partitioning gave every file the
      // full key range, so a relationship point read had to open every
      // file; range partitioning keeps the within-file sort AND makes
      // file ranges disjoint — the footer index prunes to ONE file, like
      // the twins side. Joins are indifferent (plain parquet carries no
      // distribution metadata either way).
      .repartitionByRange(col("source_id"), col("relationship_id"))
      .sortWithinPartitions(col("source_id"), col("relationship_id"))
      .write.mode(SaveMode.Overwrite)
      .options(pageOpts)
      .parquet(s"$dir/relationships")
    graph.models.write.mode(SaveMode.Overwrite).parquet(s"$dir/models")
  }

  def read(spark: SparkSession, dir: String): TwinGraph = {
    // explicit schemas, not inference: an EMPTY table (e.g. a bulk-imported
    // store with no models, or a twins-only graph) writes a parquet dir
    // with no data files, and schema inference over it throws — the
    // canonical Tables schemas make empty reads well-typed
    // (UNABLE_TO_INFER_SCHEMA found by q_store_bulk_counts, r16).
    // Column order restored explicitly (partitionBy moves model_id last).
    val twins = spark.read.schema(Tables.twinsSchema)
      .parquet(s"$dir/twins")
      .select("dt_id", "model_id", "etag", "last_update_time", "properties")
    TwinGraph(
      twins,
      spark.read.schema(Tables.relationshipsSchema)
        .parquet(s"$dir/relationships"),
      spark.read.schema(Tables.modelsSchema).parquet(s"$dir/models"))
  }

  /** Bucketed catalog tables — the layout that makes traversal joins
    * shuffle-free: twins hashed into `buckets` files on `dt_id`,
    * relationships on `source_id`, so a hop join (B4/B5) finds both sides
    * already co-partitioned on the join key and EnsureRequirements inserts
    * no Exchange (asserted in PlanQualitySpec). This is the cluster-scale
    * analogue of the reference's btree indexes
    * (GraphInitialization.cs:13-39): the btree makes the per-row lookup
    * cheap on one node; co-bucketing makes the whole-table join cheap on a
    * thousand. `buckets` should match cluster parallelism; `location`
    * overrides the warehouse dir for the database. */
  def writeBucketedTables(graph: TwinGraph, db: String, buckets: Int = 32,
      location: Option[String] = None): Unit = {
    val spark = graph.twins.sparkSession
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db$loc")
    graph.twins.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "dt_id").sortBy("dt_id")
      .saveAsTable(s"$db.twins")
    graph.relationships.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "source_id").sortBy("source_id", "relationship_id")
      .saveAsTable(s"$db.relationships")
    graph.models.write.mode(SaveMode.Overwrite).saveAsTable(s"$db.models")
  }

  /** The graph view over [[writeBucketedTables]] output. Frames read
    * through the catalog (not raw parquet paths) so scans carry the bucket
    * spec and joins on `dt_id`/`source_id` skip their shuffles. */
  def readBucketedTables(spark: SparkSession, db: String): TwinGraph =
    TwinGraph(spark.table(s"$db.twins"), spark.table(s"$db.relationships"),
      spark.table(s"$db.models"))

  /** MERGE INTO twins: upserts win over existing rows on dt_id. */
  /** Columns both sides carry, in `a`'s order — a merge between a
    * canonical store frame and a derived view (which may dual-carry
    * extras like GraphViews' `properties_v`) unions on the shared
    * document surface instead of failing the union. */
  private def sharedCols(a: DataFrame, b: DataFrame): Seq[org.apache.spark.sql.Column] =
    a.columns.filter(b.columns.contains).map(col).toSeq

  def mergeTwins(existing: DataFrame, upserts: DataFrame): DataFrame = {
    val cols = sharedCols(existing, upserts)
    existing.select(cols: _*)
      .join(upserts.select(col("dt_id")), Seq("dt_id"), "left_anti")
      .unionByName(upserts.select(cols: _*))
  }

  /** MERGE INTO relationships on (source_id, relationship_id). */
  def mergeRelationships(existing: DataFrame, upserts: DataFrame): DataFrame = {
    val cols = sharedCols(existing, upserts)
    existing.select(cols: _*)
      .join(upserts.select(col("source_id"), col("relationship_id")),
        Seq("source_id", "relationship_id"), "left_anti")
      .unionByName(upserts.select(cols: _*))
  }

  /** DELETE WHERE dt_id IN ids (returns the surviving table). */
  def deleteTwins(existing: DataFrame, ids: DataFrame): DataFrame =
    existing.join(ids.select(col("dt_id")), Seq("dt_id"), "left_anti")

  /** DELETE WHERE (source_id, relationship_id) IN keys. */
  def deleteRelationships(existing: DataFrame, keys: DataFrame): DataFrame =
    existing.join(keys.select(col("source_id"), col("relationship_id")),
      Seq("source_id", "relationship_id"), "left_anti")
}
