package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-encoded versioned state for the incremental maintainers
  * (SURVEY §2.F / the streaming §2.A9 composition).
  *
  * The r18 SLO attributed ~99% of the per-batch floor to `addBatch` — and
  * inside it, the per-commit FULL rewrite of every state table: parquet is
  * immutable, so the previous design rewrote the complete
  * degrees/components/rank tables per micro-batch, a cost bounded by STATE
  * SIZE, not the mutation batch. At 100× state a constant mutation trickle
  * pays 100× per commit, violating the maintainer family's own
  * "work ∝ mutation cone" scale contract at the commit step.
  *
  * Layout (mirrors the public Delta/Iceberg manifest idea, scoped down to
  * the pointer machinery the maintainers already had):
  *
  * {{{
  * stateDir/
  *   LATEST               committed version pointer (atomic move, as before)
  *   STATE.json           {"buckets": K} — fixed at init
  *   v{N}/
  *     MANIFEST.json      per table: bucket -> version that OWNS its files
  *     {table}/__sb={k}/  parquet for the buckets vN rewrote (dirty only)
  * }}}
  *
  * Every state table is hash-partitioned into K buckets by its key column
  * (`pmod(xxhash64(key), K)`). A commit writes ONLY the buckets the batch's
  * dirty cone touched and a manifest mapping every bucket to the version
  * that last rewrote it; clean buckets carry forward by reference. Reads
  * assemble a table by grouping the manifest by owning version — one
  * parquet relation per owner, each pruned to the owned bucket dirs — so
  * both the read and the write side of a point-mutation batch touch
  * O(dirty buckets), never O(state).
  *
  * Crash contract (unchanged from r16): the pointer moves only after the
  * full version (tables + manifest) is on disk; a replayed batch that finds
  * the pointer behind deletes the torn uncommitted version dir and
  * recomputes it deterministically; ahead → skip. Retention becomes
  * manifest-aware: a version dir lives while the committed or predecessor
  * manifest references ANY of its buckets (the predecessor grace keeps
  * in-flight lazy readers alive across one concurrent commit, as before);
  * within a referenced version, bucket dirs nothing references anymore are
  * swept bucket-granularly.
  *
  * An empty bucket writes no directory (Spark's partitioned writer emits
  * dirs only for non-empty partitions); readers treat a manifest-owned but
  * absent bucket dir as empty, which is also how a bucket whose last rows
  * were deleted is represented.
  */
private[graft] object StateStore {

  /** Partition column name — "__sb" (state bucket) because real state
    * tables use short names like `b` (k-truss edges). */
  val BucketCol = "__sb"

  val DefaultBuckets = 16

  def bucketOf(key: Column, k: Int): Column =
    pmod(xxhash64(key), lit(k.toLong)).cast("int")

  // ---------------- paths + small JSON sidecars ----------------

  private def pointerPath(stateDir: String) =
    java.nio.file.Paths.get(stateDir, "LATEST")

  def writePointer(stateDir: String, v: Long): Unit = {
    // temp-write + atomic move so a reader never sees a torn pointer
    val tmp = java.nio.file.Paths.get(stateDir, s".LATEST.tmp$v")
    java.nio.file.Files.writeString(tmp, v.toString)
    java.nio.file.Files.move(tmp, pointerPath(stateDir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  def readPointer(stateDir: String): Long =
    new String(java.nio.file.Files.readAllBytes(pointerPath(stateDir)))
      .trim.toLong

  def writeBucketCount(stateDir: String, k: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stateDir, "STATE.json"),
      s"""{"buckets":$k}"""): Unit
  }

  def bucketCount(stateDir: String): Int = {
    val n = graft.json.Json.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(stateDir, "STATE.json"))))
    n.get("buckets").asInt()
  }

  /** Table schemas (DDL strings), written once at init — the fallback for
    * assembling an EMPTY table when no bucket of it has any file (a state
    * initialized from an empty graph, or one whose rows were all deleted:
    * partitioned writers emit no files for zero rows). */
  def writeSchemas(stateDir: String, m: Map[String, String]): Unit = {
    val node = graft.json.Json.obj()
    m.toSeq.sortBy(_._1).foreach { case (t, ddl) => node.put(t, ddl): Unit }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stateDir, "SCHEMAS.json"), node.toString): Unit
  }

  private def readSchema(stateDir: String, table: String): Option[String] = {
    val p = java.nio.file.Paths.get(stateDir, "SCHEMAS.json")
    if (!java.nio.file.Files.exists(p)) None
    else Option(graft.json.Json.parse(
      new String(java.nio.file.Files.readAllBytes(p))).get(table))
      .map(_.asText())
  }

  /** table -> bucket -> owning version. */
  type Manifest = Map[String, Map[Int, Long]]

  private def manifestPath(stateDir: String, v: Long) =
    java.nio.file.Paths.get(stateDir, s"v$v", "MANIFEST.json")

  def writeManifest(stateDir: String, v: Long, m: Manifest): Unit = {
    val body = m.toSeq.sortBy(_._1).map { case (t, bs) =>
      s""""$t":{${bs.toSeq.sortBy(_._1)
        .map { case (b, o) => s""""$b":$o""" }.mkString(",")}}"""
    }.mkString("{\"tables\":{", ",", "}}")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(stateDir, s"v$v"))
    java.nio.file.Files.writeString(manifestPath(stateDir, v), body): Unit
  }

  def readManifest(stateDir: String, v: Long): Manifest = {
    val n = graft.json.Json.parse(new String(
      java.nio.file.Files.readAllBytes(manifestPath(stateDir, v))))
    val tables = n.get("tables")
    val out = Map.newBuilder[String, Map[Int, Long]]
    val tIt = tables.fieldNames()
    while (tIt.hasNext) {
      val t = tIt.next()
      val bs = Map.newBuilder[Int, Long]
      val bNode = tables.get(t)
      val bIt = bNode.fieldNames()
      while (bIt.hasNext) {
        val b = bIt.next()
        bs += (b.toInt -> bNode.get(b).asLong())
      }
      out += (t -> bs.result())
    }
    out.result()
  }

  private def bucketDir(stateDir: String, owner: Long, table: String,
      b: Int): String = s"$stateDir/v$owner/$table/$BucketCol=$b"

  // ---------------- read ----------------

  /** Assemble `table` as of version `v`: group the manifest's buckets by
    * owning version, one parquet relation per owner over exactly the
    * bucket dirs it owns. Absent dirs are empty buckets (partitioned
    * writers emit no dir for an empty partition). Giving the reader LEAF
    * dirs keeps Spark's partition discovery off (no `__sb` column in the
    * result) and makes the scan physically pruned to the named buckets. */
  def readTable(spark: SparkSession, stateDir: String, v: Long,
      table: String): DataFrame =
    readBuckets(spark, stateDir, v, table,
      readManifest(stateDir, v)(table).keys.toSeq)

  /** [[readTable]] restricted to `buckets` — the pruned base read a delta
    * commit does: only the dirty buckets' files are opened. */
  def readBuckets(spark: SparkSession, stateDir: String, v: Long,
      table: String, buckets: Seq[Int]): DataFrame = {
    val man = readManifest(stateDir, v)(table)
    val hconf = spark.sparkContext.hadoopConfiguration
    val byOwner = buckets.distinct.sorted
      .map(b => (man(b), b)).groupBy(_._1)
    val frames = byOwner.toSeq.sortBy(_._1).flatMap { case (owner, bs) =>
      val paths = bs.map { case (_, b) => bucketDir(stateDir, owner, table, b) }
        .filter { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(hconf).exists(hp)
        }
      if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
    }
    if (frames.isEmpty)
      // every named bucket is empty: an empty frame with the table schema
      // read from ANY existing bucket of the table, or fail loudly if the
      // whole table is empty everywhere (callers always init non-trivially)
      emptyLike(spark, stateDir, v, table)
    else frames.reduce(_ unionByName _)
  }

  private def emptyLike(spark: SparkSession, stateDir: String, v: Long,
      table: String): DataFrame = {
    val man = readManifest(stateDir, v)(table)
    val hconf = spark.sparkContext.hadoopConfiguration
    val any = man.toSeq.sortBy(_._1).iterator.map { case (b, o) =>
      bucketDir(stateDir, o, table, b)
    }.find { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }
    any match {
      case Some(p) => spark.read.parquet(p).limit(0)
      case None => readSchema(stateDir, table) match {
        case Some(ddl) => spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
        case None => throw new IllegalStateException(
          s"state table $table at $stateDir v$v has no bucket files and " +
            "no recorded schema")
      }
    }
  }

  // ---------------- write ----------------

  /** Write a FULL table at version `v` (init, or a deliberate compaction):
    * every bucket lands under v, manifest entries all map to v. */
  def writeFull(df: DataFrame, keyCol: Column, k: Int, stateDir: String,
      v: Long, table: String): Map[Int, Long] = {
    df.withColumn(BucketCol, bucketOf(keyCol, k))
      .write.partitionBy(BucketCol).mode("overwrite")
      .parquet(s"$stateDir/v$v/$table")
    (0 until k).map(b => b -> v).toMap
  }

  /** Write only the DIRTY buckets of a table at version `v`. `slice` must
    * contain exactly the new content of the dirty buckets (rows whose key
    * hashes elsewhere would corrupt the carry-forward, so this filters to
    * `dirty` defensively — the predicate is on the already-computed bucket
    * column and costs nothing). Returns the table's new manifest: dirty
    * buckets -> v, everything else carried from `prev`. */
  def writeDelta(slice: DataFrame, keyCol: Column, k: Int, stateDir: String,
      v: Long, table: String, dirty: Seq[Int],
      prev: Map[Int, Long]): Map[Int, Long] = {
    val ds = dirty.distinct
    if (ds.nonEmpty)
      slice.withColumn(BucketCol, bucketOf(keyCol, k))
        .filter(col(BucketCol).isin(ds.map(Integer.valueOf): _*))
        .write.partitionBy(BucketCol).mode("overwrite")
        .parquet(s"$stateDir/v$v/$table")
    prev ++ ds.map(b => b -> v)
  }

  /** Collect the distinct bucket ids of a (small, cone-sized) key frame —
    * the dirty-bucket set a delta commit rewrites. */
  def dirtyBuckets(keys: DataFrame, keyCol: Column, k: Int): Seq[Int] =
    keys.select(bucketOf(keyCol, k).as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  // ---------------- retention ----------------

  /** Delete the (uncommitted) version dir if a previous crashed attempt
    * left a torn one — called at the top of every batch recompute. */
  def clearVersion(stateDir: String, v: Long): Unit = {
    val p = java.nio.file.Paths.get(stateDir, s"v$v")
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
  }

  /** Manifest-aware retention, run after the pointer commits to
    * `committed`: a bucket dir is live iff the committed manifest — or the
    * predecessor's, the one-commit grace for in-flight lazy readers —
    * still maps that bucket to that version. Dead bucket dirs are swept
    * bucket-granularly; version dirs left with no live buckets (and that
    * are not the committed/grace versions themselves) are removed whole.
    * Best-effort, like the pre-delta prune: a crash mid-sweep leaves only
    * transient extra files for the next committed batch's sweep. */
  def prune(stateDir: String, committed: Long): Unit = {
    def tryManifest(v: Long): Manifest =
      try readManifest(stateDir, v) catch { case _: Exception => Map.empty }
    val live: Set[(Long, String, Int)] =
      (tryManifest(committed).toSeq ++ tryManifest(committed - 1).toSeq)
        .flatMap { case (t, bs) => bs.map { case (b, o) => (o, t, b) } }
        .toSet
    val dir = java.nio.file.Paths.get(stateDir)
    val versions = scala.collection.mutable.Buffer.empty[Long]
    val ls = java.nio.file.Files.list(dir)
    try {
      val it = ls.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("v")) n.drop(1).toLongOption.foreach(versions += _)
      }
    } finally ls.close()
    def rmTree(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    versions.filter(_ < committed - 1).foreach { v =>
      val vdir = java.nio.file.Paths.get(stateDir, s"v$v")
      if (!live.exists(_._1 == v)) rmTree(vdir)
      else {
        // referenced version: sweep only its dead bucket dirs. Tables can
        // be nested ("hist/i=3"), so find every `__sb=k` dir recursively
        // and name its table by the path between the version dir and the
        // bucket component.
        val dead = scala.collection.mutable.Buffer.empty[java.nio.file.Path]
        val walk = java.nio.file.Files.walk(vdir)
        try walk.forEach { p =>
          val n = p.getFileName.toString
          if (java.nio.file.Files.isDirectory(p) &&
              n.startsWith(s"$BucketCol=")) {
            val t = vdir.relativize(p.getParent).toString
              .replace(java.io.File.separatorChar, '/')
            val b = n.stripPrefix(s"$BucketCol=").toIntOption
            if (b.exists(bb => !live((v, t, bb)))) dead += p
          }
        } finally walk.close()
        dead.foreach(rmTree)
      }
    }
  }
}
