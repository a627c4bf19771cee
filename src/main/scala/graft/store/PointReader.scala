package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser

/** Driver-side point-read path over a pinned snapshot (r17, VERDICT #3):
  * serve `getTwin`/`getRelationship` fault-ins WITHOUT a Spark job.
  *
  * The reference serves light reads at wire speed off PostgreSQL's btree
  * (`performance.mdx:28` targets ~100 req/s); the Spark-job fault-in is
  * flat but scheduler-bound (~77 ms/lookup at sf10 — ~13 req/s). This
  * reader recovers the btree-like path from the columnar layout that
  * [[GraphStore.write]] already produces (files sorted by the key):
  *
  *  - at construction it reads each parquet FOOTER once and caches it
  *    with the file-level [min, max] of the lookup key — O(files) driver
  *    memory, no data pages touched, and no per-lookup footer re-parse
  *    (the dominant fixed cost of a naive ParquetReader per call);
  *  - a lookup prunes to the files whose range covers the key (usually
  *    one, since files are key-sorted), re-opens just the data stream
  *    against the cached footer, and reads with a parquet record filter:
  *    row-group statistics and the column index prune inside the file,
  *    so only the page(s) holding the key are decompressed.
  *
  * The reader is tied to one immutable snapshot directory;
  * [[TableTwinStore]] keys it by snapshot version, so a checkpoint/import
  * that moves the snapshot pointer builds a fresh reader (spec-asserted
  * invalidation). Lookups open independent streams — safe concurrently.
  */
final class PointReader(conf: Configuration, dir: String,
    keyCols: Seq[String], valueCol: String) {

  private case class FileEntry(path: Path, min: String, max: String,
      input: HadoopInputFile, footer: ParquetMetadata)

  /** Cached footers + file-level ranges of the PRIMARY key column
    * (keyCols.head), from row-group statistics. Files with no stats are
    * kept with an open range so correctness never depends on them. */
  private val files: Seq[FileEntry] = {
    val fs = new Path(dir).getFileSystem(conf)
    val root = new Path(dir)
    if (!fs.exists(root)) Seq.empty
    else {
      val paths = collection.mutable.ArrayBuffer[Path]()
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) paths += f.getPath
      }
      paths.map { p =>
        val input = HadoopInputFile.fromPath(p, conf)
        val reader = ParquetFileReader.open(input)
        try {
          val footer = reader.getFooter
          var min: String = null
          var max: String = null
          val bi = footer.getBlocks.iterator()
          while (bi.hasNext) {
            val b = bi.next()
            val ci = b.getColumns.iterator()
            while (ci.hasNext) {
              val c = ci.next()
              if (c.getPath.toDotString == keyCols.head) {
                val st = c.getStatistics
                if (st != null && st.hasNonNullValue) {
                  val lo = st.genericGetMin match {
                    case b: Binary => b.toStringUsingUTF8
                    case other => String.valueOf(other)
                  }
                  val hi = st.genericGetMax match {
                    case b: Binary => b.toStringUsingUTF8
                    case other => String.valueOf(other)
                  }
                  if (min == null || lo < min) min = lo
                  if (max == null || hi > max) max = hi
                }
              }
            }
          }
          FileEntry(p, min, max, input, footer)
        } finally reader.close()
      }.toSeq
    }
  }

  private val projection = MessageTypeParser.parseMessageType(
    s"message point {\n" +
      (keyCols :+ valueCol).map(c => s"  optional binary $c (UTF8);")
        .mkString("\n") + "\n}")

  /** How many files a lookup for `key` must open (probe for specs). */
  def candidateFiles(key: String): Int =
    files.count(f => f.min == null || (f.min <= key && key <= f.max))

  /** All `valueCol` strings whose row matches every (keyCol = value)
    * equality. Composite keys filter on all columns; file pruning uses
    * the primary column's footer range. */
  def lookup(keyValues: Seq[String]): Seq[String] = {
    require(keyValues.length == keyCols.length,
      s"expected ${keyCols.length} key values, got ${keyValues.length}")
    read(keyCols.zip(keyValues))
  }

  /** All rows matching the PRIMARY key column alone — the sorted-layout
    * prefix scan (e.g. every relationship of one source). */
  def scanFirst(key0: String): Seq[String] =
    read(Seq(keyCols.head -> key0))

  private def read(pairs: Seq[(String, String)]): Seq[String] = {
    val k0 = pairs.head._2
    val candidates = files.filter(f => f.min == null ||
      (f.min <= k0 && k0 <= f.max))
    if (candidates.isEmpty) return Seq.empty
    val pred = pairs
      .map[org.apache.parquet.filter2.predicate.FilterPredicate] {
        case (c, v) =>
          FilterApi.eq(FilterApi.binaryColumn(c), Binary.fromString(v))
      }.reduce((a, b) => FilterApi.and(a, b))
    val filter = FilterCompat.get(pred)
    val out = collection.mutable.ArrayBuffer[String]()
    candidates.foreach { fe =>
      val opts = HadoopReadOptions.builder(conf, fe.path)
        .withRecordFilter(filter)
        .build()
      // re-open only the DATA stream against the cached footer: the
      // thrift footer decode (the per-call fixed cost) happened once at
      // construction; row groups are then stats-filtered and pages
      // column-index-filtered before any decompression
      val reader = ParquetFileReader.open(fe.input, fe.footer, opts,
        fe.input.newStream())
      try {
        reader.setRequestedSchema(projection)
        val columnIO = new ColumnIOFactory()
          .getColumnIO(projection, fe.footer.getFileMetaData.getSchema)
        var pages = reader.readNextFilteredRowGroup()
        while (pages != null) {
          val rr = columnIO.getRecordReader(pages,
            new GroupRecordConverter(projection), filter)
          val n = pages.getRowCount
          var i = 0L
          while (i < n) {
            val g = rr.read()
            if (g != null && !rr.shouldSkipCurrentRecord &&
                g.getFieldRepetitionCount(valueCol) > 0)
              out += g.getString(valueCol, 0)
            i += 1
          }
          pages = reader.readNextFilteredRowGroup()
        }
      } finally reader.close()
    }
    out.toSeq
  }
}
