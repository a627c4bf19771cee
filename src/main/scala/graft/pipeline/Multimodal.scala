package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing is real — binary column, per-partition batch
  * iteration (the Scala analogue of `mapInPandas` batch shape), explicit
  * output schema, partition-count control — while the actual codec is a
  * STUB (this container ships no image/audio libraries): `decodeStub`
  * derives deterministic pseudo-metadata from the bytes, so the pipeline
  * shape is testable end-to-end and a real decoder (JavaCV / TwelveMonkeys
  * on the cluster classpath) drops in by replacing one function.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("media_type", StringType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_bytes", LongType)))

  /** STUB decoder — deterministic pseudo-metadata from leading bytes.
    * Replace with a real codec for production. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0)
    else {
      val b0 = bytes(0) & 0xff
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      (320 + b0 % 320, 240 + b1 % 240, bytes.length % 30 + 1)
    }
  }

  /** Batch "decode": per-partition iteration over binary payloads with an
    * explicit output schema — the shape a real frame-sampler / feature
    * extractor plugs into. */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("content")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, f) = decodeStub(bytes)
          Row(id, w, h, f, if (bytes == null) 0L else bytes.length.toLong)
        }
      }
    spark.createDataFrame(rows, decodedSchema)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType)))

  /** STUB resize — deterministically truncates/cycles the payload to
    * w*h/64 bytes so output size tracks the requested resolution. A real
    * image scaler replaces this one function. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) Array.emptyByteArray
    else Array.tabulate(math.max(w * h / 64, 1))(i => bytes(i % bytes.length))
  }

  /** Batch resize: binary → binary with target dimensions carried as typed
    * metadata; same per-partition batch shape as [[decode]]. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("content")).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0), resizeStub(r.getAs[Array[Byte]](1), w, h), w, h)
      })
    spark.createDataFrame(rows, resizedSchema)
  }

  /** Frame sampling: one output row per kept frame (every `everyN`-th of
    * the container's frames, frame count from the decode step). The fan-out
    * happens inside the partition iterator — no driver involvement, no
    * shuffle; a 100 TB video corpus becomes a frame corpus at scan speed. */
  def frameSample(media: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("content")).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (_, _, nFrames) = decodeStub(bytes)
        // STUB frame extraction: a deterministic byte slice per frame
        (0 until nFrames by everyN).iterator.map { f =>
          val start = if (bytes == null || bytes.isEmpty) 0 else f % bytes.length
          val frame =
            if (bytes == null || bytes.isEmpty) Array.emptyByteArray
            else bytes.slice(start, math.min(start + 16, bytes.length))
          Row(id, f, frame)
        }
      })
    spark.createDataFrame(rows, frameSchema)
  }

  /** Documents-as-media view: utf-8 text bytes standing in for image
    * payloads (TESTDATA ships no binary columns). */
  def documentsAsMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      lit("text/plain").as("media_type"))

  /** Deterministic fake feature vector (8 dims) from byte statistics —
    * stands in for an embedding model; keeps partitioning/schema real. */
  def features(media: DataFrame, dims: Int = 8): DataFrame = {
    val bytesCol = col("content")
    val idxs = sequence(lit(0), lit(dims - 1))
    media.select(col("media_id"),
      transform(idxs, i =>
        (crc32(concat(bytesCol, i.cast("string").cast("binary"))) % 1000)
          .cast("double") / 1000.0).as("feature"))
  }
}
