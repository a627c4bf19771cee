package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * Image and audio metadata decoding is REAL, from JDK built-ins — no
  * external codec library needed: `javax.imageio.ImageIO` reads PNG /
  * JPEG / BMP / GIF / WBMP headers (width × height × format, header-only,
  * no pixel decode), `javax.sound.sampled.AudioSystem` reads WAV / AIFF /
  * AU headers (frame count, sample rate, channels). Video remains the one
  * honest STUB (`decodeStub`, deterministic pseudo-metadata — the JDK
  * ships no video demuxer; JavaCV on a cluster classpath drops in by
  * replacing that one function). The Spark-side plumbing — binary column,
  * per-partition batch iteration (the Scala analogue of `mapInPandas`
  * batch shape), explicit output schema, partition-count control — is the
  * same for all three.
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

  /** STUB decoder for video/unknown payloads — deterministic
    * pseudo-metadata from leading bytes (the JDK has no video demuxer). */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0)
    else {
      val b0 = bytes(0) & 0xff
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      (320 + b0 % 320, 240 + b1 % 240, bytes.length % 30 + 1)
    }
  }

  /** REAL image metadata via ImageIO: (width, height, format), read from
    * the header only — `reader.getWidth(0)` never decodes pixel data, so
    * this runs at header speed over a 100 TB image corpus. Handles every
    * format the JDK registers readers for (PNG, JPEG, BMP, GIF, WBMP). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** REAL audio metadata via AudioSystem: (frame count, sample rate,
    * channels) from the container header (WAV, AIFF, AU). */
  def decodeAudio(bytes: Array[Byte]): Option[(Long, Float, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try Some((in.getFrameLength, in.getFormat.getSampleRate,
        in.getFormat.getChannels))
      finally in.close()
    } catch { case _: Exception => None }
  }

  /** Dispatch on declared media type: image/audio decode for real through
    * the JDK; video and text fall to the deterministic stub. Images
    * report n_frames=1; audio reports its frame count with no spatial
    * dims. Undecodable payloads of a real type report zeros (corrupt
    * media must not kill a 100 TB scan). */
  def decodeAny(bytes: Array[Byte], mediaType: String): (Int, Int, Int) =
    mediaType match {
      case t if t != null && t.startsWith("image/") =>
        decodeImage(bytes).map { case (w, h, _) => (w, h, 1) }
          .getOrElse((0, 0, 0))
      case t if t != null && t.startsWith("audio/") =>
        decodeAudio(bytes).map { case (f, _, _) => (0, 0, f.toInt) }
          .getOrElse((0, 0, 0))
      case _ => decodeStub(bytes)
    }

  /** Batch decode: per-partition iteration over binary payloads with an
    * explicit output schema — the shape a real frame-sampler / feature
    * extractor plugs into. Uses the `media_type` column for codec
    * dispatch when present. */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val withType =
      if (media.columns.contains("media_type"))
        media.select(col("media_id"), col("content"), col("media_type"))
      else media.select(col("media_id"), col("content"),
        lit(null).cast(StringType).as("media_type"))
    val rows = withType.rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, f) = decodeAny(bytes, r.getAs[String](2))
          Row(id, w, h, f, if (bytes == null) 0L else bytes.length.toLong)
        }
      }
    spark.createDataFrame(rows, decodedSchema)
  }

  /** Deterministic PNG fixture: w×h RGB gradient, ImageIO-encoded — used
    * by the codec gate and specs (TESTDATA ships no binary columns). */
  def pngFixture(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic WAV fixture: nFrames of 8-bit mono PCM. */
  def wavFixture(nFrames: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 8, 1, false, false)
    val pcm = Array.tabulate[Byte](nFrames)(i => ((i * 7) % 256 - 128).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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

  /** 64-bit average-hash (aHash) perceptual fingerprint over REAL decoded
    * pixels — the image-side analogue of SimHash for near-duplicate
    * screening of an image corpus: re-encodes, minor recompression, and
    * small edits move few bits, so Hamming distance ranks perceptual
    * similarity. The pixel decode is genuine (`ImageIO.read`, every
    * JDK-registered format); the hash arithmetic is pure integers —
    * Rec.601 luma in milli-units (`299·R + 587·G + 114·B`), an 8×8 block
    * grid with pixel→block mapping `bi = x·8/w`, and bit `i` set iff
    * block mean > global mean compared by exact cross-multiplication
    * (BigInt, so a gigapixel image cannot overflow) — so the same pixels
    * hash identically on any engine. Bit layout: block (bi, bj) → bit
    * `bj·8+bi`. Images smaller than the 8×8 grid (or undecodable
    * payloads) yield None. */
  def aHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) return None
      val w = img.getWidth; val h = img.getHeight
      val bs = new Array[Long](64); val bc = new Array[Long](64)
      var y = 0
      while (y < h) {
        val bj = y * 8 / h
        var x = 0
        while (x < w) {
          val v = img.getRGB(x, y)
          val gray = ((v >> 16) & 0xff) * 299L + ((v >> 8) & 0xff) * 587L +
            (v & 0xff) * 114L
          val idx = bj * 8 + x * 8 / w
          bs(idx) += gray; bc(idx) += 1
          x += 1
        }
        y += 1
      }
      val ts = BigInt(bs.sum); val tc = BigInt(w.toLong * h)
      var hash = 0L; var i = 0
      while (i < 64) {
        if (BigInt(bs(i)) * tc > ts * BigInt(bc(i))) hash |= 1L << i
        i += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
  }

  /** 64-bit difference-hash (dHash) perceptual fingerprint — the
    * standard complement to [[aHash64]]: a 9×8 grid of block means
    * (`ci = x·9/w`, `rj = y·8/h`) and bit `rj·8+ci` set iff block
    * (ci, rj) is brighter than its RIGHT neighbor (ci+1, rj), compared
    * by exact cross-multiplication. Because every comparison is LOCAL,
    * dHash is robust exactly where aHash is brittle: on smooth-gradient
    * images whose block means all hug the global mean, a small edit
    * flips many aHash bits (each is mean-relative) but only the dHash
    * bits of blocks the edit touches. Same decode path, same integer
    * contract; images narrower than 9 or shorter than 8 yield None. */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 9 || img.getHeight < 8) return None
      val w = img.getWidth; val h = img.getHeight
      val bs = Array.ofDim[Long](8, 9); val bc = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val rj = y * 8 / h
        var x = 0
        while (x < w) {
          val v = img.getRGB(x, y)
          val gray = ((v >> 16) & 0xff) * 299L + ((v >> 8) & 0xff) * 587L +
            (v & 0xff) * 114L
          val ci = x * 9 / w
          bs(rj)(ci) += gray; bc(rj)(ci) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var rj = 0
      while (rj < 8) {
        var ci = 0
        while (ci < 8) {
          if (BigInt(bs(rj)(ci)) * BigInt(bc(rj)(ci + 1)) >
              BigInt(bs(rj)(ci + 1)) * BigInt(bc(rj)(ci)))
            hash |= 1L << (rj * 8 + ci)
          ci += 1
        }
        rj += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
  }

  /** Batch difference-hashing: (media_id, phash) — same shape and NULL
    * degradation as [[perceptualHash]]; feed to [[hashNearDup]]. */
  def differenceHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("content")).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0),
          dHash64(r.getAs[Array[Byte]](1)).map(Long.box).orNull)
      })
    spark.createDataFrame(rows, phashSchema)
  }

  /** 64-bit audio energy fingerprint over REAL decoded PCM — the audio
    * analogue of [[aHash64]]: the stream decodes through
    * `AudioSystem.getAudioInputStream` (WAV/AIFF/AU, 8- or 16-bit PCM),
    * frames fold into 64 time windows (`w = frame·64/n`), each window's
    * summed amplitude deviation compares against the global mean by
    * exact cross-multiplication, and bit `w` is set iff the window is
    * louder than average. Re-containering and constant-gain-preserving
    * edits keep bits stable; silence insertion and re-cuts move few.
    * Multi-channel frames sum |deviation| across channels (no division —
    * stays integer). Streams shorter than 64 frames, non-PCM encodings,
    * and undecodable payloads yield None. */
  def audioHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed &&
            enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          return None
        val bits = fmt.getSampleSizeInBits
        if (bits != 8 && bits != 16) return None
        val ch = fmt.getChannels
        val frameBytes = (bits / 8) * ch
        val data = in.readAllBytes()
        val n = data.length / frameBytes
        if (n < 64) return None
        val ws = new Array[Long](64); val wc = new Array[Long](64)
        var f = 0
        while (f < n) {
          val w = (f.toLong * 64 / n).toInt
          var amp = 0L
          var c = 0
          while (c < ch) {
            val off = f * frameBytes + c * (bits / 8)
            val dev =
              if (bits == 8) {
                val u = data(off) & 0xff
                if (signed) math.abs(data(off).toLong) else math.abs(u - 128L)
              } else {
                val lo = data(off) & 0xff; val hi = data(off + 1) & 0xff
                val raw = if (fmt.isBigEndian) (data(off) << 8) | hi
                  else (data(off + 1) << 8) | lo
                if (signed) math.abs(raw.toLong)
                else math.abs(((raw & 0xffff).toLong) - 32768L)
              }
            amp += dev
            c += 1
          }
          ws(w) += amp; wc(w) += 1
          f += 1
        }
        val ts = BigInt(ws.sum); val tc = BigInt(n)
        var hash = 0L; var i = 0
        while (i < 64) {
          if (BigInt(ws(i)) * tc > ts * BigInt(wc(i))) hash |= 1L << i
          i += 1
        }
        Some(hash)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Batch audio fingerprinting: (media_id, phash) — same shape and
    * NULL degradation as [[perceptualHash]]; feed to [[hashNearDup]]. */
  def audioHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("content")).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0),
          audioHash64(r.getAs[Array[Byte]](1)).map(Long.box).orNull)
      })
    spark.createDataFrame(rows, phashSchema)
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType)))

  /** Batch perceptual hashing: (media_id, phash) with NULL for
    * undecodable/too-small payloads; same per-partition batch shape as
    * [[decode]] — scan-speed over an image corpus, no shuffle. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("content")).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0),
          aHash64(r.getAs[Array[Byte]](1)).map(Long.box).orNull)
      })
    spark.createDataFrame(rows, phashSchema)
  }

  /** Perceptual near-duplicate pairs over image payloads: [[aHash64]]
    * then [[hashNearDup]]. */
  def phashNearDup(media: DataFrame, maxHamming: Int = 2): DataFrame =
    hashNearDup(perceptualHash(media), maxHamming)

  /** Near-duplicate pairs for ANY 64-bit fingerprint table
    * (media_id, phash) by banded Hamming LSH: the 64-bit hash splits
    * into `maxHamming + 1` contiguous bit bands, so any pair within the
    * Hamming budget collides on at least one intact band (pigeonhole —
    * the same recall argument as MinHash banding), the band-equality
    * equi-join proposes candidates, and an exact `bit_count(a XOR b)`
    * verify keeps precision. No all-pairs stage: cost is
    * O(corpus + collisions), the banded-dedup discipline of [[Dedup]].
    * Output (id_a, id_b, hamming), id_a < id_b, distinct. */
  def hashNearDup(fingerprints: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15], got $maxHamming")
    val bands = maxHamming + 1
    val hashed = fingerprints.filter(col("phash").isNotNull)
    val banded = hashed.select(col("media_id"), col("phash"),
      explode(array((0 until bands).map { b =>
        val lo = b * 64 / bands; val hi = (b + 1) * 64 / bands
        struct(lit(b).as("band"),
          // sign-safe: unsigned shift then mask to the band's width
          shiftrightunsigned(col("phash"), lo)
            .bitwiseAND(lit(if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1))
            .as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("media_id").as("id_a"), col("phash").as("ph_a"))
    val b = banded.select(col("band"), col("key"),
      col("media_id").as("id_b"), col("phash").as("ph_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(ph_a ^ ph_b)").cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
