package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("zkey2 interleaves bits: a at even positions, b at odd") {
    // a=0b101, b=0b011 → bits 0,4 from a; bits 1,3 from b → 0b011011 = 27
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zkey2(col("a"), col("b"), bits = 3).as("z"))
      .as[Long].collect()(0)
    assert(r == 27L, s"got $r")
    // identity checks: zero interleaves to zero; single-bit placement
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (2L, 0L), (0L, 2L))
      .toDF("a", "b")
      .select(ZOrder.zkey2(col("a"), col("b"), bits = 4).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(0L, 1L, 2L, 4L, 8L), s"got $rows")
  }

  test("zkey2Sql is the same function (evaluated by Spark SQL)") {
    val df = Seq((12345L, 54321L), (7L, 65535L), (65535L, 0L))
      .toDF("a", "b")
    val mismatches = df
      .withColumn("z_col", ZOrder.zkey2(col("a"), col("b")))
      .withColumn("z_sql", expr(ZOrder.zkey2Sql("a", "b")))
      .filter(col("z_col") =!= col("z_sql")).count()
    assert(mismatches == 0)
  }

  test("z-sorted ranges bound both dimensions (the file-skipping property)") {
    // 16x16 grid; cut the z-sorted order into 16 equal files: every file's
    // (a, b) bounding box must stay a small rectangle, never a full row
    // or column span on both axes at once
    val grid = (for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val ranked = grid.withColumn("z", ZOrder.zkey2(col("a"), col("b"), 4))
      .orderBy(col("z")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val spans = ranked.grouped(16).map { file =>
      val (as, bs) = file.unzip
      (as.max - as.min) * (bs.max - bs.min)
    }.toSeq
    // each 16-cell Z-curve segment covers at most a few 4x4-ish tiles;
    // a row-major sort would give area 0 on one axis but 15x on scans of
    // the other — the z areas stay uniformly small
    assert(spans.forall(_ <= 9L), s"file bounding areas: $spans")
  }

  test("zkeyN: n=2 agrees with zkey2; n=3 interleaves round-robin and bounds cubes") {
    // n=2 parity: the general form must reproduce the fixed-shape key
    val pairs = Seq((12345L, 54321L), (7L, 65535L), (65535L, 0L), (0L, 0L))
      .toDF("a", "b")
    assert(pairs.filter(ZOrder.zkeyN(Seq(col("a"), col("b")), 16)
      =!= ZOrder.zkey2(col("a"), col("b"), 16)).count() == 0)
    // n=3 bit placement: a=1 -> bit 0, b=1 -> bit 1, c=1 -> bit 2,
    // a=2 -> bit 3 (second bit of a lands at 1*3+0)
    val placed = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (2L, 0L, 0L))
      .toDF("a", "b", "c")
      .select(ZOrder.zkeyN(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .as[Long].collect().toSeq
    assert(placed == Seq(1L, 2L, 4L, 8L), s"got $placed")
    // locality in 3 dims: 8x8x8 cube cut into 16 z-sorted files — every
    // file's bounding VOLUME stays a small box, never a full slab
    val cube = (for (a <- 0 until 8; b <- 0 until 8; c <- 0 until 8)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    val ranked = cube
      .withColumn("z", ZOrder.zkeyN(Seq(col("a"), col("b"), col("c")), 3))
      .orderBy(col("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vols = ranked.grouped(32).map { file =>
      val as = file.map(_._1); val bs = file.map(_._2); val cs = file.map(_._3)
      (as.max - as.min + 1) * (bs.max - bs.min + 1) * (cs.max - cs.min + 1)
    }.toSeq
    // a 32-cell curve segment spans ~a 4x4x2 box (vol 32-64); a
    // single-column sort would span full 8x8 slabs (vol 256+)
    assert(vols.forall(_ <= 64L), s"file bounding volumes: $vols")
  }

  test("writeClustered: a square predicate touches few files vs hash layout") {
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val zdir = java.nio.file.Files.createTempDirectory("graft-zc").toString
    ZOrder.writeClustered(grid, "a", "b", zdir, numFiles = 16, bits = 6)
    val hdir = java.nio.file.Files.createTempDirectory("graft-zr").toString
    grid.repartition(16).write.mode("overwrite").parquet(hdir)
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("a").between(8, 15) && col("b").between(8, 15))
        .select(input_file_name()).distinct().count()
    // the 8x8 square [8,15]^2 is ONE aligned Z-block: a contiguous run of
    // 64 keys out of 4096 → at most 2 of the 16 range files hold it; the
    // hash layout scatters the same 64 rows over nearly every file
    val z = filesTouched(zdir)
    val h = filesTouched(hdir)
    assert(z <= 2L, s"z-clustered layout touched $z files")
    assert(h >= 8L, s"hash layout unexpectedly clustered: $h files")
    // the layout is a permutation, not a transformation
    assert(spark.read.parquet(zdir).count() == 4096L)
  }
}
