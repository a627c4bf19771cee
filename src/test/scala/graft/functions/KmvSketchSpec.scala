package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  import KmvSketch._

  test("aggregator state: sorted, distinct, bounded, order-insensitive") {
    val agg = Kmv(4)
    // duplicates collapse, inserts keep sort order, size caps at k
    def red(b: Seq[Long], h: Long): Seq[Long] = agg.reduce(b, Long.box(h))
    val b = Seq(50L, 10L, 30L, 10L, 90L, 20L, 5L).foldLeft(agg.zero)(red)
    assert(b == Vector(5L, 10L, 20L, 30L))
    // null input rows are skipped, like every SQL aggregate
    assert(agg.reduce(b, null) == b)
    // merge = union-and-trim; commutative
    val c = Seq(1L, 60L, 25L).foldLeft(agg.zero)(red)
    assert(agg.merge(b, c) == agg.merge(c, b))
    assert(agg.merge(b, c) == Vector(1L, 5L, 10L, 20L))
  }

  test("estimate: exact below k, within 15% above it") {
    assert(estimate(Vector(7L, 9L), k = 4) == 2.0, "undersaturated = exact")
    // degenerate full sketch whose k-th minimum is 0 must not divide to
    // Infinity — it reports "at least k distinct"
    assert(estimate(Vector(0L, 0L), k = 2) == 2.0)
    assert(!estimate(Vector(0L, 0L), k = 2).isInfinity)
    // 5000 distinct values through the DataFrame aggregate with k=64
    val df = (1 to 5000).toDF("v")
      .select(graft.pipeline.TextAnalysis.stableId(col("v").cast("string")).as("h"))
      .agg(kmv(64)(col("h")).as("sk"))
    val sk = df.collect()(0).getSeq[Long](0)
    assert(sk.size == 64 && sk == sk.sorted && sk.distinct.size == 64)
    val est = estimate(sk, 64)
    assert(math.abs(est - 5000) / 5000.0 < 0.15, s"estimate $est vs 5000")
  }

  test("sketch state is identical regardless of partitioning") {
    def sketchOf(parts: Int): Seq[Long] =
      (1 to 1000).toDF("v").repartition(parts)
        .select(graft.pipeline.TextAnalysis.stableId(col("v").cast("string")).as("h"))
        .agg(kmv(16)(col("h"))).collect()(0).getSeq[Long](0)
    assert(sketchOf(1) == sketchOf(7), "merge order must not matter")
  }
}
