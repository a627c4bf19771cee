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

  test("merge of two sketches equals the sketch of the concatenated data") {
    def sketchOf(lo: Int, hi: Int, k: Int): Seq[Long] =
      (lo to hi).toDF("v")
        .select(graft.pipeline.TextAnalysis.stableId(col("v").cast("string")).as("h"))
        .agg(kmv(k)(col("h"))).collect()(0).getSeq[Long](0)
    val whole = sketchOf(1, 3000, 32)
    // overlapping halves: 1..2000 and 1500..3000
    val a = sketchOf(1, 2000, 32)
    val b = sketchOf(1500, 3000, 32)
    val mergedDf = Seq((a, b)).toDF("ska", "skb")
      .select(merge(32)(col("ska"), col("skb")).as("u"))
    val merged = mergedDf.collect()(0).getSeq[Long](0)
    assert(merged == whole, "bottom-k(bottom-k(A) ∪ bottom-k(B)) = bottom-k(A∪B)")
    // commonInMerged counts only hashes present in BOTH sketches
    val nCommon = Seq((a, b)).toDF("ska", "skb")
      .select(commonInMerged(merge(32)(col("ska"), col("skb")),
        col("ska"), col("skb")).as("c")).collect()(0).getLong(0)
    assert(nCommon >= 0 && nCommon <= 32)
    assert(nCommon == merged.count(h => a.contains(h) && b.contains(h)))
  }

  test("jaccard/intersection estimates land near truth on a known overlap") {
    // |A| = 4000 (1..4000), |B| = 4000 (2001..6000), |A∩B| = 2000,
    // |A∪B| = 6000 → J = 1/3
    def sketchOf(lo: Int, hi: Int): Seq[Long] =
      (lo to hi).toDF("v")
        .select(graft.pipeline.TextAnalysis.stableId(col("v").cast("string")).as("h"))
        .agg(kmv(256)(col("h"))).collect()(0).getSeq[Long](0)
    val a = sketchOf(1, 4000)
    val b = sketchOf(2001, 6000)
    val j = jaccardEstimate(a, b, 256)
    assert(math.abs(j - 1.0 / 3) < 0.1, s"jaccard $j vs 1/3")
    val inter = intersectionEstimate(a, b, 256)
    assert(math.abs(inter - 2000) / 2000.0 < 0.3, s"intersection $inter vs 2000")
    // degenerate: disjoint sketches estimate zero overlap
    assert(jaccardEstimate(Seq(1L, 2L), Seq(5L, 6L), 4) == 0.0)
    assert(intersectionEstimate(Seq(1L, 2L), Seq(5L, 6L), 4) == 0.0)
    assert(jaccardEstimate(Nil, Nil, 4) == 0.0)
  }
}
