package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graph.GraphViews
import graft.store.{GraphStore, PointReader}

/** Micro-profile of the driver-side point-read path (r18): attributes
  * per-lookup cost to its phases by differencing three passes over the
  * same id set —
  *
  *   cold:      fresh reader, cold page-index cache, cold OS page cache
  *   warm:      SAME reader again — page index + OS cache hot; measures
  *              readFilteredRowGroup + record assembly only
  *   indexcold: FRESH reader, OS cache hot — adds back the per-row-group
  *              column/offset-index reads
  *
  * (cold − indexcold) ≈ OS page-cache misses; (indexcold − warm) ≈ index
  * reads; warm ≈ decode+assembly. Usage:
  *   SPARK_GRAFT_SF_DIR=target/sf10 sbt "runMain graft.tools.PointProfile"
  */
object PointProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_POINT_N", "300").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, n) finally spark.stop()
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def run(spark: SparkSession, sfDir: String, n: Int): Unit = {
    val dir = graft.core.Scratch.dir("graft_point_profile_", sfDir)
    val twinsPath = new org.apache.hadoop.fs.Path(s"$dir/twins")
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = twinsPath.getFileSystem(hc)
    if (!fs.exists(twinsPath)) {
      val g = GraphViews.graph(spark, sfDir)
      GraphStore.write(graft.graph.TwinGraph(
        GraphViews.storeCanonicalTwins(g.twins),
        GraphViews.storeCanonicalRels(g.relationships),
        g.models), dir)
    }
    val total = spark.read.parquet(s"$dir/twins").count()
    val ids = (0 until n).map(i => s"C${1 + i.toLong * (total / (n + 7))}")
      .toArray

    def pass(reader: PointReader): (Int, Double) =
      timed(ids.count(id => reader.lookup(Seq(id)).nonEmpty))

    val r1 = new PointReader(hc, s"$dir/twins", Seq("dt_id"), "properties")
    val (hits1, cold) = pass(r1)
    val (hits2, warm) = pass(r1) // same reader: index + OS cache hot
    r1.close()
    val r2 = new PointReader(hc, s"$dir/twins", Seq("dt_id"), "properties")
    val (hits3, indexCold) = pass(r2) // fresh reader, OS cache hot
    r2.close()
    // r19: fresh reader that PRELOADS page indexes at construction — the
    // serving-store default. Preload cost is reported separately; the
    // pass itself should land at warm-rate (index phase amortized).
    val r3 = new PointReader(hc, s"$dir/twins", Seq("dt_id"), "properties")
    val (_, preloadSec) = timed(r3.preloadPageIndexes())
    val (hits4, preloaded) = pass(r3)
    r3.close()
    println(s"""{"tool":"point_profile","sf_dir":"$sfDir","rows":$total,""" +
      s""""lookups":$n,"hits":[$hits1,$hits2,$hits3,$hits4],""" +
      s""""cold_sec":${f"$cold%.2f"},"warm_sec":${f"$warm%.2f"},""" +
      s""""indexcold_sec":${f"$indexCold%.2f"},""" +
      s""""preload_sec":${f"$preloadSec%.3f"},""" +
      s""""preloaded_sec":${f"$preloaded%.2f"},""" +
      s""""cold_per_sec":${f"${n / cold}%.0f"},""" +
      s""""warm_per_sec":${f"${n / warm}%.0f"},""" +
      s""""indexcold_per_sec":${f"${n / indexCold}%.0f"},""" +
      s""""preloaded_per_sec":${f"${n / preloaded}%.0f"},""" +
      s""""est_os_miss_ms":${f"${(cold - indexCold) * 1000 / n}%.2f"},""" +
      s""""est_index_ms":${f"${(indexCold - warm) * 1000 / n}%.2f"},""" +
      s""""est_decode_ms":${f"${warm * 1000 / n}%.2f"}}""")
  }
}
