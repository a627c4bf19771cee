package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries by name (best of N)
  * without paying for the whole [[Bench]] suite. Usage:
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.ProfileQuery q_dedup_components"` */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        t
      }
      println(f"[profile] $name best=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
