package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Td
import graft.pipeline.{Dedup, TextAnalysis}

/** The one dev profiling entry point (query timing, stage timing, plan
  * dumps) — consolidated from the former ProfileQuery/Profile/CompProfile/
  * Explain mains so the tool surface can't drift.
  *
  * Usage (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS):
  *   sbt "runMain graft.tools.Profile query q_dedup_recall q_b3_filter"
  *   sbt "runMain graft.tools.Profile explain q_b5_multi_join"
  *   sbt "runMain graft.tools.Profile stages"      # dedup pipeline stages
  *   sbt "runMain graft.tools.Profile components"  # LSH pairs → components
  */
object Profile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.toList match {
      case "query" :: names if names.nonEmpty => names.foreach(query(spark, sfDir, reps, _))
      case "explain" :: names if names.nonEmpty => names.foreach(explain(spark, sfDir, _))
      case "stages" :: _ => stages(spark, sfDir)
      case "components" :: _ => components(spark, sfDir)
      case other =>
        System.err.println(
          s"""usage: Profile query <name>... | explain <name>... | stages | components
             |got: ${other.mkString(" ")}""".stripMargin)
        sys.exit(2)
    } finally spark.stop()
  }

  private def dropState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Best-of-N timing of one SparkEntry query, without the full Bench. */
  private def query(spark: SparkSession, sfDir: String, reps: Int,
      name: String): Unit = {
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      dropState(spark)
      t
    }
    println(f"[profile] $name best=${times.min}%.3f " +
      s"all=${times.map(t => f"$t%.2f").mkString(",")}")
  }

  /** Formatted physical plan of one SparkEntry query. */
  private def explain(spark: SparkSession, sfDir: String, name: String): Unit = {
    println(s"========== $name ==========")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
  }

  private def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  /** Stage-level timing of the dedup pipeline building blocks. */
  private def stages(spark: SparkSession, sfDir: String): Unit = {
    val docs = Td.documents(spark, sfDir)
    def count(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      timed(name)(println(s"  rows=${df.count()}"))
    count("docs scan")(docs)
    count("tokens explode")(docs.select(explode(TextAnalysis.tokens(col("text")))))
    count("shingleSet explode")(
      docs.select(explode(TextAnalysis.shingleSet(col("text"), 3))))
    count("shingleIds (md5+conv)")(Dedup.shingleIds(docs, "doc_id", "text", 3))
    count("minhash sigs 64 (wide)")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64))
    count("simhash")(Dedup.simhash(docs, "doc_id", "text", 3))
    count("jaccard pairs e2e")(
      Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.5, 100))
    count("minhash pairs e2e")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5))
    dropState(spark)
    count("minhash pairs COLD")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5))
  }

  /** LSH pairs → connected components, stage-timed. */
  private def components(spark: SparkSession, sfDir: String): Unit = {
    val docs = Td.documents(spark, sfDir)
    val pairs = timed("pairs (minhash)") {
      val p = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
        .persist()
      println(s"  n_pairs = ${p.count()}")
      p
    }
    timed("components")(
      println(s"  rows = ${Dedup.components(pairs).count()}"))
  }
}
