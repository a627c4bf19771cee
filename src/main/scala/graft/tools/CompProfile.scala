package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Td
import graft.pipeline.Dedup

/** Dev tool: stage timing for the dedup-components path. */
object CompProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Td.documents(spark, sfDir)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[comp] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val pairs = time("pairs (minhash)") {
      val p = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
        .persist()
      println(s"[comp] n_pairs = ${p.count()}")
      p
    }
    val comps = time("components")(Dedup.components(pairs))
    time("collect")(println(s"[comp] rows = ${comps.count()}"))
    spark.stop()
  }
}
