package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Td
import graft.pipeline.{Dedup, TextAnalysis}

/** Stage-level profiler for the dedup pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Td.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("docs scan")(docs.count())
    time("tokens explode")(
      docs.select(explode(TextAnalysis.tokens(col("text")))).count())
    time("shingleSet explode")(
      docs.select(explode(TextAnalysis.shingleSet(col("text"), 3))).count())
    time("shingleIds (md5+conv)")(
      Dedup.shingleIds(docs, "doc_id", "text", 3).count())
    val ids = Dedup.shingleIds(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("ids persisted count")(ids.count())
    time("minhash sigs 64 (wide)")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64).count())
    time("simhash")(
      Dedup.simhash(docs, "doc_id", "text", 3).count())
    time("jaccard pairs e2e")(
      Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.5, 100).count())
    time("minhash pairs e2e")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count())
    ids.unpersist(blocking = true)
    spark.catalog.clearCache()
    time("minhash pairs COLD")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count())
    spark.catalog.clearCache()
    time("minhash pairs COLD 2nd")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count())
    spark.stop()
  }
}
