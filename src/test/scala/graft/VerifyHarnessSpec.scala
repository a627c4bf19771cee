package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The correctness harness itself must fail loudly: a query that throws
  * has to leave a visible FAIL marker in the output directory, never a
  * silent absence (rounds 8-9 shipped all-green artifacts while ten
  * queries errored, because erroring queries simply vanished from the
  * compare). */
class VerifyHarnessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a throwing query writes a _verify_error marker, not an absence") {
    val out = Files.createTempDirectory("verify-harness").toString
    val err = Verify.writeQueryOutput(spark, "/nowhere", out, "q_broken",
      (_, _) => throw new IllegalStateException("deliberately broken"))
    assert(err.exists(_.contains("deliberately broken")))
    val marker = spark.read.parquet(s"$out/q_broken")
    assert(marker.columns.toSeq == Seq("_verify_error"),
      "marker parquet must exist with the error column")
    assert(marker.collect()(0).getString(0).contains("deliberately broken"))
  }

  test("a healthy query writes its rows and reports no error") {
    val out = Files.createTempDirectory("verify-harness").toString
    val err = Verify.writeQueryOutput(spark, "/nowhere", out, "q_ok",
      (s, _) => { import s.implicits._; Seq((1L, "a"), (2L, "b")).toDF("id", "v") })
    assert(err.isEmpty)
    assert(spark.read.parquet(s"$out/q_ok").count() == 2)
  }
}
