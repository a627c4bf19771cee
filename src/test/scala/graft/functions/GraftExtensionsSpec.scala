package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions (SparkSessionExtensions). */
class GraftExtensionsSpec extends AnyFunSuite {

  // extensions apply at session build; under a shared-suite JVM an
  // existing session may be returned, so also exercise the direct
  // registration path
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.register(s) // idempotent; covers pre-existing sessions
    s
  }

  test("graft_dot / graft_l2sq / graft_cosine usable from SQL") {
    val row = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_l2sq(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l2,
        |       graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs""".stripMargin)
      .collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 25.0)
    assert(row.getDouble(2) == 1.0)
  }

  test("graft_ngrams shingles a token array from SQL") {
    val row = spark.sql(
      "SELECT graft_ngrams(array('a', 'b', 'c', 'd'), 3) AS g, " +
        "graft_ngrams(array('a', 'b'), 3) AS short").collect()(0)
    assert(row.getSeq[String](0).toList == List("a b c", "b c d"))
    assert(row.getSeq[String](1).isEmpty)
  }

  test("graft_json_type introspects documents from SQL") {
    spark.sql(
      """SELECT '{"a": 1, "s": "x", "o": {"k": true}, "arr": [1]}' AS doc""")
      .createOrReplaceTempView("docs")
    val row = spark.sql(
      """SELECT graft_json_type(doc, 'a') a, graft_json_type(doc, 's') s,
        |       graft_json_type(doc, 'o') o, graft_json_type(doc, 'arr') arr,
        |       graft_json_type(doc, 'missing') m FROM docs""".stripMargin)
      .collect()(0)
    assert(row.getString(0) == "number")
    assert(row.getString(1) == "string")
    assert(row.getString(2) == "object")
    assert(row.getString(3) == "array")
    assert(row.isNullAt(4))
  }
}
