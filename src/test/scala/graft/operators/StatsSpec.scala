package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact quantiles by distributed rank selection: reference-model parity,
  * tie handling, and the no-global-sort plan shape. */
class StatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The spec's reference model: value at 1-based rank max(1, ceil(q·n)). */
  private def model(vs: Seq[Double], qBp: Long): Double = {
    val sorted = vs.sorted
    val r = math.max(1L, (qBp * vs.size + 9999L) / 10000L)
    sorted((r - 1).toInt)
  }

  private def quantMap(vs: Seq[Double], qs: Seq[Long], buckets: Int = 64) = {
    val s = spark; import s.implicits._
    Stats.exactQuantiles(vs.toDF("x"), "x", qs, buckets).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
  }

  test("matches the sorted-rank model on distinct values") {
    val vs = (1 to 1000).map(i => (i * 37 % 1009).toDouble)
    val qs = Seq(0L, 100L, 2500L, 5000L, 7500L, 9900L, 10000L)
    val got = quantMap(vs, qs)
    qs.foreach(q => assert(got(q) == model(vs, q), s"q=$q"))
  }

  test("heavy ties: every rank still selects the exact model value") {
    val vs = Seq.fill(400)(7.0) ++ Seq.fill(100)(1.0) ++ Seq.fill(100)(9.0)
    val qs = Seq(100L, 1900L, 2000L, 2100L, 5000L, 8000L, 8100L, 10000L)
    val got = quantMap(vs, qs)
    qs.foreach(q => assert(got(q) == model(vs, q), s"q=$q got ${got(q)}"))
  }

  test("bucket count does not change the answer, only the plan") {
    val vs = (1 to 500).map(i => math.sin(i).abs * 1000)
    val qs = Seq(500L, 5000L, 9500L)
    assert(quantMap(vs, qs, 64) == quantMap(vs, qs, 4))
    assert(quantMap(vs, qs, 64) == quantMap(vs, qs, 1),
      "degenerate single bucket must still be exact")
  }

  test("empty and all-null inputs return no rows") {
    val s = spark; import s.implicits._
    assert(Stats.exactQuantiles(Seq.empty[Double].toDF("x"), "x",
      Seq(5000L)).count() == 0)
    assert(Stats.exactQuantiles(Seq[Option[Double]](None, None).toDF("x"),
      "x", Seq(5000L)).count() == 0)
  }

  test("groupedQuantiles: per-group rank selection matches the model") {
    val s = spark; import s.implicits._
    val df = (Seq.tabulate(100)(i => ("a", (i * 13 % 101).toDouble)) ++
      Seq.tabulate(7)(i => ("b", (i * 3).toDouble))).toDF("g", "x")
    val qs = Seq(2500L, 5000L, 10000L)
    val got = Stats.groupedQuantiles(df, "g", "x", qs).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    def m(vs: Seq[Double], q: Long) = {
      val sorted = vs.sorted
      sorted((math.max(1L, (q * vs.size + 9999L) / 10000L) - 1).toInt)
    }
    val a = (0 until 100).map(i => (i * 13 % 101).toDouble)
    val b = (0 until 7).map(i => (i * 3).toDouble)
    qs.foreach { q =>
      assert(got(("a", q)) == m(a, q), s"a q=$q")
      assert(got(("b", q)) == m(b, q), s"b q=$q")
    }
  }

  test("tableProfile: nulls, exact ndv, min/max per column in one pass") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(30.0)),
      (4L, None, Some(10.0))).toDF("id", "s", "v")
    val got = Stats.tableProfile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 1L, 2L, "10.0", "30.0")))
  }

  test("tableProfile: all-null column reports null bounds, zero ndv") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "x")
    val r = Stats.tableProfile(df, Seq("x")).collect()(0)
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("tableProfile: approximate ndv lands near exact for a narrow table") {
    val s = spark; import s.implicits._
    val df = (1 to 5000).map(i => i % 1000).toDF("k")
    val approx = Stats.tableProfile(df, exact = false)
      .collect()(0).getLong(3)
    assert(math.abs(approx - 1000L) < 150, s"approx ndv $approx")
  }

  test("plan never funnels data through a single partition") {
    val s = spark; import s.implicits._
    val df = Stats.exactQuantiles(
      (1 to 2000).map(_.toDouble).toDF("x"), "x", Seq(2500L, 7500L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"rank selection must not globally sort:\n$plan")
  }

  test("decHistQuantiles: bracket contains the exact quantile, width within bound") {
    val s = spark; import s.implicits._
    // multi-magnitude positive values: 0.01 .. ~90k cents
    val vals = (1 to 5000).map(i => (i.toDouble * i / 277.0) % 900.0 + 0.01)
    val df = vals.toDF("v")
    val probs = Seq(1000L, 5000L, 9000L, 9900L)
    val got = Stats.decHistQuantiles(df, "v", probs, prefixLen = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cents = vals.map(x => math.floor(x * 100 + 0.5).toLong).sorted
    probs.foreach { q =>
      val exact = cents(math.max(1L, (q * cents.size + 9999L) / 10000L).toInt - 1)
      val (lo, hi) = got(q)
      assert(lo <= exact && exact <= hi, s"q=$q exact $exact outside [$lo,$hi]")
      // relative width ≤ 10^(1-prefixLen) = 1%
      assert(hi - lo <= math.max(1L, lo / 100L), s"q=$q bracket [$lo,$hi] too wide")
    }
  }

  test("decHistQuantiles: small values land in singleton (exact) buckets") {
    val s = spark; import s.implicits._
    val df = Seq(0.01, 0.02, 0.02, 0.03, 0.05).toDF("v")
    val got = Stats.decHistQuantiles(df, "v", Seq(5000L), prefixLen = 3)
      .collect()(0)
    assert(got.getLong(1) == got.getLong(2), "sub-prefix cents must be exact")
    assert(got.getLong(1) == 2L) // median of (1,2,2,3,5) cents
  }

  test("decHistQuantiles: negative values refuse loudly; empty returns no rows") {
    val s = spark; import s.implicits._
    intercept[IllegalArgumentException] {
      Stats.decHistQuantiles(Seq(-1.0, 2.0).toDF("v"), "v", Seq(5000L))
    }
    // single-digit negative at prefixLen 1: its bucket floor divides to
    // zero, so the guard must ride min(c), not the bucket floor
    intercept[IllegalArgumentException] {
      Stats.decHistQuantiles(Seq(-0.05, 2.0).toDF("v"), "v", Seq(5000L),
        prefixLen = 1)
    }
    // quantile outside basis points is a loud argument error, not an
    // ArrayIndexOutOfBounds deep in the rank walk
    intercept[IllegalArgumentException] {
      Stats.decHistQuantiles(Seq(1.0).toDF("v"), "v", Seq(10001L))
    }
    assert(Stats.decHistQuantiles(Seq.empty[Double].toDF("v"), "v",
      Seq(5000L)).count() == 0L)
  }

  test("decHistQuantilesByGroup: per-group brackets contain each group's exact quantile") {
    val s = spark; import s.implicits._
    val rows = (1 to 3000).map { i =>
      val g = s"g${i % 3}"
      (g, ((i * 7919) % 5000).toDouble / 10.0 + 0.01)
    }
    val df = rows.toDF("g", "v")
    val got = Stats.decHistQuantilesByGroup(df, "g", "v",
      Seq(2500L, 7500L), prefixLen = 3)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, members) =>
      val cents = members.map(m => math.floor(m._2 * 100 + 0.5).toLong).sorted
      Seq(2500L, 7500L).foreach { q =>
        val exact = cents(
          math.max(1L, (q * cents.size + 9999L) / 10000L).toInt - 1)
        val (lo, hi) = got((g, q))
        assert(lo <= exact && exact <= hi, s"$g q=$q: $exact not in [$lo,$hi]")
      }
    }
  }

  test("decHistQuantiles: partitioning does not change the histogram answer") {
    val s = spark; import s.implicits._
    val vals = (1 to 2000).map(i => (i * 37 % 997).toDouble + 0.5)
    val a = Stats.decHistQuantiles(vals.toDF("v").repartition(1), "v",
      Seq(2500L, 7500L)).collect().toSeq
    val b = Stats.decHistQuantiles(vals.toDF("v").repartition(13), "v",
      Seq(2500L, 7500L)).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
