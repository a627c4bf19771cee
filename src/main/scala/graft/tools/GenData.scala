package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic-testdata generator for scale points the driver
  * tree doesn't ship (TESTDATA.md tops out at sf0.1). Emits the same ten
  * tables with the same schemas and the same value shapes (verified
  * against the sf0.1 tree: column types, key ranges, category sets,
  * near-dup structure, lines-per-order mean ~4), at any scale factor.
  *
  * Generation is `spark.range(n)` + pure column expressions: every value
  * is a function of (seed, table tag, row id) through xxhash64, so the
  * output is bit-stable across runs, partitionings and cluster sizes — no
  * Random, no driver-side loops, no shuffle. At sf1 this writes ~6M
  * lineitem rows in seconds at local[32]; on a 1000-executor cluster the
  * identical code generates sf100000 (100 TB) because each row is
  * computed independently inside the scan.
  *
  * NOT the driver's generator: ids, schemas and category sets match
  * TESTDATA.md exactly, but hash streams differ — so sf1 results are not
  * comparable to sf0.1 results row-for-row, only shape-for-shape. That is
  * the point: a *independent* larger dataset for scaling evidence
  * (BENCH_sf1.json), with correctness still anchored by the DuckDB oracle
  * run over these same parquet files.
  *
  * Usage: runMain graft.tools.GenData <outDir> [sf] [seed]
  */
object GenData {

  /** Uniform Long in [0, m) from the seed, a stream tag and key columns —
    * xxhash64 is signed, pmod folds to non-negative. */
  private def u(seed: Long, tag: String, m: Long, keys: Column*): Column =
    pmod(xxhash64((lit(seed) :: lit(tag) :: keys.toList): _*), lit(m))

  /** Uniform 2-decimal double in [lo, hi]. */
  private def money(seed: Long, tag: String, lo: Double, hi: Double,
      keys: Column*): Column =
    (u(seed, tag, math.round((hi - lo) * 100) + 1, keys: _*) / 100.0 + lo)

  private def pick(seed: Long, tag: String, values: Seq[String],
      keys: Column*): Column =
    element_at(array(values.map(lit): _*),
      (u(seed, tag, values.size, keys: _*) + 1).cast(IntegerType))

  val MktSegments = Seq("MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD",
    "FURNITURE")
  val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
    "5-LOW")
  val PartAdjs = Seq("blue", "cold", "hot", "large", "new", "old", "red",
    "small")
  val PartNouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring",
    "rod", "widget")
  val PartTypes = Seq("ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE",
    "STANDARD")
  val EventTypes = Seq("signup", "purchase", "view", "click", "error")
  val Langs = Seq("en", "en", "zh", "es", "fr", "de") // en ~2x, like sf0.1
  /** The sf0.1 corpus' exact 31-token vocabulary. */
  val Vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
    "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  /** Vocabulary for a given scale factor: the 31 base tokens plus
    * hash-named fillers so |vocab| grows ~cbrt(corpus) — Heaps-law-ish.
    * A FIXED vocabulary densifies the 3-shingle space quadratically as
    * the corpus grows (at sf1 the driver tree's 31 tokens would put the
    * average shingle document-frequency at ~100, making any exact
    * all-pairs ground truth Σdf² ≈ quadratic in corpus size — a property
    * no real crawl has). Scaling |vocab|³ with the document count keeps
    * per-shingle df roughly constant, the shape real dedup workloads
    * present. */
  def vocabFor(sf: Double): Seq[String] = {
    val target = math.max(Vocab.size,
      math.round(Vocab.size * math.cbrt(sf / 0.1)).toInt)
    Vocab ++ (Vocab.size until target).map(i => s"tok$i")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: GenData <outDir> [sf] [seed]"))
    val sf = args.lift(1).map(_.toDouble).getOrElse(1.0)
    val seed = args.lift(2).map(_.toLong).getOrElse(42L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // match the driver tree's physical layout (timestamp[us]); the
      // session default here writes TIMESTAMP(NANOS), which the
      // vectorized reader then refuses without the nanosAsLong shim
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, outDir, sf, seed)
    finally spark.stop()
  }

  /** Row counts per TESTDATA.md: sf0.1 ⇒ lineitem 600k, so sf1 ⇒ ~6M. */
  def counts(sf: Double): Map[String, Long] = Map(
    "customer" -> math.round(150000 * sf),
    "supplier" -> math.round(10000 * sf),
    "part" -> math.round(200000 * sf),
    "orders" -> math.round(1500000 * sf),
    "events" -> math.round(1000000 * sf),
    "documents" -> math.round(50000 * sf),
    "embeddings" -> math.round(20000 * sf),
    "users" -> math.round(15000 * sf))

  def generate(spark: SparkSession, outDir: String, sf: Double,
      seed: Long): Unit = {
    val n = counts(sf)
    val parts = math.max(spark.sparkContext.defaultParallelism,
      (n("orders") / 200000L).toInt) // ~200k rows per task
    def range(rows: Long): DataFrame =
      spark.range(0, rows, 1, parts).toDF("id")
    def save(name: String)(df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      // metadata-only count of what was actually written
      val written = spark.read.parquet(s"$outDir/$name.parquet").count()
      println(s"[gen] $name: $written rows")
    }

    save("region")(spark.range(0, 5, 1, 1).select(
      col("id").cast(IntegerType).as("r_regionkey"),
      element_at(array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
        "MIDDLE EAST").map(lit): _*),
        (col("id") + 1).cast(IntegerType)).as("r_name")))

    save("nation")(spark.range(0, 25, 1, 1).select(
      col("id").cast(IntegerType).as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast(IntegerType).as("n_regionkey")))

    save("customer")(range(n("customer")).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      u(seed, "c_nat", 25, col("id")).cast(IntegerType).as("c_nationkey"),
      money(seed, "c_bal", -999.99, 9999.99, col("id")).as("c_acctbal"),
      pick(seed, "c_seg", MktSegments, col("id")).as("c_mktsegment")))

    save("supplier")(range(n("supplier")).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      u(seed, "s_nat", 25, col("id")).cast(IntegerType).as("s_nationkey"),
      money(seed, "s_bal", -999.99, 9999.99, col("id")).as("s_acctbal")))

    save("part")(range(n("part")).select(
      col("id").as("p_partkey"),
      concat(pick(seed, "p_adj", PartAdjs, col("id")), lit(" "),
        pick(seed, "p_noun", PartNouns, col("id"))).as("p_name"),
      concat(lit("Brand#"),
        u(seed, "p_brand", 25, col("id")) + 1).as("p_brand"),
      pick(seed, "p_type", PartTypes, col("id")).as("p_type"),
      (u(seed, "p_size", 50, col("id")) + 1).cast(IntegerType).as("p_size"),
      money(seed, "p_price", 900.0, 999.9, col("id")).as("p_retailprice")))

    // orders span 1995-01-01 .. 2001-08-01 (2404 days), like the sf0.1 tree
    val orders = range(n("orders")).select(
      col("id").as("o_orderkey"),
      u(seed, "o_cust", n("customer"), col("id")).as("o_custkey"),
      pick(seed, "o_status", Seq("O", "P", "F"), col("id")).as("o_orderstatus"),
      money(seed, "o_total", 1000.0, 499999.99, col("id")).as("o_totalprice"),
      date_add(to_date(lit("1995-01-01")),
        u(seed, "o_date", 2405, col("id")).cast(IntegerType))
        .cast("timestamp_ntz").as("o_orderdate"),
      pick(seed, "o_prio", Priorities, col("id")).as("o_orderpriority"))
    save("orders")(orders)

    // lineitem: 1 + h%4 + h'%4 lines per order — mean 4, max 7 (the sf0.1
    // tree is Poisson-mean-4 with a rare tail to 17; same mean, same join
    // fan-out, slightly lighter tail). Shipdate = orderdate + 1..120 days.
    val ok = col("o_orderkey")
    save("lineitem")(range(n("orders"))
      .select(col("id").as("o_orderkey"),
        (lit(1) + u(seed, "l_n1", 4, col("id")) + u(seed, "l_n2", 4, col("id")))
          .cast(IntegerType).as("n_lines"),
        date_add(to_date(lit("1995-01-01")),
          u(seed, "o_date", 2405, col("id")).cast(IntegerType)).as("odate"))
      .select(ok, col("odate"),
        explode(sequence(lit(1), col("n_lines"))).as("l_linenumber"))
      .select(
        ok.as("l_orderkey"),
        u(seed, "l_part", n("part"), ok, col("l_linenumber")).as("l_partkey"),
        u(seed, "l_supp", n("supplier"), ok, col("l_linenumber")).as("l_suppkey"),
        col("l_linenumber"),
        (u(seed, "l_qty", 50, ok, col("l_linenumber")) + 1)
          .cast(DoubleType).as("l_quantity"),
        money(seed, "l_price", 900.68, 104999.91, ok, col("l_linenumber"))
          .as("l_extendedprice"),
        (u(seed, "l_disc", 11, ok, col("l_linenumber")) / 100.0).as("l_discount"),
        (u(seed, "l_tax", 9, ok, col("l_linenumber")) / 100.0).as("l_tax"),
        pick(seed, "l_rf", Seq("A", "N", "R"), ok, col("l_linenumber"))
          .as("l_returnflag"),
        pick(seed, "l_ls", Seq("O", "F"), ok, col("l_linenumber"))
          .as("l_linestatus"),
        date_add(col("odate"),
          (u(seed, "l_ship", 120, ok, col("l_linenumber")) + 1)
            .cast(IntegerType)).cast("timestamp_ntz").as("l_shipdate")))

    // events: 30 days of 2024-01 at microsecond resolution, like sf0.1
    val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z
    save("events")(range(n("events")).select(
      col("id").as("event_id"),
      // session tz is UTC, so the NTZ cast is an identity on the stored
      // microseconds — and the file layout matches the driver tree
      // (timestamp[us], isAdjustedToUTC=false)
      timestamp_micros(lit(baseMicros) +
        u(seed, "e_ts", 30L * 86400 * 1000000, col("id")))
        .cast("timestamp_ntz").as("ts"),
      u(seed, "e_user", n("users"), col("id")).as("user_id"),
      pick(seed, "e_type", EventTypes, col("id")).as("event_type"),
      (u(seed, "e_val", 10000, col("id")) / 100.0).as("value"),
      format_string("{\"k\": %d}",
        u(seed, "e_k", 100, col("id"))).as("props")))

    // documents: word-salad over the sf0.1 corpus' exact 31-token
    // vocabulary, 8..110 tokens. Deterministic duplicate structure so the
    // dedup family has work at every scale: id%100==99 ⇒ exact copy of
    // id-10's text; id%100 in {97,98} ⇒ near-dups of the SAME normal base
    // doc (97→id-1, 98→id-2, both ≡96 mod 100: last token swapped, swap
    // token keyed by own id so 97/98 also near-dup each other) — ~1%
    // exact, ~2% near, like a lightly-deduped web crawl. (98 must NOT
    // point at id-1: doc id-1 is itself the 97-variant rendering a
    // different stream, which would make 98 a near-dup of no real doc.)
    val vocab = vocabFor(sf)
    val vocabCol = array(vocab.map(lit): _*)
    val docs0 = range(n("documents")).select(col("id"),
      when(col("id") % 100 === 99, col("id") - 10)
        .when(col("id") % 100 === 97, col("id") - 1)
        .when(col("id") % 100 === 98, col("id") - 2)
        .otherwise(col("id")).as("tid"),
      (col("id") % 100).isin(97, 98).as("near"))
    val toks = transform(
      sequence(lit(1), (u(seed, "d_len", 103, col("tid")) + 8).cast(IntegerType)),
      j => element_at(vocabCol,
        (pmod(xxhash64(lit(seed), lit("d_tok"), col("tid"), j),
          lit(vocab.size)) + 1).cast(IntegerType)))
    save("documents")(docs0
      .select(col("id"), col("near"),
        when(col("near"),
          concat(slice(toks, lit(1), size(toks) - 1),
            array(element_at(vocabCol,
              (u(seed, "d_swap", vocab.size, col("id")) + 1)
                .cast(IntegerType)))))
          .otherwise(toks).as("toks"))
      .select(
        col("id").as("doc_id"),
        array_join(col("toks"), " ").as("text"),
        pick(seed, "d_lang", Langs, col("id")).as("lang"),
        concat(lit("src"), u(seed, "d_src", 20, col("id"))).as("source"))
      .withColumn("n_chars", length(col("text")).cast(LongType)))

    // embeddings: 64 floats uniform in [-0.35, 0.35), labels 0..9
    save("embeddings")(range(n("embeddings")).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => ((pmod(xxhash64(lit(seed), lit("v"), col("id"), j), lit(700000))
          / lit(1000000.0)) - 0.35).cast(FloatType)).as("embedding"),
      u(seed, "v_lab", 10, col("id")).cast(IntegerType).as("label")))
  }
}
