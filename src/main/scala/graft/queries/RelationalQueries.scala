package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Td

/** Relational operator inventory (SURVEY §2.B) demonstrated over the driver
  * testdata, each with a DuckDB oracle.
  *
  * Hash-parity rules used throughout (the driver compares sorted-column
  * value hashes against DuckDB):
  *  - Sums over doubles are computed in fixed-point: `floor(x*100+0.5)` as
  *    BIGINT cents on BOTH engines — integer addition is order-independent,
  *    so partial aggregation cannot perturb the hash.
  *  - Ratios are formed by one final integer division (IEEE-deterministic).
  *  - Ordering-sensitive outputs always carry a unique key and an explicit
  *    sort.
  */
object RelationalQueries {

  private def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B9/B10 aggregates — TPC-H Q1 shape (pricing summary).
    "q1_agg" -> ((s, d) => {
      Td.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // B3 filter: AND / OR / IN / parens / != (rewritten NOT(=) like
    // AdtQueryHelpers.cs:417-426 of the reference).
    "q_b3_filter" -> ((s, d) => {
      Td.orders(s, d)
        .filter((col("o_orderpriority").isin("1-URGENT", "2-HIGH") ||
          col("o_totalprice") > 200000) && !(col("o_orderstatus") === "F"))
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_price_c"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // B5 chained JOIN RELATED — 5-way join, TPC-H Q5 shape. The two
    // dimension joins (nation, region) are broadcast; the orders⋈lineitem
    // join shuffles on the shared key.
    "q_b5_multi_join" -> ((s, d) => {
      val li = Td.lineitem(s, d); val o = Td.orders(s, d); val c = Td.customer(s, d)
      val n = Td.nation(s, d); val r = Td.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // B8 TOP(n) — deterministic top-k with tiebreak key.
    "q_b8_topk" -> ((s, d) => {
      Td.orders(s, d)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
        .orderBy(col("price_c").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // B11 UNION (distinct).
    "q_b11_union" -> ((s, d) => {
      Td.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
        .union(Td.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    }),

    // OLAP subtotal lattice: ROLLUP(l_returnflag, l_linestatus) — the
    // grouping-sets operator class (detail rows + per-flag subtotals +
    // grand total in ONE aggregation pass; Catalyst plans it as a single
    // Expand + hash aggregate, so the scan is read once, not once per
    // level). GROUPING() markers are collapsed to an explicit 'ALL'
    // sentinel so subtotal row identity is engine-independent (no NULL
    // sort-order ambiguity between engines).
    "q_rollup" -> ((s, d) => {
      Td.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("__gr"),
          grouping(col("l_linestatus")).as("__gl"))
        .select(
          when(col("__gr") === 1, lit("ALL")).otherwise(col("l_returnflag"))
            .as("rflag"),
          when(col("__gl") === 1, lit("ALL")).otherwise(col("l_linestatus"))
            .as("lstatus"),
          col("sum_qty_c"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))
    }),

    // Pivot (crosstab): order-priority counts pivoted to one column per
    // priority class, one row per order status. Spark's pivot with an
    // EXPLICIT value list — never the value-discovering overload, which
    // runs a distinct scan on the driver before planning; at 100 TB the
    // pivot key set must be declared, not discovered.
    "q_pivot" -> ((s, d) => {
      Td.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent_n"),
          coalesce(col("2-HIGH"), lit(0L)).as("high_n"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("medium_n"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("notspec_n"),
          coalesce(col("5-LOW"), lit(0L)).as("low_n"))
        .orderBy(col("o_orderstatus"))
    }),

    // B13 OPTIONAL MATCH — left outer join, zero-preserved.
    "q_b13_optional" -> ((s, d) => {
      val c = Td.customer(s, d); val o = Td.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    // B14 DETACH DELETE survivor-set semantics — anti join (customers
    // with no urgent order survive the "delete").
    "q_b14_anti" -> ((s, d) => {
      Td.customer(s, d)
        .join(Td.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // B15 MERGE/upsert read-side semantics: latest row per key
    // (row_number window = the dedup Delta MERGE would produce).
    "q_b15_upsert_latest" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Td.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
          cents(col("o_totalprice")).as("latest_price_c"))
        .orderBy(col("o_custkey"))
    }),

    // B18 pagination — SKIP/LIMIT over a stable sort (the reference pages
    // with continuation tokens re-issuing SKIP n, Query.cs:90-120).
    "q_b18_pagination" -> ((s, d) => {
      Td.orders(s, d)
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"))
        .offset(200)
        .limit(100)
    }),

    // B12 UNWIND — lateral explode of an array (token explode).
    "q_b12_unwind" -> ((s, d) => {
      Td.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // Bloom semi-join: fact rows whose order survives a selective
    // dimension filter — bloom-negative rows die at scan speed, only the
    // residual shuffles, result exactly the SQL semi-join.
    "q_bloom_semijoin" -> ((s, d) => {
      graft.operators.BloomSemiJoin.semiJoin(
        Td.lineitem(s, d),
        Td.orders(s, d).filter(col("o_totalprice") > 400000),
        "l_orderkey", "o_orderkey", numBits = 1 << 16, numHashes = 5)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Bloom anti-join: the definitely-absent shortcut — bloom-negative
    // rows skip the join entirely, bloom-positive rows anti-join for real.
    "q_bloom_anti" -> ((s, d) => {
      graft.operators.BloomSemiJoin.antiJoin(
        Td.lineitem(s, d),
        Td.orders(s, d).filter(col("o_totalprice") > 400000),
        "l_orderkey", "o_orderkey", numBits = 1 << 16, numHashes = 5)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Z-order clustering key (Morton interleave of the two hottest filter
    // columns) — the layout a 100 TB table sorts by so data files carry
    // tight min/max envelopes on both dimensions at once. Pure integer
    // bit arithmetic, codegen'd, bit-identical to the SQL oracle.
    "q_layout_zorder" -> ((s, d) => {
      Td.orders(s, d)
        .withColumn("zkey", graft.operators.ZOrder.zkey2(
          col("o_custkey") % 65536, col("o_orderkey") % 65536))
        .select(col("o_orderkey"), col("zkey"))
        .orderBy(col("zkey"), col("o_orderkey"))
        .limit(100)
    }),

    // Exact distributed quantiles (selection-by-rank, no global sort):
    // the reproducible cutoff computation behind every length-cap /
    // score-threshold pipeline decision.
    "q_stats_quantiles" -> ((s, d) => {
      graft.operators.Stats.exactQuantiles(Td.lineitem(s, d),
        "l_extendedprice", Seq(100L, 2500L, 5000L, 7500L, 9900L, 10000L))
        .orderBy(col("q_bp"))
    }),

    // Stratified exact quantiles: per-group rank selection (the
    // per-source length-distribution report).
    "q_stats_grouped_quantiles" -> ((s, d) => {
      graft.operators.Stats.groupedQuantiles(Td.lineitem(s, d),
        "l_returnflag", "l_extendedprice", Seq(2500L, 5000L, 7500L))
        .orderBy(col("l_returnflag"), col("q_bp"))
    }),

    // One-pass decimal-histogram quantiles: the single-scan mergeable
    // profile form (exactQuantiles needs a probe pass + per-bucket
    // sort); bucket brackets are integer/string arithmetic identical in
    // DuckDB, ≤1%-relative-width at prefixLen 3 — here prefixLen 2 to
    // keep multi-magnitude bucketing exercised.
    "q_stats_histquant" -> ((s, d) => {
      graft.operators.Stats.decHistQuantiles(Td.lineitem(s, d),
        "l_extendedprice", Seq(2500L, 5000L, 9000L, 9900L), prefixLen = 2)
        .orderBy(col("q_bp"))
    }),

    // Stratified one-pass histogram quantiles: per-group brackets from
    // ONE (group, bucket) aggregation — the per-source profile report.
    "q_stats_histquant_grouped" -> ((s, d) => {
      graft.operators.Stats.decHistQuantilesByGroup(Td.lineitem(s, d),
        "l_returnflag", "l_extendedprice", Seq(5000L, 9900L), prefixLen = 2)
        .orderBy(col("l_returnflag"), col("q_bp"))
    }),

    // ANALYZE-style column profile: the one-scan statistics pass behind
    // layout/skew decisions (exact NDV via a single expand).
    "q_stats_profile" -> ((s, d) => {
      graft.operators.Stats.tableProfile(Td.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy(col("col_name"))
    }),

    // Salted skew join: hot lineitem orderkeys spread over (key, salt);
    // result must be row-identical to the plain join the oracle runs.
    "q_skew_join" -> ((s, d) => {
      val li = Td.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
      val ords = Td.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val hot = graft.operators.SkewJoin.hotKeys(li, "l_orderkey", 6L)
      graft.operators.SkewJoin
        .join(li, ords, "l_orderkey", "o_orderkey", hot, salts = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100 + 0.5).cast("long"))
            .as("sum_q_c"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    // inverse empirical CDF: value at 1-based rank max(1, ceil(q·n)) —
    // integer ceil, so rank selection is exact on both engines
    "q_stats_quantiles" ->
      """WITH v AS (SELECT l_extendedprice AS value,
        |    row_number() OVER (ORDER BY l_extendedprice) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM lineitem
        |      WHERE l_extendedprice IS NOT NULL),
        |t(q_bp) AS (VALUES (100),(2500),(5000),(7500),(9900),(10000)),
        |r AS (SELECT CAST(q_bp AS BIGINT) AS q_bp,
        |        greatest(1, (q_bp * n + 9999) // 10000) AS rk
        |      FROM t, n)
        |SELECT r.q_bp, v.value FROM r JOIN v ON v.rn = r.rk
        |ORDER BY q_bp""".stripMargin,
    "q_stats_grouped_quantiles" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS value,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT g, count(*) AS n FROM v GROUP BY 1),
        |t(q_bp) AS (VALUES (2500),(5000),(7500)),
        |r AS (SELECT n.g, CAST(q_bp AS BIGINT) AS q_bp,
        |        greatest(1, (q_bp * n + 9999) // 10000) AS rk
        |      FROM t, n)
        |SELECT r.g AS l_returnflag, r.q_bp, v.value
        |FROM r JOIN v ON v.g = r.g AND v.rn = r.rk
        |ORDER BY 1, 2""".stripMargin,
    // identical decimal-prefix bucketing + rank walk, pure SQL
    "q_stats_histquant" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |k AS (SELECT c, CAST(power(10,
        |    greatest(length(CAST(c AS VARCHAR)) - 2, 0)) AS BIGINT) AS divd
        |  FROM v),
        |g AS (SELECT (c // divd) * divd AS lo_c,
        |    (c // divd) * divd + divd - 1 AS hi_c, count(*) AS n
        |  FROM k GROUP BY 1, 2),
        |o AS (SELECT lo_c, hi_c, sum(n) OVER (ORDER BY lo_c) AS cum FROM g),
        |n AS (SELECT count(*) AS total FROM v),
        |t(q_bp) AS (VALUES (2500),(5000),(9000),(9900)),
        |r AS (SELECT CAST(q_bp AS BIGINT) AS q_bp,
        |    greatest(1, (q_bp * total + 9999) // 10000) AS rk FROM t, n),
        |sel AS (SELECT q_bp, min(lo_c) AS lo_c
        |  FROM r JOIN o ON o.cum >= r.rk GROUP BY 1)
        |SELECT q_bp, lo_c, hi_c FROM sel JOIN o USING (lo_c)
        |ORDER BY q_bp""".stripMargin,
    // identical bucketing, stratified by l_returnflag
    "q_stats_histquant_grouped" ->
      """WITH v AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |k AS (SELECT g, c, CAST(power(10,
        |    greatest(length(CAST(c AS VARCHAR)) - 2, 0)) AS BIGINT) AS divd
        |  FROM v),
        |gb AS (SELECT g, (c // divd) * divd AS lo_c,
        |    (c // divd) * divd + divd - 1 AS hi_c, count(*) AS n
        |  FROM k GROUP BY 1, 2, 3),
        |o AS (SELECT g, lo_c, hi_c,
        |    sum(n) OVER (PARTITION BY g ORDER BY lo_c) AS cum FROM gb),
        |tot AS (SELECT g, count(*) AS total FROM v GROUP BY 1),
        |t(q_bp) AS (VALUES (5000),(9900)),
        |r AS (SELECT tot.g, CAST(q_bp AS BIGINT) AS q_bp,
        |    greatest(1, (q_bp * total + 9999) // 10000) AS rk FROM t, tot),
        |sel AS (SELECT r.g, q_bp, min(lo_c) AS lo_c
        |  FROM r JOIN o ON o.g = r.g AND o.cum >= r.rk GROUP BY 1, 2)
        |SELECT sel.g AS l_returnflag, q_bp, o.lo_c, o.hi_c
        |FROM sel JOIN o ON o.g = sel.g AND o.lo_c = sel.lo_c
        |ORDER BY 1, 2""".stripMargin,
    "q_stats_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS n_null,
           |  count(DISTINCT $c) AS ndv,
           |  CAST(min($c) AS VARCHAR) AS min_s,
           |  CAST(max($c) AS VARCHAR) AS max_s FROM orders""".stripMargin
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority")
      s"""WITH p AS (${cols.map(one).mkString("\nUNION ALL\n")})
         |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST(n_null AS BIGINT) AS n_null, CAST(ndv AS BIGINT) AS ndv,
         |  min_s, max_s
         |FROM p ORDER BY col_name""".stripMargin
    },
    // plain join — the salted split must be invisible in the result
    "q_skew_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(floor(l_quantity*100+0.5) AS BIGINT)) AS BIGINT) AS sum_q_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity*100+0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100+0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_b3_filter" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM orders
        |WHERE (o_orderpriority IN ('1-URGENT','2-HIGH') OR o_totalprice > 200000)
        |  AND NOT (o_orderstatus = 'F')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_b5_multi_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100+0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_b8_topk" ->
      """SELECT o_orderkey, CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS price_c
        |FROM orders ORDER BY price_c DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_b11_union" ->
      """SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |UNION SELECT DISTINCT CAST(s_nationkey AS INT) FROM supplier
        |ORDER BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
        |       ELSE l_returnflag END AS rflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
        |       ELSE l_linestatus END AS lstatus,
        |  CAST(sum(CAST(floor(l_quantity*100+0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_c,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_n,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_n,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium_n,
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS notspec_n,
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low_n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_b13_optional" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_b14_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY 1""".stripMargin,
    "q_b15_upsert_latest" ->
      """SELECT o_custkey, latest_orderkey, latest_price_c FROM (
        |  SELECT o_custkey, o_orderkey AS latest_orderkey,
        |    CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS latest_price_c,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_b18_pagination" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 200""".stripMargin,
    "q_b12_unwind" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q_bloom_semijoin" ->
      """SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000)
        |ORDER BY 1, 2""".stripMargin,
    "q_bloom_anti" ->
      """SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000)
        |ORDER BY 1, 2""".stripMargin,

    "q_layout_zorder" ->
      s"""SELECT o_orderkey,
         |  CAST(${graft.operators.ZOrder.zkey2Sql("a", "b")} AS BIGINT) AS zkey
         |FROM (SELECT o_orderkey, o_custkey % 65536 AS a,
         |             o_orderkey % 65536 AS b FROM orders)
         |ORDER BY zkey, o_orderkey LIMIT 100""".stripMargin
  )
}
