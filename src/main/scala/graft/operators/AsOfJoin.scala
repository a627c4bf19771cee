package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every probe row, the latest series row with the same
  * key and `seriesTime <= probeTime` — the point-in-time lookup Spark
  * lacks as a built-in (pandas merge_asof / DuckDB ASOF JOIN / kdb aj).
  *
  * Spark-first formulation, composed from built-ins rather than a custom
  * physical operator: TAG both sides, UNION them, and run ONE window per
  * key ordered by (time, tag) carrying the last non-null series values
  * forward; probe rows then read their carried match. Cost = one shuffle
  * of each side on the key + a per-partition sort — the same price as
  * the co-partitioned join you would hand-write, with none of the
  * range-join explosion a `t2 <= t1` theta-join triggers (Spark plans
  * those as broadcast-nested-loop or cartesian). Skewed keys are plain
  * aggregate-style skew, handled by AQE.
  *
  * Ordering contract: series rows sort BEFORE probe rows at equal
  * timestamps (tag 0 < 1), so a series row at exactly `probeTime`
  * matches (inclusive <=, like merge_asof/ASOF JOIN). Among equal
  * (key, time) series rows the LAST in (time, tiebreak-column) order
  * wins; pass `seriesTiebreak` to pin that choice deterministically.
  */
object AsOfJoin {

  /** Left as-of join: every probe row, plus `carryCols` from its match
    * prefixed `asof_` (null when no series row precedes it), plus
    * `asof_ts` = the matched series timestamp.
    *
    * @param toleranceMs match only when `probeTime - seriesTime` is
    *        within this many milliseconds (like merge_asof tolerance);
    *        expired matches null out. */
  def asOf(probe: DataFrame, series: DataFrame, keyCols: Seq[String],
      probeTimeCol: String, seriesTimeCol: String, carryCols: Seq[String],
      seriesTiebreak: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(carryCols.nonEmpty, "at least one carried column required")
    val keys = keyCols.map(col)
    // tiebreak keeps its own type: any orderable column works, and a
    // forced cast would null out e.g. string ids, silently destroying
    // the determinism the parameter exists for
    val tbType = seriesTiebreak
      .map(c => series.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.IntegerType)
    val tb: Column = seriesTiebreak.map(col).getOrElse(lit(0))

    // ALL carried values (and the matched timestamp) travel in ONE
    // struct per series row: a single last(ignoreNulls) then skips only
    // probe-row placeholders, never a legitimately-NULL value inside a
    // series row — per-column carries would reach past a null-valued
    // match to a stale older row, disagreeing with asof_ts.
    val probeSide = probe.select(
      keys :+
        col(probeTimeCol).as("__t") :+
        lit(1).as("__tag") :+
        lit(null).cast(tbType).as("__tb") :+
        struct(probe.columns.map(col): _*).as("__row") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("__mt",
            probe.schema(probeTimeCol).dataType) +:
            carryCols.map(c => org.apache.spark.sql.types.StructField(
              c, series.schema(c).dataType)))).as("__match"): _*)
    val seriesSide = series.select(
      keys :+
        col(seriesTimeCol).as("__t") :+
        lit(0).as("__tag") :+
        tb.as("__tb") :+
        lit(null).cast(probeSide.schema("__row").dataType).as("__row") :+
        struct(col(seriesTimeCol).as("__mt") +:
          carryCols.map(c => col(c)): _*).as("__match"): _*)

    val w = Window.partitionBy(keys: _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = probeSide.unionByName(seriesSide)
      .withColumn("__best", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    // tolerance needs real timestamps (unix_millis); matches older than
    // the window null out exactly like an unmatched probe
    val best = toleranceMs.fold(col("__best")) { t =>
      when(col("__best").isNotNull &&
        unix_millis(col("__t")) - unix_millis(col("__best.__mt")) > t,
        lit(null)).otherwise(col("__best"))
    }
    matched.withColumn("__best", best)
      .select(col("__row.*") +:
        carryCols.map(c => col(s"__best.$c").as(s"asof_$c")) :+
        col("__best.__mt").as("asof_ts"): _*)
  }
}
