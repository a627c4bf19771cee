package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — match points to the intervals containing them
  * (`start <= t < end`, plus optional equality keys) — the second classic
  * operator Spark lacks natively: a raw inequality join plans as
  * broadcast-nested-loop or cartesian and dies at scale.
  *
  * Bucketized formulation: bin time into fixed-width buckets; a point
  * lives in exactly ONE bucket, an interval is exploded to every bucket
  * it overlaps, and the join becomes an EQUI-join on (keys, bucket) with
  * an exact containment post-filter. Each (point, interval) pair meets
  * at most once (the point's single bucket), so no dedup stage. Shuffle
  * cost = both sides hashed on (keys, bucket); interval blow-up =
  * ceil(length/binWidth) rows per interval — pick `binMs` near the
  * typical interval length so that factor stays ~1-2.
  */
object RangeJoin {

  /** Inner point-in-interval join. Returns every point row joined to each
    * containing interval, interval columns (minus the shared keys)
    * prefixed `ivl_`. Degenerate intervals (`end <= start`) match
    * nothing, like the half-open predicate says. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pointTimeCol: String, startCol: String,
      endCol: String, binMs: Long): DataFrame = {
    require(binMs > 0, s"binMs $binMs must be positive")
    val keys = keyCols.map(col)

    // bin arithmetic at MICROsecond resolution (Spark timestamps): an
    // ms-floored end would compute the last overlapped bucket from a
    // point up to 1 ms EARLY, silently dropping matches whose interval
    // end carries a sub-ms fraction landing on a bucket edge
    val binUs = binMs * 1000
    val p = points.withColumn("__bin",
      floor(unix_micros(col(pointTimeCol)) / binUs))
    val ivlCols = intervals.columns.filterNot(keyCols.contains)
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .select(keys ++ ivlCols.map(c => col(c).as(s"ivl_$c")): _*)
      // half-open [start, end): the last overlapped bucket is the one
      // holding end-1us, so an interval ending exactly on a bucket edge
      // doesn't leak into the next bucket
      .withColumn("__bin", explode(sequence(
        floor(unix_micros(col(s"ivl_$startCol")) / binUs),
        floor((unix_micros(col(s"ivl_$endCol")) - 1) / binUs))))

    p.join(i, keyCols :+ "__bin")
      .filter(col(s"ivl_$startCol") <= col(pointTimeCol) &&
        col(pointTimeCol) < col(s"ivl_$endCol"))
      .drop("__bin")
  }
}
