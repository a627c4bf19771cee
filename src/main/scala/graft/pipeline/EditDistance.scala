package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance near-match pairs — entity-resolution dedup for short
  * strings (names, titles, product keys), the string-similarity sibling
  * of [[Dedup]]'s shingle family.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al. 2007,
  * "Fast Similarity Search in Large Dictionaries"): if lev(a,b) ≤ d,
  * the two strings share a common subsequence reachable by ≤ d single-
  * character deletions from EACH side (delete the unmatched alignment
  * characters), so exploding every ≤d-deletion variant and equi-joining
  * on the variant string proposes a candidate superset — never an
  * all-pairs product — and Spark's codegen'd `levenshtein` verifies
  * exactly (integer distances, identical in DuckDB, so the whole
  * operator is oracle-checkable bit-for-bit).
  *
  * Scale shape: a string of length L explodes into O(L^d) variants
  * (L+1 at d=1) — the published FastSS index cost, fine for the short
  * keys entity resolution targets; the join is an equi-join on the
  * variant with collision-bounded work, and the verify runs only on
  * candidates. All collection ops are built-in HOFs, no UDFs.
  */
object EditDistance {

  /** All single-deletion variants of `s`, plus `s` itself. */
  private def delOnce(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s)))))

  /** The ≤`d`-deletion neighborhood of `s` (distinct variants). */
  def deletionNeighborhood(s: Column, d: Int): Column = {
    require(d >= 1, s"maxDist must be >= 1, got $d")
    (1 until d).foldLeft(delOnce(s)) { (acc, _) =>
      array_distinct(flatten(transform(acc, v => delOnce(v))))
    }
  }

  /** (id_a, id_b, dist) for every pair with levenshtein ≤ `maxDist`,
    * id_a < id_b; exact and complete (FastSS candidates are a superset,
    * the levenshtein filter is the truth). */
  def nearPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    val vars = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("v", explode(deletionNeighborhood(col("s"), maxDist)))
      .localCheckpoint(eager = true) // feeds both sides of the self-join
    val l = vars.select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
    val r = vars.select(col("id").as("id_b"), col("s").as("s_b"), col("v"))
    val out = l.join(r, Seq("v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .localCheckpoint(eager = true)
    graft.core.Blocks.free(vars)
    out
  }
}
