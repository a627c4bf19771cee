package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for pathological key skew. A shuffle join hashes every row
  * of one key onto ONE reducer — at 100 TB a single hot key (the empty
  * document, a boilerplate URL, a default twin model) turns into one task
  * that runs for hours while 999 executors idle. AQE's skew-join split
  * handles moderate sort-merge skew automatically; this operator is the
  * explicit form for the cases AQE cannot rescue — known-hot keys far
  * beyond a partition split, or plans where the skewed side feeds a
  * downstream stage that must stay co-partitioned.
  *
  * Recipe (the standard one): split both sides on a broadcast hot-key
  * list; cold keys join normally; hot probe rows get a deterministic salt
  * in [0, salts) and hot build rows are replicated `salts` times, so the
  * join key becomes (key, salt) and each hot key spreads over `salts`
  * reducers. The union of the two joins is row-identical to the plain
  * join for ANY hot-key list — the list only moves work between the two
  * paths, so a stale frequency estimate can cost performance, never
  * correctness.
  */
object SkewJoin {

  /** Keys of `df` whose row count reaches `minCount` — the broadcastable
    * hot list. One map-side-combinable aggregation; by construction the
    * result has at most n/minCount rows, so a sane threshold keeps it
    * broadcast-sized no matter how large `df` is. */
  def hotKeys(df: DataFrame, keyCol: String, minCount: Long): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount).select(col(keyCol))

  /** Inner equi-join of `left` and `right` on `leftKey = rightKey`,
    * salted on the keys listed in `hot`. Output columns are
    * left ++ right, exactly as `left.join(right, ...)` would produce.
    * `left` should be the skewed (probe) side; `right`'s hot rows are
    * replicated `salts` times, so keep `salts` proportional to the
    * worst observed key ÷ target partition size. */
  def join(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, hot: DataFrame, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val hotSet = broadcast(hot.toDF("__hk"))
    def split(df: DataFrame, key: String): (DataFrame, DataFrame) =
      (df.join(hotSet, col(key) === col("__hk"), "left_semi"),
        df.join(hotSet, col(key) === col("__hk"), "left_anti"))
    val (leftHot, leftCold) = split(left, leftKey)
    val (rightHot, rightCold) = split(right, rightKey)
    val cold = leftCold.join(rightCold,
      leftCold(leftKey) === rightCold(rightKey))
    // Deterministic per-row salt from the probe row's full content: no
    // rand() (replay/retry must re-salt identically). Identical duplicate
    // rows share a salt — they carry identical join work either way.
    val salted = leftHot.withColumn("__salt",
      pmod(xxhash64(struct(leftHot.columns.map(col): _*)), lit(salts))
        .cast("int"))
    val replicated = rightHot.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    val hotJoined = salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop(salted("__salt")).drop(replicated("__salt"))
    cold.unionByName(hotJoined)
  }
}
