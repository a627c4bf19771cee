package graft.store

/** Unsigned UTF-8 byte order for store keys — the order parquet UTF8
  * statistics use and the order Spark's string sort (UTF8String binary
  * compare) laid the snapshot files out in. Every key cursor (delete-job
  * enumeration, snapshot key walks, point-reader pruning) compares in
  * THIS order so driver-side sets and snapshot streams interleave
  * consistently; Java String's UTF-16 code-unit order disagrees for
  * supplementary-plane characters (ADVICE r17).
  *
  * UTF-8 byte order equals Unicode code-point order, so the compare walks
  * code points without allocating byte arrays.
  */
object Key {

  def cmp(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def cmpPair(a: (String, String), b: (String, String)): Int = {
    val c = cmp(a._1, b._1)
    if (c != 0) c else cmp(a._2, b._2)
  }

  /** Componentwise lexicographic over equal-arity key tuples. */
  def cmpSeq(a: Seq[String], b: Seq[String]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = cmp(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  val ordering: Ordering[String] = (a, b) => cmp(a, b)
  val pairOrdering: Ordering[(String, String)] = (a, b) => cmpPair(a, b)
  val seqOrdering: Ordering[Seq[String]] = (a, b) => cmpSeq(a, b)
}
