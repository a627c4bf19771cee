package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase blocklist matching via an Aho-Corasick automaton
  * (Aho & Corasick 1975): ONE left-to-right pass over the text finds
  * every occurrence of every phrase, independent of how many phrases the
  * list holds. This is the curation primitive behind domain/phrase
  * blocklists (C4's "bad words" filter, contamination canaries, policy
  * phrase screens): the naive formulation — one `contains` per phrase —
  * scans the corpus N times, which at 10k phrases × 100 TB is the
  * difference between one pass and ten thousand.
  *
  * Returns the DISTINCT matched phrases, sorted — a deterministic,
  * engine-comparable witness (membership, not positions). Same native
  * dual-path pattern as [[WordPiece]]/[[BpeSegment]]: the automaton is
  * built once per JVM and shared via a codegen reference object. */
case class BlocklistMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val automaton: Blocklist.Automaton =
    Blocklist.build(phrases)

  override def nullSafeEval(input: Any): Any =
    Blocklist.matches(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acRef = ctx.addReferenceObj("ac", automaton,
        "graft.functions.Blocklist.Automaton")
      s"${ev.value} = graft.functions.Blocklist.matches($a, $acRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Blocklist {

  /** Trie + failure links, flattened to arrays. `out(n)` lists the phrase
    * indexes that END at node n (own phrase plus inherited via the fail
    * chain, precomputed so the scan loop never walks fail links for
    * output). */
  final class Automaton(
      val next: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int],
      val out: Array[Array[Int]],
      val phrases: Array[UTF8String]) extends Serializable

  def build(rawPhrases: Seq[String]): Automaton = {
    // matches() contracts DISTINCT matched phrases; a duplicate entry would
    // get its own output index and emit the same text twice.
    val phrases = rawPhrases.distinct
    require(phrases.nonEmpty, "blocklist must not be empty")
    require(phrases.forall(_.nonEmpty), "blocklist phrases must be non-empty")
    val next = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    val ownOut = new java.util.ArrayList[java.util.ArrayList[Int]]()
    def newNode(): Int = {
      next.add(new java.util.HashMap[Character, Integer]())
      ownOut.add(new java.util.ArrayList[Int]())
      next.size - 1
    }
    newNode() // root = 0
    phrases.zipWithIndex.foreach { case (p, pi) =>
      var cur = 0
      p.foreach { ch =>
        val n = next.get(cur).get(Character.valueOf(ch))
        cur = if (n != null) n.intValue()
        else { val nn = newNode(); next.get(cur).put(Character.valueOf(ch), nn); nn }
      }
      ownOut.get(cur).add(pi)
    }
    // BFS failure links; out sets inherit from the fail target
    val n = next.size
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    val queue = new java.util.ArrayDeque[Integer]()
    out(0) = ownOut.get(0).stream().mapToInt(_.intValue()).toArray
    next.get(0).forEach { (_, child) =>
      fail(child) = 0
      queue.add(child); ()
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      val inherited = out(fail(u))
      val own = ownOut.get(u)
      val merged = new Array[Int](own.size + inherited.length)
      var k = 0
      while (k < own.size) { merged(k) = own.get(k); k += 1 }
      System.arraycopy(inherited, 0, merged, own.size, inherited.length)
      out(u) = merged
      next.get(u).forEach { (ch, child) =>
        // follow fail chain to find the longest proper suffix with ch
        var f = fail(u)
        var hop = next.get(f).get(ch)
        while (hop == null && f != 0) { f = fail(f); hop = next.get(f).get(ch) }
        fail(child) = if (hop != null && hop.intValue() != child.intValue())
          hop.intValue() else 0
        queue.add(child); ()
      }
    }
    new Automaton(
      next.toArray(new Array[java.util.HashMap[Character, Integer]](0)),
      fail, out, phrases.map(UTF8String.fromString).toArray)
  }

  /** One pass: distinct matched phrases, sorted by phrase text. */
  def matches(text: UTF8String, ac: Automaton): GenericArrayData = {
    val s = text.toString
    val hit = new Array[Boolean](ac.phrases.length)
    var hits = 0
    var state = 0
    var i = 0
    while (i < s.length && hits < ac.phrases.length) {
      val ch = Character.valueOf(s.charAt(i))
      var nxt = ac.next(state).get(ch)
      while (nxt == null && state != 0) {
        state = ac.fail(state)
        nxt = ac.next(state).get(ch)
      }
      state = if (nxt != null) nxt.intValue() else 0
      val o = ac.out(state)
      var j = 0
      while (j < o.length) {
        if (!hit(o(j))) { hit(o(j)) = true; hits += 1 }
        j += 1
      }
      i += 1
    }
    val found = new java.util.ArrayList[UTF8String]()
    var p = 0
    while (p < hit.length) { if (hit(p)) found.add(ac.phrases(p)); p += 1 }
    found.sort((a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(found.toArray())
  }

  /** Column entry: sorted distinct blocklist phrases present in `text`. */
  def matched(text: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(BlocklistMatches(ColumnBridge.expression(text), phrases))

  /** The C4-style usage: drop every document containing ANY blocklist
    * phrase. Pure per-row filter — pushes into the scan stage, zero
    * shuffle, streaming-safe. */
  def screen(df: org.apache.spark.sql.DataFrame, textCol: String,
      phrases: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(org.apache.spark.sql.functions.size(
      matched(org.apache.spark.sql.functions.col(textCol), phrases)) === 0)
}
