package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding segmentation (Sennrich et al. 2016 — the merge-list
  * tokenizer scheme GPT-2/RoBERTa popularized; HuggingFace `BPE` model):
  * each whitespace token starts as single characters, then the learned
  * merge list applies in rank order — at every step the lowest-ranked
  * adjacent pair present in the word merges at all its (left-to-right,
  * non-overlapping) occurrences — until no listed pair remains. Together
  * with [[graft.pipeline.TextAnalysis.bpeTrain]] this closes the
  * tokenizer loop: train the merges on the corpus, then count/segment
  * with them at corpus scale.
  *
  * Why a native expression (same rationale as [[WordPiece]]): the
  * iterate-until-fixpoint merge loop has no Column-level formulation, a
  * UDF pays per-row serialization, and segmentation runs over every byte
  * of the corpus. The rank map is shared per JVM via a codegen reference
  * object; interpreted and generated paths call the same static routine,
  * so they cannot drift. */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0001" + b, i); ()
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeSegment.encode(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ranksRef = ctx.addReferenceObj("ranks", ranks,
        "java.util.HashMap<String,Integer>")
      s"${ev.value} = graft.functions.BpeSegment.encode($a, $ranksRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegment {

  /** The merge loop, shared verbatim by the interpreted and codegen
    * paths. Per token: chars → repeatedly merge the lowest-ranked
    * adjacent pair (all occurrences, left-to-right) → emit the surviving
    * symbols. Empty tokens vanish. */
  def encode(toks: ArrayData,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val w = toks.getUTF8String(i).toString
      if (w.nonEmpty) {
        var syms = new java.util.ArrayList[String](w.length)
        var k = 0
        while (k < w.length) { syms.add(String.valueOf(w.charAt(k))); k += 1 }
        var done = syms.size < 2
        while (!done) {
          var best = Integer.MAX_VALUE
          var j = 0
          while (j < syms.size - 1) {
            val r = ranks.get(syms.get(j) + "\u0001" + syms.get(j + 1))
            if (r != null && r < best) best = r
            j += 1
          }
          if (best == Integer.MAX_VALUE) done = true
          else {
            val merged = new java.util.ArrayList[String](syms.size)
            var p = 0
            while (p < syms.size) {
              val hit = p < syms.size - 1 && {
                val r = ranks.get(syms.get(p) + "\u0001" + syms.get(p + 1))
                r != null && r.intValue() == best
              }
              if (hit) { merged.add(syms.get(p) + syms.get(p + 1)); p += 2 }
              else { merged.add(syms.get(p)); p += 1 }
            }
            syms = merged
            done = syms.size < 2
          }
        }
        var m = 0
        while (m < syms.size) {
          out.add(UTF8String.fromString(syms.get(m))); m += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray())
  }

  /** Column entry: BPE pieces of a token array under a trained merge
    * list (rank = position in `merges`). */
  def segment(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(tokens), merges))
}
