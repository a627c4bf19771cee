package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece algorithm —
  * Wu et al. 2016, the BERT tokenizer; same scheme HuggingFace
  * `BertTokenizer` implements): each whitespace token is consumed
  * left-to-right by the longest vocabulary piece, continuation pieces
  * carry the `##` prefix, and a word with an un-coverable remainder
  * becomes a single `[UNK]`. This replaces the `bpeishCount` proxy with a
  * REAL trained-vocabulary tokenizer — the piece that makes token budgets
  * ([[graft.pipeline.Packing]]), context chunking and mixing quotas match
  * what the training job will actually see.
  *
  * Why a native expression: tokenization runs over every byte of a
  * 100 TB corpus. There is no Column-level formulation of greedy longest
  * match (higher-order functions can't express the two-level cursor
  * loop), and a Scala UDF pays serialization per row. The kernel is
  * row-local (embarrassingly parallel, no shuffle), runs inside
  * whole-stage codegen, and shares one broadcast-sized vocabulary
  * hash-set per JVM via a reference object — both the interpreted and
  * generated paths call the same static routine, so they cannot drift. */
case class WordPiece(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]", maxWordLen: Int = 64) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val unkU = UTF8String.fromString(unk)

  override def nullSafeEval(input: Any): Any =
    WordPiece.encode(input.asInstanceOf[ArrayData], vocabSet, unkU, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val vocabRef = ctx.addReferenceObj("vocab", vocabSet,
        "java.util.HashSet<String>")
      val unkRef = ctx.addReferenceObj("unk", unkU,
        "org.apache.spark.unsafe.types.UTF8String")
      s"""
         |${ev.value} = graft.functions.WordPiece.encode(
         |  $a, $vocabRef, $unkRef, $maxWordLen);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPiece {

  /** The greedy longest-match loop, shared verbatim by the interpreted
    * and codegen paths. Empty tokens vanish (a double space contributes
    * nothing); over-long words are `[UNK]` without scanning O(len²). */
  def encode(toks: ArrayData, vocab: java.util.HashSet[String],
      unk: UTF8String, maxWordLen: Int): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val w = toks.getUTF8String(i).toString
      if (w.isEmpty) {
        // nothing
      } else if (w.length > maxWordLen) {
        out.add(unk)
      } else {
        val pieces = new java.util.ArrayList[UTF8String]()
        var start = 0
        var bad = false
        while (start < w.length && !bad) {
          var end = w.length
          var found: String = null
          while (end > start && found == null) {
            val cand =
              if (start > 0) "##" + w.substring(start, end)
              else w.substring(start, end)
            if (vocab.contains(cand)) found = cand else end -= 1
          }
          if (found == null) bad = true
          else { pieces.add(UTF8String.fromString(found)); start = end }
        }
        if (bad) out.add(unk)
        else { var j = 0; while (j < pieces.size()) { out.add(pieces.get(j)); j += 1 } }
      }
      i += 1
    }
    new GenericArrayData(out.toArray())
  }

  /** Column entry: subword pieces of a token array. */
  def tokenize(tokens: Column, vocab: Seq[String], unk: String = "[UNK]",
      maxWordLen: Int = 64): Column =
    ColumnBridge.column(WordPiece(ColumnBridge.expression(tokens), vocab,
      unk, maxWordLen))
}
