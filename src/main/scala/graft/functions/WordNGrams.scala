package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a token array as a native codegen'd kernel:
  * `["a","b","c","d"]` with n=3 → `["a b c", "b c d"]` (full n-grams only;
  * fewer than n tokens → empty array).
  *
  * Why native: shingling feeds every dedup operator (MinHash / SimHash /
  * Jaccard, Dedup.scala). The two Column-level formulations both lose at
  * scale — `transform(sequence, slice)` is interpreter-evaluated per row,
  * and the posexplode + `lead().over(Window.partitionBy(doc))` form
  * re-shuffles and sorts the ENTIRE token stream just to pair adjacent
  * tokens (a full repartition of ~all bytes at 100 TB). This expression is
  * embarrassingly parallel — n-grams are built row-locally inside
  * whole-stage codegen at scan speed, so the only shuffle left in a dedup
  * pass is the one the algorithm actually needs (the distinct / groupBy).
  *
  * Output strings are `sep`-joined and byte-identical to the
  * positional-join SQL the DuckDB oracles use, with one deliberate
  * divergence from the retired `transform(sequence, slice)` formulation:
  * a document with fewer than n tokens yields an EMPTY array here, where
  * the old slice-based form emitted one partial shingle. Empty is the
  * semantics the dedup operators want — a doc too short to hold a full
  * n-gram has no shingle evidence, so MinHash/Jaccard never pair it on a
  * fragment (see TextAnalysisSpec "short docs yield no shingles"). */
case class WordNGrams(child: Expression, n: Int, sep: String = " ")
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sepU = UTF8String.fromString(sep)
    val m = math.max(toks.numElements() - (n - 1), 0)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sepU, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", UTF8String.fromString(sep),
        "org.apache.spark.unsafe.types.UTF8String")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      s"""
         |int $m = java.lang.Math.max($a.numElements() - ${n - 1}, 0);
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[$n];
         |  for (int $j = 0; $j < $n; $j++) $parts[$j] = $a.getUTF8String($i + $j);
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  /** Column-level entry: `ngrams(tokensArray, 3)`. */
  def ngrams(tokens: Column, n: Int, sep: String = " "): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(tokens), n, sep))
}
