package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst kernels for vector similarity.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * by the interpreter — a 64-dim cosine via folds costs ~200 interpreted
  * expression nodes per row pair, which measured ~150 s for a 2000×2000
  * nearest-neighbor pass at sf0.1. These expressions run the same kernel as
  * a tight JVM loop with whole-stage codegen (`doGenCode` emits the loop
  * inline), bringing the pass to ~100× faster per pair.
  *
  * Element access follows the reference semantics of pgvector distance
  * functions (l2_distance / cosine ordering, DigitalTwins.cs:1242-1248 of
  * /root/reference): elements are widened to double BEFORE multiplication,
  * and accumulation is sequential left-to-right — bit-identical to an
  * engine that casts the array to DOUBLE[] first (our DuckDB oracles).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  protected def elemAccessor(dt: DataType, arr: String, i: String): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  protected def elemEval(dt: DataType, arr: ArrayData, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }
}

/** Σ aᵢ·bᵢ over two numeric arrays (sequential double accumulation). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += elemEval(left.dataType, x, i) * elemEval(right.dataType, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${elemAccessor(left.dataType, a, i)} * ${elemAccessor(right.dataType, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — squared L2 distance. */
case class L2DistanceSq(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = elemEval(left.dataType, x, i) - elemEval(right.dataType, y, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${elemAccessor(left.dataType, a, i)} - ${elemAccessor(right.dataType, b, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object VectorFunctions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(e(a), e(b)))
  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2DistanceSq(e(a), e(b)))
}
