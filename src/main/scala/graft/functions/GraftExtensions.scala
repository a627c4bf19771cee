package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql` users get them alongside the DataFrame API:
  *
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  *   spark.sql("... WHERE graft_json_type(properties, 'dims') = 'object'")
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two numeric arrays (double)"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "squared L2 distance of two numeric arrays"),
      (args: Seq[Expression]) => L2DistanceSq(args(0), args(1))),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(DotProduct(args(0), args(1)),
          Multiply(Sqrt(DotProduct(args(0), args(0))),
            Sqrt(DotProduct(args(1), args(1)))))
      }),
    (FunctionIdentifier("graft_json_type"),
      info("graft_json_type", "JSON type at a dotted path"),
      (args: Seq[Expression]) => JsonTypeOf(args(0), args(1))),
    (FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams",
        "word n-grams of a token array: graft_ngrams(tokens, 3)"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_ngrams n must be an integer literal, got $other")
        }
        WordNGrams(args(0), n)
      }))

  /** Register directly on an already-constructed session (the extensions
    * path only applies at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, i, builder)
    }
}
