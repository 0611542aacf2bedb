package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the engine's native expressions via the
  * public `SparkSessionExtensions` API:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
  *   // or .withExtensions(new GraftExtensions)
  * ...
  * spark.sql("SELECT dot_fixed(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * The DataFrame API does not need this — [[graft.operators.Similarity]]
  * builds the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** name → (implementing class, builder, usage) per injected function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression, String)] = Seq(
    ("dot_fixed", classOf[FixedDot].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_fixed takes exactly 2 arguments")
        FixedDot(children.head, children(1))
      },
      "dot_fixed(a, b) - exact fixed-point dot product of two float arrays"),
    ("cosine_sim", classOf[CosineSim].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(children.head, children(1))
      },
      "cosine_sim(a, b) - cosine similarity of two float arrays"))

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, className, builder, usage) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, null, name, usage, ""),
        builder))
    }
}
