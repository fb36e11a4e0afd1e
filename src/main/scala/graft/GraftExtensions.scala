package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the engine's native Catalyst expressions with the function
  * registry so they are callable from SQL and `call_function` without any
  * private-API Column construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName,
        null,
        "cosine_sim",
        "cosine_sim(a, b) - fused cosine similarity of two array<double> vectors",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children(0), children(1))
      }))
  }
}
