package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, L2Distance, L2Norm}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions so `spark.sql("SELECT vec_cosine(a, b)")`
  * works next to the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    reg("vec_cosine", es => CosineSimilarity(es(0), es(1)))
    reg("vec_dot", es => DotProduct(es(0), es(1)))
    reg("vec_l2", es => L2Distance(es(0), es(1)))
    reg("vec_norm", es => L2Norm(es(0)))
  }
}
