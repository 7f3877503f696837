package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point (SURVEY §2.13 / guide §custom
  * operator): registers the native expressions as SQL functions so
  * `spark.sql("... dot_product(a, b) ...")` plans the codegen'd
  * Catalyst expression. Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (done by `core.Sessions.local`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => DotProductRewrite)
    e.injectOptimizerRule(_ => graft.plans.MvRewrite)
    GraftTableFunctions.register(e)
    e.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}
