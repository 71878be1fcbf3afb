package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{JaroWinkler, VecDot, VecLshSignature}

/** Session extension registering the engine's custom Catalyst surface —
  * SQL functions over the codegen'd expressions (`vec_dot`/`vec_cosine`,
  * the Spark-native replacement for the reference's Flink
  * `ScalarFunction` registry, SURVEY.md §2.J) and the
  * [[graft.plans.RangeJoinRewrite]] optimizer rule (automatic bin-grid
  * rewrite of large-large range joins, opt-in via
  * `spark.graft.rangeJoin.binWidth`).
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `withExtensions` on the session builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_cosine(a, b) takes exactly 2 arguments")
        // TryDivide, matching Vectors.cosine: a zero-norm vector yields
        // null (ranks last) instead of an ANSI DIVIDE_BY_ZERO job failure
        import org.apache.spark.sql.catalyst.expressions.{Multiply, Sqrt, TryEval, Divide}
        val (a, b) = (children.head, children(1))
        TryEval(Divide(VecDot(a, b),
          Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b)))))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "jaro_winkler(a, b) takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }))
  }
}
