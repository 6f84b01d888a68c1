package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{RowNumberToTopKRule, TopKColumnPruningRule, TopKStrategy}

import graft.functions.LongVecDot

/** Session extension registering the engine's custom Catalyst surface, so
  * SQL users get it without touching the Scala API:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ... // or .withExtensions(new GraftExtensions()(_))
  *   spark.sql("SELECT long_vec_dot(a, b) FROM vectors")
  * }}}
  *
  * Currently: `long_vec_dot` ([[graft.functions.LongVecDot]], the
  * codegen'd exact integer dot product behind q18/q19/q28/q30) and the
  * planner strategy for the native top-k-per-key operator
  * ([[org.apache.spark.sql.graftbridge.TopKPerKey]], used through
  * [[graft.operators.TopK]]). These are the (c)-tier extension points of
  * the build brief — used only where a built-in genuinely can't express
  * the semantics efficiently; everything else in the engine is plain
  * `org.apache.spark.sql.functions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => RowNumberToTopKRule)
    // runs inside the fixed-point operator-optimization batch, so built-in
    // ColumnPruning pushes the Project this rule inserts down to the scan
    ext.injectOptimizerRule(_ => TopKColumnPruningRule)
    ext.injectFunction((
      new FunctionIdentifier("long_vec_dot"),
      new ExpressionInfo(
        classOf[LongVecDot].getName, null, "long_vec_dot",
        "long_vec_dot(a, b) - exact dot product of two array<bigint> vectors",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "long_vec_dot takes exactly 2 arguments")
        LongVecDot(children.head, children(1))
      }))
  }
}
