package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst kernel for the similarity-search hot loop: the exact
  * long dot product of two integer-scaled vectors (see
  * [[graft.operators.VectorOps]] for the scaling contract).
  *
  * The `aggregate(zip_with(...))` higher-order formulation is interpreted
  * per element with boxed arithmetic — fine at spec scale, but it is THE
  * inner loop of brute-force top-k (O(queries × corpus × dims) calls).
  * This expression generates a tight primitive `long` loop over the two
  * `ArrayData` buffers inside whole-stage codegen: no boxing, no lambda
  * dispatch, no intermediate zipped array. Same math, same bit-exact
  * result — [[graft.queries.LlmQueries]]' oracles are unchanged.
  *
  * ==Null / length contract==
  * Unlike `aggregate(zip_with(a, b, (x, y) -> x*y), ...)` — which yields
  * NULL if any element is NULL and NULL-pads to the longer array — this
  * kernel reads each slot as a primitive `long`, so a NULL element
  * contributes as 0 and the loop runs over `min(len(a), len(b))`
  * elements. That keeps the generated loop branch-free, which is the
  * point of the expression. Callers (VectorOps.scaled) produce
  * equal-length arrays of non-null elements, where the two formulations
  * coincide; feed it genuinely nullable elements only if 0-for-NULL is
  * the semantics you want.
  */
case class LongVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for [[LongVecDot]]. */
  def longVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
