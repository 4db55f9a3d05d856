package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product — the hot
  * scalar of similarity search. `aggregate(zip_with(...))` builds an
  * intermediate array per row and walks it through two higher-order-
  * function frames; this expression is a single fused loop with `doGenCode`
  * so the whole cosine stays inside one WholeStageCodegen span
  * (preference order (b) of the build brief: custom Expression before
  * custom operator). Sum order is left-to-right sequential — identical to
  * the fold the DuckDB oracle mirrors, so results stay bit-compatible.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc_${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  acc_${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = acc_${ev.value};
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  val FnName = "graft_vec_dot"

  /** Idempotently register the expression with the session's function
    * registry (Spark 4 keeps Column↔Expression bridging private, so the
    * registry + `call_function` is the public route).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Dot product of two array<float> columns ([[register]] first). */
  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
}
