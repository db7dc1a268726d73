package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the ANN hot path: dot product of
  * two float vectors, accumulated left-to-right in double — the SAME
  * fold order as the `aggregate(zip_with(...))` composition it
  * replaces, so results are bit-identical and the DuckDB oracles
  * still match.
  *
  * Null semantics are the FULL higher-order-function equivalence
  * (which makes [[graft.plans.FloatDotRewrite]] a total rewrite, no
  * runtime guard): a null array, unequal lengths (zip_with pads the
  * short side with nulls → the whole sum is null), or any null
  * element all yield NULL. The per-element null check is one branch
  * inside the generated loop — nothing interpreted on the hot path.
  *
  * Why an Expression and not a UDF: `doGenCode` emits a tight Java
  * loop inline into the whole-stage-generated code — no
  * serialization, no per-element boxing, no higher-order-function
  * dispatch per element. This is tier (b) of the extension
  * preference order (compose built-ins > native Expression > custom
  * plan > mapPartitions). */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Ragged/null-element inputs yield null even when both arrays are
    * non-null, so nullability cannot be narrowed statically. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Column-API entry point. */
  def float_dot(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))

  /** Register `float_dot(a, b)` for SQL-text queries on `spark`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "float_dot",
      exprs => FloatDot(exprs.head, exprs(1)))
}
