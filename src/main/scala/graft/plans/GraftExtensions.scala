package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.FloatDot

/** Session-extension entry point (the PUBLIC registration path, tier
  * (c) of the extension preference order): install with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Injects:
  *   - `float_dot(a, b)` as a SQL function (no manual register call)
  *   - [[FloatDotRewrite]], an optimizer rule that turns the
  *     declarative HOF dot product into the whole-stage-codegen'd
  *     native expression
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getCanonicalName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDot(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => FloatDotRewrite)
  }
}

/** Rewrite `aggregate(zip_with(x, y, (a, b) -> a * b), 0.0,
  * (acc, v) -> acc + v)` over float arrays into [[FloatDot]].
  *
  * FloatDot folds left-to-right in double — the SAME IEEE op sequence
  * as the HOF chain — so equal-length all-non-null inputs are
  * bit-identical. Two semantic gaps are guarded at RUNTIME:
  * unequal lengths (zip_with pads with NULLs → whole sum NULL, while
  * FloatDot stops at min(len)) via `size(x) = size(y)`, and — only
  * when the array type admits null elements — a null slot (HOF sum
  * becomes NULL, FloatDot reads 0.0) via `NOT exists(arr, isnull)`.
  * Rows failing the guard fall through to the original expression.
  * The STATIC requirement is that the zip lambda multiplies in
  * double (see [[isPairwiseMul]]); a raw-float multiply rounds each
  * product to float before widening and is not bit-equivalent. */
object FloatDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  /** `NOT exists(arr, e -> isnull(e))` — the runtime guard for
    * nullable-element arrays (parquet list elements are nullable by
    * default even when no null ever occurs, so a static containsNull
    * check would kill the rewrite on every real table). */
  private def noNullElem(arr: Expression): Expression = {
    val lv = NamedLambdaVariable("gx", FloatType, nullable = true)
    Not(ArrayExists(arr, LambdaFunction(IsNull(lv), Seq(lv))))
  }

  /** strip casts, then require the expression to BE the given bound
    * lambda variable (matched by exprId — lambda vars are
    * NamedLambdaVariable after analysis, not AttributeReferences). */
  private def sameVar(e: Expression, arg: NamedExpression): Boolean =
    (stripCast(e), arg) match {
      case (v: NamedLambdaVariable, a: NamedLambdaVariable) =>
        v.exprId == a.exprId
      case _ => false
    }

  /** body is (a cast/raw) * (b cast/raw) of exactly the two lambda
    * variables in order, AND the multiply itself evaluates in double.
    * Without the dataType check a raw-float `(a, b) -> a * b` (where
    * the analyzer only casts at the outer Add) would match, but there
    * each product rounds to float before widening while FloatDot
    * multiplies widened doubles — low-order bits differ. */
  private def isPairwiseMul(body: Expression,
                            args: Seq[NamedExpression]): Boolean = body match {
    case m @ Multiply(l, r, _) if m.dataType == DoubleType =>
      sameVar(l, args.head) && sameVar(r, args(1))
    case _ => false
  }

  private def isPairwiseAdd(body: Expression,
                            args: Seq[NamedExpression]): Boolean = body match {
    case Add(l, r, _) => sameVar(l, args.head) && sameVar(r, args(1))
    case _ => false
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other => other
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg), _) => sameVar(body, arg)
    case _ => false
  }

  /** Explicit recursion instead of transformDown/Up: the rewrite
    * embeds the original aggregate as the If's ragged-input fallback,
    * so any traversal that revisits rule output (transformDown
    * in-pass, or the optimizer batch's fixed-point re-runs) would
    * re-wrap it forever. The skip case makes the rule IDEMPOTENT:
    * an already-guarded subtree is left untouched wholesale. */
  private def rewriteExpr(e: Expression): Expression = e match {
    case If(_, _: FloatDot, _) => e
    case _ =>
      e.mapChildren(rewriteExpr) match {
        case agg @ ArrayAggregate(
              ZipWith(x, y, LambdaFunction(mulBody, mulArgs, _)),
              Literal(0.0, DoubleType),
              LambdaFunction(addBody, addArgs, _),
              finish)
            if isFloatArray(x) && isFloatArray(y) &&
              isPairwiseMul(mulBody, mulArgs) &&
              isPairwiseAdd(addBody, addArgs) &&
              isIdentity(finish) =>
          val guards = Seq(EqualTo(Size(x), Size(y))) ++
            (if (elemNullable(x)) Seq(noNullElem(x)) else Nil) ++
            (if (elemNullable(y)) Seq(noNullElem(y)) else Nil)
          If(guards.reduce(And), FloatDot(x, y), agg)
        case other => other
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp { case p => p.mapExpressions(rewriteExpr) }
}
