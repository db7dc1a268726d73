package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.typedLit
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression for the k-means hot path: index of the
  * nearest centroid (squared-L2) to a float vector — the engine's
  * hottest ML inner loop (k·dims FLOPs per row, every assignment
  * pass). Replaces the per-row Scala UDF that paid Seq[Float] boxing
  * and serialization per row: `doGenCode` inlines the k×dims loop
  * into whole-stage codegen reading Unsafe arrays directly.
  *
  * Arithmetic is the UDF's exact IEEE op sequence — diff = (double)
  * emb[i] − cent[i], d2 += diff·diff, centroids scanned in index
  * order, strict < keeping the LOWEST index on ties — so assignments
  * are bit-identical to the UDF path (`Round6Spec` proves it row for
  * row) and every invariant spec built on the UDF loop still holds.
  *
  * Like [[FloatDot]] this is the FAST input-controlled variant
  * (Column-API only, not SQL-registered): `left` is array<float>
  * with no null elements, `right` an array<array<double>> centroid
  * literal whose rows all have the embedding's width — our KMeans
  * call sites guarantee both (fixed-width parquet embeddings,
  * driver-built centroid arrays). */
case class FloatL2Argmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val k = cents.numElements()
    var best = 0
    var bd = Double.MaxValue
    var ci = 0
    while (ci < k) {
      val c = cents.getArray(ci)
      val n = c.numElements()
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val diff = emb.getFloat(i).toDouble - c.getDouble(i)
        d2 += diff * diff
        i += 1
      }
      if (d2 < bd) { bd = d2; best = ci }
      ci += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |int $k = $b.numElements();
         |int $best = 0;
         |double $bd = Double.MAX_VALUE;
         |for (int $ci = 0; $ci < $k; $ci++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($ci);
         |  int $n = $c.numElements();
         |  double $d2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $a.getFloat($i) - $c.getDouble($i);
         |    $d2 += $diff * $diff;
         |  }
         |  if ($d2 < $bd) { $bd = $d2; $best = $ci; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatL2Argmin =
    copy(left = newLeft, right = newRight)
}

object FloatL2Argmin {
  /** Column-API entry: nearest-centroid index of `emb` among the
    * driver-side centroid array (embedded as a plan literal — k·dims
    * doubles, the same payload the UDF broadcast). */
  def float_l2_argmin(emb: Column, cents: Array[Array[Double]]): Column = {
    val centsCol = typedLit[Seq[Seq[Double]]](cents.map(_.toSeq).toSeq)
    Bridge.column(
      FloatL2Argmin(Bridge.expression(emb), Bridge.expression(centsCol)))
  }
}
