package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** True (unrestricted) Damerau–Levenshtein distance — the
  * Lowrance–Wagner algorithm: minimum number of insertions,
  * deletions, substitutions and ADJACENT TRANSPOSITIONS that turn
  * `a` into `b`, where a transposed pair may be edited again later
  * (unlike the cheaper optimal-string-alignment restriction).
  * Distinguishing fixture: DL("CA","ABC") = 2 (OSA gives 3) — the
  * value DuckDB 1.0.0's `damerau_levenshtein` returns, which is what
  * lets q201 sit under the driver's integer hash.
  *
  * Spark ships `levenshtein` but no transposition-aware distance;
  * this is the tier-(b) extension path (native Expression, not a
  * UDF): `doGenCode` emits a call to the static [[DamerauLev.dist]]
  * helper inside whole-stage codegen — no boxing, no serialization,
  * null-safety handled by `nullSafeCodeGen`. The DP is O(|a|·|b|)
  * time / space per row and purely row-local, so the operator is
  * embarrassingly parallel — at 100 TB it rides whatever scan/join
  * produced the string pair, adding no shuffle.
  *
  * Unit of comparison is the UTF-16 code unit (`String.charAt`),
  * identical to DuckDB's byte-wise walk on ASCII inputs — the
  * declared query compares nation names (ASCII). For non-BMP text
  * the two engines could count differently; the scaladoc contract is
  * ASCII/BMP, matching `levenshtein`'s own caveats.
  */
object DamerauLev {

  /** Static DP kernel, called from both eval paths and the generated
    * code. Lowrance–Wagner with a 128-slot last-occurrence table for
    * ASCII plus a map spill for anything wider. */
  def dist(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    // (la+2) x (lb+2) DP matrix with the Lowrance–Wagner sentinel row
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    val daAscii = new Array[Int](128)
    var daWide: java.util.HashMap[Character, Integer] = null
    def lastRow(c: Char): Int =
      if (c < 128) daAscii(c)
      else if (daWide == null) 0
      else { val v = daWide.get(c); if (v == null) 0 else v.intValue() }
    def setLastRow(c: Char, r: Int): Unit =
      if (c < 128) daAscii(c) = r
      else {
        if (daWide == null) daWide = new java.util.HashMap[Character, Integer]()
        daWide.put(c, r)
      }
    i = 1
    while (i <= la) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= lb) {
        val bj = b.charAt(j - 1)
        val k = lastRow(bj)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        var m = if (sub < ins) sub else ins
        if (del < m) m = del
        if (tra < m) m = tra
        d(i + 1)(j + 1) = m
        j += 1
      }
      setLastRow(ai, i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

/** Column-level wrapper: `damerau_levenshtein(a, b)` as a codegen'd
  * Catalyst expression returning INT (cast to BIGINT at call sites
  * for the oracle's type contract). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLev.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLev.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
