package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd expression — the
  * entity-resolution scorer [[graft.operators.FuzzyJoin]]'s
  * edit-distance verify can't replace: Jaro tolerates transpositions
  * and weights by BOTH lengths (levenshtein punishes a long name for
  * one extra token), and the Winkler prefix boost encodes that human
  * identifiers diverge at the END (typos, suffixes), not the start.
  * Spark has levenshtein but no Jaro family; a UDF would leave
  * codegen, so this is a (b)-tier custom expression like
  * [[UnicodeNormalize]].
  *
  * Semantics pinned to the textbook definition (and verified against
  * DuckDB's `jaro_winkler_similarity`, which the gate oracle runs):
  * match window = max(0, ⌊max(|a|,|b|)/2⌋ − 1); transpositions t/2;
  * either side empty → 0; Winkler boost `j + ℓ·0.1·(1−j)` with ℓ =
  * common prefix capped at 4, applied only when j > 0.7. O(|a|·|b|)
  * per pair — pair generation stays the blocked join's job; this
  * scores candidates. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires string inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")
}

object JaroWinkler {

  /** Static kernel shared by eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}
