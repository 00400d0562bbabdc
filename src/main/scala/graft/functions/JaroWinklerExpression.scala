package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression — the
  * scoring kernel of the entity-resolution join (the fuzzy-match
  * counterpart of [[graft.dedup.Dedup.edJoin]]'s exact edit-distance
  * join). Spark ships `levenshtein` but no Jaro–Winkler; a Scala UDF
  * here would box two strings per candidate pair on the ER join's hot
  * path, so this is a Catalyst expression whose generated code is one
  * virtual call into [[score]] per row, keeping the surrounding
  * pair-join projection inside whole-stage codegen.
  *
  * Semantics match the classic definition exactly as DuckDB's
  * `jaro_winkler_similarity` implements it (verified value-identical
  * on probe pairs, so the oracle can replay the formula):
  *   - matching window `max(|a|,|b|)/2 - 1`, greedy left-to-right
  *     match marking; transpositions = half the mismatched aligned
  *     matches;
  *   - jaro = (m/|a| + m/|b| + (m-t)/m) / 3, 0 when m = 0;
  *   - Winkler boost `j + L·0.1·(1-j)` for common prefix L ≤ 4, only
  *     when j > 0.7;
  *   - either string empty → 0.0 (DuckDB returns 0 even for two empty
  *     strings — no equality shortcut before the length check).
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  /** Row kernel, called from both eval and generated code. Works on
    * UTF-16 char sequences (identical to codepoints for the fixture
    * alphabet; ties out with DuckDB on all probe pairs).
    */
  def score(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(la, lb) / 2 - 1
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, lb)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - half).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(la, lb))
      while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    score(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jwExpr", this,
      classOf[JaroWinklerSimilarity].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.score($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

object JaroWinklerSimilarity {
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSimilarity(
      Bridge.expression(a), Bridge.expression(b)))
}
