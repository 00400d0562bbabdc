package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the vector math on the similarity
  * hot path. Spark's higher-order functions (`zip_with` + `aggregate`)
  * are evaluated interpreted — fine for one row, ruinous for the
  * pair-join inner loop of near-dup detection at 100 TB. These
  * expressions generate a tight Java loop over the underlying
  * `ArrayData` (no per-element closure dispatch, no boxing), staying
  * inside whole-stage codegen.
  *
  * Summation is sequential left-to-right, matching both the
  * higher-order-function formulation and any scalar engine's loop —
  * results are bit-identical to the DuckDB oracle.
  */
object VectorExpressions {

  /** Sums are accumulated exactly like the codegen below. */
  private def sums(a: ArrayData, b: ArrayData): (Double, Double, Double) = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    (dot, na, nb)
  }

  abstract class VectorBinary extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    // Inputs must already be array<double> (the Column wrappers below
    // insert the cast; SQL users cast explicitly).
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  /** cosine(a, b) = dot/(‖a‖·‖b‖); 0.0 when either norm is 0. */
  case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinary {

    override def nullSafeEval(l: Any, r: Any): Any = {
      val (dot, na, nb) = sums(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $a.getDouble($i);
           |  double $y = $b.getDouble($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0)
           |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "graft_cosine"
  }

  /** dot(a, b) — sequential sum of elementwise products. */
  case class DotProduct(left: Expression, right: Expression) extends VectorBinary {

    override def nullSafeEval(l: Any, r: Any): Any =
      sums(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])._1

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "graft_dot"
  }

  /** Column-API entry points (no session/registration needed). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  /** Second argument of the SQL forms of graft_fingerprint /
    * graft_simhash_fold must be a literal int (it parameterizes the
    * generated code, like a window frame size).
    */
  private[functions] def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal integer argument, got $other")
  }

  private[functions] def stringLit(e: Expression, fn: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal string argument, got $other")
  }

  /** SQL registration (`graft_cosine`, `graft_dot`, `graft_fingerprint`,
    * `graft_simhash_fold`) for `spark.sql` users; idempotent per session.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[FingerprintMinMd5].getName, "graft_fingerprint"),
      (children: Seq[Expression]) =>
        FingerprintMinMd5(children(0), intLit(children(1), "graft_fingerprint")))
    reg.registerFunction(
      FunctionIdentifier("graft_simhash_fold"),
      new ExpressionInfo(classOf[SimHashFold].getName, "graft_simhash_fold"),
      (children: Seq[Expression]) =>
        SimHashFold(children(0), intLit(children(1), "graft_simhash_fold")))
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // from the registry into an AggregateExpression during resolution
    reg.registerFunction(
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "graft_kmv"),
      (children: Seq[Expression]) =>
        KmvDistinct(children(0), intLit(children(1), "graft_kmv")))
    reg.registerFunction(
      FunctionIdentifier("graft_spacesaving"),
      new ExpressionInfo(classOf[SpaceSavingTopK].getName, "graft_spacesaving"),
      (children: Seq[Expression]) =>
        SpaceSavingTopK(children(0), intLit(children(1), "graft_spacesaving")))
    reg.registerFunction(
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_normalize"),
      (children: Seq[Expression]) =>
        UnicodeNormalize(children(0), stringLit(children(1), "graft_normalize")))
    reg.registerFunction(
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (children: Seq[Expression]) =>
        WinnowFingerprints(children(0), intLit(children(1), "graft_winnow"),
          intLit(children(2), "graft_winnow")))
    reg.registerFunction(
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) =>
        JaroWinklerSimilarity(children(0), children(1)))
  }
}

/** `SparkSessionExtensions` hook: enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` to get the
  * SQL functions in every session without explicit registration.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => VectorExpressions.CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => VectorExpressions.DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[FingerprintMinMd5].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => FingerprintMinMd5(
        children(0), VectorExpressions.intLit(children(1), "graft_fingerprint"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_fold"),
      new ExpressionInfo(classOf[SimHashFold].getName, "graft_simhash_fold"),
      (children: Seq[Expression]) => SimHashFold(
        children(0), VectorExpressions.intLit(children(1), "graft_simhash_fold"))))
    ext.injectFunction((
      FunctionIdentifier("graft_spacesaving"),
      new ExpressionInfo(classOf[SpaceSavingTopK].getName, "graft_spacesaving"),
      (children: Seq[Expression]) => SpaceSavingTopK(
        children(0), VectorExpressions.intLit(children(1), "graft_spacesaving"))))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_normalize"),
      (children: Seq[Expression]) => UnicodeNormalize(children(0),
        VectorExpressions.stringLit(children(1), "graft_normalize"))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (children: Seq[Expression]) => WinnowFingerprints(children(0),
        VectorExpressions.intLit(children(1), "graft_winnow"),
        VectorExpressions.intLit(children(2), "graft_winnow"))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) =>
        JaroWinklerSimilarity(children(0), children(1))))
    // config-gated COUNT(DISTINCT) → KMV sketch rewrite (no-op unless
    // spark.graft.approxDistinct.enabled=true)
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite)
  }
}
