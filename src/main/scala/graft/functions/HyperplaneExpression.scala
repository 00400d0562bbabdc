package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All hyperplane-LSH bucket keys of a vector in ONE native loop: for
  * each table, the sign bits of the vector's dot products against that
  * table's planes, rendered as `"t:bits"`.
  *
  * The column formulation builds tables × planes separate `graft_dot`
  * calls plus `when`/`concat` towers — each codegen'd individually, but
  * the expression tree re-reads the vector per plane and pays
  * per-expression dispatch. This fuses the whole tables × planes × dim
  * multiply-add block and emits the strings directly. Bit-for-bit equal
  * to the column form (spec-gated): same sequential accumulation per
  * dot, same `>= 0` sign rule, identical strings.
  */
case class HyperplaneBuckets(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  @transient private lazy val flat: Array[Array[Double]] =
    planes.map(tbl => tbl.flatten.toArray).toArray
  @transient private lazy val planesPerTable: Int = planes.head.length
  @transient private lazy val dim: Int =
    if (planes.head.isEmpty) 0 else planes.head.head.length

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = arr.getDouble(i); i += 1 }
    val lim = math.min(n, dim) // graft_dot's min-length rule
    val out = new Array[AnyRef](flat.length)
    var t = 0
    while (t < flat.length) {
      val tp = flat(t)
      val sb = new java.lang.StringBuilder(planesPerTable + 4)
      sb.append(t).append(':')
      var p = 0
      while (p < planesPerTable) {
        var dot = 0.0
        val off = p * dim
        var j = 0
        while (j < lim) { dot += vec(j) * tp(off + j); j += 1 }
        sb.append(if (dot >= 0) '1' else '0')
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpbuckets", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_buckets"
}

object HyperplaneBuckets {
  def apply(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(HyperplaneBuckets(
      Bridge.expression(vec.cast("array<double>")), planes))
}
