package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM segmentation over a token array: `array<string>`
  * of words → `struct(pieces: array<string>, cost: bigint)` — the
  * flattened Viterbi piece stream across the words plus the summed
  * total cost, applying [[graft.text.Unigram.Model]] per word
  * (min-integer-cost, ties to the smallest start — the exact rule the
  * DuckDB recursive-CTE oracle replays). The model rides along as a
  * reference object; the generated code is one virtual call per row
  * (the graft_bpe_subwords pattern), so the projection stays inside
  * whole-stage codegen regardless of table size.
  */
case class UnigramEncode(child: Expression, model: graft.text.Unigram.Model)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("cost", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  /** Row kernel, called from both eval and generated code. */
  def encodeTokens(input: ArrayData): InternalRow = {
    val n = input.numElements()
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var total = 0L
    var i = 0
    while (i < n) {
      val w = input.getUTF8String(i)
      if (w != null) {
        val (pieces, cost) = model.encodeWord(w.toString)
        total += cost
        var j = 0
        while (j < pieces.length) {
          out += UTF8String.fromString(pieces(j))
          j += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](new GenericArrayData(out.toArray), total))
  }

  override def nullSafeEval(input: Any): Any =
    encodeTokens(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramExpr", this,
      classOf[UnigramEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeTokens($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_unigram_encode"
}

object UnigramEncode {
  def apply(tokens: Column, model: graft.text.Unigram.Model): Column =
    Bridge.column(UnigramEncode(Bridge.expression(tokens), model))
}
