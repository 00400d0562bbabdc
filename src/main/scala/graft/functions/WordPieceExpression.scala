package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece segmentation over a token array: `array<string>`
  * of words → the flattened `array<string>` of their pieces, applying
  * [[graft.text.WordPiece.Vocab]] per word (greedy longest-match with
  * "##" continuations, whole-word [UNK] on failure — the exact rule
  * the DuckDB recursive-CTE oracle replays). The vocabulary rides
  * along as a reference object; the generated code is one virtual
  * call per row (the [[BpeSubwords]] pattern), so the projection
  * stays inside whole-stage codegen regardless of vocabulary size.
  */
case class WordPieceEncode(child: Expression,
    vocab: graft.text.WordPiece.Vocab)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  /** Row kernel, called from both eval and generated code. */
  def encodeTokens(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < n) {
      val w = input.getUTF8String(i)
      if (w != null) {
        val pieces = vocab.encodeWord(w.toString)
        var j = 0
        while (j < pieces.length) {
          out += UTF8String.fromString(pieces(j))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    encodeTokens(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("wpExpr", this, classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeTokens($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_wordpiece_encode"
}

object WordPieceEncode {
  def apply(tokens: Column, vocab: graft.text.WordPiece.Vocab): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(tokens), vocab))
}
