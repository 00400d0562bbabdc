package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE segmentation over a token array: `array<string>` of
  * words → the flattened `array<string>` of their subwords, applying
  * [[graft.text.Bpe.Merges]] per word (leftmost-lowest-rank, one
  * merge per step — the exact rule the DuckDB recursive-CTE oracle
  * replays). The merge table rides along as a reference object; the
  * generated code is one virtual call per row (the graft_winnow
  * pattern), so the whole projection stays inside whole-stage codegen
  * regardless of table size.
  *
  * `marked = true` emits the Sennrich et al. continuation notation:
  * every NON-final subword of a word carries the "@@" suffix, which
  * makes the flattened stream losslessly decodable — rejoin with
  * spaces, delete every `"@@ "`, and the original token stream
  * reappears (t42's round-trip contract; the unmarked stream cannot
  * be decoded because word boundaries are gone).
  */
case class BpeSubwords(child: Expression, merges: graft.text.Bpe.Merges,
    marked: Boolean = false, byteLevel: Boolean = false)
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
        val subs =
          if (byteLevel) merges.encodeBytes(w.toString)
          else merges.encodeWord(w.toString)
        var j = 0
        while (j < subs.length) {
          val sub =
            if (marked && j < subs.length - 1) subs(j) + "@@" else subs(j)
          out += UTF8String.fromString(sub)
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
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeSubwords].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeTokens($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_subwords"
}

object BpeSubwords {
  def apply(tokens: Column, merges: graft.text.Bpe.Merges): Column =
    Bridge.column(BpeSubwords(Bridge.expression(tokens), merges))

  /** The continuation-marked stream (t42's decodable encoding). */
  def marked(tokens: Column, merges: graft.text.Bpe.Merges): Column =
    Bridge.column(
      BpeSubwords(Bridge.expression(tokens), merges, marked = true))

  /** Byte-level ([UNK]-free) marked stream — t52's decodable
    * encoding: hex-pair base alphabet via [[graft.text.Bpe.Merges
    * .encodeBytes]], continuation "@@" markers as in [[marked]].
    */
  def markedBytes(tokens: Column, merges: graft.text.Bpe.Merges): Column =
    Bridge.column(BpeSubwords(Bridge.expression(tokens), merges,
      marked = true, byteLevel = true))

  /** Unmarked byte-level stream (t46's mass counting — marker-free,
    * like [[apply]] for the char alphabet).
    */
  def bytes(tokens: Column, merges: graft.text.Bpe.Merges): Column =
    Bridge.column(BpeSubwords(Bridge.expression(tokens), merges,
      byteLevel = true))
}
