package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.catalyst.util.FailureSafeParser
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Minimal bridge to the `private[sql]` Column ↔ Expression converters
  * (Spark 4 moved the old public `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic`). This is the one sanctioned-by-
  * convention seam for libraries shipping custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A reusable JSON-document → InternalRow parser for the given (possibly
    * column-pruned) schema — the same `JacksonParser` + permissive
    * `FailureSafeParser` stack `spark.read.json` uses internally, exposed
    * for the graft DataSource V2 payload reader. One parser instance per
    * partition; apply it per document.
    */
  def jsonDocParser(schema: StructType): String => Iterator[InternalRow] = {
    val opts = new JSONOptions(Map.empty[String, String], "UTC")
    val raw = new JacksonParser(schema, opts, allowArrayAsStructs = false)
    val safe = new FailureSafeParser[String](
      input => raw.parse(input, CreateJacksonParser.string, UTF8String.fromString),
      opts.parseMode, schema, opts.columnNameOfCorruptRecord)
    (doc: String) => safe.parse(doc)
  }
}
