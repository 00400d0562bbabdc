package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decodes raw Alpha-Vantage-shaped JSON payloads into a typed frame.
  *
  * The payload's real type (SURVEY.md §1.1) is a struct of optional
  * date-keyed maps plus error-envelope fields:
  * top-level keys `"Time Series (Daily)"` / `"Time Series (5min)"` /
  * `"Technical Analysis: SMA"` (reference `main_parallel.py:387-393`),
  * per-bar struct keys `"1. open"` … `"5. volume"`
  * (`main_parallel.py:271-275`), SMA value key `"SMA"`
  * (`main_parallel.py:350`), and envelopes `"Error Message"` / `"Note"`
  * (`main_parallel.py:378-384`).
  */
object PayloadReader {

  val barStruct: StructType = StructType(
    Seq("1. open", "2. high", "3. low", "4. close", "5. volume")
      .map(StructField(_, StringType)))

  val smaStruct: StructType = StructType(Seq(StructField("SMA", StringType)))

  val payloadSchema: StructType = StructType(Seq(
    StructField("Meta Data", MapType(StringType, StringType)),
    StructField("Time Series (Daily)", MapType(StringType, barStruct)),
    StructField("Time Series (5min)", MapType(StringType, barStruct)),
    StructField("Technical Analysis: SMA", MapType(StringType, smaStruct)),
    StructField("Error Message", StringType),
    StructField("Note", StringType)))

  /** One payload JSON document per input row → one payload struct per row. */
  def fromJsonStrings(spark: SparkSession, payloads: Dataset[String]): DataFrame =
    spark.read.schema(payloadSchema).json(payloads)

  /** Directory/glob of payload files, one (possibly pretty-printed)
    * JSON document per FILE. For JSONL (one document per line) use
    * [[fromJsonLines]] — multiLine mode would swallow lines 2..n.
    */
  def fromFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(payloadSchema).option("multiLine", true).json(path)

  /** JSONL payload files: one JSON document per line. */
  def fromJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(payloadSchema).json(path)

  /** A14: drop API error / rate-limit envelopes before normalization. */
  def valid(payloads: DataFrame): DataFrame =
    payloads.where(col("Error Message").isNull && col("Note").isNull)

  /** Symbol extracted from payload metadata. The daily/intraday endpoints
    * use metadata key `"2. Symbol"`; the SMA endpoint uses `"1: Symbol"`.
    */
  val symbol: Column =
    coalesce(
      element_at(col("Meta Data"), "2. Symbol"),
      element_at(col("Meta Data"), "1: Symbol"))
}
