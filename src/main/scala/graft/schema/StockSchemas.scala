package graft.schema

import org.apache.spark.sql.types._

/** Canonical schemas for the four stock tables.
  *
  * Source of truth is the reference's newest DDL variants
  * (`/root/reference/main_parallel.py:164-203`,
  * `/root/reference/create_tables_duckdb.sql:1-36`): `BIGINT` volume,
  * `DECIMAL(15,4)` prices, `date_time TIMESTAMP` key for SMA
  * (SURVEY.md §1.2 / §7.1 decision 1).
  */
object StockSchemas {
  val Money: DecimalType = DecimalType(15, 4)

  val companies: StructType = StructType(Seq(
    StructField("company_symbol", StringType, nullable = false)))

  val dailyStockPrices: StructType = StructType(Seq(
    StructField("company_symbol", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("open_price", Money, nullable = false),
    StructField("high_price", Money, nullable = false),
    StructField("low_price", Money, nullable = false),
    StructField("close_price", Money, nullable = false),
    StructField("volume", LongType, nullable = false)))

  val intradayStockPrices: StructType = StructType(Seq(
    StructField("company_symbol", StringType, nullable = false),
    StructField("date_time", TimestampType, nullable = false),
    StructField("open_price", Money, nullable = false),
    StructField("high_price", Money, nullable = false),
    StructField("low_price", Money, nullable = false),
    StructField("close_price", Money, nullable = false),
    StructField("volume", LongType, nullable = false)))

  val smaIndicators: StructType = StructType(Seq(
    StructField("company_symbol", StringType, nullable = false),
    StructField("date_time", TimestampType, nullable = false),
    StructField("sma_value", Money, nullable = false)))

  /** Primary keys — drive dedup-within-batch and the idempotent-append
    * anti-join (reference `ON CONFLICT (pk) DO NOTHING`,
    * `main_parallel.py:281-287`).
    */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "companies"             -> Seq("company_symbol"),
    "daily_stock_prices"    -> Seq("company_symbol", "date"),
    "intraday_stock_prices" -> Seq("company_symbol", "date_time"),
    "sma_indicators"        -> Seq("company_symbol", "date_time"))

  val tables: Map[String, StructType] = Map(
    "companies"             -> companies,
    "daily_stock_prices"    -> dailyStockPrices,
    "intraday_stock_prices" -> intradayStockPrices,
    "sma_indicators"        -> smaIndicators)

  /** Storage partitioning: the fact tables partition by symbol so the
    * reference's `WHERE company_symbol = ?` reads (B2/B8) prune
    * partitions at planning time. `companies` is a single-column dim —
    * no data columns would remain under partition dirs.
    */
  val partitioning: Map[String, Seq[String]] = Map(
    "companies"             -> Nil,
    "daily_stock_prices"    -> Seq("company_symbol"),
    "intraday_stock_prices" -> Seq("company_symbol"),
    "sma_indicators"        -> Seq("company_symbol"))
}
