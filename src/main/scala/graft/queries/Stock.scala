package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.StockPipeline
import graft.analytics.Indicators
import graft.ingest.{Fixtures, Normalize}

/** The stock-pipeline surface (SURVEY.md §2.A) demonstrated on the
  * embedded Alpha-Vantage-shaped fixtures. These don't read `sfDir`, so
  * they carry no DuckDB oracle — the driver records rows-only checks;
  * exact-value coverage lives in the ScalaTest specs.
  */
object Stock {

  type Q = (SparkSession, String) => DataFrame

  /** A2-A6: payload JSON → normalized daily rows (edge rows dropped). */
  val stock_daily_normalize: Q = (s, _) =>
    Normalize.daily(Fixtures.dailyPayloads(s))

  /** A5 strict single-format timestamps on the 5-min series. */
  val stock_intraday_normalize: Q = (s, _) =>
    Normalize.intraday(Fixtures.intradayPayloads(s))

  /** A5 dual-format keys: date-only → midnight; `HH:mm` keys dropped. */
  val stock_sma_normalize: Q = (s, _) =>
    Normalize.sma(Fixtures.smaPayloads(s))

  /** A7/B1/B4/B6/A13/B9: full idempotent two-run load; returns the loaded
    * daily table (second run inserted only genuinely-new bars).
    */
  val stock_incremental_load: Q = (s, _) => StockPipeline.demo(s)

  /** B10 computed natively: 3-bar SMA over the fixture intraday closes. */
  val stock_sma_native: Q = (s, _) =>
    Indicators.sma(
      Normalize.intraday(Fixtures.intradayPayloads(s)),
      partitionCol = "company_symbol",
      orderCols = Seq("date_time"),
      valueCol = "close_price",
      n = 3)
      .select(col("company_symbol"), col("date_time"), col("sma_value"))

  /** B8: the reference's exemplar user query (`README_duckdb.md:78-84`)
    * over the fixture-loaded table.
    */
  val stock_latest_bars: Q = (s, _) =>
    Indicators.latestN(
      Normalize.daily(Fixtures.dailyPayloads(s)),
      keyCol = "company_symbol", key = "AAPL",
      orderCol = "date", n = 10)
      .select(col("company_symbol"), col("date"), col("close_price"))

  val queries: Map[String, Q] = Map(
    "stock_daily_normalize"    -> stock_daily_normalize,
    "stock_intraday_normalize" -> stock_intraday_normalize,
    "stock_sma_normalize"      -> stock_sma_normalize,
    "stock_incremental_load"   -> stock_incremental_load,
    "stock_sma_native"         -> stock_sma_native,
    "stock_latest_bars"        -> stock_latest_bars)
}
