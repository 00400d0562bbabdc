package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedded Alpha-Vantage-shaped payload fixtures (FIXTURES.md §A.1).
  * Shapes derive from the key names the reference consumes
  * (`main_parallel.py:271-275, 350, 387-393`). Values are synthetic.
  *
  * Edge rows deliberately present:
  *   - SMA key `2025-12-01 08:00` (minutes, no seconds) → dropped (A5);
  *   - a bar with a missing field and one with non-numeric volume →
  *     dropped permissively (A6);
  *   - duplicate dates across the two daily payloads for AAPL →
  *     dedup via PK anti-join (B4);
  *   - volume > 2^31 → exercises BIGINT/LongType (§1.2).
  */
object Fixtures {

  private def dailyBars(rows: Seq[(String, String, String, String, String, String)]): String =
    rows.map { case (d, o, h, l, c, v) =>
      s""""$d": {"1. open": "$o", "2. high": "$h", "3. low": "$l", "4. close": "$c", "5. volume": "$v"}"""
    }.mkString(",\n    ")

  val dailyAapl: String = s"""{
  "Meta Data": {"1. Information": "Daily Prices", "2. Symbol": "AAPL"},
  "Time Series (Daily)": {
    ${dailyBars(Seq(
      ("2025-12-09", "278.1600", "280.0300", "276.9200", "277.1800", "31753410"),
      ("2025-12-08", "276.5000", "279.2000", "275.8000", "278.0300", "29514800"),
      ("2025-12-05", "272.1100", "276.4400", "271.9000", "275.9200", "5100000000"),
      ("2025-12-04", "270.0000", "273.5000", "269.1000", "272.4400", "28100400"),
      ("2025-12-03", "268.4000", "271.0000", "267.0000", "270.1200", "30255100")))},
    "2025-12-02": {"1. open": "266.0000", "2. high": "268.9000", "3. low": "265.0000", "4. close": "267.5500", "5. volume": "not-a-number"},
    "2025-12-01": {"1. open": "264.0000", "2. high": "266.1000", "4. close": "265.3000", "5. volume": "27100000"}
  }
}"""

  /** Overlaps dailyAapl on 2025-12-09/2025-12-08 (same symbol) — used to
    * prove idempotent re-ingest inserts 0 for the overlap.
    */
  val dailyAaplNextRun: String = s"""{
  "Meta Data": {"1. Information": "Daily Prices", "2. Symbol": "AAPL"},
  "Time Series (Daily)": {
    ${dailyBars(Seq(
      ("2025-12-11", "280.0000", "282.5000", "279.0000", "281.7700", "33004100"),
      ("2025-12-10", "277.5000", "281.0000", "277.0000", "280.0600", "30900200"),
      ("2025-12-09", "278.1600", "280.0300", "276.9200", "277.1800", "31753410"),
      ("2025-12-08", "276.5000", "279.2000", "275.8000", "278.0300", "29514800")))}
  }
}"""

  val dailyMsft: String = s"""{
  "Meta Data": {"1. Information": "Daily Prices", "2. Symbol": "MSFT"},
  "Time Series (Daily)": {
    ${dailyBars(Seq(
      ("2025-12-09", "448.1000", "452.0000", "447.3000", "450.2200", "18400300"),
      ("2025-12-08", "445.9000", "449.8000", "444.0000", "448.5500", "17550200"),
      ("2025-12-05", "441.2000", "446.0000", "440.8000", "445.1000", "16800000")))}
  }
}"""

  val intradayAapl: String = """{
  "Meta Data": {"1. Information": "Intraday (5min)", "2. Symbol": "AAPL"},
  "Time Series (5min)": {
    "2025-12-09 19:55:00": {"1. open": "277.1000", "2. high": "277.3000", "3. low": "277.0000", "4. close": "277.1800", "5. volume": "210400"},
    "2025-12-09 19:50:00": {"1. open": "277.0500", "2. high": "277.2000", "3. low": "276.9000", "4. close": "277.1000", "5. volume": "180100"},
    "2025-12-09 19:45:00": {"1. open": "276.8000", "2. high": "277.1500", "3. low": "276.7500", "4. close": "277.0500", "5. volume": "150900"},
    "2025-12-09 19:40": {"1. open": "276.7000", "2. high": "276.9000", "3. low": "276.6000", "4. close": "276.8000", "5. volume": "99999"}
  }
}"""

  val smaAapl: String = """{
  "Meta Data": {"1: Symbol": "AAPL", "2: Indicator": "Simple Moving Average (SMA)"},
  "Technical Analysis: SMA": {
    "2025-12-09 16:00:00": {"SMA": "243.8080"},
    "2025-12-09 15:00:00": {"SMA": "243.5512"},
    "2025-12-08": {"SMA": "243.0020"},
    "2025-12-01 08:00": {"SMA": "241.9999"},
    "2025-12-05 16:00:00": {"SMA": "bad"}
  }
}"""

  val errorPayload: String =
    """{"Error Message": "Invalid API call. Please retry or visit the documentation."}"""

  val ratelimitPayload: String =
    """{"Note": "Thank you for using Alpha Vantage! Our standard API rate limit is 25 requests per day."}"""

  def dailyPayloads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PayloadReader.fromJsonStrings(
      spark, Seq(dailyAapl, dailyMsft, errorPayload, ratelimitPayload).toDS())
  }

  def dailyPayloadsNextRun(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PayloadReader.fromJsonStrings(spark, Seq(dailyAaplNextRun, dailyMsft).toDS())
  }

  def intradayPayloads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PayloadReader.fromJsonStrings(spark, Seq(intradayAapl).toDS())
  }

  def smaPayloads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PayloadReader.fromJsonStrings(spark, Seq(smaAapl).toDS())
  }
}
