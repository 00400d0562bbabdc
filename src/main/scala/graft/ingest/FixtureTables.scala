package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dumps the embedded payload fixtures as RAW relational parquet so an
  * external SQL engine (the driver's DuckDB oracle) can replay the
  * normalize / incremental-load / top-N semantics from the exact same
  * input rows the Spark queries consume.
  *
  * The dumped shape is the post-explode, pre-cast bar: one row per
  * (symbol, series key) with every numeric still a STRING. Everything
  * the reference's parse loop does after that point — strict key-format
  * timestamp parsing, DECIMAL(15,4)/BIGINT casts, permissive bad-row
  * drop (`main_parallel.py:254-362`) — is then replayable in portable
  * SQL, giving the stock surface the same hash-level differential proof
  * as the corpus queries instead of rows-only checks.
  */
object FixtureTables {

  /** Absolute location the oracle SQL embeds via `read_parquet` — the
    * root for EVERY artifact a query writes and its oracle re-reads
    * (payload raws, classifier weight dumps, shard exports, format
    * round-trips, ANN index stores, media fixtures).
    *
    * PER-PROCESS unique by default, so two JVMs (a Bench interleaved
    * with a Verify, or two Verify generations in the driver's harness)
    * can never overwrite what the other's pending DuckDB compare will
    * replay — the round-9 q124/q125 hash-mismatch class. [[graft.Verify]]
    * pins it INTO ITS OWN OUTPUT DIRECTORY at startup (before any query
    * or oracle-SQL generation runs), making each verify run's dumps
    * write-once, private, and durable for the compare process that runs
    * afterwards.
    */
  @volatile var root: String = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"),
    s"graft_fixture_tables_p${ProcessHandle.current().pid()}").getAbsolutePath

  @volatile private var writtenBy: SparkSession = _

  private def rawBars(payloads: DataFrame, seriesKey: String): DataFrame =
    PayloadReader.valid(payloads)
      .select(
        PayloadReader.symbol.as("company_symbol"),
        explode(col(seriesKey)).as(Seq("k", "bar")))
      .select(
        col("company_symbol"), col("k"),
        col("bar")("1. open").as("open_s"),
        col("bar")("2. high").as("high_s"),
        col("bar")("3. low").as("low_s"),
        col("bar")("4. close").as("close_s"),
        col("bar")("5. volume").as("volume_s"))

  private def rawSma(payloads: DataFrame): DataFrame =
    PayloadReader.valid(payloads)
      .select(
        PayloadReader.symbol.as("company_symbol"),
        explode(col("Technical Analysis: SMA")).as(Seq("k", "bar")))
      .select(col("company_symbol"), col("k"), col("bar")("SMA").as("sma_s"))

  /** Idempotently (once per session) write the four raw fixture tables.
    * Tiny frames — coalesce(1) keeps each table a single file.
    */
  def ensure(spark: SparkSession): String = synchronized {
    if (writtenBy ne spark) {
      def dump(df: DataFrame, name: String): Unit =
        df.coalesce(1).write.mode("overwrite").parquet(s"$root/$name.parquet")
      dump(rawBars(Fixtures.dailyPayloads(spark), "Time Series (Daily)"), "daily_raw")
      dump(rawBars(Fixtures.dailyPayloadsNextRun(spark), "Time Series (Daily)"), "daily_raw2")
      dump(rawBars(Fixtures.intradayPayloads(spark), "Time Series (5min)"), "intraday_raw")
      dump(rawSma(Fixtures.smaPayloads(spark)), "sma_raw")
      writtenBy = spark
    }
    root
  }
}
