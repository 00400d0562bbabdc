package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the stock tables. B10 is the reference's
  * one true analytic (it delegates the SMA computation to the Alpha
  * Vantage API, `main_parallel.py:240-243`, and only stores the result);
  * this engine computes it natively, plus the obvious adjacent window
  * analytics.
  *
  * All functions are window-partitioned by symbol, so they shuffle once
  * on the symbol key and scale horizontally; per-symbol history sorts
  * locally within partitions. For very long single-symbol histories,
  * pre-partition storage by symbol to avoid re-shuffling.
  */
object Indicators {

  /** B10: n-period simple moving average of `valueCol`, emitted only for
    * rows with a full n-bar window — matching the API's semantics of
    * producing SMA only once `time_period` bars exist (SURVEY.md §7.5.3).
    * `orderCols` must be a unique ordering per partition for
    * deterministic results.
    */
  def sma(
      df: DataFrame,
      partitionCol: String,
      orderCols: Seq[String],
      valueCol: String,
      n: Int,
      out: String = "sma_value"): DataFrame = {
    require(n >= 1, s"sma period must be >= 1, got $n")
    val w = Window
      .partitionBy(col(partitionCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), 0)
    df.withColumn(out, avg(col(valueCol)).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .where(col("__n") === n)
      .drop("__n")
  }

  /** n-period exponential moving average (smoothing 2/(n+1)), seeded with
    * the first value. Uses the closed form over a bounded window so it
    * stays a single window aggregate (no sequential recursion):
    * EMA_t ≈ sum_{i=0..k} a(1-a)^i x_{t-i} + (1-a)^{t} x_0 truncated at
    * `cap` terms (error < (1-a)^cap).
    */
  def ema(
      df: DataFrame,
      partitionCol: String,
      orderCols: Seq[String],
      valueCol: String,
      n: Int,
      out: String = "ema_value",
      cap: Int = 64): DataFrame = {
    val a = 2.0 / (n + 1)
    val w = Window
      .partitionBy(col(partitionCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(cap - 1), 0)
    // weight per element = a*(1-a)^dist, except the oldest in-window
    // element takes the whole tail mass (1-a)^dist so weights sum to 1:
    // exact EMA while the window is unsaturated, truncation-approx after.
    df.withColumn("__vals", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn(
        out,
        expr(
          s"""aggregate(
             |  zip_with(__vals, sequence(size(__vals) - 1, 0, -1),
             |           (v, d) -> v * CASE WHEN d = size(__vals) - 1
             |                              THEN power(1.0 - $a, d)
             |                              ELSE $a * power(1.0 - $a, d) END),
             |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin))
      .drop("__vals")
  }

  /** Per-symbol period-over-period returns: (close - prev) / prev. */
  def returns(
      df: DataFrame,
      partitionCol: String,
      orderCols: Seq[String],
      valueCol: String,
      out: String = "return"): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(orderCols.map(col): _*)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn(out, (col(valueCol) - prev) / prev)
  }

  /** B8: latest n rows for one key — the reference's exemplar user query
    * (`README_duckdb.md:78-84`). Plans as TakeOrderedAndProject (top-K,
    * no global sort).
    */
  def latestN(df: DataFrame, keyCol: String, key: String, orderCol: String, n: Int): DataFrame =
    df.where(col(keyCol) === lit(key)).orderBy(col(orderCol).desc).limit(n)

  /** Rolling min/max/volatility over an n-bar window (full windows only). */
  def rollingStats(
      df: DataFrame,
      partitionCol: String,
      orderCols: Seq[String],
      valueCol: String,
      n: Int): DataFrame = {
    val w = Window
      .partitionBy(col(partitionCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), 0)
    val v: Column = col(valueCol)
    df.withColumn("rolling_min", min(v).over(w))
      .withColumn("rolling_max", max(v).over(w))
      .withColumn("rolling_stddev", stddev_samp(v.cast("double")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .where(col("__n") === n)
      .drop("__n")
  }
}
