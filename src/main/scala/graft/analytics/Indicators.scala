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
    //
    // Every weight is a precomputed LITERAL (not power() at runtime):
    // the body weights feed the codegen'd graft_dot over the
    // newest-first value array (graft_dot's min-length semantics slice
    // the 64-element weight array automatically), and the oldest
    // element's tail-mass correction (1-a)^len is a literal lookup by
    // window length. No interpreted higher-order functions anywhere,
    // and an external engine replaying the same constants reproduces
    // the result bit-for-bit.
    val bodyW = array((0 until cap).map(d => lit(a * math.pow(1.0 - a, d))): _*)
    val tailW = array((1 to cap).map(d => lit(math.pow(1.0 - a, d))): _*)
    val len = size(col("__vals"))
    df.withColumn("__vals",
        reverse(collect_list(col(valueCol).cast("double")).over(w)))
      .withColumn(
        out,
        graft.functions.VectorExpressions.dot(col("__vals"), bodyW)
          // dot already weighted the oldest element by a*(1-a)^(len-1);
          // adding (1-a)^len * oldest tops it up to the full (1-a)^(len-1)
          + element_at(tailW, len) * element_at(col("__vals"), len))
      .drop("__vals")
  }

  /** The EMA weight constants for period `n`, exposed so a differential
    * oracle can interpolate the exact same literals into its SQL.
    */
  def emaWeights(n: Int, cap: Int = 64): (Seq[Double], Seq[Double]) = {
    val a = 2.0 / (n + 1)
    ((0 until cap).map(d => a * math.pow(1.0 - a, d)),
      (1 to cap).map(d => math.pow(1.0 - a, d)))
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

  /** Bollinger bands: n-bar SMA ± k·σ, full windows only. The variance
    * comes from exact decimal SUM/SUM-of-squares over the window
    * ((Σx² − (Σx)²/n)/(n−1)) rather than a streaming estimator, so the
    * result is bit-reproducible in any engine with decimal arithmetic
    * (the driver's DuckDB oracle replays it exactly).
    * `valueCol` must be a DecimalType column.
    */
  def bollinger(
      df: DataFrame,
      partitionCol: String,
      orderCols: Seq[String],
      valueCol: String,
      n: Int,
      k: Double = 2.0): DataFrame = {
    val w = Window
      .partitionBy(col(partitionCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), 0)
    val v = col(valueCol)
    // Stage each window aggregate exactly ONCE, then derive the bands as
    // scalar projections. Inlining s1/s2 into the band arithmetic makes
    // the window extractor emit every occurrence as its own window
    // expression (8× sum(v) across 3 chained Window nodes), each paying
    // the full O(frame) decimal re-aggregation per row — measured 26s
    // vs ~2s at sf0.1 for the q19 surface.
    val staged = df.select(df.columns.map(col) ++ Seq(
      sum(v).over(w).cast("double").as("__s1"),
      sum(v * v).over(w).cast("double").as("__s2"),
      count(lit(1)).over(w).as("__n")): _*)
    val mid = col("__s1") / n
    val variance = (col("__s2") - (col("__s1") * col("__s1")) / n) / (n - 1)
    val sd = sqrt(greatest(variance, lit(0.0)))
    staged
      .withColumn("bb_mid", mid)
      .withColumn("bb_upper", mid + lit(k) * sd)
      .withColumn("bb_lower", mid - lit(k) * sd)
      .where(col("__n") === n)
      .drop("__n", "__s1", "__s2")
  }

  /** RSI (simple n-bar average of gains/losses over the previous-value
    * deltas; 100 when there are no losses). Decimal delta sums → exact
    * cross-engine reproduction. Emitted only once n deltas exist.
    */
  def rsi(
      df: DataFrame,
      partitionCol: String,
      orderCols: Seq[String],
      valueCol: String,
      n: Int = 14): DataFrame = {
    val ordered = Window.partitionBy(col(partitionCol)).orderBy(orderCols.map(col): _*)
    val frame = ordered.rowsBetween(-(n - 1), 0)
    val diff = col(valueCol) - lag(col(valueCol), 1).over(ordered)
    val withDiff = df.withColumn("__diff", diff)
    // stage gains/losses/count once each (see bollinger: inlined window
    // aggregates are re-extracted per occurrence and re-aggregated per
    // row), then the RSI formula is pure scalar math
    val staged = withDiff.select(withDiff.columns.map(col) ++ Seq(
      sum(when(col("__diff") > 0, col("__diff")).otherwise(lit(0)))
        .over(frame).cast("double").as("__gains"),
      sum(when(col("__diff") < 0, -col("__diff")).otherwise(lit(0)))
        .over(frame).cast("double").as("__losses"),
      count(col("__diff")).over(frame).as("__nd")): _*)
    staged
      .withColumn("rsi",
        when(col("__losses") === 0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("__gains") / col("__losses"))))
      .where(col("__nd") === n)
      .drop("__diff", "__nd", "__gains", "__losses")
  }

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
