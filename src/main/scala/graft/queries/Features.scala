package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Joins

/** Round-9 (continued) training-pipeline surface: point-in-time
  * feature assembly, privacy profiling, and closed-form model fitting
  * — the operations that sit between a curated corpus and a training
  * job. Each query carries a bit-exact DuckDB oracle reached by an
  * independent mechanism (DuckDB's native ASOF JOIN vs our windowed
  * union-scan as-of; its GROUPING SETS vs ours; its decimal engine vs
  * ours).
  *
  * Cross-engine float discipline (see README "determinism"): every
  * order-dependent sum is quantized to DECIMAL before aggregation;
  * final scalar math (regression solves, ratios) runs on doubles
  * derived from exact decimal sums with an identical written
  * operation order in both engines, so each IEEE step is correctly
  * rounded from identical inputs.
  */
object Features {

  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val dec2 = DecimalType(18, 2)

  // ---------------------------------------------------- feature store

  /** q118: point-in-time training-set assembly (the feature-store
    * join). Spine = orders of the event-covered customers, label =
    * `o_totalprice`; features = each customer's cumulative activity
    * snapshot (event count, decimal-exact lifetime value, purchase
    * count, last-seen timestamp) as of STRICTLY before the order
    * timestamp — the leakage-safe contract: a feature row stamped at
    * the label's own instant is invisible to it
    * ([[Joins.asofJoin]] `strict = true`).
    *
    * Plan shape: one keyed aggregate on (user, ts) collapses the raw
    * event stream (map-side combined), one window pass builds the
    * running snapshot on the collapsed frame, and the as-of join is
    * the single-shuffle union-scan — three exchanges total on the
    * same `user_id` key family, no row explosion anywhere. At 100 TB
    * the snapshot frame is |distinct (user, ts)| ≪ |events| and the
    * spine join never materializes candidate pairs, so cost is one
    * sort per key partition — the same shape pandas `merge_asof` /
    * kdb `aj` users expect, but distributed.
    *
    * The oracle reaches the identical result through DuckDB's native
    * `ASOF LEFT JOIN` with a strict `>` comparator — an entirely
    * different mechanism (binary-search probe vs our windowed scan),
    * so a hash match is strong evidence both engines implement the
    * same point-in-time semantics. Lifetime value sums 2-decimal
    * DECIMAL quantizations of the (2-decimal-valued) event doubles:
    * order-independent-exact in both engines.
    */
  val q118_feature_store: Q = (s, dir) => {
    val ev = t(s, dir, "events")
      .groupBy(col("user_id"), col("ts"))
      .agg(
        count(lit(1)).as("__n"),
        sum(round(col("value"), 2).cast(dec2)).as("__v"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("__p"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val snap = ev
      .withColumn("n_events", sum(col("__n")).over(w))
      .withColumn("lifetime_value", sum(col("__v")).over(w).cast(dec2))
      .withColumn("n_purchases", sum(col("__p")).over(w))
      .select(col("user_id"), col("ts").as("last_seen_ts"),
        col("n_events"), col("lifetime_value"), col("n_purchases"))
    val spine = t(s, dir, "orders").where(col("o_custkey") < 150)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"),
        col("o_orderdate"), col("o_totalprice").as("label"))
    Joins.asofJoin(spine, snap, Seq("user_id"),
        leftTs = "o_orderdate", rightTs = "last_seen_ts", strict = true)
      .select(
        col("o_orderkey"), col("user_id"), col("o_orderdate"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("lifetime_value"), lit(0).cast(dec2)).as("lifetime_value"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        col("last_seen_ts"),
        col("label"))
  }

  val q118_sql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, COUNT(*) AS n,
      |    SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS v,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      |  FROM events GROUP BY user_id, ts),
      |snap AS (
      |  SELECT user_id, ts AS last_seen_ts,
      |    CAST(SUM(n) OVER w AS BIGINT) AS n_events,
      |    CAST(SUM(v) OVER w AS DECIMAL(18,2)) AS lifetime_value,
      |    CAST(SUM(p) OVER w AS BIGINT) AS n_purchases
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT o.o_orderkey, o.o_custkey AS user_id, o.o_orderdate,
      |  COALESCE(f.n_events, 0) AS n_events,
      |  COALESCE(f.lifetime_value, CAST(0 AS DECIMAL(18,2))) AS lifetime_value,
      |  COALESCE(f.n_purchases, 0) AS n_purchases,
      |  f.last_seen_ts,
      |  o.o_totalprice AS label
      |FROM orders o ASOF LEFT JOIN snap f
      |  ON o.o_custkey = f.user_id AND o.o_orderdate > f.last_seen_ts
      |WHERE o.o_custkey < 150""".stripMargin

  // ------------------------------------------------------------ maps

  val queries: Map[String, Q] = Map(
    "q118_feature_store" -> q118_feature_store)

  val oracles: Map[String, String] = Map(
    "q118_feature_store" -> q118_sql)
}
