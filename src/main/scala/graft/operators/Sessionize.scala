package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign each row a session id that increments
  * whenever the gap to the previous event of the same key exceeds
  * `gapMicros`. The classic event-analytics operator (user sessions,
  * trading bursts, machine incident windows).
  *
  * Implementation is the standard two-window formulation — a lag to
  * flag session starts, a running sum to number them — both windows
  * share ONE partitioning (the key) and ONE sort (the timestamp), so
  * the whole operator costs a single shuffle + per-partition sort at
  * any scale: the same plan shape a 1000-executor job wants (each
  * executor sessionizes its keys independently; no driver state, no
  * iteration).
  */
object Sessionize {

  /** Adds `session_id` (1-based per key, ordered by time) to `df`.
    * Rows with a null timestamp sort first and join the first session.
    * Ties at the same timestamp never open a session (gap 0).
    */
  def apply(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapMicros: Long,
      out: String = "session_id"): DataFrame = {
    require(keys.nonEmpty, "sessionize requires at least one key")
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    // cast("timestamp"): no-op for TIMESTAMP, reinterpretation for
    // TIMESTAMP_NTZ under a UTC session (unix_micros rejects NTZ)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(micros, 1).over(byKey)
    val isStart = when(
      prev.isNull || (micros - prev) > gapMicros, 1L).otherwise(0L)
    df.withColumn(out,
      sum(isStart).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
