package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the migration/backfill audit every
  * warehouse cutover runs: row-level diff of two snapshots of the same
  * table (old pipeline vs. new, yesterday vs. today, primary vs.
  * replica), classifying each key as added / removed / changed / same.
  *
  * Comparison is per-column null-safe equality (`<=>`), never a
  * formatted-string row hash: string rendering of doubles/timestamps is
  * engine- and locale-dependent, while `<=>` compares the typed values
  * themselves. Shape: ONE full-outer join on the PK — both sides hash
  * by key, nothing global; at 100 TB this is the same plan family as
  * any fact-fact equi-join and AQE handles the skewed-key case.
  */
object Reconcile {

  /** Diff `b` (new snapshot) against `a` (old): one row per PK present
    * in either side, with `status` ∈ added|removed|changed|same and the
    * compared columns from both sides as `a_<col>` / `b_<col>`.
    */
  def tableDiff(
      a: DataFrame,
      b: DataFrame,
      pk: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val as = a.select(pk.map(col) ++
      compareCols.map(c => col(c).as(s"a_$c")): _*).withColumn("__ina", lit(true))
    val bs = b.select(pk.map(col) ++
      compareCols.map(c => col(c).as(s"b_$c")): _*).withColumn("__inb", lit(true))
    val same = compareCols
      .map(c => col(s"a_$c") <=> col(s"b_$c"))
      .reduce(_ && _)
    as.join(bs, pk, "full_outer")
      .withColumn("status",
        when(col("__inb").isNull, lit("removed"))
          .when(col("__ina").isNull, lit("added"))
          .when(same, lit("same"))
          .otherwise(lit("changed")))
      .drop("__ina", "__inb")
  }
}
