package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two snapshots of a PK-keyed table — the
  * operator behind "what did this ingest run actually change":
  * classifies every key as `insert` (new only), `delete` (old only) or
  * `update` (present in both with any non-key column differing);
  * unchanged rows drop out. This is the set-level complement of the
  * incremental loader (reference `ON CONFLICT DO NOTHING`,
  * `main_parallel.py:281-287`, only ever appends — the diff is how a
  * warehouse audits what an append-only feed did to the table).
  *
  * One full-outer sort-merge join on the PK — both sides shuffle once
  * on the same key, value comparison is null-safe per column
  * (`<=>` / IS DISTINCT FROM), no driver state: the 100 TB shape. If
  * both snapshots are bucketed on the PK ([[Scale.writeBucketed]]),
  * the join plans with zero exchanges.
  */
object SnapshotDiff {

  /** Returns `pk ++ (change_type)` rows for every changed key. Both
    * inputs must share a schema; `pk` columns must be non-null.
    */
  def apply(old: DataFrame, updated: DataFrame, pk: Seq[String]): DataFrame = {
    require(pk.nonEmpty, "snapshotDiff requires a primary key")
    require(old.columns.sameElements(updated.columns),
      s"snapshot schemas differ: ${old.columns.toSeq} vs ${updated.columns.toSeq}")
    val valCols = old.columns.filterNot(pk.contains).toSeq
    val o = old.as("o")
    val n = updated.as("n")
    val joined = o.join(n, pk.map(k => o(k) <=> n(k)).reduce(_ && _), "full_outer")
    val anyDiff = valCols
      .map(c => !(o(c) <=> n(c)))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    val changeType = when(o(pk.head).isNull, lit("insert"))
      .when(n(pk.head).isNull, lit("delete"))
      .when(anyDiff, lit("update"))
      .otherwise(lit("unchanged"))
    joined
      .select(
        pk.map(k => coalesce(o(k), n(k)).as(k)) :+ changeType.as("change_type"): _*)
      .where(col("change_type") =!= "unchanged")
  }
}
