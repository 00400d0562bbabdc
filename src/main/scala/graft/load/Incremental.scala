package graft.load

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incremental, idempotent loading — the reference's high-water-mark +
  * `ON CONFLICT DO NOTHING` semantics (SURVEY.md §2 A7/B1/B4/B6),
  * re-expressed as set operations so they are order-independent and
  * shuffle-parallel:
  *
  *   - watermark: ONE hash aggregate over the target computes
  *     `MAX(ts) per key` for all keys (vs. the reference's one SELECT
  *     round-trip per symbol, `main_parallel.py:206-218`);
  *   - the watermark frame is broadcast when small (key cardinality ~
  *     symbols), so the incoming fact stream is filtered map-side with
  *     no shuffle;
  *   - cross-batch dedup: left-anti join on the PK — at scale this is
  *     the only correct general idempotent append (the target's PK set
  *     can be arbitrarily large), and AQE picks broadcast vs. shuffled
  *     anti join by runtime size.
  *
  * The order-dependent early-break variant (A8, `main.py:137-140`) is
  * deliberately NOT reproduced — SURVEY.md §7.1 decision 2.
  */
object Incremental {

  /** B1: per-key high-water marks, one aggregate for all keys. */
  def highWaterMarks(target: DataFrame, keyCol: String, tsCol: String): DataFrame =
    target.groupBy(col(keyCol)).agg(max(col(tsCol)).as("__hwm"))

  /** A7 (order-independent): keep incoming rows strictly newer than the
    * target's watermark for their key; keys unseen in the target pass.
    */
  def newerThanWatermark(
      incoming: DataFrame,
      target: DataFrame,
      keyCol: String,
      tsCol: String,
      broadcastWatermark: Boolean = true): DataFrame = {
    val hwm0 = highWaterMarks(target, keyCol, tsCol)
    val hwm = if (broadcastWatermark) broadcast(hwm0) else hwm0
    incoming
      .join(hwm, Seq(keyCol), "left")
      .where(col("__hwm").isNull || col(tsCol) > col("__hwm"))
      .drop("__hwm")
  }

  /** B6 within-batch + B4 cross-batch: at-most-once on the PK.
    *
    * Rows with a NULL in any PK column are rejected outright: a real
    * primary key forbids NULLs (the reference's Postgres INSERT would
    * error), and equality anti-joins never match NULL keys — keeping
    * such rows would re-insert them on every run, silently breaking
    * idempotency.
    */
  def notInTarget(incoming: DataFrame, target: DataFrame, pk: Seq[String]): DataFrame =
    incoming
      .where(pk.map(col(_).isNotNull).reduce(_ && _))
      .dropDuplicates(pk)
      .join(target.select(pk.map(col): _*), pk, "left_anti")

  /** Incremental aggregate maintenance: merge partial aggregate STATES
    * instead of recomputing from raw history — the materialized-view
    * refresh pattern. Each input frame holds per-key additive buffers
    * (counts, exact decimal sums — anything where merge(a,b) = a + b;
    * avg is kept as sum+count, never a stored ratio); the merge is one
    * union + re-aggregate on the keys. At 100 TB this is the difference
    * between touching one new partition's partials and rescanning the
    * table: cost is O(|new data| + |distinct keys|), independent of
    * history size. Exactness is oracle-proven (merged state ≡ full
    * recompute, q49).
    */
  def mergeAggregates(
      parts: Seq[DataFrame],
      keys: Seq[String],
      buffers: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "need at least one partial-state frame")
    val aggs = buffers.map(b => sum(col(b)).as(b))
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental JOIN maintenance — the join counterpart of
    * [[mergeAggregates]]: given the previous snapshots of both sides
    * and this batch's deltas, the change to `A ⋈ B` is the standard
    * delta rule
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB
    *
    * (inner equi-join, insert-only deltas). A materialized join view
    * refreshes by appending this frame — cost is O(|ΔA|·f + |ΔB|·f),
    * independent of history size, vs. rescanning both tables. At
    * 100 TB the deltas are typically broadcastable against the big
    * snapshots, and all three terms share the join key partitioning.
    * Exactness is oracle-proven (old join + delta ≡ full recompute,
    * q69) and spec-proven on both-sides-growing batches.
    */
  def deltaJoin(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** SCD Type-2 merge: apply one batch of attribute changes to a
    * versioned dimension, preserving full history — the
    * slowly-changing-dimension semantics a warehouse load (the
    * reference's `companies` upsert, `main.py:254-272`, is the
    * degenerate type-1 case) needs once attributes can change.
    *
    * `dim` rows are (key, attr, validFrom, validTo) with
    * `validTo IS NULL` marking the current version; `updates` rows are
    * (key, attr, ts) — at most one per key (the caller collapses a
    * multi-change batch to its latest, or applies batches in order).
    * Semantics per key:
    *
    *   - update with a different attr → the current row closes at `ts`
    *     and a new open version starts at `ts`;
    *   - update with an identical attr (null-safe compare) → no-op;
    *   - update for a key absent from `dim` → new open version;
    *   - no update → current row unchanged. Closed history rows always
    *     pass through untouched.
    *
    * Shape: ONE full-outer keyed join of the current slice against the
    * batch, then a per-row explode over the 1-or-2 output versions — no
    * branch re-reads the join, so the dimension is scanned exactly
    * once. At 100 TB the batch side is typically broadcastable and the
    * history pass-through is a pure scan; nothing here is a global
    * sort.
    */
  def scdMerge(
      dim: DataFrame,
      updates: DataFrame,
      key: String,
      attr: String,
      ts: String,
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val u = updates.select(
      col(key), col(attr).as("__new"), col(ts).as("__ts"))
    val cur = dim.where(col(validTo).isNull)
    val hist = dim.where(col(validTo).isNotNull)
    val j = cur.join(u, Seq(key), "full_outer")
    val isNewKey = col(validFrom).isNull // right-only: no current row
    val changed = col("__ts").isNotNull && !(col(attr) <=> col("__new"))
    def v(a: Column, from: Column, to: Column) =
      struct(a.as(attr), from.as(validFrom), to.as(validTo))
    val nullTs = lit(null).cast(j.schema(validFrom).dataType)
    val merged = j
      .select(col(key), explode(
        when(isNewKey, array(v(col("__new"), col("__ts"), nullTs)))
          .when(changed, array(
            v(col(attr), col(validFrom), col("__ts")),
            v(col("__new"), col("__ts"), nullTs)))
          .otherwise(array(
            v(col(attr), col(validFrom), col(validTo))))).as("__v"))
      .select(col(key), col("__v." + attr), col("__v." + validFrom),
        col("__v." + validTo))
    hist.select(col(key), col(attr), col(validFrom), col(validTo))
      .unionByName(merged)
  }

  /** Idempotent append of `incoming` into the parquet table at `path`
    * (creating it with `schema` if absent). Returns rows inserted —
    * re-running with the same batch inserts 0 (the reference's observed
    * behavior on its second run, BASELINE.md).
    *
    * `partitionBy` columns produce hive-style directory partitioning:
    * point/range predicates on them (the reference's
    * `WHERE company_symbol = ?` access pattern, B2) prune whole
    * partitions at planning time instead of scanning the table.
    *
    * Single-writer assumption, like the reference's read-then-insert
    * (SURVEY.md §7.5.1).
    */
  def appendIdempotent(
      spark: SparkSession,
      path: String,
      incoming: DataFrame,
      pk: Seq[String],
      schema: StructType,
      partitionBy: Seq[String] = Nil): Long = {
    val target = Catalog.readOrEmpty(spark, path, schema)
    val fresh = notInTarget(incoming, target, pk)
      .select(schema.fieldNames.map(col): _*)
      .cache()
    try {
      val n = fresh.count()
      if (n > 0) {
        val w = fresh.write.mode("append")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .parquet(path)
      }
      n
    } finally fresh.unpersist()
  }
}
