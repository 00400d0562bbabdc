package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines — the GPT-style
  * concat-and-chunk layout: documents are laid end-to-end in a
  * deterministic order and the token stream is cut into fixed-capacity
  * packs (context windows). A document's pack is determined by its
  * running start offset; long documents may span several packs, exactly
  * like pretraining chunking (no padding waste, no bin-packing search).
  *
  * Distributed shape: one window (sum over the preceding rows) per
  * shard key — a single exchange on the shard, no iteration, no driver
  * state. Sharding is the point at 100 TB: each shard (language,
  * source, date bucket…) packs independently, so the operator
  * parallelizes across shards while keeping within-shard order
  * deterministic.
  */
object Pack {

  /** Adds three columns to `df`:
    *   - `start_offset`: tokens preceding this doc in its shard's stream
    *   - `pack_id`: 0-based chunk index of the doc's first token
    *     (`start_offset div capacity`)
    *   - `pack_offset`: the doc's position inside that pack
    *     (`start_offset mod capacity`)
    *
    * Deterministic given (`shardKeys`, `orderCol`) — re-runs and
    * engine replays produce identical layouts (pure integer window
    * arithmetic, no floating point anywhere).
    */
  def concatChunk(
      df: DataFrame,
      shardKeys: Seq[String],
      orderCol: String,
      tokensCol: String,
      capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(shardKeys.nonEmpty, "concatChunk requires at least one shard key")
    val w = Window.partitionBy(shardKeys.map(col): _*)
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)).cast("long"))
      .withColumn("pack_id", expr(s"start_offset div ${capacity}L"))
      .withColumn("pack_offset", col("start_offset") % capacity)
  }

  /** Best-fit-decreasing bin loads over a BOUNDED group's item weights
    * — the no-split packing policy (each doc wholly inside one bin, so
    * bins carry padding waste; concat-and-chunk has zero waste but
    * splits docs). Input: an `array<bigint>` of weights in any order;
    * output: the final bin-load `array<bigint>`, ascending.
    *
    * The classical BFD rule, restated so a plain fold (no positional
    * index bookkeeping) computes it: process weights in DESCENDING
    * order; for each weight the candidate bins are those with
    * `load + w <= capacity`, and best-fit picks the FULLEST candidate
    * (ties by bin index don't matter — equal loads are interchangeable,
    * so the bin STATE is a multiset and we keep it as a sorted array).
    * With bins sorted ascending the candidates are exactly a PREFIX of
    * the array and the best fit is that prefix's last element — one
    * `filter` + one `element_at` per step, then remove-and-reinsert
    * keeps the array sorted. A weight above `capacity` opens its own
    * (overfull) bin, deterministically, same as the SQL replay.
    *
    * Everything is Catalyst higher-order functions over an
    * `aggregate` fold — exact integers end-to-end, bit-replayable by
    * the DuckDB recursive CTE that states the identical rule. The
    * fold is O(n² log n) in the GROUP size, which is why callers must
    * bound the group (c06/t44: per-source selection ≤ quota ≤ budget);
    * the 100 TB shape is many bounded groups in parallel, never one
    * global fold.
    */
  def bfdBinLoads(weights: Column, capacity: Long): Column = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val desc = reverse(array_sort(weights))
    val emptyBins = lit(Array.empty[Long])
    aggregate(desc, emptyBins, (bins, w) => {
      val nf = size(filter(bins, b => b + w <= lit(capacity)))
      when(nf === 0, array_sort(concat(bins, array(w))))
        .otherwise(array_sort(concat(
          slice(bins, lit(1), nf - 1),
          slice(bins, nf + 1, size(bins) - nf),
          array(element_at(bins, nf) + w))))
    })
  }

  /** Σ per-bin padding waste of a bin-load array: `max(0, cap − load)`
    * summed — overfull single-item bins contribute zero rather than
    * negative waste.
    */
  def binWaste(loads: Column, capacity: Long): Column =
    aggregate(loads, lit(0L),
      (acc, b) => acc + greatest(lit(0L), lit(capacity) - b))
}
