package graft.operators

import org.apache.spark.sql.DataFrame
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
}
