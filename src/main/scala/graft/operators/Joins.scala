package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal joins Spark lacks as built-ins, composed from operators it
  * has — no custom physical plan needed, so both stay inside
  * whole-stage codegen and AQE.
  *
  * - [[asofJoin]]: "latest right row at or before each left row" — the
  *   classic financial/point-in-time join (attach the prevailing quote
  *   to each trade). Implemented as union + partitioned sort + a
  *   last-non-null running window: ONE shuffle on the keys, linear
  *   scan, no range-product blowup. This is the formulation that
  *   survives 100 TB — a naive `ts <= ts` range join materializes the
  *   full history product per left row before taking max.
  * - [[rangeJoin]]: equi-key band join (`right.ts - left.ts` within a
  *   bounded interval). Implemented by bin-bucketing: both sides key on
  *   `floor(ts / binWidth)` with the left row duplicated into the (at
  *   most 2) bins its window can reach, then an equi-join on
  *   (keys, bin) + the exact predicate. The join stays hash/sort-merge
  *   on bounded buckets — the product space is Σ|bin|² per key, never
  *   |left|×|right|.
  */
object Joins {

  private def payloadStruct(df: DataFrame, cols: Seq[String]): StructType =
    StructType(cols.map(df.schema.apply))

  /** Backward as-of join: for every left row, append the payload of the
    * single right row with the greatest `rightTs <= leftTs` and equal
    * `keys` (ties at the exact same timestamp DO match). Left rows with
    * no prior right row keep null payloads (left-outer semantics).
    *
    * Requirements, asserted or documented:
    * - `keys` non-empty (they partition the sort — the scale unit);
    * - right payload column names (everything but the keys) must not
    *   collide with left columns — pre-rename (e.g. `ts` → `quote_ts`);
    * - right rows must be unique per (keys, rightTs) for a
    *   deterministic result (pre-aggregate duplicates);
    * - right rows with a null `rightTs` are dropped; left rows with a
    *   null `leftTs` match nothing.
    *
    * Plan shape: one Exchange on `keys`, one sort per partition, one
    * window pass. The right payload travels as a single struct so a
    * left row never mixes fields from different right rows (per-column
    * `last(ignoreNulls)` would, whenever a payload field is legitimately
    * null).
    */
  /** Optional `toleranceMicros`: a match farther away in time than the
    * tolerance is discarded — the left row keeps null payloads, the
    * bounded-staleness rule of pandas `merge_asof` tolerance / kdb
    * `wj`. Applied as a post-window projection, so the plan shape is
    * unchanged.
    *
    * `direction`: "backward" (default) matches the latest right row at
    * or before the left row; "forward" matches the earliest right row
    * at or after it (the order→next-fill shape) — same one-shuffle
    * plan, the partition sort just runs descending.
    *
    * `strict`: exclude exact-timestamp ties — backward becomes
    * `rightTs < leftTs`, forward `rightTs > leftTs`. This is the
    * leakage-safe mode a point-in-time feature join needs: a feature
    * row stamped at the label's own instant must NOT be visible to
    * the label (it can encode the outcome). Implemented purely in the
    * tie-break sort order (left rows scan before right rows at equal
    * timestamps), so the plan shape is identical.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      toleranceMicros: Option[Long] = None,
      direction: String = "backward",
      strict: Boolean = false): DataFrame = {
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward or forward, got $direction")
    require(keys.nonEmpty, "asofJoin requires at least one equi-key")
    val lCols = left.columns.toSeq
    val lOnly = lCols.filterNot(keys.contains)
    val rPay  = right.columns.toSeq.filterNot(keys.contains) // includes rightTs
    val clash = rPay.intersect(lCols)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")}")
    val rpType = payloadStruct(right, rPay)

    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ats"), lit(1).as("__side"),
          lit(null).cast(rpType).as("__rp")) ++
        lOnly.map(col): _*)
    val rTagged = right.where(col(rightTs).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ats"), lit(0).as("__side"),
          struct(rPay.map(col): _*).as("__rp")) ++
        lOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort before left rows at the same timestamp (__side
    // 0 < 1), so an exact-tie right row is visible to the left row.
    // Forward direction scans time descending: "last right at or above
    // in scan order" = earliest right timestamp >= the left row's.
    // Strict mode flips the tie-break: left rows scan FIRST at an
    // equal timestamp, so the running last(__rp) has not yet seen the
    // tie when the left row is evaluated — `<` / `>` semantics with
    // zero plan change.
    val ordered =
      if (direction == "backward") col("__ats").asc else col("__ats").desc
    val tieBreak = if (strict) col("__side").desc else col("__side").asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ordered, tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = toleranceMicros match {
      case Some(tol) =>
        val lm = unix_micros(col("__ats").cast("timestamp"))
        val rm = unix_micros(col("__m").getField(rightTs).cast("timestamp"))
        val staleness = if (direction == "backward") lm - rm else rm - lm
        matched.withColumn("__m", when(staleness <= tol, col("__m")))
      case None => matched
    }
    bounded.select(lCols.map(col) ++ rPay.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Equi-key band join: all (left, right) pairs with equal `keys` and
    * `rightTs - leftTs` in `[lowerMicros, upperMicros]` (both bounds
    * inclusive, in microseconds; negative bounds look backward in
    * time). Output = left columns ++ right payload columns (which must
    * not collide — pre-rename). Rows with null timestamps match
    * nothing.
    *
    * Bin width = the window span, so each left row lands in at most two
    * bins (one `explode` of a 2-element array) and each right row in
    * exactly one — every qualifying pair meets in exactly one bin, no
    * post-join dedup needed.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      lowerMicros: Long,
      upperMicros: Long): DataFrame = {
    require(upperMicros >= lowerMicros, "upperMicros must be >= lowerMicros")
    val lCols = left.columns.toSeq
    val rPay  = right.columns.toSeq.filterNot(keys.contains)
    val clash = rPay.intersect(lCols)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")}")
    val binW = math.max(upperMicros - lowerMicros, 1L)

    // cast("timestamp") is a no-op for TIMESTAMP and a pure
    // reinterpretation for TIMESTAMP_NTZ under a UTC session —
    // unix_micros itself rejects NTZ input
    val l = left
      .withColumn("__lts", unix_micros(col(leftTs).cast("timestamp")))
      .withColumn("__bin", explode(array_distinct(array(
        floor((col("__lts") + lit(lowerMicros)) / lit(binW.toDouble)).cast("long"),
        floor((col("__lts") + lit(upperMicros)) / lit(binW.toDouble)).cast("long")))))
    val r = right
      .withColumn("__rts", unix_micros(col(rightTs).cast("timestamp")))
      .withColumn("__bin", floor(col("__rts") / lit(binW.toDouble)).cast("long"))

    l.join(r, keys :+ "__bin")
      .where((col("__rts") - col("__lts")).between(lowerMicros, upperMicros))
      .select(lCols.map(col) ++ rPay.map(col): _*)
  }
}
