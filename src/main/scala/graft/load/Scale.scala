package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: explicit skew mitigation and storage co-location.
  * AQE handles moderate runtime skew (split oversized shuffle
  * partitions); these are for the cases it can't — extreme single-key
  * skew known in advance, and avoiding the shuffle altogether via
  * bucketed storage.
  */
object Scale {

  /** Salted equi-join for a skewed big side: the big side scatters each
    * key across `salt` sub-keys; the small side replicates `salt` ways
    * (explode), so one hot key's rows spread over `salt` reducers
    * instead of one. Inner/left joins only (replication breaks
    * right/full semantics). Salt is deterministic (hash of the whole
    * row, not `rand()`) so re-runs produce identical partitioning.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left joins, got $joinType")
    val bigSalted = big.withColumn(
      "__salt", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)).cast("int"))
    val smallSalted = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallSalted, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Z-value (Morton code) of `cols`: min/max-normalize each column to
    * a `bits`-bit integer rank, then interleave the bits (bit i of
    * column j lands at position i·N + j), so range-partitioning and
    * sorting on the single z column co-locates rows that are close in
    * EVERY dimension at once. The whole thing is a static expression
    * tree of shifts/masks — codegen'd, no UDF. Min/max bounds come in
    * as parameters (one tiny aggregate at the call site): linear
    * scaling is skew-sensitive — for heavy-tailed columns feed
    * pre-ranked values instead.
    */
  def zvalue(cols: Seq[(Column, Double, Double)], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"need 1+ cols and bits*ncols <= 63, got $bits x ${cols.size}")
    val maxRank = (1L << bits) - 1
    val ranks = cols.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      least(greatest(
        floor((c.cast("double") - lit(lo)) / lit(span) * maxRank)
          .cast("long"), lit(0L)), lit(maxRank))
    }
    (0 until bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftleft(r.bitwiseAND(lit(1L << i)), i * (cols.size - 1) + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order clustering: lay `df` out by the interleaved z-value of
    * `zCols` — range-partition into `partitions` files-to-be, sort
    * within each. After a parquet write, row-group min/max stats are
    * narrow on EVERY z column simultaneously, so scans filtering on
    * any of them skip most of the data — the multi-column data-skipping
    * layout a single-column sort can't give (sorting by x alone leaves
    * every file spanning y's full range). The bounds aggregate is one
    * scan-reduce; the layout cost is the one range exchange any
    * clustered write pays. Works for the write-side of a 100 TB table
    * unchanged: partitions scale with input size, nothing is
    * collected but 2·N scalars.
    */
  def zorderBy(df: DataFrame, zCols: Seq[String], partitions: Int): DataFrame = {
    require(zCols.nonEmpty, "zorderBy needs at least one column")
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val specs = zCols.zipWithIndex.map { case (c, i) =>
      (col(c), row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zvalue(specs))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Per-key top-N without a hot-key reducer: stage 1 ranks within
    * (input partition, key) — that shuffle spreads a hot key's rows
    * across as many reducers as there are input partitions, so no
    * single task ever sorts all of a hot key — and stage 2 ranks the
    * survivors, at most `n × input-partitions` rows per key.
    * Equivalent results to `row_number().over(partitionBy(key)
    * .orderBy(ord)) <= n`; costs one extra (skew-spread) shuffle, so
    * use it when a hot key would otherwise pin the rank window to one
    * reducer, not as a general replacement.
    */
  def topNPerKey(df: DataFrame, key: String, ord: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = Window.partitionBy(spark_partition_id(), col(key)).orderBy(ord)
    val global = Window.partitionBy(col(key)).orderBy(ord)
    df.withColumn("__lr", row_number().over(local))
      .where(col("__lr") <= n)
      .drop("__lr")
      .withColumn("__r", row_number().over(global))
      .where(col("__r") <= n)
      .drop("__r")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈totalBytes / targetFileBytes⌉ files. Streaming appends and
    * per-batch idempotent loads accrete small files; at scale the
    * resulting per-file open/footer overhead dominates scan time long
    * before data volume does (a 100 TB table in 1 MB files is 100M
    * opens). Sizing walks the source RECURSIVELY, so hive-partitioned
    * layouts (files nested under `col=value/` directories) size
    * correctly; the destination is written flat, with any partition
    * values preserved as ordinary columns — re-establishing a
    * directory layout is the caller's choice via [[writePartitioned]].
    * Writes to a NEW path (Spark cannot overwrite a directory it is
    * reading); the caller then repoints readers — or renames dst over
    * src where the filesystem makes that atomic. Returns
    * (filesBefore, filesAfter).
    */
  def compactTo(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String,
      dstPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true) // recursive: descend partition dirs
      val buf = scala.collection.mutable.ListBuffer[org.apache.hadoop.fs.LocatedFileStatus]()
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val files = parquetFiles(new org.apache.hadoop.fs.Path(srcPath))
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(srcPath)
      .repartition(n)
      .write.mode("overwrite").parquet(dstPath)
    val after = parquetFiles(new org.apache.hadoop.fs.Path(dstPath)).length
    (files.length, after)
  }

  /** Bloom-filter semi-join reduction — the scan-side pre-filter a
    * 100 TB fact join wants: build a Bloom filter over the (small) key
    * side with one aggregate, ship it to the fact scan as a literal,
    * and drop non-joining fact rows BEFORE they reach the join's
    * shuffle. False positives only let extra rows through — the real
    * join still decides membership — so composing this under any
    * equi-join/semi-join is semantically transparent; what it buys is
    * shuffle volume proportional to matching rows instead of the whole
    * fact table. This is the manual form of Spark's own
    * `InjectRuntimeFilter` rewrite, for when the key side is computed
    * (not a join branch the optimizer can see) or the filter should be
    * reused across many queries. Uses the engine's native
    * `BloomFilterAggregate` / `BloomFilterMightContain` expressions
    * over xxhash64 keys.
    *
    * Returns the filtered fact frame. `expectedItems` sizes the filter
    * (~1.2 bytes/item at the default FPP); the one-row aggregate
    * collect is the broadcast, not a data move.
    */
  def bloomPreFilter(
      fact: DataFrame,
      factKey: Column,
      keys: DataFrame,
      keyCol: String,
      expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    val aggExpr = Bridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(Bridge.expression(col(keyCol)))), expectedItems)
        .toAggregateExpression())
    val bloom = keys.select(aggExpr.as("bf")).head.getAs[Array[Byte]]("bf")
    fact.where(Bridge.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        new XxHash64(Seq(Bridge.expression(factKey))))))
  }

  /** Write `df` hive-partitioned by `partCols` — the other half of the
    * storage-layout toolkit next to [[writeBucketed]]: bucketing
    * co-locates JOIN keys, directory partitioning prunes SCANS. An
    * equality/range predicate on a partition column eliminates whole
    * directories at planning time (the scan's `PartitionFilters`),
    * so a day query over a 100 TB date-partitioned corpus reads one
    * day's files, never touching the rest — asserted by `ScaleSpec`.
    * Choose low-cardinality columns (date, region); high-cardinality
    * partitioning degenerates into millions of tiny files.
    */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write
      .format("parquet")
      .partitionBy(partCols: _*)
      .mode("overwrite")
      .save(path)

  /** Write `df` as a bucketed+sorted table (hive-style layout in the
    * session warehouse): joins and aggregations on `key` against
    * another table bucketed the same way need NO shuffle — the
    * co-location the reference gets implicitly from DBMS indexes,
    * expressed as Spark storage layout. At 100 TB this converts every
    * recurring fact-fact join on the key into a zero-exchange
    * sort-merge join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
