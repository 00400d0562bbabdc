package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated corpus (TESTDATA.md): one parquet per
  * table under `sfDir`. All queries go through here so scan-level concerns
  * (nanosecond timestamps, column pruning) are handled in one place.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }

  /** `events.parquet` has carried its `ts` column as TIMESTAMP(NANOS)
    * (older fixtures) or TIMESTAMP(MICROS) without timezone (current
    * fixtures), and Spark lineages differ in how they surface each:
    * some read nanos only via `nanosAsLong` (as BIGINT), Spark 4.1.2
    * reads no-tz timestamps natively as TIMESTAMP_NTZ and ignores the
    * legacy conf. Branch on the *loaded* dtype so the loader works on
    * every (fixture, Spark) pairing, always producing a microsecond
    * TimestampType column. Sessions run with timeZone=UTC, so the
    * NTZ→TZ cast preserves wall-clock values and stays comparable to
    * DuckDB's naive `CAST(ts AS TIMESTAMP)`; the nanos→micros path
    * truncates (not rounds) for the same reason.
    *
    * Note: `nanosAsLong` is session-wide and stays set (restoring it
    * immediately would race the lazy scan). On Sparks that honor it,
    * the observable change for other reads in the session is
    * nanos-columns-as-BIGINT instead of a hard failure — acceptable
    * for this engine's sessions, documented here.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) surfaced as nanos-since-epoch
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // native no-tz read; align to session-UTC instants
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** B9 as a SQL surface: register every corpus table as a temp view and
    * the graft SQL functions (`graft_cosine`, `graft_dot`), so the whole
    * engine is reachable from `spark.sql(...)`.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
    graft.functions.VectorExpressions.register(spark)
  }
}
