package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark 4 rejects
    * natively; read nanos as long and truncate to a microsecond timestamp.
    * Truncation (not rounding) matches DuckDB's `CAST(ts AS TIMESTAMP)`
    * on the same file, keeping the oracle comparable.
    *
    * Note: `nanosAsLong` is session-wide and stays set (restoring it
    * immediately would race the lazy scan). Without it Spark ERRORS on
    * any TIMESTAMP(NANOS) parquet, so the observable change for other
    * reads in the session is nanos-columns-as-BIGINT instead of a hard
    * failure — acceptable for this engine's sessions, documented here.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
