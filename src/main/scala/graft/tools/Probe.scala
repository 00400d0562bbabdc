package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for environment behavior (nanos timestamps, parser
  * strictness). Not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.selectExpr("ts", "timestamp_micros(ts div 1000) AS ts2").show(3, false)
      println("EVENTS_READ_OK")
    } catch { case e: Throwable => println(s"EVENTS_READ_FAIL: ${e.getMessage.take(500)}") }

    // parser strictness: does to_timestamp('2025-12-01 08:00') parse? to_date prefix-parse?
    val df = spark.sql(
      """SELECT
        |  to_timestamp('2025-12-01 08:00') AS a,
        |  try_to_timestamp('2025-12-01 08:00', 'yyyy-MM-dd HH:mm:ss') AS b,
        |  try_to_timestamp('2025-12-01', 'yyyy-MM-dd') AS c,
        |  to_date('2025-12-01 08:00') AS d,
        |  try_cast('278.1600' AS DECIMAL(15,4)) AS e,
        |  try_cast('bad' AS DECIMAL(15,4)) AS f,
        |  md5('hello world') AS g
        |""".stripMargin)
    df.show(false)
    spark.stop()
  }
}
