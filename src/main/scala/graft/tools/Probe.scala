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

    println(s"SPARK_VERSION=${spark.version}")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      println("RAW SCHEMA (no legacy conf):")
      ev.printSchema()
      ev.selectExpr("ts").show(3, false)
    } catch { case e: Throwable => println(s"RAW_READ_FAIL: ${e.getMessage.take(300)}") }

    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      println("SCHEMA with nanosAsLong=true:")
      ev.printSchema()
    } catch { case e: Throwable => println(s"LEGACY_READ_FAIL: ${e.getMessage.take(300)}") }

    try {
      val ev2 = graft.Tables.events(spark, "/root/testdata/sf0.001")
      println("Tables.events SCHEMA:")
      ev2.printSchema()
      ev2.selectExpr("ts").show(3, false)
      println("TABLES_EVENTS_OK count=" + ev2.count())
    } catch { case e: Throwable => println(s"TABLES_EVENTS_FAIL: ${e.getMessage.take(500)}") }
    spark.stop()
  }
}
