package graft

import java.nio.file.Files

import graft.ingest.Fixtures
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("dailyIngestStream: AvailableNow drains files, dedups on PK, resumes incrementally") {
    val base = Files.createTempDirectory("graft_stream_spec").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()

    Files.writeString(java.nio.file.Paths.get(s"$in/p1.json"), Fixtures.dailyAapl)
    Files.writeString(java.nio.file.Paths.get(s"$in/p2.json"), Fixtures.dailyMsft)
    StreamingIngest.dailyIngestStream(spark, in, out, ckpt).awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 8)   // 5 AAPL + 3 MSFT good bars (2 edge rows dropped)

    // second batch overlaps the first on 2 AAPL bars; only new dates land
    Files.writeString(java.nio.file.Paths.get(s"$in/p3.json"), Fixtures.dailyAaplNextRun)
    StreamingIngest.dailyIngestStream(spark, in, out, ckpt).awaitTermination()
    val rows = spark.read.parquet(out)
      .select("company_symbol", "date").collect()
      .map(r => (r.getString(0), r.getDate(1).toString))
    assert(rows.length == 10)                     // +2 genuinely-new bars
    assert(rows.distinct.length == 10)            // and no PK duplicates
  }

  test("streamingSma maintains count-based windows per key in arbitrary arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingIngest.Bar]
    def ts(i: Int) = new java.sql.Timestamp(i * 60000L)
    stream.addData(
      StreamingIngest.Bar("A", ts(2), 2.0),
      StreamingIngest.Bar("A", ts(1), 1.0),   // out of order within the batch
      StreamingIngest.Bar("A", ts(3), 3.0),
      StreamingIngest.Bar("B", ts(1), 10.0))
    val q = StreamingIngest.streamingSma(stream.toDS(), n = 3)
      .writeStream.format("memory").queryName("sma_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT company_symbol, sma FROM sma_out")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out == Seq(("A", 2.0)))   // only A reaches 3 bars: (1+2+3)/3
  }
}
