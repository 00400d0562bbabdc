package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.ingest.{Fixtures, Normalize}

class PayloadSourceSpec extends SparkSpec {

  private def normalizedSet(df: org.apache.spark.sql.DataFrame) =
    Normalize.daily(df).collect().map(_.toSeq).toSet

  test("fixture-mode reads through the V2 source match the DataFrame-reader path") {
    val v2 = spark.read.format("graft-payloads").load()
    assert(v2.schema === graft.ingest.PayloadReader.payloadSchema)
    assert(normalizedSet(v2) === normalizedSet(Fixtures.dailyPayloads(spark)))
    val sma = spark.read.format("graft-payloads").option("endpoint", "sma").load()
    assert(Normalize.sma(sma).collect().map(_.toSeq).toSet ===
      Normalize.sma(Fixtures.smaPayloads(spark)).collect().map(_.toSeq).toSet)
  }

  test("path mode reads one JSON document per file, one partition per file") {
    val dir = Files.createTempDirectory("graft_payload_src")
    Seq("aapl" -> Fixtures.dailyAapl, "msft" -> Fixtures.dailyMsft,
        "err" -> Fixtures.errorPayload, "note" -> Fixtures.ratelimitPayload)
      .foreach { case (n, doc) =>
        Files.write(dir.resolve(s"$n.json"), doc.getBytes(StandardCharsets.UTF_8))
      }
    val v2 = spark.read.format("graft-payloads").load(dir.toString)
    assert(v2.rdd.getNumPartitions === 4)
    assert(normalizedSet(v2) === normalizedSet(Fixtures.dailyPayloads(spark)))
  }

  test("fetch mode pulls one URL per symbol partition on the executor (file:// transport)") {
    val dir = Files.createTempDirectory("graft_payload_fetch")
    Seq("AAPL" -> Fixtures.dailyAapl, "MSFT" -> Fixtures.dailyMsft)
      .foreach { case (sym, doc) =>
        Files.write(dir.resolve(s"$sym.json"), doc.getBytes(StandardCharsets.UTF_8))
      }
    // the live-mode surface with the sandbox transport: {symbol} in the
    // template expands per partition, the fetch runs executor-side
    val v2 = spark.read.format("graft-payloads")
      .option("urlTemplate", s"file://$dir/{symbol}.json")
      .option("symbols", "AAPL, MSFT")
      .load()
    assert(v2.rdd.getNumPartitions === 2)
    assert(normalizedSet(v2) === normalizedSet(
      Fixtures.dailyPayloads(spark).where(
        org.apache.spark.sql.functions.col("Error Message").isNull
          && org.apache.spark.sql.functions.col("Note").isNull)))
  }

  test("fetch mode onError=envelope degrades a failed fetch to the A14 error envelope") {
    val dir = Files.createTempDirectory("graft_payload_fetch_err")
    Files.write(dir.resolve("AAPL.json"),
      Fixtures.dailyAapl.getBytes(StandardCharsets.UTF_8))
    val v2 = spark.read.format("graft-payloads")
      .option("urlTemplate", s"file://$dir/{symbol}.json")
      .option("symbols", "AAPL,MISSING")
      .option("onError", "envelope")
      .load()
    // good symbol parses; missing one contributes exactly one envelope
    // row that downstream dispatch (A14) routes like an API error —
    // and zero normalized bars (same rows as the path-mode read of the
    // same directory, which holds only AAPL)
    assert(v2.where(v2("Error Message").isNotNull).count() === 1)
    assert(normalizedSet(v2) === normalizedSet(
      spark.read.format("graft-payloads").load(dir.toString)))
    // default onError=fail: the task must raise instead
    val failing = spark.read.format("graft-payloads")
      .option("urlTemplate", s"file://$dir/{symbol}.json")
      .option("symbols", "MISSING")
      .load()
    intercept[org.apache.spark.SparkException] { failing.count() }
  }

  test("column pruning is pushed into the payload scan") {
    val pruned = spark.read.format("graft-payloads").load()
      .select("Error Message")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<Error Message:string>"),
      s"expected only the envelope column in the scan, got:\n$plan")
    assert(pruned.where(pruned("Error Message").isNotNull).count() === 1)
  }
}
