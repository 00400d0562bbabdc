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

  test("column pruning is pushed into the payload scan") {
    val pruned = spark.read.format("graft-payloads").load()
      .select("Error Message")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<Error Message:string>"),
      s"expected only the envelope column in the scan, got:\n$plan")
    assert(pruned.where(pruned("Error Message").isNotNull).count() === 1)
  }
}
