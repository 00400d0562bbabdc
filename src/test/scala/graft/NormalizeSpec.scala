package graft

import java.sql.{Date, Timestamp}

import graft.ingest.{Fixtures, Normalize}

class NormalizeSpec extends SparkSpec {

  test("daily: parses bars, drops bad-numeric and missing-field rows, keeps >2^31 volume") {
    val rows = Normalize.daily(Fixtures.dailyPayloads(spark))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(6)))
    val aapl = rows.filter(_._1 == "AAPL").map(_._2).toSet
    // 2025-12-02 (volume "not-a-number") and 2025-12-01 (missing "3. low") dropped
    assert(aapl == Set("2025-12-09", "2025-12-08", "2025-12-05", "2025-12-04", "2025-12-03"))
    assert(rows.exists(_._3 == 5100000000L))          // BIGINT volume survives
    assert(rows.count(_._1 == "MSFT") == 3)
  }

  test("daily: error/rate-limit envelopes contribute no rows") {
    val syms = Normalize.daily(Fixtures.dailyPayloads(spark))
      .select("company_symbol").distinct()
      .collect().map(_.getString(0)).toSet
    assert(syms == Set("AAPL", "MSFT"))
  }

  test("intraday: strict yyyy-MM-dd HH:mm:ss — minutes-only key dropped") {
    val ts = Normalize.intraday(Fixtures.intradayPayloads(spark))
      .collect().map(_.getTimestamp(1).toString).toSet
    assert(ts == Set("2025-12-09 19:55:00.0", "2025-12-09 19:50:00.0", "2025-12-09 19:45:00.0"))
  }

  test("sma: dual-format keys — date-only normalizes to midnight, HH:mm dropped, bad value dropped") {
    val out = Normalize.sma(Fixtures.smaPayloads(spark))
      .collect().map(r => (r.getTimestamp(1).toString, r.getDecimal(2).toPlainString)).toSet
    assert(out == Set(
      ("2025-12-09 16:00:00.0", "243.8080"),
      ("2025-12-09 15:00:00.0", "243.5512"),
      ("2025-12-08 00:00:00.0", "243.0020")))
  }

  test("rejects surfaces per-symbol dropped-row counts") {
    val rej = Normalize.rejects(Fixtures.smaPayloads(spark), "sma")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(rej == Set(("AAPL", 5L, 2L)))   // 5 keys in, 2 rejected
  }
}
