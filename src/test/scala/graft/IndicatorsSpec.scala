package graft

import org.apache.spark.sql.functions._

import graft.analytics.Indicators

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private val series = (1 to 10).map(i => ("A", i, i.toDouble)) ++
    (1 to 5).map(i => ("B", i, 10.0 * i))

  test("sma matches brute-force average and gates on full windows") {
    val df = series.toDF("sym", "t", "x")
    val out = Indicators.sma(df, "sym", Seq("t"), "x", n = 3)
      .select("sym", "t", "sma_value")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // no partial windows: t=1,2 absent
    assert(!out.contains(("A", 1)) && !out.contains(("A", 2)))
    assert(out(("A", 3)) == 2.0)            // (1+2+3)/3
    assert(out(("A", 10)) == 9.0)           // (8+9+10)/3
    assert(out(("B", 5)) == 40.0)           // (30+40+50)/3
    assert(out.size == 8 + 3)
  }

  test("ema: saturated closed form equals the recursive definition within truncation error") {
    val xs = (1 to 80).map(_.toDouble)
    val df = xs.zipWithIndex.map { case (x, i) => ("A", i, x) }.toDF("sym", "t", "x")
    val out = Indicators.ema(df, "sym", Seq("t"), "x", n = 9, cap = 64)
      .orderBy("t").select("ema_value").collect().map(_.getDouble(0))
    val a = 2.0 / 10
    val rec = xs.tail.scanLeft(xs.head)((e, x) => a * x + (1 - a) * e)
    // truncation error bound ~ (1-a)^cap · max|x| = 0.8^64 · 80 ≈ 5e-5
    assert(math.abs(out.last - rec.last) < 5e-5)
    assert(math.abs(out.head - rec.head) < 1e-12)  // seed = first value
  }

  test("returns computes (x - prev)/prev per key") {
    val df = Seq(("A", 1, 100.0), ("A", 2, 110.0), ("A", 3, 99.0)).toDF("sym", "t", "x")
    val out = Indicators.returns(df, "sym", Seq("t"), "x")
      .orderBy("t").select("return").collect()
    assert(out(0).isNullAt(0))
    assert(math.abs(out(1).getDouble(0) - 0.10) < 1e-12)
    assert(math.abs(out(2).getDouble(0) - (-0.1)) < 1e-12)
  }

  test("rollingStats emits min/max/stddev on full windows only") {
    val df = (1 to 5).map(i => ("A", i, i.toDouble)).toDF("sym", "t", "x")
    val out = Indicators.rollingStats(df, "sym", Seq("t"), "x", n = 3)
      .orderBy("t")
      .select("t", "rolling_min", "rolling_max")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq((3, 1.0, 3.0), (4, 2.0, 4.0), (5, 3.0, 5.0)))
  }
}
