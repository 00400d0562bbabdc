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

  test("bollinger: mid/upper/lower match brute-force mean ± 2·stddev") {
    val xs = Seq(10.0, 12.0, 11.0, 13.0, 15.0, 14.0)
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("A", i, BigDecimal(x).setScale(2))
    }.toDF("sym", "t", "x")
      .select(col("sym"), col("t"), col("x").cast("decimal(18,2)").as("x"))
    val out = Indicators.bollinger(df, "sym", Seq("t"), "x", n = 3, k = 2.0)
      .orderBy("t").select("t", "bb_mid", "bb_upper", "bb_lower")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 4)   // t = 2..5
    out.foreach { case (ti, mid, up, lo) =>
      val window = xs.slice(ti - 2, ti + 1)
      val m = window.sum / 3
      val sd = math.sqrt(window.map(x => (x - m) * (x - m)).sum / 2)
      assert(math.abs(mid - m) < 1e-9)
      assert(math.abs(up - (m + 2 * sd)) < 1e-9)
      assert(math.abs(lo - (m - 2 * sd)) < 1e-9)
    }
  }

  test("rsi: all-gains series is 100; alternating series matches brute force") {
    def mk(xs: Seq[Double]) = xs.zipWithIndex.map { case (x, i) =>
      ("A", i, BigDecimal(x).setScale(2))
    }.toDF("sym", "t", "x")
      .select(col("sym"), col("t"), col("x").cast("decimal(18,2)").as("x"))
    val up = Indicators.rsi(mk((1 to 10).map(_.toDouble)), "sym", Seq("t"), "x", n = 3)
      .select("rsi").collect().map(_.getDouble(0))
    assert(up.nonEmpty && up.forall(_ == 100.0))

    val alt = Seq(10.0, 12.0, 11.0, 14.0, 12.0)  // diffs: +2, -1, +3, -2
    val out = Indicators.rsi(mk(alt), "sym", Seq("t"), "x", n = 4)
      .select("rsi").collect().map(_.getDouble(0))
    // gains=5, losses=3 → rsi = 100 - 100/(1 + 5/3) = 62.5
    assert(out.length == 1 && math.abs(out.head - 62.5) < 1e-9)
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
