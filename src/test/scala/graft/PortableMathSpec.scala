package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableMath
import graft.functions.PortableMath.Dual

/** [[PortableMath]] — the cross-engine transcendentals behind
  * q122/q126/q130. The full Spark↔DuckDB bit-equality experiment is
  * `tools.PortableMathProbe` + `scripts/portable_math_check.py`
  * (788k adversarial inputs, 0 mismatches at round 10); this spec
  * pins the JVM-side invariants CI can check alone: the series are
  * ACCURATE (equality across engines would be vacuous if both agreed
  * on wrong values), the SQL emission never produces the two literal
  * forms DuckDB types as DECIMAL (the probe-caught 1-ulp drift
  * class), and the logistic saturates exactly where documented.
  */
class PortableMathSpec extends SparkSpec {

  import spark.implicits._

  test("lnPosBigint matches java.lang.Math.log to 1e-13 relative across magnitudes") {
    val vs = ((1L to 3000L) ++
      Iterator.iterate(7L)(v => v * 3 + 1).takeWhile(_ < 1000000000000000L))
      .toSeq.distinct
    val got = PortableMath
      .withBindings(vs.toDF("v"), PortableMath.lnPosBigint("v", "ln_v"))
      .select(col("v"), col("ln_v")).as[(Long, Double)].collect()
    got.foreach { case (v, lnV) =>
      val ref = math.log(v.toDouble)
      val err = math.abs(lnV - ref) / math.max(math.abs(ref), 1.0)
      assert(err < 1e-13, s"ln($v): got $lnV want $ref")
    }
  }

  test("expBindings matches java.lang.Math.exp to 1e-13 relative on [-44, 44]") {
    val xs = (-8800 to 8800).map(_ / 200.0)
    val got = PortableMath
      .withBindings(xs.toDF("x"), PortableMath.expBindings("x", "exp_x"))
      .select(col("x"), col("exp_x")).as[(Double, Double)].collect()
    got.foreach { case (x, ex) =>
      val ref = math.exp(x)
      assert(math.abs(ex - ref) / ref < 1e-13, s"exp($x): got $ex want $ref")
    }
  }

  test("logisticE9 saturates to exactly 0 / 1e9 outside ±22 and is monotone inside") {
    val xs = Seq(-60.0, -22.0000001, -21.9, -3.0, 0.0, 3.0, 21.9,
      22.0000001, 60.0)
    val got = PortableMath
      .withBindings(xs.toDF("x"), PortableMath.logisticE9("x", "sig"))
      .select(col("x"), col("sig")).as[(Double, Long)].collect().sortBy(_._1)
    assert(got.head._2 == 0L && got.last._2 == 1000000000L)
    assert(got.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    assert(got.find(_._1 == 0.0).get._2 == 500000000L) // σ(0) = ½ exactly
  }

  test("SQL emission never contains a bare fractional literal (DuckDB would type it DECIMAL)") {
    // Two probe-caught drift classes: a bare `0.3333…` literal is
    // DECIMAL in DuckDB (pure-literal CASE → decimal column → exact
    // decimal +/−), and CAST(decimal-literal AS DOUBLE) double-rounds
    // when the scaled mantissa exceeds 2⁵³. Every emitted double
    // literal must therefore be exponent-suffixed.
    val sql = PortableMath.sqlWithBindings("SELECT v, x FROM t",
      PortableMath.lnPosBigint("v", "ln_v") ++
        PortableMath.expBindings("x", "exp_x") ++
        PortableMath.logisticE9("x", "sig"))
    val bare = raw"\d\.\d+(?![\dE])".r.findAllIn(sql).toList
    assert(bare.isEmpty, s"bare fractional literals emitted: $bare")
  }

  test("roundedUnits is floor(x·10ⁿ + ½) exactly, negatives included") {
    val df = Seq(0.1234567894, -0.1234567894, 2.5e-10, -2.5e-10)
      .toDF("x")
    val got = PortableMath
      .withBindings(df, Seq("u" -> PortableMath.roundedUnits(
        Dual.col("x"), 9)))
      .select(col("x"), col("u")).as[(Double, Long)].collect().toMap
    got.foreach { case (x, u) =>
      assert(u == math.floor(x * 1e9 + 0.5).toLong, s"x=$x u=$u")
    }
  }
}
