package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinklerSimilarity

/** Algebraic properties of the Jaro–Winkler kernel (pure JVM, no Spark
  * jobs — the kernel is exercised directly, so case counts can be
  * high). Pins the invariants the d15 ER join and the DuckDB parity
  * depend on: symmetry, range, identity, and the empty-string rule
  * DuckDB uses (either side empty → 0, even both-empty).
  */
object JwProperties extends Properties("graft.jaro_winkler") {

  private val expr = JaroWinklerSimilarity(
    null: org.apache.spark.sql.catalyst.expressions.Expression,
    null: org.apache.spark.sql.catalyst.expressions.Expression)
  private def jw(a: String, b: String): Double =
    expr.score(UTF8String.fromString(a), UTF8String.fromString(b))

  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  property("symmetric") = Prop.forAll(word, word) { (a, b) =>
    jw(a, b) == jw(b, a)
  }

  property("within [0, 1]") = Prop.forAll(word, word) { (a, b) =>
    val s = jw(a, b)
    s >= 0.0 && s <= 1.0
  }

  property("identity on non-empty; DuckDB's empty rule") =
    Prop.forAll(word) { a =>
      if (a.isEmpty) jw(a, a) == 0.0 else jw(a, a) == 1.0
    }

  property("either side empty scores 0") = Prop.forAll(word) { a =>
    jw(a, "") == 0.0 && jw("", a) == 0.0
  }

  property("disjoint alphabets score 0") = Prop.forAll(
    Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString),
    Gen.nonEmptyListOf(Gen.oneOf('x', 'y', 'z')).map(_.mkString)) { (a, b) =>
    jw(a, b) == 0.0
  }

  property("appending a shared suffix to both sides never hurts a perfect match") =
    Prop.forAll(word.suchThat(_.nonEmpty), word) { (a, sfx) =>
      jw(a + sfx, a + sfx) == 1.0
    }

  // ----- e-6 quantization safety (the d15/c05 threshold + report rule)
  //
  // Both queries compare and report ⌊jw·10⁶ + ½⌋, which flips only at
  // jw = (2k+1)/(2·10⁶) — an odd numerator over 2·10⁶, unattainable by
  // the exact JW rationals (denominator 30·l1·l2·m), so the nearest
  // attainable score sits ≥ 1/(2q) away from every flip point and a
  // last-bit kernel difference between engines can never flip the
  // quantized value. These properties measure that margin on the
  // COMPUTED doubles, including deliberately threshold-adjacent pairs.

  private def flipMargin(s: Double): Double = {
    val x = s * 1e6 + 0.5
    math.abs(x - math.round(x))
  }

  property("quantization margin ≥ 1e-6 on short word pairs") =
    Prop.forAll(word, word) { (a, b) =>
      // q = 30·l1·l2·m ≤ 30·12³ → analytic margin ≥ 9.6e-6; assert a
      // conservative 1e-6 on the computed double
      flipMargin(jw(a, b)) > 1e-6
    }

  private val partName: Gen[String] = {
    val colors = Vector("almond", "antique", "aquamarine", "azure",
      "beige", "bisque", "black", "blanched", "blue", "blush", "brown",
      "burlywood", "burnished", "chartreuse", "chiffon", "chocolate",
      "coral", "cornflower", "cornsilk", "cream", "cyan")
    for {
      n <- Gen.chooseNum(3, 5)
      ws <- Gen.listOfN(n, Gen.oneOf(colors))
    } yield ws.mkString(" ")
  }

  // single-character mutations of realistic part names concentrate
  // scores right where the d15 (0.85) and c05 (0.92) thresholds live
  private val mutatedPair: Gen[(String, String)] = for {
    a <- partName
    i <- Gen.chooseNum(0, 1000)
    c <- Gen.alphaLowerChar
  } yield (a, a.updated(i % a.length, c))

  property("quantization margin ≥ 1e-7 on threshold-adjacent long name pairs") =
    Prop.forAll(mutatedPair) { case (a, b) =>
      // 45-char names: q ≤ 30·45³ ≈ 2.7e6 → analytic margin ≥ 1.85e-7,
      // still ~300× the kernel's few-ulp error budget
      flipMargin(jw(a, b)) > 1e-7
    }
}
