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
}
