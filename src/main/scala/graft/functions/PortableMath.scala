package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Cross-engine bit-deterministic scalar math.
  *
  * Problem (round-9 postmortem): `round(double, n)` over a
  * transcendental (ln/exp) diverges between Spark and DuckDB — Spark
  * rounds the shortest decimal repr, DuckDB rounds via the multiply
  * trick, and the engines' libm `ln`/`exp` are each only
  * faithfully-rounded (≤1 ulp), not correctly-rounded, so even the
  * pre-round doubles can differ in the last bit. Any query whose
  * compared output passes a transcendental through `round` is one
  * data instance away from a hash mismatch (q118/q122/q126/g08 in
  * CORRECTNESS_r09).
  *
  * Fix: state the WHOLE formula — including the transcendental —
  * once, and emit that single written form to BOTH engines, using
  * only operations IEEE-754 REQUIRES to be correctly rounded
  * (+, −, ×, /) plus exact ops (floor, integer compares, CASE
  * branches on already-identical values) and decimal literals whose
  * shortest repr round-trips to the same double in both parsers.
  * Identical inputs + identical correctly-rounded op sequence =
  * bit-identical outputs, independent of either engine's libm.
  *
  * [[Dual]] is that "stated once" form: a Spark [[Column]] and the
  * equivalent DuckDB SQL text built in lockstep by the same
  * combinator call, so the two trees CANNOT drift. Multi-step
  * formulas are emitted as NAMED BINDINGS ([[Bindings]]) — each step
  * becomes a real column on both sides (`withColumn` / a nested
  * `SELECT *, expr AS name`), keeping every emitted expression
  * short instead of textually inlining subterms exponentially.
  *
  * `ln` is an atanh series after exact decimal+binary range
  * reduction; `exp` is a Taylor series after base-2 argument
  * reduction with the 2^k factor selected from a CASE table of exact
  * literals. Accuracy is ~1e-15 relative (series truncation ≪ the
  * reports' e9 quantization) — and, unlike accuracy, EQUALITY across
  * the two engines is exact by construction (spec: PortableMathSpec).
  *
  * Catalyst note: Spark's ReorderAssociativeOperator only
  * reassociates integral types, and JVM ≥17 floating point is always
  * strict (JEP 306), so the Column tree evaluates the written order.
  */
object PortableMath {

  /** One scalar expression, two emissions. `sql` is always
    * parenthesized/atomic, so embedding composes without precedence
    * surprises.
    */
  final case class Dual(c: Column, sql: String) {
    def +(o: Dual): Dual = Dual(c + o.c, s"(${sql} + ${o.sql})")
    def -(o: Dual): Dual = Dual(c - o.c, s"(${sql} - ${o.sql})")
    def *(o: Dual): Dual = Dual(c * o.c, s"(${sql} * ${o.sql})")
    def /(o: Dual): Dual = Dual(c / o.c, s"(${sql} / ${o.sql})")
    def unary_- : Dual = Dual(-c, s"(0.0E0 - ${sql})")
    def <(o: Dual): DualCond = DualCond(c < o.c, s"(${sql} < ${o.sql})")
    def <=(o: Dual): DualCond = DualCond(c <= o.c, s"(${sql} <= ${o.sql})")
    def >=(o: Dual): DualCond = DualCond(c >= o.c, s"(${sql} >= ${o.sql})")
    def ===(o: Dual): DualCond = DualCond(c === o.c, s"(${sql} = ${o.sql})")

    /** floor toward −∞ as BIGINT in both engines (exact). */
    def floorL: Dual =
      Dual(F.floor(c), s"CAST(FLOOR(${sql}) AS BIGINT)")

    /** BIGINT → double view — exact for |v| < 2⁵³. */
    def toDouble: Dual =
      Dual(c.cast("double"), s"CAST(${sql} AS DOUBLE)")
  }

  final case class DualCond(c: Column, sql: String)

  object Dual {
    /** A column that exists under the SAME name in the Spark frame
      * and the oracle's SQL scope — the caller's naming contract.
      */
    def col(name: String): Dual = Dual(F.col(name), name)

    /** A double literal. `java.lang.Double.toString` is the shortest
      * repr that uniquely identifies the double, and both engines'
      * decimal→double conversions are correctly rounded, so the
      * literal round-trips to the identical bit pattern on each side.
      * The SQL emission is E-notation because DuckDB types a bare
      * fractional literal as DECIMAL — a pure-literal CASE would
      * become a DECIMAL column whose +/− runs as EXACT decimal
      * arithmetic, and even `CAST(lit AS DOUBLE)` goes through the
      * DECIMAL value and DOUBLE-ROUNDS when the scaled mantissa
      * exceeds 2⁵³ (probe-caught: 9·ln10 off by 1 ulp). An
      * exponent-suffixed literal is parsed DIRECTLY as a DOUBLE,
      * correctly rounded.
      */
    def lit(d: Double): Dual = {
      require(java.lang.Double.isFinite(d), s"non-finite literal $d")
      val s = java.lang.Double.toString(d)
      Dual(F.lit(d), if (s.contains("E")) s else s + "E0")
    }

    def litL(v: Long): Dual = Dual(F.lit(v), v.toString)

    /** CASE WHEN … chain; conditions must branch on values already
      * identical across engines (exact integers or Duals).
      */
    def cases(branches: Seq[(DualCond, Dual)], default: Dual): Dual = {
      val c = branches.foldRight(default.c) { case ((p, v), els) =>
        F.when(p.c, v.c).otherwise(els)
      }
      val sql = branches
        .map { case (p, v) => s"WHEN ${p.sql} THEN ${v.sql}" }
        .mkString("(CASE ", " ", s" ELSE ${default.sql} END)")
      Dual(c, sql)
    }
  }

  /** An ordered list of named steps; later steps may reference
    * earlier names via [[Dual.col]].
    */
  type Bindings = Seq[(String, Dual)]

  /** Materialize bindings on the Spark side. Collisions are rejected
    * CASE-INSENSITIVELY: both engines resolve identifiers that way
    * (Spark withColumn silently replaces; DuckDB silently renames its
    * `SELECT *` duplicate), so a colliding binding would read
    * DIFFERENT columns on the two sides — the exact drift this module
    * exists to prevent.
    */
  def withBindings(df: DataFrame, bs: Bindings): DataFrame =
    bs.foldLeft(df) { case (d, (n, dual)) =>
      require(!d.columns.exists(_.equalsIgnoreCase(n)),
        s"binding '$n' collides case-insensitively with an existing column")
      d.withColumn(n, dual.c)
    }

  /** Materialize bindings on the SQL side: each step becomes one
    * nested `SELECT *, expr AS name` over `base` (a table name or a
    * parenthesizable subquery).
    */
  def sqlWithBindings(base: String, bs: Bindings): String =
    bs.foldLeft(base) { case (inner, (n, d)) =>
      s"SELECT *, ${d.sql} AS $n FROM ($inner)"
    }

  private val Ln2 = math.log(2.0) // generation-time constants; emitted
  private val Ln10 = math.log(10.0) // as literals, so both engines get
  private val InvLn2 = 1.0 / Ln2 // the same double regardless of libm

  /** Natural log of the positive BIGINT column `src` (1 ≤ v < 10¹⁵)
    * into column `out`, bit-identical across engines.
    *
    * Range reduction is exact at every step: the decimal magnitude s
    * (a CASE of integer compares on the exact BIGINT) maps v to
    * m = v/10ˢ ∈ [0.1, 1) via one correctly-rounded division by an
    * exactly-representable power of ten; a second CASE on m picks
    * j ∈ {0..3} so y = m·2ʲ ∈ [0.8, 1.6) (multiplying by a power of
    * two is exact; thresholds 0.2/0.4/0.8 are exact binary
    * fractions). Then ln y = 2·atanh t with t = (y−1)/(y+1),
    * |t| ≤ 3/13, via a 15-term odd Horner series (truncation
    * ≤ 1e-19 relative), and ln v = s·ln10 − j·ln2 + ln y with the
    * s·ln10 / j·ln2 products folded to literals at generation time.
    */
  def lnPosBigint(src: String, out: String): Bindings = {
    val v = Dual.col(src)
    val digitConds = (1 to 15).map { s =>
      s -> (v < Dual.litL(math.pow(10, s).toLong))
    }
    val p10 = Dual.cases(
      digitConds.map { case (s, cond) => cond -> Dual.lit(math.pow(10.0, s)) },
      Dual.lit(1e15))
    val sLn10 = Dual.cases(
      digitConds.map { case (s, cond) => cond -> Dual.lit(s * Ln10) },
      Dual.lit(15 * Ln10))
    val m = Dual.col(s"${out}_m")
    val jf = Dual.cases(
      Seq((m < Dual.lit(0.2)) -> Dual.lit(8.0),
        (m < Dual.lit(0.4)) -> Dual.lit(4.0),
        (m < Dual.lit(0.8)) -> Dual.lit(2.0)),
      Dual.lit(1.0))
    val jLn2 = Dual.cases(
      Seq((m < Dual.lit(0.2)) -> Dual.lit(3 * Ln2),
        (m < Dual.lit(0.4)) -> Dual.lit(2 * Ln2),
        (m < Dual.lit(0.8)) -> Dual.lit(1 * Ln2)),
      Dual.lit(0.0))
    val y = Dual.col(s"${out}_y")
    val one = Dual.lit(1.0)
    val t = Dual.col(s"${out}_t")
    val t2 = Dual.col(s"${out}_t2")
    // Σ t²ᵏ/(2k+1), k = 0..14, Horner from the smallest term
    val ser = (14 to 1 by -1).foldLeft(Dual.lit(1.0 / 29)) { (acc, k) =>
      Dual.lit(1.0 / (2 * k - 1)) + t2 * acc
    }
    Seq(
      s"${out}_sl" -> sLn10,
      s"${out}_m" -> (v.toDouble / p10),
      s"${out}_jl" -> jLn2,
      s"${out}_y" -> (m * jf),
      s"${out}_t" -> ((y - one) / (y + one)),
      s"${out}_t2" -> (t * t),
      out -> (Dual.col(s"${out}_sl") - Dual.col(s"${out}_jl") +
        Dual.lit(2.0) * t * ser))
  }

  /** e^x of the double column `src` (|x| ≤ 44 — beyond 2⁻⁶⁴/2⁶⁴ the
    * CASE table saturates and callers must have clamped) into column
    * `out`, bit-identical across engines. k = ⌊x/ln2 + ½⌋ (exact
    * floor of an identical double), r = x − k·ln2 with |r| ≤ ln2/2
    * + ulp, e^r by 13-step Taylor–Horner (truncation ≤ 5e-18), and
    * the 2ᵏ factor from a CASE table of exact power-of-two literals.
    */
  def expBindings(src: String, out: String): Bindings = {
    val x = Dual.col(src)
    val k = Dual.col(s"${out}_k")
    val r = Dual.col(s"${out}_r")
    // e^r = 1 + r(1 + r/2(1 + r/3(… 1 + r/13)))
    val ser = (13 to 1 by -1).foldLeft(Dual.lit(1.0)) { (acc, j) =>
      Dual.lit(1.0) + r * Dual.lit(1.0 / j) * acc
    }
    val p2 = Dual.cases(
      (-64 to 64).map { e =>
        (k === Dual.litL(e.toLong)) -> Dual.lit(math.pow(2.0, e))
      },
      Dual.lit(0.0))
    Seq(
      s"${out}_k" -> (x * Dual.lit(InvLn2) + Dual.lit(0.5)).floorL,
      s"${out}_r" -> (x - k.toDouble * Dual.lit(Ln2)),
      s"${out}_s" -> ser,
      out -> (Dual.col(s"${out}_s") * p2))
  }

  /** round-half-up of x at 10⁻ⁿ as scaled BIGINT units: ⌊x·10ⁿ + ½⌋.
    * Both engines compute the identical double x·10ⁿ + 0.5 (correctly
    * rounded multiply/add) and floor is exact — the engine-portable
    * replacement for `round(double, n)`, whose two implementations
    * (shortest-repr vs multiply) are what diverged in round 9.
    */
  def roundedUnits(x: Dual, n: Int): Dual =
    (x * Dual.lit(math.pow(10.0, n)) + Dual.lit(0.5)).floorL

  /** σ(z)·10⁹ as BIGINT for the double column `zSrc`, saturated
    * outside |z| ≤ 22 where the e9 quantization is constant anyway
    * (e⁻²² < 3e-10): the portable logistic for probability reports.
    */
  def logisticE9(zSrc: String, out: String): Bindings = {
    val z = Dual.col(zSrc)
    val negZ = s"${out}_nz"
    val ez = s"${out}_ez"
    val sat = Dual.cases(
      Seq(
        (z >= Dual.lit(22.0)) -> Dual.litL(1000000000L),
        (z <= Dual.lit(-22.0)) -> Dual.litL(0L)),
      roundedUnits(Dual.lit(1.0) / (Dual.lit(1.0) + Dual.col(ez)), 9))
    Seq(negZ -> (-z)) ++ expBindings(negZ, ez) :+ (out -> sat)
  }
}
