package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.operators.Joins

/** Semantics of the temporal joins (as-of, band) and the KMV sketch —
  * hand-built frames with known answers, plus equivalence against the
  * naive formulations the scalable plans replace.
  */
class JoinsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val trades = {
    import spark.implicits._
    Seq(
      (1L, "AAPL", ts("2024-01-01 10:00:00"), 100.0),
      (2L, "AAPL", ts("2024-01-01 10:05:00"), 101.0),
      (3L, "AAPL", ts("2024-01-01 09:00:00"), 99.0), // before any quote
      (4L, "MSFT", ts("2024-01-01 10:00:30"), 200.0),
      (5L, "MSFT", ts("2024-01-01 10:01:00"), 201.0) // exact tie with a quote
    ).toDF("trade_id", "symbol", "ts", "trade_px")
  }

  private lazy val quotes = {
    import spark.implicits._
    Seq(
      ("AAPL", ts("2024-01-01 09:59:00"), 99.5),
      ("AAPL", ts("2024-01-01 10:03:00"), 100.5),
      ("MSFT", ts("2024-01-01 10:00:00"), 199.5),
      ("MSFT", ts("2024-01-01 10:01:00"), 200.5)
    ).toDF("symbol", "quote_ts", "quote_px")
  }

  test("asofJoin picks the latest quote at or before each trade, null when none") {
    val got = Joins.asofJoin(trades, quotes, Seq("symbol"), "ts", "quote_ts")
      .select("trade_id", "quote_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(99.5),   // 09:59 quote
      2L -> Some(100.5),  // 10:03 quote
      3L -> None,         // no quote yet
      4L -> Some(199.5),  // 10:00 quote
      5L -> Some(200.5))) // exact-tie quote at 10:01 matches
  }

  test("asofJoin tolerance nulls stale matches but keeps the left row") {
    val got = Joins.asofJoin(trades, quotes, Seq("symbol"), "ts", "quote_ts",
        toleranceMicros = Some(90L * 1000 * 1000)) // 90 s
      .select("trade_id", "quote_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(99.5),   // 60 s stale — inside tolerance
      2L -> None,         // 120 s stale — outside → nulled, row kept
      3L -> None,         // no quote at all
      4L -> Some(199.5),  // 30 s
      5L -> Some(200.5))) // exact tie, staleness 0
  }

  test("asofJoin forward picks the earliest quote at or after each trade") {
    val got = Joins.asofJoin(trades, quotes, Seq("symbol"), "ts", "quote_ts",
        direction = "forward")
      .select("trade_id", "quote_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(100.5),  // next AAPL quote at 10:03
      2L -> None,         // nothing after 10:05
      3L -> Some(99.5),   // 09:00 trade → first quote 09:59
      4L -> Some(200.5),  // next MSFT quote at 10:01
      5L -> Some(200.5))) // exact tie matches
  }

  test("asofJoin strict excludes exact-timestamp ties (leakage-safe backward)") {
    val got = Joins.asofJoin(trades, quotes, Seq("symbol"), "ts", "quote_ts",
        strict = true)
      .select("trade_id", "quote_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(99.5),
      2L -> Some(100.5),
      3L -> None,
      4L -> Some(199.5),  // 10:00 < 10:00:30 — strictly before, still matches
      5L -> Some(199.5))) // exact-tie 10:01 quote now EXCLUDED → previous one
  }

  test("asofJoin strict forward excludes ties symmetrically") {
    val got = Joins.asofJoin(trades, quotes, Seq("symbol"), "ts", "quote_ts",
        direction = "forward", strict = true)
      .select("trade_id", "quote_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(100.5),
      2L -> None,
      3L -> Some(99.5),
      4L -> Some(200.5),
      5L -> None)) // the only quote at-or-after is the tie — excluded
  }

  test("asofJoin keeps all left columns and carries the full right payload atomically") {
    val row = Joins.asofJoin(trades, quotes, Seq("symbol"), "ts", "quote_ts")
      .where(col("trade_id") === 2L).collect().head
    assert(row.getAs[String]("symbol") === "AAPL")
    assert(row.getAs[Double]("trade_px") === 101.0)
    assert(row.getAs[Timestamp]("quote_ts") === ts("2024-01-01 10:03:00"))
    assert(row.getAs[Double]("quote_px") === 100.5)
  }

  test("asofJoin matches the naive per-row max-rank formulation on a random frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = (1 to 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts("2024-01-01 00:00:00").getTime + rnd.nextInt(100000) * 1000L))
      .map { case (id, k, ms) => (id, k, new Timestamp(ms)) }
      .toDF("lid", "k", "lts")
    val r = (1 to 100).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts("2024-01-01 00:00:00").getTime + rnd.nextInt(100000) * 1000L))
      .map { case (id, k, ms) => (id, k, new Timestamp(ms)) }
      .distinct
      .map { case (id, k, t) => (k, t, id) }
      .toDF("k", "rts", "rid")
      // unique per (k, rts) for determinism
      .groupBy("k", "rts").agg(max(col("rid")).as("rid"))
    val fast = Joins.asofJoin(l, r, Seq("k"), "lts", "rts")
      .select("lid", "rid").collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    // naive: range join + latest-rts-then-greatest-rid pick
    val naive = l.join(r, l("k") === r("k") && col("rts") <= col("lts"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lid"))
          .orderBy(col("rts").desc_nulls_last, col("rid").desc_nulls_last)))
      .where(col("rk") === 1)
      .select("lid", "rid").collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(fast === naive)
  }

  test("rangeJoin returns exactly the pairs inside the closed interval") {
    import spark.implicits._
    val l = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("lid", "k", "lts")
    val r = Seq(
      (10L, "u", ts("2024-01-01 10:00:00")), // delta 0 — below lower bound 1us
      (11L, "u", ts("2024-01-01 10:00:01")), // inside
      (12L, "u", ts("2024-01-01 10:05:00")), // exactly upper bound — inside
      (13L, "u", ts("2024-01-01 10:05:01")), // outside
      (14L, "v", ts("2024-01-01 10:00:01"))  // wrong key
    ).toDF("rid", "k", "rts")
    val got = Joins.rangeJoin(l, r, Seq("k"), "lts", "rts", 1L, 300L * 1000 * 1000)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got === Set(11L, 12L))
  }

  test("rangeJoin equals the naive inequality join on a random frame (no dups, no misses)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    val l = (1 to 150).map(i => (i.toLong, s"k${rnd.nextInt(4)}",
      new Timestamp(base + rnd.nextInt(50000) * 1000L))).toDF("lid", "k", "lts")
    val r = (1 to 150).map(i => (i.toLong, s"k${rnd.nextInt(4)}",
      new Timestamp(base + rnd.nextInt(50000) * 1000L))).toDF("rid", "k2", "rts")
      .withColumnRenamed("k2", "k")
    val fast = Joins.rangeJoin(l, r, Seq("k"), "lts", "rts",
        -7L * 1000 * 1000, 13L * 1000 * 1000)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val naive = l.join(r, Seq("k"))
      .where((unix_micros(col("rts")) - unix_micros(col("lts")))
        .between(-7L * 1000 * 1000, 13L * 1000 * 1000))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(fast.sorted === naive.sorted)       // same pairs
    assert(fast.size === fast.distinct.size)   // each pair exactly once
  }

  test("KMV is exact below k and within 10% above it, invariant to partitioning") {
    import spark.implicits._
    val small = (1 to 100).map(i => s"v${i % 40}").toDF("x") // 40 distinct < k=64
    val smallEst = small.agg(KmvSketch.kmvDistinct(col("x"), k = 64)).collect().head.getLong(0)
    assert(smallEst === 40L)

    val big = (1 to 20000).map(i => s"v${i % 5000}").toDF("x") // 5000 distinct > k
    Seq(1, 7).foreach { parts =>
      val est = big.repartition(parts)
        .agg(KmvSketch.kmvDistinct(col("x"), k = 256)).collect().head.getLong(0)
      assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est too far from 5000")
    }
    // partition-count invariance must be exact: merge(k smallest) is
    // associative and hash-deterministic
    val a = big.repartition(3).agg(KmvSketch.kmvDistinct(col("x"))).collect().head.getLong(0)
    val b = big.repartition(13).agg(KmvSketch.kmvDistinct(col("x"))).collect().head.getLong(0)
    assert(a === b)
  }

  test("sessionize numbers gap-separated sessions per key") {
    import spark.implicits._
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00")),
      ("u1", ts("2024-01-01 10:10:00")), // same session (gap 10m < 30m)
      ("u1", ts("2024-01-01 11:00:00")), // new session (gap 50m)
      ("u1", ts("2024-01-01 11:29:59")), // same (gap < 30m)
      ("u2", ts("2024-01-01 10:00:00"))  // separate key
    ).toDF("user_id", "ts")
    val got = graft.operators.Sessionize(ev, Seq("user_id"), "ts", 30L * 60 * 1000 * 1000)
      .collect()
      .map(r => (r.getAs[String]("user_id"), r.getAs[Timestamp]("ts").toString, r.getAs[Long]("session_id")))
      .toSet
    assert(got === Set(
      ("u1", "2024-01-01 10:00:00.0", 1L),
      ("u1", "2024-01-01 10:10:00.0", 1L),
      ("u1", "2024-01-01 11:00:00.0", 2L),
      ("u1", "2024-01-01 11:29:59.0", 2L),
      ("u2", "2024-01-01 10:00:00.0", 1L)))
  }

  test("sessionize + per-session rollup share ONE exchange (subset rule)") {
    import spark.implicits._
    val ev = (1 to 100).map(i => (s"u${i % 5}", ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val sessions = graft.operators.Sessionize(ev, Seq("user_id"), "ts", 60L * 1000 * 1000)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
    sessions.collect()
    // AdaptiveSparkPlan.toString prints Final AND Initial plans — count
    // exchanges only in the executed (final) section
    val plan = sessions.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"expected the windows and the rollup to reuse one user_id exchange, got $exchanges:\n$plan")
  }

  test("cubeFromBase equals native .cube for algebraic aggregates") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 500).map(_ =>
      (s"a${rnd.nextInt(3)}", s"b${rnd.nextInt(4)}", rnd.nextInt(100).toLong)).toDF("d1", "d2", "v")
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2), r.getLong(3))).toSet
    val native = canon(df.cube(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select("d1", "d2", "n", "sv"))
    val base = df.groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val twoPhase = canon(graft.operators.Rollups
      .cubeFromBase(base, Seq("d1", "d2"), Seq("n", "sv"))
      .select("d1", "d2", "n", "sv"))
    assert(twoPhase === native)
  }

  test("graft_kmv is callable from SQL") {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    (1 to 1000).map(i => i % 300).toDF("x").createOrReplaceTempView("kmv_in")
    val est = spark.sql(
      """SELECT graft_kmv(CAST(conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10) AS BIGINT), 256) AS e
        |FROM kmv_in""".stripMargin).collect().head.getLong(0)
    assert(est === 300L)
  }
}
