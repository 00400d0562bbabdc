package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-9 analytic operators (q87 skyline, q88 Markov transitions,
  * q89 CUSUM drift, t34 Unicode normalize) verified against
  * INDEPENDENT in-memory reimplementations over the sf0.001 fixtures —
  * the same adversarial shape as the DuckDB oracles (quadratic
  * dominance scan vs window identity; sequential driver-side recursion
  * vs the distributed fold), so a bug in the Spark formulation cannot
  * hide in a shared mechanism.
  */
class AnalyticOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("UnicodeNormalize: UAX #15 forms, fast path, and null flow") {
    import graft.functions.UnicodeNormalize
    // composed e-acute (U+00E9) vs decomposed e + U+0301
    val deco = UTF8String.fromString("cafe\u0301")
    val comp = UTF8String.fromString("caf\u00e9")
    assert(UnicodeNormalize.compute(deco, "NFC") === comp)
    assert(UnicodeNormalize.compute(comp, "NFD") === deco)
    // compatibility: the fi ligature (U+FB01) folds to "fi" under NFKC only
    val lig = UTF8String.fromString("\ufb01n")
    assert(UnicodeNormalize.compute(lig, "NFKC") === UTF8String.fromString("fin"))
    assert(UnicodeNormalize.compute(lig, "NFC") === lig)
    // fast path: already-normalized input returns the SAME instance
    assert(UnicodeNormalize.compute(comp, "NFC") eq comp)
    // Hangul recomposition: conjoining jamo -> one precomposed syllable
    val jamo = UTF8String.fromString("\u1112\u1161\u11ab")
    assert(UnicodeNormalize.compute(jamo, "NFC") === UTF8String.fromString("\ud55c"))
    // non-BMP + composition EXCLUSION: U+1D15E (musical half note)
    // decomposes canonically but is excluded from recomposition, so
    // NFC(NFD(x)) must STAY decomposed — the UAX #15 subtlety a naive
    // "compose everything" implementation gets wrong (surrogate pairs
    // exercise the non-BMP path at the same time)
    val half = UTF8String.fromString("\ud834\udd5e")             // U+1D15E
    val decoHalf = UnicodeNormalize.compute(half, "NFD")
    assert(decoHalf ===
      UTF8String.fromString("\ud834\udd57\ud834\udd65"))      // U+1D157 U+1D165
    assert(UnicodeNormalize.compute(decoHalf, "NFC") === decoHalf)
    // codegen path end-to-end, null-intolerant null flow
    import spark.implicits._
    val df = Seq(Some("e\u0301"), Some("ascii"), None).toDF("s")
      .select(UnicodeNormalize(col("s"), "NFC").as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("\u00e9"), Some("ascii"), None))
  }

  test("q87_skyline equals the quadratic dominance scan (per-brand Pareto)") {
    val got = graft.queries.Extensions.q87_skyline(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
      .toSet
    // independent: brute-force dominance over collected price levels
    val lvl = Tables(spark, sfDir, "part")
      .groupBy(col("p_brand"), col("p_retailprice"))
      .agg(max(col("p_size")).as("best_size"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
    val want = lvl.filter { case (b, p, s, _) =>
      !lvl.exists { case (b2, p2, s2, _) => b2 == b && p2 < p && s2 >= s }
    }.toSet
    assert(got === want)
    assert(got.nonEmpty)
    // every brand keeps its cheapest price level (it is never dominated)
    val cheapest = lvl.groupBy(_._1).map { case (_, g) => g.minBy(_._2) }.toSet
    assert(cheapest.subsetOf(got))
  }

  test("q88_markov_transitions equals a sequential per-user replay") {
    val got = graft.queries.Extensions.q88_markov_transitions(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val events = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val counts = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      // full microsecond precision: getTime truncates to millis
      val seq = rows.sortBy(r =>
        (r._2.toInstant.getEpochSecond, r._2.getNanos, r._3)).map(_._4)
      seq.zip(seq.drop(1))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fromTotals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    assert(got.keySet === counts.keySet)
    counts.foreach { case (k, n) =>
      val (gn, gp) = got(k)
      assert(gn === n, s"count mismatch at $k")
      val p = BigDecimal(n.toDouble / fromTotals(k._1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gp - p) < 1e-9, s"probability mismatch at $k: $gp vs $p")
    }
    // each from-row of the matrix sums to ~1
    got.toSeq.groupBy(_._1._1).foreach { case (f, rows) =>
      assert(math.abs(rows.map(_._2._2).sum - 1.0) < 1e-4, s"row $f not normalized")
    }
  }

  test("q89_cusum_drift equals the sequential Page recursion") {
    val got = graft.queries.Extensions.q89_cusum_drift(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getAs[Timestamp]("first_breach_day")))).toMap
    val daily = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (et, rows) =>
      val series = rows.sortBy(_._2.getTime)
      val days = series.length.toLong
      val total = series.map(_._3).sum
      var s = 0L; var smax = 0L; var breach: Option[Timestamp] = None
      series.foreach { case (_, day, n) =>
        s = math.max(0L, s + n * days - total)
        smax = math.max(smax, s)
        if (breach.isEmpty && s > total) breach = Some(day)
      }
      et -> (days, total, smax, breach)
    }
    assert(got === want)
    // the integer-scaled fold is exact: a flat series has zero excursion
    assert(got.values.forall { case (_, _, smax, _) => smax >= 0L })
  }

  test("WinnowFingerprints: matches a direct replay and honors the shared-run guarantee") {
    import graft.functions.WinnowFingerprints
    import spark.implicits._
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def replay(toks: Seq[String], k: Int, w: Int): Seq[String] = {
      val hs = if (toks.length < k) Seq(md5hex(toks.mkString(" ")))
        else toks.sliding(k).map(g => md5hex(g.mkString(" "))).toSeq
      val nw = math.max(hs.length - w + 1, 1)
      (0 until nw).map { i =>
        val win = hs.slice(i, math.min(i + w, hs.length))
        // rightmost min: left fold taking b when b <= a
        win.reduceLeft((a, b) => if (b <= a) b else a)
      }.distinct.sorted
    }
    val rng = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0 until 40).map { i =>
      i.toLong -> Seq.fill(3 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
    }
    val got = docs.map { case (id, toks) => (id, toks) }
      .toDF("doc_id", "toks")
      .select(col("doc_id"), WinnowFingerprints(col("toks"), 5, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    docs.foreach { case (id, toks) =>
      assert(got(id) === replay(toks, 5, 4), s"doc $id")
    }
    // the winnowing guarantee: two docs sharing a run of ≥ w+k-1 = 8
    // tokens share at least one fingerprint, wherever the run sits
    val shared = Seq("s1", "s2", "s3", "s4", "s5", "s6", "s7", "s8")
    val a = Seq.fill(15)(vocab(rng.nextInt(vocab.size))) ++ shared
    val b = shared ++ Seq.fill(22)(vocab(rng.nextInt(vocab.size)))
    assert(replay(a, 5, 4).toSet.intersect(replay(b, 5, 4).toSet).nonEmpty)
    // density lands near the paper's 2/(w+1) on random text
    val dens = docs.collect { case (id, toks) if toks.length > 12 =>
      got(id).size.toDouble / math.max(toks.length - 4 - 3, 1)
    }
    val mean = dens.sum / dens.size
    assert(mean > 0.2 && mean < 0.8, s"winnow density off: $mean")
  }

  test("d13_winnow_copydetect executes the winnow scan once (AQE reuses the fp exchange)") {
    val df = graft.queries.Corpus.queries("d13_winnow_copydetect")(spark, sfDir)
    df.collect()
    // both self-join branches end in the canonically-identical window
    // exchange; at runtime AQE must REUSE the first branch's shuffle
    // stage for the second, so the expensive winnow scan runs once.
    // (The static plan prints two exchanges — reuse is a runtime stage
    // decision, which is why this asserts on the EXECUTED plan.)
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("Reused"),
      s"no reused stage in the executed plan:\n$executed")
  }

  test("q90_theilsen_trend equals a sequential pairwise-median replay") {
    def median(xs: Seq[Double]): Double = {
      val v = xs.sorted
      val pos = 0.5 * (v.length - 1)
      val lo = v(pos.toInt); val hi = v(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val got = graft.queries.Extensions.q90_theilsen_trend(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val daily = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (et, rows) =>
      val series = rows.sortBy(_._2.getTime).map(_._3).zipWithIndex
        .map { case (n, i) => (i + 1, n) } // 1-based day index
      val slopes = for {
        (ia, na) <- series; (ib, nb) <- series if ib > ia
      } yield (nb - na).toDouble / (ib - ia)
      val m = median(slopes.toSeq)
      val intercept = median(series.map { case (i, n) => n - m * i }.toSeq)
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      et -> (r6(m), r6(intercept), slopes.size.toLong)
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (et, (gs, gi, gn)) =>
      val (ws, wi, wn) = want(et)
      assert(gn === wn, s"pair count $et")
      assert(math.abs(gs - ws) < 1e-9, s"slope $et: $gs vs $ws")
      assert(math.abs(gi - wi) < 1e-9, s"intercept $et: $gi vs $wi")
    }
    // robustness: Theil-Sen of a clean linear series IS the true slope,
    // one corrupted point moves it not at all
    val clean = (1 to 21).map(i => (i, 10L + 3L * i))
    def sen(series: Seq[(Int, Long)]): Double = median((for {
      (ia, na) <- series; (ib, nb) <- series if ib > ia
    } yield (nb - na).toDouble / (ib - ia)).toSeq)
    assert(sen(clean) === 3.0)
    val corrupted = clean.updated(10, (11, 100000L))
    assert(sen(corrupted) === 3.0)
  }

  test("t36_quota_allocation: quotas sum to the budget and match the Hamilton method") {
    val rows = graft.queries.Corpus.queries("t36_quota_allocation")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._5).sum === 1000L, "quotas must sum exactly to the budget")
    // direct largest-remainder replay
    val total = rows.map(_._2).sum
    val base = rows.map { case (src, n, _, _, _) =>
      (src, n, n * 1000L / total, n * 1000L % total)
    }
    val leftover = (1000L - base.map(_._3).sum).toInt
    val bump = base.sortBy { case (src, _, _, rem) => (-rem, src) }
      .take(leftover).map(_._1).toSet
    val want = base.map { case (src, n, b, rem) =>
      (src, n, b, rem, b + (if (bump(src)) 1L else 0L))
    }.toSet
    assert(rows.toSet === want)
    // floor/ceil sandwich: every quota is within 1 of its exact share
    rows.foreach { case (src, n, _, _, q) =>
      val exact = n.toDouble * 1000 / total
      assert(q >= math.floor(exact) && q <= math.ceil(exact), s"$src: $q vs $exact")
    }
  }

  test("drift statistics NULL out on one-sided data instead of emitting NaN/Inf") {
    // the q139 hazard: a slice whose events all fall on one side of
    // the split has n_ref = 0 (or n_cur = 0). Unguarded, Spark's
    // d_stat = 0/0 = NaN and crit = Inf with NaN > Inf = TRUE — a
    // spurious drift verdict AND a cross-engine flip (DuckDB's
    // 0.0/0.0 is NULL). The shared guarded tails must yield NULL for
    // every statistic on that slice, for KS and rank-sum alike.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val after = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val oneSided = Seq.tabulate(8)(i =>
      (after, "only_cur", (i % 3).toDouble + 1.0))
      .toDF("ts", "event_type", "value")
    val slice = graft.queries.Features
      .driftFromSliceCounts(
        graft.queries.Features.sliceValueCounts(oneSided))
      .collect()(0)
    assert(slice.getLong(1) == 0L && slice.getLong(2) == 8L)
    Seq(3, 4, 5, 7, 8).foreach(i => // d_stat, crit, ks_drift, z, mw_drift
      assert(slice.isNullAt(i), s"column $i must be NULL on one-sided data"))
    val global = graft.queries.Features
      .ksFromCounts(graft.queries.Features.ksValueCounts(
        oneSided.select(col("ts"), col("value"))))
      .collect()(0)
    Seq(2, 3, 4).foreach(i =>
      assert(global.isNullAt(i), s"q135 column $i must be NULL one-sided"))
  }

  test("BH step-up rejects below the frontier, drops degenerate slices from m") {
    // the q143 semantics that separate BH from per-test thresholding:
    // a rank that FAILS its own critical value is still rejected when
    // any LOWER rank passes (step-up), and a NULL-z slice is not a
    // test (it must shrink m, not pad it)
    import spark.implicits._
    val dash = Seq(
      ("a", 10L, 10L, Some(3.00), true),
      ("b", 10L, 10L, Some(-2.10), true), // fails crit(2,4)=2.2414...
      ("c", 10L, 10L, Some(2.09), true),  // passes crit(3,4)=2.0802...
      ("d", 10L, 10L, Some(0.50), false),
      ("e", 0L, 10L, Option.empty[Double], false)) // degenerate: no test
      .toDF("slice", "n_ref", "n_cur", "z_score", "mw_drift")
    val r = graft.queries.Features.bhFromDashboard(dash)
      .collect().map(x => (x.getString(0), x.getLong(4), x.getLong(5),
        x.getBoolean(8))).sortBy(_._1)
    assert(r.length === 4) // e dropped
    assert(r.forall(_._3 == 4L)) // m = 4, not 5
    // frontier at rank 3 (c passes) ⟹ a, b, c rejected; d not
    assert(r.toSeq === Seq(("a", 1L, 4L, true), ("b", 2L, 4L, true),
      ("c", 3L, 4L, true), ("d", 4L, 4L, false)))
  }

  test("BH critical-z table: generated values reproduce the r13 " +
    "hand-derived constants") {
    // the generator (commons-math3 Φ⁻¹ rounded through a 6-decimal
    // string) must reproduce the 15 values the r13 table carried by
    // hand — a drift here would silently move every BH verdict
    val expected = Map(
      (1, 1) -> 1.959964,
      (1, 2) -> 2.241403, (2, 2) -> 1.959964,
      (1, 3) -> 2.393980, (2, 3) -> 2.128045, (3, 3) -> 1.959964,
      (1, 4) -> 2.497705, (2, 4) -> 2.241403, (3, 4) -> 2.080278,
      (4, 4) -> 1.959964,
      (1, 5) -> 2.575829, (2, 5) -> 2.326348, (3, 5) -> 2.170090,
      (4, 5) -> 2.053749, (5, 5) -> 1.959964)
    val gen = graft.queries.Features.BhCritZ.toMap
    expected.foreach { case (k, v) =>
      assert(gen(k) === v, s"BhCritZ$k drifted from the r13 constant")
    }
    // spot pins PAST m=5 (r14 advice): the m∈6..24 region is
    // generated at runtime from commons-math3, so a library upgrade
    // could silently shift critical values with no test failing.
    // These constants come from an INDEPENDENT Φ⁻¹ implementation
    // (CPython's statistics.NormalDist.inv_cdf — Wichura AS241),
    // rounded through the same 6-decimal string.
    val spotPins = Map(
      (1, 6) -> 2.638257, (6, 6) -> 1.959964,
      (1, 13) -> 2.890512, (7, 17) -> 2.315452,
      (1, 24) -> 3.078088, (5, 24) -> 2.561682, (12, 24) -> 2.241403,
      (23, 24) -> 1.978107, (24, 24) -> 1.959964)
    spotPins.foreach { case (k, v) =>
      assert(gen(k) === v, s"BhCritZ$k drifted from the AS241 constant")
    }
    // complete lower-triangular coverage up to the enforced bound
    val mx = graft.queries.Features.BhMaxM
    assert(gen.size === mx * (mx + 1) / 2)
    (1 to mx).foreach(m => (1 to m).foreach(i =>
      assert(gen.contains((i, m)), s"missing BhCritZ($i,$m)")))
  }

  test("BH gate: a 6-slice dashboard (past the r13 table) computes " +
    "the exact step-up; a domain past BhMaxM throws, never under-rejects") {
    import spark.implicits._
    // six real tests — the r13 table stopped at m=5 and would have
    // reported bh_critical_z=NULL / bh_reject=false for every row here
    val zs = Seq("a" -> 3.10, "b" -> 2.70, "c" -> 2.45, "d" -> 2.20,
      "e" -> 1.70, "f" -> 0.40)
    val dash = zs.map { case (s, z) => (s, 10L, 10L, Some(z), z > 2.0) }
      .toDF("slice", "n_ref", "n_cur", "z_score", "mw_drift")
    val got = graft.queries.Features.bhFromDashboard(dash)
      .collect()
      .map(x => (x.getString(0), x.getLong(4), x.getDouble(6),
        x.getBoolean(8)))
      .sortBy(_._2)
    // driver-side reference step-up over the same generated table
    val crit = graft.queries.Features.BhCritZ.toMap
    val ranked = zs.sortBy(-_._2).zipWithIndex
      .map { case ((s, z), i) => (s, i + 1, z) }
    val frontier = ranked.filter { case (_, i, z) => z >= crit((i, 6)) }
      .map(_._2).maxOption.getOrElse(0)
    val want = ranked
      .map { case (s, i, _) => (s, i.toLong, crit((i, 6)), i <= frontier) }
    assert(got.toSeq === want)
    assert(got.count(_._4) === 4) // a..d rejected via the step-up
    // 25 tests > BhMaxM=24: the gate must FAIL, not report all-false
    val big = (1 to 25).map(i => (f"s$i%02d", 10L, 10L, Some(1.0 + i * 0.1),
      true)).toDF("slice", "n_ref", "n_cur", "z_score", "mw_drift")
    val ex = intercept[Exception] {
      graft.queries.Features.bhFromDashboard(big).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("BhMaxM")))
  }

  test("q141/q145 domain guards: a 6th event type fails loudly " +
    "instead of silently vanishing from the pivot") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    // q141: per-type sufficient stats with an out-of-domain type
    val anovaStats = (graft.queries.Features.AnovaTypes :+ "refund")
      .map(t => (t, 10L, 1000L, new java.math.BigDecimal(100000)))
      .toDF("event_type", "n", "s", "s2")
    val e1 = intercept[Exception] {
      graft.queries.Features.anovaFromStats(anovaStats).collect()
    }
    assert(msgs(e1).exists(m => m != null && m.contains("AnovaTypes")))
    // q145: per-type drift counts with an out-of-domain type
    val catCounts = (graft.queries.Features.AnovaTypes :+ "refund")
      .map(t => (t, 10L, 12L)).toDF("event_type", "n_ref", "n_cur")
    val e2 = intercept[Exception] {
      graft.queries.Features.chi2FromCatCounts(catCounts).collect()
    }
    assert(msgs(e2).exists(m => m != null && m.contains("AnovaTypes")))
    // the guard passes untouched frames through: in-domain stats give
    // the same single-row readout as before
    val ok = graft.queries.Features.AnovaTypes
      .map(t => (t, 10L, 12L)).toDF("event_type", "n_ref", "n_cur")
    assert(graft.queries.Features.chi2FromCatCounts(ok).count() === 1L)
  }
}
