package graft

import org.scalacheck.{Gen, Prop, Properties, Test => ScTest}

import graft.functions.FreqSketch

/** SpaceSaving property checks in the LOSSY regime (domain >> k) under
  * partitioned merges — every guarantee the t17 sketch-guided pipeline
  * leans on, on adversarial data the near-uniform corpus can't produce.
  */
object FreqSketchProperties extends Properties("graft.freqsketch") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(40)

  private def exact(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Summary after feeding `parts` as separate partials merged in order
    * — exercises update AND the mergeable-summaries combine.
    */
  private def sketch(parts: Seq[Seq[String]], k: Int): Map[String, (Long, Long)] = {
    val bufs = parts.map { p =>
      val b = new FreqSketch.SSBuffer(k)
      p.foreach(b.insertOne)
      b
    }
    val merged = bufs.reduceLeft((a, b) => a.mergeWith(b))
    merged.sortedEntries.map { case (i, e, r) => i -> (e, r) }.toMap
  }

  private val genStream: Gen[(List[String], Int)] = for {
    n <- Gen.choose(200, 1200)
    xs <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.choose(0, 4)),      // heavy head
      (3, Gen.choose(5, 40)),     // torso
      (2, Gen.choose(41, 400)))   // long tail >> k
      .map(i => s"w$i"))
    cuts <- Gen.choose(1, 7)
  } yield (xs, cuts)

  property("overestimate, bounded error, guaranteed inclusion") =
    Prop.forAll(genStream) { case (xs, cuts) =>
      val k = 32
      val parts = xs.grouped(math.max(1, xs.size / cuts)).toSeq
      val s = sketch(parts, k)
      val truth = exact(xs)
      val n = xs.size.toLong
      val sizeOk = s.size <= k
      val estOk = s.forall { case (item, (est, err)) =>
        val t = truth.getOrElse(item, 0L)
        est >= t && est - t <= err && err <= n / k + parts.size
      }
      // anything with true > N/k must be present in the summary
      val inclusionOk = truth.forall { case (item, t) =>
        t <= n / k || s.contains(item)
      }
      sizeOk && estOk && inclusionOk
    }

  property("sketch-guided exact recount equals the direct heavy-hitter set") =
    Prop.forAll(Gen.listOfN(600, Gen.frequency(
      (5, Gen.choose(0, 3)), (3, Gen.choose(4, 30)),
      (2, Gen.choose(31, 300))).map(i => s"t$i"))) { xs =>
      val k = 64
      val n = xs.size.toLong
      val thresholdNum = 50L // heavy = count * 50 > N; N/50 > N/64 = N/k
      val s = sketch(xs.grouped(100).toSeq, k)
      val truth = exact(xs)
      val candidates = s.collect {
        case (item, (est, _)) if est * thresholdNum > n => item
      }.toSet
      val viaSketch = truth.view
        .filterKeys(candidates).filter { case (_, t) => t * thresholdNum > n }
        .toMap
      val direct = truth.filter { case (_, t) => t * thresholdNum > n }
      viaSketch == direct
    }
}

/** End-to-end check of the t17 query over the real corpus against a
  * direct exact formulation (no sketch anywhere).
  */
class FreqSketchSpec extends SparkSpec {

  test("t17_heavy_hitters over the real corpus matches the direct exact aggregate") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.queries.Corpus.t17_heavy_hitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val toks = Tables(spark, sfDir, "documents")
      .select(graft.text.TextAnalysis.tokens(col("text")).as("__toks"))
      .where(size(col("__toks")) >= 2)
    val bigrams = toks.select(
      explode_outer(transform(sequence(lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ", slice(col("__toks"), i, lit(2))))).as("bigram"))
      .where(col("bigram").isNotNull)
    val n = bigrams.count()
    val ref = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .where(col("n") * 800 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === ref)
    assert(got.nonEmpty, "threshold should select a non-empty heavy set")
  }
}
