package graft

import org.apache.spark.sql.functions._

/** c06 training-mix release capstone invariants — the composition
  * contracts the hash compare alone can't name: the Hamilton budget
  * identity survives the dedup→quota chain, selection takes exactly
  * the clamped quota, packing is consistent with the token mass, and
  * the whole pipeline is a pure function of the data (bit-identical
  * re-runs).
  */
class ReleaseSpec extends SparkSpec {

  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  test("c06: quota budget identity and exact clamped selection on each fixture") {
    assume(dirs.nonEmpty)
    dirs.foreach { dir =>
      val out = SparkEntry.queries("c06_training_mix_release")(spark, dir)
        .select("source", "n_candidates", "final_quota", "n_selected",
          "sum_tokens", "n_packs")
        .collect()
      val budget = graft.queries.Corpus.C06Budget
      assert(out.map(_.getLong(2)).sum == budget,
        s"$dir: Hamilton quotas must sum exactly to the budget")
      out.foreach { r =>
        val (cand, quota, selected) =
          (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(selected == math.min(quota, cand),
          s"$dir/${r.getString(0)}: selection must take exactly " +
            s"min(final_quota, n_candidates)")
        val (sumTok, nPacks) = (r.getLong(4), r.getLong(5))
        if (selected == 0) assert(nPacks == 0 && sumTok == 0)
        else {
          // pack ids live in [0, (sum_tokens-1) div 2048]; each pack id
          // is claimed by at least one STARTING doc only when no doc
          // spans a whole window, so the count is bounded both ways
          assert(nPacks >= 1 && nPacks <= selected,
            s"$dir/${r.getString(0)}: pack count out of range")
          assert(nPacks <= (sumTok - 1) / 2048 + 1,
            s"$dir/${r.getString(0)}: more packs than the token mass spans")
        }
      }
    }
  }

  test("c06: dedup leg feeds quotas — candidates equal distinct texts") {
    assume(dirs.nonEmpty)
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val distinctTexts = docs.select("text").distinct().count()
      val out = SparkEntry.queries("c06_training_mix_release")(spark, dir)
      assert(out.agg(sum("n_candidates")).head.getLong(0) == distinctTexts,
        s"$dir: per-source candidates must sum to the deduped corpus size")
    }
  }

  test("c06: selection thresholds are mergeable — per-batch KMV folds ≡ full corpus") {
    // the incremental face of the release pipeline: the per-source
    // quota-th-smallest-hash state is a KMV min-k sketch, so a
    // continuous corpus maintains it by folding per-batch sketches
    // (min-k of a union = min-k of the min-k's) instead of rescanning
    // history. Split the corpus by doc_id parity, fold the two
    // per-source sketches, and demand bit-equality with the one-shot
    // full-corpus fold.
    assume(dirs.nonEmpty)
    val dir = dirs.head
    import graft.functions.KmvSketch
    val k = graft.queries.Corpus.C06Budget.toInt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        KmvSketch.hash64(col("doc_id")).as("__h"))
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("source")).agg(KmvSketch.kmvHashes(col("__h"), k).as("hs"))
    val full = sketch(docs).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val a = sketch(docs.where(col("doc_id") % 2 === 0)).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val b = sketch(docs.where(col("doc_id") % 2 === 1)).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    full.foreach { case (src, hs) =>
      val folded = (a.getOrElse(src, Seq.empty) ++ b.getOrElse(src, Seq.empty))
        .distinct.sorted.take(k)
      assert(folded == hs, s"$src: folded per-batch sketches != full fold")
    }
  }

  test("c06: the release is a pure function of the data (re-run bit-identical)") {
    assume(dirs.nonEmpty)
    val dir = dirs.head
    val q = SparkEntry.queries("c06_training_mix_release")
    val a = q(spark, dir).orderBy("source").collect().toSeq
    val b = q(spark, dir).orderBy("source").collect().toSeq
    assert(a == b, "hash-order sampling must be deterministic across runs")
  }

  test("c09: the quality gate shrinks candidates to the kept tertiles and re-apportions quotas") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    def bySource(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(6))).toMap
    val base = bySource(
      graft.queries.Corpus.c06_training_mix_release(spark, dir))
    val gated = bySource(
      graft.queries.Corpus.c09_quality_release(spark, dir))
    // the gate can only REMOVE candidates, never add
    gated.foreach { case (src, (cand, _, _)) =>
      assert(cand <= base(src)._1, s"$src gained candidates past the gate")
    }
    // the tail tertile is ~1/3 of docs; dedup overlaps it, so just
    // assert the gate is not a no-op: strictly fewer total candidates
    assert(gated.values.map(_._1).sum < base.values.map(_._1).sum)
    // the budget identity survives re-apportioning
    assert(gated.values.map(_._2).sum ===
      base.values.map(_._2).sum) // Σ final_quota = the shared budget
    // and the selection actually changed somewhere (checksum diff)
    assert(gated.exists { case (src, (_, _, ck)) => base(src)._3 != ck })
  }

  test("c10: the domain gate partitions sources, only removes candidates, and the budget identity survives") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val manifest = graft.queries.Corpus.c10_domain_gate(spark, dir)
      .collect()
    val docsSources = graft.Tables(spark, dir, "documents")
      .select(col("source")).distinct().collect()
      .map(_.getString(0)).toSet
    // the manifest covers every source exactly once, one verdict each
    assert(manifest.map(_.getString(0)).toSet === docsSources)
    assert(manifest.length === docsSources.size)
    manifest.foreach { r =>
      assert(Set("keep", "flag", "drop")(r.getString(12)))
      // signal sanity: counts nest, percentages are exact integer
      // shares in [0, 100]
      assert(r.getLong(2) <= r.getLong(1))  // n_scored <= n_docs
      assert(r.getLong(3) <= r.getLong(2))  // n_tail <= n_scored
      assert(r.getLong(10) <= r.getLong(9)) // n_shared_fp <= n_fp
      Seq(4, 6, 8, 11).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 100L))
    }
    val dropped = manifest.filter(_.getString(12) == "drop")
      .map(_.getString(0)).toSet
    assert(dropped.nonEmpty, "fixture thresholds must exercise a drop")
    assert(manifest.exists(_.getString(12) == "keep"))
    // composition: source gate -> c09's doc gate -> c06 chain
    def bySource(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val c09 = bySource(
      graft.queries.Corpus.c09_quality_release(spark, dir))
    val c10 = bySource(
      graft.queries.Corpus.c10GatedRelease(spark, dir))
    // dropped sources are gone from the gated release
    assert(c10.keySet === c09.keySet -- dropped)
    // the gate only REMOVES candidates globally (a per-source count
    // may grow when a cross-source duplicate's min-id holder sat in a
    // dropped source — the group migrates, it is not new)
    assert(c10.values.map(_._1).sum < c09.values.map(_._1).sum)
    // Hamilton re-apportions over the survivors; the budget identity
    // holds through BOTH gates
    assert(c10.values.map(_._2).sum ===
      graft.queries.Corpus.C06Budget)
  }

  test("c11: the media release keeps the budget identity, clamped selection, and dedup-only-removes per kind") {
    val out = SparkEntry.queries("c11_media_mix_release")(
        spark, "/root/testdata/sf0.001")
      .select("source", "n_candidates", "final_quota", "n_selected",
        "sum_tokens", "n_packs")
      .collect()
    // one manifest row per media kind
    assert(out.map(_.getString(0)).sorted.toSeq ===
      Seq("audio", "image", "video"))
    // Hamilton quotas sum exactly to the media budget
    assert(out.map(_.getLong(2)).sum === graft.queries.Corpus.C11Budget)
    out.foreach { r =>
      val (cand, quota, selected) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(selected == math.min(quota, cand),
        s"${r.getString(0)}: selection must take min(final_quota, n_candidates)")
      // dedup only removes: kept canonicals never exceed the corpus
      val corpus = r.getString(0) match {
        case "video" => 200L
        case _       => 400L
      }
      assert(cand >= 1L && cand <= corpus,
        s"${r.getString(0)}: kept count $cand out of [1, $corpus]")
      // the fixtures plant 4-member duplicate groups — dedup must
      // actually have fired, not passed everything through
      assert(cand < corpus, s"${r.getString(0)}: dedup removed nothing")
    }
    // re-run bit-identical (pure function of the data)
    val again = SparkEntry.queries("c11_media_mix_release")(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    val first = SparkEntry.queries("c11_media_mix_release")(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    assert(again === first)
  }
}
