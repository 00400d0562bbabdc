package graft

import graft.multimodal.MultiModal

class MultiModalSpec extends SparkSpec {

  test("decodeImages: only images, correct raster size, deterministic") {
    val media = MultiModal.syntheticMedia(spark, 30)
    val d1 = MultiModal.decodeImages(media, batchSize = 4).collect()
    assert(d1.nonEmpty)
    d1.foreach { img =>
      assert(img.pixels.length == img.width * img.height * img.channels)
    }
    val d2 = MultiModal.decodeImages(media, batchSize = 7).collect()
    assert(d1.map(i => (i.mediaId, i.pixels.toSeq)).toSet
      == d2.map(i => (i.mediaId, i.pixels.toSeq)).toSet)  // batch size never changes results
  }

  test("resize produces the requested dimensions") {
    val media = MultiModal.syntheticMedia(spark, 12)
    val resized = MultiModal.resize(MultiModal.decodeImages(media), 8, 6).collect()
    resized.foreach { img =>
      assert(img.width == 8 && img.height == 6)
      assert(img.pixels.length == 8 * 6 * img.channels)
    }
  }

  test("sampleFrames fans out one row per sampling interval with timestamps") {
    val media = MultiModal.syntheticMedia(spark, 30)
    val frames = MultiModal.sampleFrames(media, everyMs = 1000L).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.mediaId)
    val durations = media.collect().map(m => m.mediaId -> m.meta.durationMs).toMap
    byId.foreach { case (id, fs) =>
      assert(fs.length == math.max(1, (durations(id) / 1000L).toInt))
      assert(fs.map(_.timestampMs).sorted.toSeq
        == fs.indices.map(_ * 1000L).toSeq)
    }
  }

  test("extractFeatures: fixed-dim normalized histograms for every modality") {
    val media = MultiModal.syntheticMedia(spark, 30)
    val feats = MultiModal.extractFeatures(media, dim = 64).collect()
    assert(feats.length == 30)
    assert(feats.map(_.kind).toSet == Set("image", "audio", "video"))
    feats.foreach { f =>
      assert(f.features.length == 64)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3)  // normalized histogram
    }
  }

  test("featureStats aggregates per kind") {
    val stats = MultiModal.featureStats(spark, n = 30).collect()
    assert(stats.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(stats.map(_.getLong(1)).sum == 30)
  }

  test("tilePatches partitions each image exactly: areas sum to w*h, no overlap") {
    val media = MultiModal.syntheticMedia(spark, n = 60)
    val patches = MultiModal.tilePatches(media, patch = 16).collect()
    val images = media.collect().filter(_.kind == "image")
    assert(images.nonEmpty && patches.nonEmpty)
    val byMedia = patches.groupBy(_.mediaId)
    images.foreach { m =>
      val ps = byMedia(m.mediaId)
      // exact cover: patch areas sum to the image area
      assert(ps.map(p => p.width.toLong * p.height).sum ===
        m.meta.width.toLong * m.meta.height)
      // in bounds, non-degenerate, distinct ids
      ps.foreach { p =>
        assert(p.width > 0 && p.height > 0)
        assert(p.x0 + p.width <= m.meta.width && p.y0 + p.height <= m.meta.height)
      }
      assert(ps.map(_.patchId).distinct.length === ps.length)
      // no overlap: pairwise disjoint rectangles (small n, direct check)
      for (a <- ps; b <- ps if a.patchId < b.patchId) {
        val overlap = a.x0 < b.x0 + b.width && b.x0 < a.x0 + a.width &&
          a.y0 < b.y0 + b.height && b.y0 < a.y0 + a.height
        assert(!overlap, s"patches ${a.patchId} and ${b.patchId} overlap")
      }
    }
  }

  test("windowAudio frames strided full windows inside the sample count; short clips yield none") {
    val media = MultiModal.syntheticMedia(spark, n = 60)
    val wins = MultiModal.windowAudio(media, windowSamples = 400,
      hopSamples = 160).collect()
    val audio = media.collect().filter(_.kind == "audio")
    assert(audio.nonEmpty && wins.nonEmpty)
    val byMedia = wins.groupBy(_.mediaId).withDefaultValue(Array.empty)
    audio.foreach { m =>
      val nTotal = m.meta.sampleRate.toLong * m.meta.durationMs / 1000L
      val ws = byMedia(m.mediaId).sortBy(_.windowIndex)
      val expected =
        if (nTotal < 400) 0L else (nTotal - 400) / 160 + 1
      assert(ws.length.toLong === expected, s"media ${m.mediaId}")
      ws.foreach { w =>
        // every window lies fully inside the clip, on the hop grid
        assert(w.startSample === w.windowIndex * 160)
        assert(w.startSample + w.nSamples <= nTotal)
        assert(w.startMs === w.startSample * 1000 / m.meta.sampleRate)
      }
      // the NEXT window would overrun — coverage is maximal
      if (expected > 0) assert(ws.last.startSample + 160 + 400 > nTotal)
    }
    // a sub-window clip yields zero windows, not a partial one
    import spark.implicits._
    val short = Seq(MultiModal.MediaRow(999L, "audio", Array[Byte](1),
      MultiModal.MediaMeta("wav", 0, 0, 16000, 20L))).toDS()
    assert(MultiModal.windowAudio(short, 400, 160).count() === 0L)
  }
}
