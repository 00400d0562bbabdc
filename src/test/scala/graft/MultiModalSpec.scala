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

  test("ImageIoCodec: a real PNG decodes to exact dims and pixels, and patch geometry holds") {
    import spark.implicits._
    // author a real 20×12 PNG in-memory with a known pixel function
    val (w0, h0) = (20, 12)
    def rgb(x: Int, y: Int): Int = ((x * 21) % 256 << 16) |
      ((y * 37) % 256 << 8) | ((x + y) % 256)
    val buf = new java.awt.image.BufferedImage(
      w0, h0, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h0; x <- 0 until w0) buf.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "png", bos))
    val png = bos.toByteArray
    // a real PNG decodes through the REAL path: container dims win and
    // pixels are the authored ones, not stub noise (meta deliberately
    // lies about the size to prove the codec, not the metadata, rules)
    val media = Seq(
      MultiModal.MediaRow(1L, "image", png,
        MultiModal.MediaMeta("png", w0, h0, 0, 0L)),
      MultiModal.MediaRow(2L, "image", png,
        MultiModal.MediaMeta("png", 999, 999, 0, 0L)),
      MultiModal.MediaRow(3L, "image", Array[Byte](1, 2, 3),
        MultiModal.MediaMeta("png", 5, 4, 0, 0L))).toDS()
    val decoded = MultiModal.decodeImages(media, batchSize = 2)
      .collect().map(d => d.mediaId -> d).toMap
    Seq(1L, 2L).foreach { id =>
      val d = decoded(id)
      assert(d.width === w0 && d.height === h0 && d.channels === 3)
      for (y <- 0 until h0; x <- 0 until w0) {
        val p = rgb(x, y); val i = (y * w0 + x) * 3
        assert(d.pixels(i) === ((p >> 16) & 0xff).toByte)
        assert(d.pixels(i + 1) === ((p >> 8) & 0xff).toByte)
        assert(d.pixels(i + 2) === (p & 0xff).toByte)
      }
    }
    // the garbage payload falls back to the stub at metadata dims
    assert(decoded(3L).width === 5 && decoded(3L).height === 4)
    assert(decoded(3L).pixels.length === 5 * 4 * 3)
    // m03's patchify geometry over the REAL image: 16-px grid on 20×12
    // is 2×1 patches — full 16-wide then a 4-px edge clamp
    val patches = MultiModal.tilePatches(media.filter(_.mediaId == 1L), 16)
      .collect().sortBy(_.patchId)
    assert(patches.map(p => (p.patchId, p.x0, p.y0, p.width, p.height)).toSeq
      === Seq((0, 0, 0, 16, 12), (1, 16, 0, 4, 12)))
    assert(patches.map(p => p.width.toLong * p.height).sum === w0.toLong * h0)
  }

  test("AudioSystemCodec: a real WAV decodes to exact samples, downmixes stereo, and m04 framing holds on real audio") {
    import spark.implicits._
    import MultiModal.AudioSystemCodec
    // author a real 16 kHz mono WAV with a known sample function
    val rate = 16000
    val n = 6400 // 400 ms
    val samples = Array.tabulate(n)(i => ((i * 773) % 30001 - 15000).toShort)
    val wav = AudioSystemCodec.wavBytes(samples, rate)
    // container magic, not metadata, decides the path
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    val Some((gotRate, got)) = AudioSystemCodec.decodeAudio(wav)
    assert(gotRate === rate)
    assert(got.toSeq === samples.toSeq)
    // garbage bytes fall back to None (the StubCodec cue)
    assert(AudioSystemCodec.decodeAudio(Array[Byte](1, 2, 3)).isEmpty)
    // stereo downmix: author an interleaved L/R WAV by hand and assert
    // the per-frame channel average
    val l = Array.tabulate(100)(i => (i * 100).toShort)
    val r = Array.tabulate(100)(i => (i * 100 + 50).toShort)
    val pcm = new Array[Byte](100 * 4)
    for (i <- 0 until 100; (s, c) <- Seq((l(i), 0), (r(i), 1))) {
      val off = (i * 2 + c) * 2
      pcm(off) = (s & 0xff).toByte
      pcm(off + 1) = ((s >> 8) & 0xff).toByte
    }
    val stereoFmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 2, true, false)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), stereoFmt, 100L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos2)
    val Some((_, mono)) = AudioSystemCodec.decodeAudio(bos2.toByteArray)
    assert(mono.toSeq === (0 until 100).map(i => ((l(i) + r(i)) / 2).toShort))
    // extractFeatures takes the REAL path for a WAV payload: its 64-bin
    // byte histogram must equal the one computed from the decoded
    // samples' little-endian bytes, and differ from the stub's
    val media = Seq(MultiModal.MediaRow(7L, "audio", wav,
      MultiModal.MediaMeta("wav", 0, 0, rate, 400L))).toDS()
    val feats = MultiModal.extractFeatures(media).collect().head.features
    val bytes = samples.flatMap(s => Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val hist = new Array[Float](64)
    bytes.foreach(b => hist((b & 0xff) * 64 / 256) += 1f)
    assert(feats.toSeq === hist.map(_ / bytes.length).toSeq)
    // m04's framing geometry on the real clip: windowAudio's metadata
    // arithmetic agrees with the DECODED sample count (400 ms @ 16 kHz
    // = 6400 samples -> (6400-400)/160+1 full windows), and every
    // window's sample range is in-bounds for the real PCM
    val ws = MultiModal.windowAudio(media, 400, 160).collect().sortBy(_.windowIndex)
    assert(ws.length === (got.length - 400) / 160 + 1)
    ws.foreach(w => assert(w.startSample + w.nSamples <= got.length))
  }

  test("AviMjpegCodec: a real MJPEG AVI round-trips frames, and sampleFrames reads the container clock") {
    import spark.implicits._
    import MultiModal.AviMjpegCodec
    // author a 3-frame 16×16 2 fps AVI of solid red/green/blue frames
    val colors = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255))
    val frames = colors.map { case (r, g, b) =>
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = img.createGraphics()
      gfx.setColor(new java.awt.Color(r, g, b))
      gfx.fillRect(0, 0, 16, 16)
      gfx.dispose()
      img
    }
    val avi = AviMjpegCodec.aviMjpegBytes(frames, fps = 2)
    assert(new String(avi.take(4), "US-ASCII") === "RIFF")
    val Some((usPerFrame, decoded)) = AviMjpegCodec.decodeFrames(avi)
    assert(usPerFrame === 500000L) // 2 fps
    assert(decoded.length === 3)
    decoded.zip(colors).foreach { case ((w, h, px), (r, g, b)) =>
      assert(w === 16 && h === 16 && px.length === 16 * 16 * 3)
      // JPEG is lossy: solid frames decode within a small tolerance
      def mean(c: Int): Double =
        px.indices.collect { case i if i % 3 == c => px(i) & 0xff }.sum / 256.0
      assert(math.abs(mean(0) - r) < 8, s"R ${mean(0)} vs $r")
      assert(math.abs(mean(1) - g) < 8, s"G ${mean(1)} vs $g")
      assert(math.abs(mean(2) - b) < 8, s"B ${mean(2)} vs $b")
    }
    // garbage bytes fall back to None (the StubCodec cue)
    assert(AviMjpegCodec.decodeFrames(Array[Byte](1, 2, 3)).isEmpty)
    // sampleFrames takes the REAL path: 3 frames / 2 fps = 1500 ms, so
    // everyMs = 500 samples 3 frames whose pixels are the decoded
    // frames in order (ts 0, 500, 1000 → frame 0, 1, 2) — geometry from
    // the CONTAINER, not the (deliberately wrong) metadata
    val media = Seq(MultiModal.MediaRow(9L, "video", avi,
      MultiModal.MediaMeta("avi", 4, 4, 0, 9999L))).toDS()
    val sampled = MultiModal.sampleFrames(media, everyMs = 500L)
      .collect().sortBy(_.frameIndex)
    assert(sampled.map(f => (f.frameIndex, f.timestampMs, f.width, f.height)).toSeq
      === Seq((0, 0L, 16, 16), (1, 500L, 16, 16), (2, 1000L, 16, 16)))
    sampled.zip(decoded).foreach { case (s, (_, _, px)) =>
      assert(s.pixels.toSeq === px.toSeq)
    }
    // extractFeatures' video branch histograms the decoded frames, not
    // the stub stream
    val feats = MultiModal.extractFeatures(media).collect().head.features
    val all = Array.concat(decoded.map(_._3): _*)
    val hist = new Array[Float](64)
    all.foreach(b => hist((b & 0xff) * 64 / 256) += 1f)
    assert(feats.toSeq === hist.map(_ / all.length).toSeq)
  }

  test("AviMjpegCodec: a negative chunk size terminates promptly with None (no hang)") {
    // RIFF/AVI magics + a chunk whose u32 size truncates to Int -8
    // (0xFFFFFFF8): before the size<0 guard this left the walk offset
    // unchanged forever, hanging the executor thread. The contract for
    // arbitrary bytes is a PROMPT None fallback — enforced here through
    // a timed future so a regression fails the suite instead of
    // freezing it.
    val bad = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0x40, 0, 0, 0) ++
      "AVI ".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      Array.fill[Byte](32)(0)
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = ex.submit(
        new java.util.concurrent.Callable[Option[(Long, Seq[(Int, Int, Array[Byte])])]] {
          def call() = MultiModal.AviMjpegCodec.decodeFrames(bad)
        })
      assert(fut.get(10, java.util.concurrent.TimeUnit.SECONDS).isEmpty)
    } finally { ex.shutdownNow(); () }
  }

  test("a third-party video codec drops into sampleFrames and extractFeatures untouched") {
    import spark.implicits._
    val payload = "FAKE".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val media = Seq(
      MultiModal.MediaRow(1L, "video", payload,
        MultiModal.MediaMeta("fake", 2, 2, 0, 999L))).toDS()
    val chain = MultiModal.VideoCodecs.default :+ new FakeFourccCodec
    // with the drop-in codec: the container clock (2 frames × 0.5 s)
    // drives the fan-out — 2 sampled frames with the codec's pixels
    val fs = MultiModal.sampleFrames(media, everyMs = 500L, codecs = chain)
      .collect().sortBy(_.frameIndex)
    assert(fs.length === 2)
    assert(fs(0).pixels.toSeq === Seq.fill(12)(0.toByte))
    assert(fs(1).pixels.toSeq === Seq.fill(12)(1.toByte))
    // without it: no registered codec accepts the payload, so the stub
    // fallback uses the METADATA duration (999 ms → 1 frame)
    assert(MultiModal.sampleFrames(media, everyMs = 500L).count() === 1L)
    // extractFeatures consults the same chain: bytes 0 and 1 both land
    // in histogram bin 0, so the codec-decoded feature vector is
    // exactly [1.0, 0, 0, ...]
    val feats = MultiModal.extractFeatures(media, codecs = chain)
      .collect().head.features
    assert(feats(0) === 1.0f)
    assert(feats.drop(1).forall(_ == 0.0f))
  }

  test("m07 composition: media features feed the IVF index and ANN finds a planted duplicate") {
    import org.apache.spark.sql.functions.col
    import graft.similarity.Similarity
    // the full multimodal -> similarity pipeline: opaque media bytes ->
    // per-row feature vectors (one mapPartitions decode pass, no
    // shuffle) -> IVF inverted lists -> ANN serving. A byte-identical
    // duplicate of one media object must come back as its top-1
    // neighbor at cosine ~1 -- the cross-modal near-dup detection loop
    // (d04's embedding path, fed by m01's features) end to end.
    val base = MultiModal.syntheticMedia(spark, 40).collect()
    val dup = base.head.copy(mediaId = 1000L)
    import spark.implicits._
    val media = spark.createDataset((base :+ dup).toSeq)
    val feats = MultiModal.extractFeatures(media, dim = 64)
      .select(col("mediaId").as("vec_id"), col("features").as("embedding"))
    val idx = Similarity.IvfIndex.build(feats, "vec_id", "embedding", nLists = 8)
    val hit = idx.search(feats.where(col("vec_id") === 1000L),
        "vec_id", "embedding", k = 1, nProbe = 2)
      .collect()
    assert(hit.length == 1)
    assert(hit.head.getLong(1) == base.head.mediaId)
    assert(math.abs(hit.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("dHash: identical rasters collide, small perturbations stay near, others far") {
    def raster(f: (Int, Int) => Int): Array[Byte] = {
      val out = new Array[Byte](64 * 48 * 3)
      for (y <- 0 until 48; x <- 0 until 64; c <- 0 until 3)
        out((y * 64 + x) * 3 + c) = f(x, y).toByte
      out
    }
    val base = raster((x, y) => (x * 3 + y * 5) % 256)
    val same = raster((x, y) => (x * 3 + y * 5) % 256)
    // brighten one 9x8 downsample cell
    val near = raster((x, y) =>
      if (x / 8 == 2 && y / 6 == 2) ((x * 3 + y * 5) % 256 + 96) % 256
      else (x * 3 + y * 5) % 256)
    val far = raster((x, y) => (x * 7 + y * 13 + x * y) % 256)
    def d(a: Array[Byte]) = MultiModal.dHash64(a, 64, 48, 3)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(d(base) == d(same))
    assert(ham(d(base), d(near)) <= 4, s"near ${ham(d(base), d(near))}")
    assert(ham(d(base), d(far)) > 10, s"far ${ham(d(base), d(far))}")
  }

  test("m07 corpus decodes through the REAL PNG path and banding is lossless") {
    import spark.implicits._
    val media = MultiModal.imageCorpus(spark, n = 80)
    // every image must take the javax.imageio route, not the stub
    val decoded = media.collect()
      .map(m => MultiModal.ImageIoCodec.decodeImage(m.content))
    assert(decoded.forall(_.isDefined))
    val hashes = MultiModal.imageDHashes(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // brute-force all pairs at hamming <= 3
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty, "fixture must plant near-dup pairs")
    // pigeonhole: any such pair matches exactly in >= 1 of 4 bands
    brute.foreach { case (ia, ib) =>
      val ha = hashes.find(_._1 == ia).get._2
      val hb = hashes.find(_._1 == ib).get._2
      assert((0 until 4).exists(b =>
        ((ha >> (16 * b)) & 0xffff) == ((hb >> (16 * b)) & 0xffff)))
    }
    // and at least one planted same-pattern pair is identified while
    // cross-pattern pairs stay out
    assert(brute.exists { case (a, b) => a / 4 == b / 4 })
  }

  test("m08 corpus decodes through the REAL WAV path and fingerprints are local") {
    import spark.implicits._
    val media = MultiModal.audioCorpus(spark, n = 80)
    val rows = media.collect()
    rows.foreach(m =>
      assert(MultiModal.AudioSystemCodec.decodeAudio(m.content).isDefined))
    // WAV PCM round-trip is lossless, so the fingerprint of the decoded
    // stream equals the fingerprint of the source samples
    val fps = MultiModal.audioFingerprints(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same-pattern variants are near; a different pattern is far
    val basePattern = (0L to 3L).map(fps)
    assert(basePattern.combinations(2).forall { case Seq(a, b) => ham(a, b) <= 4 })
    assert(ham(fps(0L), fps(40L)) > 8, s"cross ${ham(fps(0L), fps(40L))}")
  }

  test("m09 corpus decodes through the REAL MJPEG-AVI path with near frame hashes") {
    import spark.implicits._
    val media = MultiModal.videoCorpus(spark, n = 24)
    media.collect().foreach { m =>
      val dec = MultiModal.AviMjpegCodec.decodeFrames(m.content)
      assert(dec.isDefined && dec.get._2.length == 4)
    }
    val fh = MultiModal.videoFrameDHashes(media)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // variant 1 of pattern 0 differs from variant 0 only in frame 0's
    // block: the other three frame positions must be CLOSE (JPEG noise
    // only), and at least 3 of 4 within the m09 threshold
    val close = (0 until 4).count(f => ham(fh((0L, f)), fh((1L, f))) <= 6)
    assert(close >= 3, s"close positions $close")
    // cross-pattern clips share no positions within the threshold
    val cross = (0 until 4).count(f => ham(fh((0L, f)), fh((20L, f))) <= 6)
    assert(cross == 0, s"cross-pattern close positions $cross")
  }
}

/** A minimal third-party codec for the drop-in spec: decodes payloads
  * whose magic is "FAKE" into two 2×2 frames at 2 fps. Top-level class
  * (no outer reference) so the task closure serializes it cleanly —
  * the shape any real MP4/H.264 codec dependency would take.
  */
class FakeFourccCodec extends MultiModal.VideoCodec {
  override def decodeFrames(
      content: Array[Byte]): Option[(Long, Seq[(Int, Int, Array[Byte])])] =
    if (content.length >= 4 &&
        new String(content, 0, 4, "US-ASCII") == "FAKE")
      Some((500000L, Seq.tabulate(2)(i => (2, 2, Array.fill[Byte](12)(i.toByte)))))
    else None

}

