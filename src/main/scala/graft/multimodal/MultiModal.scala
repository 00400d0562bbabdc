package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads carried as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / resize / frame-sample operators.
  *
  * Spark-side design (all real and exercised by the specs):
  *   - media rows are a typed `Dataset[MediaRow]` — binary payload +
  *     metadata struct, the schema a 100 TB media lake would use
  *     (payloads inline here; at petabyte scale the binary column holds
  *     a pointer + byte-range into bulk object storage instead);
  *   - per-partition batch processing via `mapPartitions` with an
  *     explicit batch size — the shape vectorized decoders need (decode
  *     N payloads per library call), with executor-side iterators and
  *     no driver collection;
  *   - repartitioning by size class before decode balances skew (one
  *     4K video next to thumbnails starves a partition otherwise).
  *
  * Image decode is REAL for the containers the JDK ships readers for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — [[ImageIoCodec]]), and audio
  * decode is REAL for WAV/AIFF/AU (via `javax.sound.sampled` —
  * [[AudioSystemCodec]], multi-channel downmix + 16-bit conversion
  * included) — both with no external dependency. Payloads no installed
  * reader accepts fall back to [[StubCodec]], which derives
  * deterministic fake pixels/samples from the payload bytes so
  * synthetic fixtures stay testable end-to-end. Video decode has no
  * JDK-native path and remains stubbed; every stub call site is marked,
  * and the surrounding schema, partitioning, batching, and operator
  * signatures are the real contract a full codec drop-in would
  * implement.
  */
object MultiModal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(
      format: String,            // "png" | "jpeg" | "wav" | "mp4" | ...
      width: Int,                // pixels; 0 for audio
      height: Int,               // pixels; 0 for audio
      sampleRate: Int,           // Hz; 0 for images
      durationMs: Long)          // 0 for still images

  /** One media object: opaque bytes + typed metadata. */
  case class MediaRow(
      mediaId: Long,
      kind: String,              // "image" | "audio" | "video"
      content: Array[Byte],
      meta: MediaMeta)

  /** Decoded raster: row-major interleaved channels. */
  case class DecodedImage(
      mediaId: Long,
      width: Int,
      height: Int,
      channels: Int,
      pixels: Array[Byte])

  /** One sampled video frame (decoded). */
  case class SampledFrame(
      mediaId: Long,
      frameIndex: Int,
      timestampMs: Long,
      width: Int,
      height: Int,
      pixels: Array[Byte])

  /** Fixed-length feature vector per media object. */
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      features: Array[Float])

  /** ================= JDK-NATIVE IMAGE CODEC =================
    * Real decode for any container an installed `javax.imageio` reader
    * accepts — PNG, BMP, GIF, JPEG ship with every JDK, so this needs
    * no new dependency. Output is row-major interleaved RGB, the
    * [[DecodedImage]] contract. Executor-side, thread-safe, and
    * allocation-bounded (one int row buffer per call).
    */
  object ImageIoCodec {
    javax.imageio.ImageIO.setUseCache(false) // no per-call temp files

    /** Decode to (width, height, interleaved RGB). None when no reader
      * recognizes the bytes — the caller's cue to fall back to
      * [[StubCodec]] (synthetic fixtures, unsupported containers).
      */
    def decodeImage(content: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case _: java.io.IOException | _: RuntimeException => null }
      Option(img).map { im =>
        val w = im.getWidth
        val h = im.getHeight
        val out = new Array[Byte](w * h * 3)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          im.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            val i = (y * w + x) * 3
            out(i) = ((p >> 16) & 0xff).toByte
            out(i + 1) = ((p >> 8) & 0xff).toByte
            out(i + 2) = (p & 0xff).toByte
            x += 1
          }
          y += 1
        }
        (w, h, out)
      }
    }
  }

  /** ================= JDK-NATIVE AUDIO CODEC =================
    * Real decode for any container an installed `javax.sound.sampled`
    * reader accepts — WAV/AIFF/AU ship with every JDK, so this needs no
    * new dependency (the audio analogue of [[ImageIoCodec]]). Output is
    * (sampleRate, mono 16-bit PCM): multi-channel input is downmixed by
    * per-frame channel average, and non-16-bit encodings are converted
    * through the JDK's format-conversion pipeline first.
    */
  object AudioSystemCodec {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    /** Decode to (sampleRate, mono samples). None when no installed
      * reader recognizes the bytes — the caller's cue to fall back to
      * [[StubCodec]] (synthetic fixtures, unsupported containers).
      */
    def decodeAudio(content: Array[Byte]): Option[(Int, Array[Short])] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val base = in.getFormat
          val target = new AudioFormat(
            AudioFormat.Encoding.PCM_SIGNED, base.getSampleRate, 16,
            base.getChannels, base.getChannels * 2, base.getSampleRate,
            /* bigEndian = */ false)
          val pcm = AudioSystem.getAudioInputStream(target, in)
          val bytes = pcm.readAllBytes()
          val ch = target.getChannels
          val nFrames = bytes.length / (2 * ch)
          val out = new Array[Short](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0
            var c = 0
            while (c < ch) {
              val i = (f * ch + c) * 2 // little-endian, matching `target`
              acc += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
              c += 1
            }
            out(f) = (acc / ch).toShort
            f += 1
          }
          Some((math.round(base.getSampleRate), out))
        } finally in.close()
      } catch { case _: Exception => None }

    /** Author a real single-channel 16-bit PCM WAV from samples — the
      * fixture-side inverse of [[decodeAudio]], so specs and synthetic
      * corpora can exercise the REAL decode path without any media
      * files in the environment.
      */
    def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(i * 2) = (samples(i) & 0xff).toByte // WAV PCM is little-endian
        pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** ================= STUB CODEC =================
    * Deterministic fake decode: pixels/samples are a keyed stream from
    * the payload bytes (xorshift over a seed folded from the content).
    * A real deployment replaces ONLY this object with e.g. a JNI codec;
    * every operator below is codec-agnostic.
    */
  object StubCodec {
    private def fold(bytes: Array[Byte]): Long =
      bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)

    /** STUB for an image decoder (`???` semantics, made deterministic
      * so pipelines are testable end-to-end).
      */
    def decodeImage(content: Array[Byte], w: Int, h: Int, channels: Int): Array[Byte] = {
      var s = fold(content) | 1L
      val out = new Array[Byte](w * h * channels)
      var i = 0
      while (i < out.length) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = (s & 0xff).toByte
        i += 1
      }
      out
    }

    /** STUB for an audio PCM decoder. */
    def decodeAudio(content: Array[Byte], nSamples: Int): Array[Short] = {
      var s = fold(content) | 1L
      val out = new Array[Short](nSamples)
      var i = 0
      while (i < out.length) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = (s & 0xffff).toShort
        i += 1
      }
      out
    }
  }

  /** Decode image payloads in per-partition batches. `batchSize` is the
    * unit a vectorized codec would receive; the iterator never holds
    * more than one batch in memory.
    */
  def decodeImages(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media
      .filter(col("kind") === "image")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { m =>
            ImageIoCodec.decodeImage(m.content) match {
              // REAL decode: dimensions come from the container itself
              case Some((w, h, px)) => DecodedImage(m.mediaId, w, h, 3, px)
              // STUB fallback (no reader accepted the payload): fake
              // pixels at the metadata dimensions keep synthetic
              // fixtures flowing end-to-end
              case None =>
                val w = math.max(m.meta.width, 1)
                val h = math.max(m.meta.height, 1)
                DecodedImage(m.mediaId, w, h, 3,
                  StubCodec.decodeImage(m.content, w, h, 3))
            }
          }
        }
      }
  }

  /** Nearest-neighbor resize on decoded rasters — pure Scala per row,
    * no shuffle.
    */
  def resize(images: Dataset[DecodedImage], outW: Int, outH: Int): Dataset[DecodedImage] = {
    import images.sparkSession.implicits._
    images.map { img =>
      val out = new Array[Byte](outW * outH * img.channels)
      var y = 0
      while (y < outH) {
        val sy = y * img.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * img.width / outW
          var c = 0
          while (c < img.channels) {
            out((y * outW + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(img.mediaId, outW, outH, img.channels, out)
    }
  }

  /** Sample video frames every `everyMs` milliseconds — flatMap (the
    * explode shape): one input row fans out to duration/everyMs rows.
    * Decode is the stub; the fan-out, timestamps, and schema are real.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media
      .filter(col("kind") === "video")
      .flatMap { m =>
        val n = math.max(1, (m.meta.durationMs / everyMs).toInt)
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          val w = math.max(m.meta.width, 1)
          val h = math.max(m.meta.height, 1)
          // STUB call site: frame-accurate seek+decode in a real codec.
          val framePayload = m.content ++ BigInt(ts).toByteArray
          SampledFrame(m.mediaId, i, ts, w, h,
            StubCodec.decodeImage(framePayload, w, h, 3))
        }
      }
  }

  /** One image patch reference (geometry only — the pointer a patch
    * loader dereferences; no pixels move until then).
    */
  case class PatchRef(
      mediaId: Long,
      patchId: Int,
      x0: Int,
      y0: Int,
      width: Int,
      height: Int)

  /** Tile each image into a `patch`×`patch` grid — the ViT patchify
    * shape: ⌈w/p⌉×⌈h/p⌉ patches in row-major order, edge patches
    * clamped to the image bounds. Pure metadata arithmetic (narrow, no
    * decode, no shuffle): the manifest is what a 100 TB vision pipeline
    * materializes and joins against embeddings; pixel extraction stays
    * deferred behind the patch references.
    */
  def tilePatches(media: Dataset[MediaRow], patch: Int = 16): Dataset[PatchRef] = {
    import media.sparkSession.implicits._
    require(patch >= 1, s"patch size must be >= 1, got $patch")
    media
      .filter(col("kind") === "image")
      .flatMap { m =>
        val (w, h) = (m.meta.width, m.meta.height)
        val nx = (w + patch - 1) / patch
        val ny = (h + patch - 1) / patch
        (0 until nx * ny).iterator.map { pid =>
          val (i, j) = (pid % nx, pid / nx)
          PatchRef(m.mediaId, pid, i * patch, j * patch,
            math.min(patch, w - i * patch), math.min(patch, h - j * patch))
        }
      }
  }

  /** One strided audio analysis window (geometry only — the reference a
    * feature extractor dereferences; no samples move until then).
    */
  case class AudioWindow(
      mediaId: Long,
      windowIndex: Long,
      startSample: Long,
      nSamples: Int,
      startMs: Long)

  /** Frame audio into strided analysis windows — the STFT/mel framing
    * shape: windows of `windowSamples` every `hopSamples`, full windows
    * only. Pure metadata arithmetic over (sampleRate, durationMs) —
    * narrow, no decode, no shuffle — so at 100 TB the manifest
    * materializes and joins against features while PCM extraction stays
    * deferred behind the window references, exactly like
    * [[tilePatches]] for images.
    */
  def windowAudio(media: Dataset[MediaRow], windowSamples: Int = 400,
      hopSamples: Int = 160): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    require(windowSamples >= 1 && hopSamples >= 1,
      s"window/hop must be >= 1, got $windowSamples/$hopSamples")
    media
      .filter(col("kind") === "audio")
      .flatMap { m =>
        val nTotal = m.meta.sampleRate.toLong * m.meta.durationMs / 1000L
        val nWin =
          if (nTotal < windowSamples) 0L
          else (nTotal - windowSamples) / hopSamples + 1
        (0L until nWin).iterator.map { i =>
          val start = i * hopSamples
          AudioWindow(m.mediaId, i, start, windowSamples,
            start * 1000L / m.meta.sampleRate)
        }
      }
  }

  /** Feature extraction: 64-bin normalized byte histogram over decoded
    * content — a deterministic stand-in with the exact shape of a real
    * embedding stage (fixed-dim float vector per media object, computed
    * per partition with no shuffle). Output feeds
    * [[graft.similarity.Similarity]] unchanged.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val decoded: Array[Byte] = m.kind match {
            // image: real decode when a JDK reader accepts the bytes,
            // stub otherwise; audio/video remain STUB call sites
            case "image" =>
              ImageIoCodec.decodeImage(m.content) match {
                case Some((_, _, px)) => px
                case None =>
                  val w = math.max(m.meta.width, 1)
                  val h = math.max(m.meta.height, 1)
                  StubCodec.decodeImage(m.content, w, h, 3)
              }
            case "audio" =>
              // audio: real decode when a JDK reader accepts the bytes
              // (WAV/AIFF/AU), stub otherwise
              val samples = AudioSystemCodec.decodeAudio(m.content) match {
                case Some((_, pcm)) => pcm
                case None =>
                  val n = math.max(1, (m.meta.sampleRate * m.meta.durationMs / 1000L).toInt)
                  StubCodec.decodeAudio(m.content, math.min(n, 1 << 20))
              }
              samples.flatMap { s =>
                Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
              }
            case _ =>
              StubCodec.decodeImage(m.content, math.max(m.meta.width, 1),
                math.max(m.meta.height, 1), 3)
          }
          val hist = new Array[Float](dim)
          var i = 0
          while (i < decoded.length) {
            hist((decoded(i) & 0xff) * dim / 256) += 1f
            i += 1
          }
          val total = math.max(decoded.length, 1).toFloat
          MediaFeatures(m.mediaId, m.kind, hist.map(_ / total))
        }
      }
    }
  }

  /** Deterministic synthetic media fixture (no real codecs in this
    * environment): `n` rows cycling image/audio/video with md5-seeded
    * payloads. Partitioned by media id so decode parallelism is even.
    */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).repartition(partitions).map { r =>
      val id = r
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val payload = java.security.MessageDigest.getInstance("MD5")
        .digest(s"media-$id".getBytes("UTF-8"))
      val meta = kind match {
        case "image" => MediaMeta("png", 32 + (id % 64).toInt, 24 + (id % 48).toInt, 0, 0L)
        case "audio" => MediaMeta("wav", 0, 0, 16000, 500L + (id % 2000))
        case _       => MediaMeta("mp4", 16 + (id % 16).toInt, 16 + (id % 16).toInt, 0, 2000L + (id % 5000))
      }
      MediaRow(id, kind, payload, meta)
    }
  }

  /** End-to-end demo frame: synthetic media → features → per-kind stats
    * (count, mean feature-norm). Registered as a rows-only query.
    */
  def featureStats(spark: SparkSession, n: Int = 300): DataFrame = {
    val feats = extractFeatures(syntheticMedia(spark, n))
    feats.toDF()
      .select(col("kind"),
        sqrt(aggregate(transform(col("features"),
          x => x.cast("double") * x.cast("double")),
          lit(0.0), (s, x) => s + x)).as("norm"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        avg(col("norm")).as("mean_feature_norm"))
  }
}
