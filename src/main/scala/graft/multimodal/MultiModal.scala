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
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — [[ImageIoCodec]]), audio
  * decode is REAL for WAV/AIFF/AU (via `javax.sound.sampled` —
  * [[AudioSystemCodec]], multi-channel downmix + 16-bit conversion
  * included), and video decode is REAL for MJPEG-in-AVI (RIFF chunk
  * walk + per-frame JPEG via [[AviMjpegCodec]]) — all with no external
  * dependency. Payloads no codec accepts (e.g. MP4/H.264, which has no
  * JDK path) fall back to [[StubCodec]], which derives deterministic
  * fake pixels/samples from the payload bytes so synthetic fixtures
  * stay testable end-to-end; every fallback call site is marked, and
  * the surrounding schema, partitioning, batching, and operator
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

  /** ================= VIDEO CODEC SEAM =================
    * The boundary between container formats and the operators: a codec
    * inspects raw payload bytes and returns Some((µs per frame, decoded
    * frames)) when it recognizes the container, None otherwise.
    * [[sampleFrames]] and [[extractFeatures]] take a codec LIST and try
    * each in order, falling back to [[StubCodec]] when none accepts —
    * so supporting a new container (e.g. MP4/H.264, which has no JDK
    * path and needs a third-party/JNI decoder) is a pure list addition:
    * no operator changes (spec-proven by a drop-in fake codec in
    * MultiModalSpec). The list is a PARAMETER captured in the task
    * closure, not driver-side mutable state — codecs serialize to
    * executors with the job, the only registration that is correct on a
    * real cluster.
    *
    * Supported containers: PNG/BMP/GIF/JPEG images ([[ImageIoCodec]]),
    * WAV/AIFF/AU audio ([[AudioSystemCodec]]), MJPEG-in-AVI video
    * ([[AviMjpegCodec]]); everything else → [[StubCodec]], the
    * permanent documented fallback.
    */
  trait VideoCodec extends Serializable {
    /** Some((µs per frame, frames as (w, h, interleaved RGB))) when the
      * bytes are a container this codec decodes; None otherwise. Must
      * return (never hang) on arbitrary bytes.
      */
    def decodeFrames(content: Array[Byte]): Option[(Long, Seq[(Int, Int, Array[Byte])])]
  }

  object VideoCodecs {
    /** The default chain: the JDK-native MJPEG-AVI decoder. */
    val default: Seq[VideoCodec] = Seq(AviMjpegCodec)

    /** First codec that accepts the payload wins; None → stub fallback. */
    def decode(codecs: Seq[VideoCodec], content: Array[Byte])
        : Option[(Long, Seq[(Int, Int, Array[Byte])])] =
      codecs.iterator.map(_.decodeFrames(content)).collectFirst {
        case Some(r) => r
      }
  }

  /** ================= JDK-NATIVE VIDEO CODEC =================
    * Real decode for MJPEG-in-AVI — the one video container a bare JDK
    * can take apart: AVI is a RIFF chunk tree (walked here directly),
    * and each MJPEG frame chunk is a standalone baseline JPEG that
    * [[ImageIoCodec]] decodes. No external dependency, same
    * Option-or-fallback contract as the image/audio codecs. Other
    * containers (MP4/H.264 etc.) have no JDK path and keep the
    * [[StubCodec]] fallback.
    */
  object AviMjpegCodec extends VideoCodec {
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Decode to (µs per frame, frames as (w, h, interleaved RGB)).
      * None when the bytes are not a RIFF/AVI with decodable MJPEG
      * frames — the caller's cue to fall back to [[StubCodec]].
      */
    override def decodeFrames(
        content: Array[Byte]): Option[(Long, Seq[(Int, Int, Array[Byte])])] =
      try {
        if (content.length < 12 || fourcc(content, 0) != "RIFF" ||
            fourcc(content, 8) != "AVI ") None
        else {
          val end = math.min(content.length.toLong, 8L + u32(content, 4)).toInt
          var usPerFrame = 0L
          val jpegs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          // walk the chunk tree: LIST children recurse, 'avih' carries
          // the frame clock, '00dc'/'00db' chunks are stream-0 frames
          def walk(from: Int, to: Int): Unit = {
            var off = from
            while (off + 8 <= to) {
              val fc = fourcc(content, off)
              val size = u32(content, off + 4).toInt
              // a size whose u32 truncates negative cannot be a valid
              // chunk (it would also leave `off` unchanged below, so the
              // walk would never advance): treat the rest of this range
              // as malformed and stop — forward progress is guaranteed
              if (size < 0) return
              val dataStart = off + 8
              val dataEnd = math.min(dataStart.toLong + size, to.toLong).toInt
              if (fc == "LIST" && size >= 4) {
                val lt = fourcc(content, dataStart)
                if (lt == "hdrl" || lt == "movi" || lt == "strl" || lt == "rec ")
                  walk(dataStart + 4, dataEnd)
              } else if (fc == "avih" && size >= 40) {
                usPerFrame = u32(content, dataStart)
              } else if (fc.startsWith("00") &&
                  (fc.endsWith("dc") || fc.endsWith("db")) && size > 0) {
                jpegs += java.util.Arrays.copyOfRange(content, dataStart, dataEnd)
              }
              off = dataStart + size + (size & 1)
            }
          }
          walk(12, end)
          val decoded = jpegs.toSeq.map(ImageIoCodec.decodeImage)
          if (jpegs.isEmpty || usPerFrame <= 0 || decoded.exists(_.isEmpty)) None
          else Some((usPerFrame, decoded.map(_.get)))
        }
      } catch { case _: Exception => None }

    private def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    private def le16x2(a: Int, b: Int): Array[Byte] = Array(
      (a & 0xff).toByte, ((a >> 8) & 0xff).toByte,
      (b & 0xff).toByte, ((b >> 8) & 0xff).toByte)

    private def chunk(fc: String, data: Array[Byte]): Array[Byte] =
      fc.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++
        (if ((data.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)

    private def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)

    /** Author a real MJPEG AVI from frames — the fixture-side inverse
      * of [[decodeFrames]] (the [[AudioSystemCodec.wavBytes]] move for
      * video), so specs and synthetic corpora exercise the REAL decode
      * path with no media files in the environment. Frames are encoded
      * as baseline JPEGs via `javax.imageio`.
      */
    def aviMjpegBytes(
        frames: Seq[java.awt.image.BufferedImage], fps: Int): Array[Byte] = {
      require(frames.nonEmpty && fps >= 1, "need >=1 frame and fps >= 1")
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val jpegs = frames.map { f =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(f, "jpg", bos)
        bos.toByteArray
      }
      val maxFrame = jpegs.map(_.length).max
      val avih = Array.concat( // MainAVIHeader, 14 × u32
        le32(1000000L / fps), le32(0), le32(0), le32(0),
        le32(jpegs.length.toLong), le32(0), le32(1), le32(maxFrame.toLong),
        le32(w.toLong), le32(h.toLong), le32(0), le32(0), le32(0), le32(0))
      val strh = Array.concat( // AVIStreamHeader for the video stream
        "vids".getBytes("US-ASCII"), "MJPG".getBytes("US-ASCII"),
        le32(0), le32(0), le32(0),
        le32(1), le32(fps.toLong), le32(0), le32(jpegs.length.toLong),
        le32(maxFrame.toLong), le32(0xffffffffL), le32(0),
        le16x2(0, 0), le16x2(w, h))
      val strf = Array.concat( // BITMAPINFOHEADER, biCompression = MJPG
        le32(40), le32(w.toLong), le32(h.toLong), le16x2(1, 24),
        "MJPG".getBytes("US-ASCII"), le32(w.toLong * h * 3),
        le32(0), le32(0), le32(0), le32(0))
      val hdrl = list("hdrl", Array.concat(
        chunk("avih", avih),
        list("strl", Array.concat(chunk("strh", strh), chunk("strf", strf)))))
      val movi = list("movi",
        Array.concat(jpegs.map(j => chunk("00dc", j)): _*))
      val body = Array.concat("AVI ".getBytes("US-ASCII"), hdrl, movi)
      Array.concat("RIFF".getBytes("US-ASCII"), le32(body.length.toLong), body)
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
    * MJPEG-AVI payloads decode for REAL ([[AviMjpegCodec]]): the frame
    * clock comes from the container and each sample timestamp maps to
    * its nearest-preceding decoded frame. Other containers fall back
    * to [[StubCodec]] at the metadata geometry.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L,
      codecs: Seq[VideoCodec] = VideoCodecs.default): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media
      .filter(col("kind") === "video")
      .flatMap { m =>
        VideoCodecs.decode(codecs, m.content) match {
          case Some((usPerFrame, frames)) =>
            // REAL decode: duration and frame geometry come from the
            // container; sample i reads the frame covering i·everyMs
            val durationMs = frames.length * usPerFrame / 1000L
            val n = math.max(1, (durationMs / everyMs).toInt)
            (0 until n).iterator.map { i =>
              val ts = i * everyMs
              val idx = math.min(frames.length - 1L, ts * 1000L / usPerFrame).toInt
              val (w, h, px) = frames(idx)
              SampledFrame(m.mediaId, i, ts, w, h, px)
            }
          case None =>
            val n = math.max(1, (m.meta.durationMs / everyMs).toInt)
            (0 until n).iterator.map { i =>
              val ts = i * everyMs
              val w = math.max(m.meta.width, 1)
              val h = math.max(m.meta.height, 1)
              // STUB fallback (no JDK path for this container)
              val framePayload = m.content ++ BigInt(ts).toByteArray
              SampledFrame(m.mediaId, i, ts, w, h,
                StubCodec.decodeImage(framePayload, w, h, 3))
            }
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
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64, batchSize: Int = 64,
      codecs: Seq[VideoCodec] = VideoCodecs.default): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          // histogram accumulates CHUNK BY CHUNK (one decoded buffer at
          // a time) — a multi-frame video contributes frames × w × h × 3
          // bytes to the counts without ever concatenating them into one
          // per-row array, so per-row memory is one frame, not the clip
          val hist = new Array[Float](dim)
          var total = 0L
          def bump(chunk: Array[Byte]): Unit = {
            var i = 0
            while (i < chunk.length) {
              hist((chunk(i) & 0xff) * dim / 256) += 1f
              i += 1
            }
            total += chunk.length
          }
          m.kind match {
            // image: real decode when a JDK reader accepts the bytes,
            // stub otherwise; non-JDK codecs remain STUB call sites
            case "image" =>
              bump(ImageIoCodec.decodeImage(m.content) match {
                case Some((_, _, px)) => px
                case None =>
                  val w = math.max(m.meta.width, 1)
                  val h = math.max(m.meta.height, 1)
                  StubCodec.decodeImage(m.content, w, h, 3)
              })
            case "audio" =>
              // audio: real decode when a JDK reader accepts the bytes
              // (WAV/AIFF/AU), stub otherwise
              val samples = AudioSystemCodec.decodeAudio(m.content) match {
                case Some((_, pcm)) => pcm
                case None =>
                  val n = math.max(1, (m.meta.sampleRate * m.meta.durationMs / 1000L).toInt)
                  StubCodec.decodeAudio(m.content, math.min(n, 1 << 20))
              }
              samples.foreach { s =>
                hist((s & 0xff) * dim / 256) += 1f
                hist(((s >> 8) & 0xff) * dim / 256) += 1f
                total += 2
              }
            case _ =>
              // video: real decode via the codec registry (MJPEG-AVI by
              // default) — each frame's pixels bump the counts in turn
              VideoCodecs.decode(codecs, m.content) match {
                case Some((_, frames)) => frames.foreach(f => bump(f._3))
                case None =>
                  bump(StubCodec.decodeImage(m.content, math.max(m.meta.width, 1),
                    math.max(m.meta.height, 1), 3))
              }
          }
          val denom = math.max(total, 1L).toFloat
          MediaFeatures(m.mediaId, m.kind, hist.map(_ / denom))
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

  /** Deterministic REAL-PNG image corpus with planted near-duplicate
    * groups — the fixture for perceptual-hash dedup (m07). Every 4
    * consecutive ids share a base pattern (an integer-math gradient
    * field keyed by `id / 4`); variants 1..3 perturb the brightness of
    * one small block, so same-pattern images land within a few dHash
    * bits of each other while different patterns are ~32 bits apart.
    * Encoded through `javax.imageio` PNG and decoded back through
    * [[ImageIoCodec]] — the hash runs on real codec output, not stub
    * bytes.
    */
  def imageCorpus(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).repartition(partitions).map { id =>
      val pattern = (id / 4).toInt
      val variant = (id % 4).toInt
      val w = 64; val h = 48
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // integer gradient field keyed by the pattern
          var g = (x * (3 + pattern % 7) + y * (5 + pattern % 11)
            + (x * y) / (1 + pattern % 5)) % 256
          // variant: one bright block (one dHash cell) shifts value
          if (variant > 0 && x / 8 == variant && y / 6 == variant)
            g = (g + 96) % 256
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(id, "image", bos.toByteArray, MediaMeta("png", w, h, 0, 0L))
    }
  }

  /** 64-bit difference hash (dHash) over an interleaved raster:
    * grayscale → nearest-neighbor 9×8 downsample → bit per
    * adjacent-column comparison. All-integer arithmetic, so the hash
    * is exactly reproducible anywhere; perceptual because the
    * downsample absorbs small pixel perturbations and re-encoding.
    */
  def dHash64(pixels: Array[Byte], w: Int, h: Int, channels: Int): Long = {
    def gray(px: Int, py: Int): Int = {
      val base = (py * w + px) * channels
      if (channels >= 3) {
        val c0 = pixels(base) & 0xff
        val c1 = pixels(base + 1) & 0xff
        val c2 = pixels(base + 2) & 0xff
        (c0 * 299 + c1 * 587 + c2 * 114) / 1000
      } else pixels(base) & 0xff
    }
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      val py = cy * h / 8
      var cx = 0
      while (cx < 8) {
        val pxA = cx * w / 9
        val pxB = (cx + 1) * w / 9
        if (gray(pxA, py) > gray(pxB, py)) hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** (media_id, dhash) per image — decode and hash in one typed pass
    * (the batched-decode stage, mapPartitions territory like
    * [[extractFeatures]]); falls back to [[StubCodec]] pixels when no
    * JDK reader accepts the bytes, so the frame is total.
    */
  def imageDHashes(media: Dataset[MediaRow], batchSize: Int = 32): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { m =>
        val (w, h, c, px) = ImageIoCodec.decodeImage(m.content) match {
          case Some((dw, dh, p)) => (dw, dh, 3, p)
          case None =>
            val w0 = math.max(m.meta.width, 1); val h0 = math.max(m.meta.height, 1)
            (w0, h0, 3, StubCodec.decodeImage(m.content, w0, h0, 3))
        }
        (m.mediaId, dHash64(px, w, h, c))
      })
    }.toDF("media_id", "dhash")
  }

  /** Deterministic REAL-WAV audio corpus with planted near-duplicate
    * groups — [[imageCorpus]]'s audio sibling for m08. Every 4
    * consecutive ids share a base waveform (square + saw components
    * with pattern-keyed integer periods); variants 1..3 add a short
    * click at a variant-dependent offset, perturbing one or two energy
    * windows of the fingerprint. Encoded through `javax.sound` WAV
    * (16-bit PCM, lossless round-trip) and decoded back through
    * [[AudioSystemCodec]].
    */
  def audioCorpus(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).repartition(partitions).map { id =>
      val pattern = (id / 4).toInt
      val variant = (id % 4).toInt
      val len = 4000
      val p1 = 50 + pattern % 37
      val p2 = 30 + pattern % 23
      val samples = Array.tabulate(len) { t =>
        var s = (t % p1) * 120 - 3000
        s += (if ((t / p2) % 2 == 0) 1500 else -1500)
        if (variant > 0 && t >= variant * 800 && t < variant * 800 + 80)
          s += 8000
        s.toShort
      }
      val bytes = AudioSystemCodec.wavBytes(samples, 8000)
      MediaRow(id, "audio", bytes, MediaMeta("wav", 0, 0, 8000, 500L))
    }
  }

  /** 64-bit audio fingerprint: 65 contiguous energy windows (sum of
    * |sample|, integer), bit i set when window i+1 is louder than
    * window i — the energy-delta-sign family (Haitsma–Kalker shape at
    * toy scale). All-integer, so exactly reproducible; local clicks
    * move only the windows they land in.
    */
  def audioFingerprint64(samples: Array[Short]): Long = {
    val nw = 65
    val n = samples.length
    if (n < nw) return 0L
    val energy = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      val lo = w * n / nw
      val hi = (w + 1) * n / nw
      var i = lo
      var e = 0L
      while (i < hi) { e += math.abs(samples(i).toInt); i += 1 }
      energy(w) = e
      w += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (energy(b + 1) > energy(b)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** (media_id, fp) per audio row — real WAV decode + fingerprint in
    * one typed pass, [[imageDHashes]]'s audio sibling; stub PCM when
    * no JDK reader accepts the bytes.
    */
  def audioFingerprints(media: Dataset[MediaRow], batchSize: Int = 32): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { m =>
        val samples = AudioSystemCodec.decodeAudio(m.content) match {
          case Some((_, pcm)) => pcm
          case None =>
            val n = math.max(1,
              (m.meta.sampleRate * m.meta.durationMs / 1000L).toInt)
            StubCodec.decodeAudio(m.content, math.min(n, 1 << 20))
        }
        (m.mediaId, audioFingerprint64(samples))
      })
    }.toDF("media_id", "fp")
  }

  /** Deterministic REAL-AVI video corpus with planted near-duplicate
    * groups — the video sibling of [[imageCorpus]]/[[audioCorpus]] for
    * m09. Every 4 consecutive ids share a 4-frame gradient clip
    * (frame index shifts the field); variants 1..3 perturb one
    * brightness block in ONE frame, so 3 of 4 frames stay
    * hash-identical. Encoded through [[AviMjpegCodec.aviMjpegBytes]]
    * (real baseline JPEGs in a real RIFF container) and decoded back
    * through the codec registry's MJPEG walk.
    */
  def videoCorpus(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).repartition(partitions).map { id =>
      val pattern = (id / 4).toInt
      val variant = (id % 4).toInt
      val w = 64; val h = 48
      val frames = (0 until 4).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var g = (x * (3 + pattern % 7) + y * (5 + pattern % 11)
              + (x * y) / (1 + pattern % 5) + f * 37) % 256
            if (variant > 0 && f == variant - 1 &&
                x / 8 == variant && y / 6 == variant)
              g = (g + 96) % 256
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        img
      }
      MediaRow(id, "video", AviMjpegCodec.aviMjpegBytes(frames, fps = 4),
        MediaMeta("avi", w, h, 0, 1000L))
    }
  }

  /** (media_id, frame_idx, dhash) per decoded video frame — real
    * MJPEG-AVI decode + per-frame [[dHash64]] in one typed pass;
    * stub pixels when no codec accepts the bytes.
    */
  def videoFrameDHashes(media: Dataset[MediaRow], batchSize: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { m =>
        VideoCodecs.decode(VideoCodecs.default, m.content) match {
          case Some((_, frames)) =>
            frames.zipWithIndex.map { case ((fw, fh, px), i) =>
              (m.mediaId, i, dHash64(px, fw, fh, 3))
            }
          case None =>
            val w0 = math.max(m.meta.width, 1); val h0 = math.max(m.meta.height, 1)
            Seq((m.mediaId, 0,
              dHash64(StubCodec.decodeImage(m.content, w0, h0, 3), w0, h0, 3)))
        }
      })
    }.toDF("media_id", "frame_idx", "dhash")
  }

  /** Banded Hamming self-join shared by the perceptual near-dup
    * family (m07/m08/m09, c04): split each 64-bit hash into
    * `64 / (maxDist + 1 rounded to a divisor)` — concretely 4×16-bit
    * bands for thresholds ≤ 3 and 8×8-bit bands for ≤ 7 — equi-join
    * per band, then verify with `bit_count(xor)`. Pigeonhole makes the
    * candidate set LOSSLESS at the threshold: `maxDist` differing bits
    * cannot touch every disjoint band. Candidates are Σ|bucket|²,
    * never n².
    */
  def bandedHammingPairs(
      hashes: org.apache.spark.sql.DataFrame, // (media_id, h)
      maxDist: Int): org.apache.spark.sql.DataFrame = {
    require(maxDist <= 7, "eight 8-bit bands cover at most 7 bits")
    val nb = if (maxDist <= 3) 4 else 8
    val width = 64 / nb
    val mask = (1L << width) - 1
    val banded = hashes.select(col("media_id"), col("h"),
      explode(array((0 until nb).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("h"), width * b).bitwiseAND(lit(mask)).as("k"))): _*))
        .as("band"))
      .select(col("media_id"), col("h"), col("band.b"), col("band.k"))
    banded.as("a").join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.h").as("__ha"), col("b.h").as("__hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(__ha ^ __hb)").cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** m09's pair rule over per-frame hashes: positions join on
    * (frame_idx, band), Hamming ≤ 6 per position, videos pair when
    * ≥ 3 aligned positions are close. The per-position candidates are
    * lossless (8-band pigeonhole), so the position-count filter sees
    * every qualifying combination.
    */
  def videoNearDupPairs(
      frameHashes: org.apache.spark.sql.DataFrame, // (media_id, frame_idx, dhash)
      maxDist: Int = 6,
      minCloseFrames: Int = 3): org.apache.spark.sql.DataFrame = {
    require(maxDist <= 7,
      "eight 8-bit bands are lossless only for <= 7 differing bits")
    val banded = frameHashes.select(col("media_id"), col("frame_idx"), col("dhash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("dhash"), 8 * b).bitwiseAND(lit(255L)).as("k"))): _*))
        .as("band"))
      .select(col("media_id"), col("frame_idx"), col("dhash"),
        col("band.b"), col("band.k"))
    banded.as("a").join(banded.as("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.frame_idx").as("__fi"),
        col("a.dhash").as("__ha"), col("b.dhash").as("__hb"))
      .distinct()
      .where(expr("bit_count(__ha ^ __hb)") <= maxDist)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_close_frames"))
      .where(col("n_close_frames") >= minCloseFrames)
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
