package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing: image payloads ride as opaque `binary`
  * columns; decode / resize / frame-sample run batched per partition with
  * REAL codecs (`javax.imageio` — PNG/BMP/GIF/JPEG readers ship with the
  * JDK, zero dependencies).
  *
  * [[decode]] parses the actual container (real width/height/format from the
  * byte stream, real pixel reads from the raster); [[resize]] decodes,
  * resamples through `Graphics2D`, re-encodes in the same format and
  * re-decodes — a genuine transcode round trip. Payloads that are not a
  * decodable image degrade to an observable `format="undecodable"` row
  * (width/height 0) instead of being dropped or faked.
  *
  * The driver oracle works because test payloads are synthesized by
  * [[encodeImage]] under a deterministic generation rule (dims and pixel
  * channels are closed-form in the image id), so DuckDB recomputes the
  * expected decode output from the rule while Spark recovers it from the
  * actual bytes — if the decode were fake, the corner-pixel checks would
  * mismatch immediately.
  */
object Media {

  // ImageIO defaults to FILE-backed stream caches (a temp file per
  // encode/decode call — serial disk I/O that dwarfs the codec work on
  // small images); in-memory caching makes the per-image cost pure CPU.
  ImageIO.setUseCache(false)

  // javax.sound.AudioSystem resolves its SPI providers through a
  // SYNCHRONIZED global cache on EVERY call — with 32 concurrent decode
  // tasks the lock convoy made the parallel audio stage ~3.4× slower than a
  // single thread (probe-measured: 0.72 s single-thread vs 2.47 s on 32
  // threads for the same 5000 encode+decodes). Resolve the providers ONCE
  // per JVM through the public ServiceLoader mechanism and dispatch
  // directly: same JDK provider classes, byte-identical containers and
  // decodes, no global lock on the hot path.
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala.toSeq
  }
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toSeq
  }

  private def writeAudio(
      ais: javax.sound.sampled.AudioInputStream,
      typ: javax.sound.sampled.AudioFileFormat.Type,
      out: java.io.OutputStream): Int = {
    audioWriters.find(_.isFileTypeSupported(typ, ais)) match {
      case Some(w) => w.write(ais, typ, out)
      case None => throw new IllegalArgumentException(s"no $typ writer")
    }
  }

  /** First-provider-wins parse, the AudioSystem contract without its lock;
    * a fresh stream per attempt (ByteArrayInputStream — no shared state).
    */
  private def readAudioFormat(payload: Array[Byte]): javax.sound.sampled.AudioFileFormat = {
    audioReaders.foreach { r =>
      try return r.getAudioFileFormat(new ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  private def readAudioStream(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    audioReaders.foreach { r =>
      try return r.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  final case class MediaRow(id: Long, payload: Array[Byte], kind: String)

  /** Decoded image metadata + two raster probes: `px00`/`px_last` are the
    * 24-bit RGB of the top-left and bottom-right pixels — header-only
    * parsing cannot produce them.
    */
  final case class MediaMeta(
      id: Long, kind: String, n_bytes: Long, width: Int, height: Int,
      format: String, px00: Int, px_last: Int)

  // --------------------------------------------------------------------------
  // Deterministic image synthesis (fixture generation rule, mirrored in SQL)
  // --------------------------------------------------------------------------

  /** Generation rule: dims and per-pixel channels are linear in (id, x, y)
    * so an oracle can recompute any probe in closed form.
    */
  def genWidth(id: Long): Int = (8 + id % 57).toInt
  def genHeight(id: Long): Int = (8 + (id * 3) % 41).toInt
  def genFormat(id: Long): String = if (id % 2 == 0) "png" else "bmp"
  def genRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((id + x + 2L * y) % 256).toInt
    val g = ((id * 3 + 5L * x + y) % 256).toInt
    val b = ((id * 7 + x + 3L * y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Encode a real image for `id` under the generation rule (PNG for even
    * ids, BMP for odd — both lossless, so raster probes are exact).
    */
  def encodeImage(id: Long): Array[Byte] = {
    val w = genWidth(id)
    val h = genHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, genRgb(id, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, genFormat(id), out), s"no ${genFormat(id)} writer")
    out.toByteArray
  }

  // --------------------------------------------------------------------------
  // Real decode / resize
  // --------------------------------------------------------------------------

  /** Decode the payload with the real codec: container format from the
    * registered reader, dims and corner pixels from the decoded raster.
    * Returns None when no reader recognizes the bytes.
    */
  def tryDecode(payload: Array[Byte]): Option[(String, BufferedImage)] = {
    if (payload == null || payload.isEmpty) return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some((reader.getFormatName.toLowerCase, reader.read(0)))
        } finally reader.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  def decode(id: Long, kind: String, payload: Array[Byte]): MediaMeta =
    tryDecode(payload) match {
      case Some((fmt, img)) =>
        val w = img.getWidth
        val h = img.getHeight
        MediaMeta(id, kind, payload.length.toLong, w, h, fmt,
          img.getRGB(0, 0) & 0xffffff, img.getRGB(w - 1, h - 1) & 0xffffff)
      case None =>
        MediaMeta(id, kind, if (payload == null) 0L else payload.length.toLong,
          0, 0, "undecodable", 0, 0)
    }

  /** Batched decode over partitions (per-partition iterator — the
    * mapInPandas-equivalent shape in Scala; codec setup is JVM-static here,
    * but per-batch native-codec init would amortize the same way).
    */
  def extractMeta(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions(_.map(r => decode(r.id, r.kind, r.payload)))
  }

  /** Aspect-preserving box-fit target dims (integer math, no upscale). */
  def fitBox(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val den = math.max(w, h)
    if (den <= maxDim) (w, h)
    else (math.max(1, w * maxDim / den), math.max(1, h * maxDim / den))
  }

  /** Real resample: decode, `Graphics2D.drawImage` into the box-fit target,
    * re-encode in the source format. Undecodable payloads pass through
    * unchanged (the gate is [[extractMeta]]'s observable marker).
    */
  def resizePayload(payload: Array[Byte], maxDim: Int): Array[Byte] =
    tryDecode(payload) match {
      case Some((fmt, img)) =>
        val (tw, th) = fitBox(img.getWidth, img.getHeight, maxDim)
        if (tw == img.getWidth && th == img.getHeight) payload
        else {
          val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try g.drawImage(img, 0, 0, tw, th, null)
          finally g.dispose()
          val out = new ByteArrayOutputStream()
          require(ImageIO.write(dst, fmt, out), s"no $fmt writer")
          out.toByteArray
        }
      case None => payload
    }

  /** Distributed transcode: resample every payload, then RE-DECODE the
    * result — the emitted metadata comes from the transcoded bytes, proving
    * the round trip (encode → resample → encode → decode) end to end.
    */
  def resize(rows: Dataset[MediaRow], maxDim: Int): Dataset[MediaMeta] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions(_.map { r =>
      decode(r.id, r.kind, resizePayload(r.payload, maxDim))
    })
  }

  // --------------------------------------------------------------------------
  // Frame sampling — REAL multi-frame decode (animated GIF: the one
  // multi-frame container the JDK can both write and read; palette images
  // with ≤256 distinct colors round-trip pixel-exact, verified per frame)
  // --------------------------------------------------------------------------

  /** Fixed 8-color palette for synthesized animations: few enough distinct
    * colors that the GIF encoder preserves them exactly.
    */
  val FramePalette: Array[Int] = Array(
    0x112233, 0x445566, 0x778899, 0xaabbcc, 0xddeeff, 0x102030, 0x405060, 0x708090)

  def genFrames(id: Long): Int = (1 + id % 8).toInt
  def genAnimWidth(id: Long): Int = (8 + id % 24).toInt
  def genAnimHeight(id: Long): Int = (8 + (id * 3) % 16).toInt
  def genFrameRgb(id: Long, f: Int, x: Int, y: Int): Int =
    FramePalette(((id + f + x + y) % 8).toInt)

  /** Encode a real animated GIF for `id` under the generation rule. */
  def encodeAnimation(id: Long): Array[Byte] = {
    val w = genAnimWidth(id)
    val h = genAnimHeight(id)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until genFrames(id)).foreach { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, genFrameRgb(id, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** One REAL decoded frame: dims and corner pixels come from the decoded
    * raster of that frame, not from metadata.
    */
  final case class Frame(
      id: Long, frame_idx: Int, width: Int, height: Int, px00: Int, px_last: Int)

  /** Frame sampling with a real container decode: every `stride`-th frame of
    * each payload is decoded (`ImageReader.read(i)` — GIF/TIFF readers
    * support random frame access) and emitted with raster probes. Payloads
    * no reader recognizes emit nothing (the [[extractMeta]] path carries the
    * observable `undecodable` marker for auditing).
    *
    * Scale shape: embarrassingly parallel mapPartitions explode — one
    * reader per payload, frames stream out without materializing the whole
    * animation.
    */
  def sampleFrames(rows: Dataset[MediaRow], stride: Int = 1): Dataset[Frame] = {
    val spark = rows.sparkSession
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    rows.flatMap { r =>
      if (r.payload == null || r.payload.isEmpty) Nil
      else {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Nil
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0 until n by stride).map { f =>
                val img = reader.read(f)
                val w = img.getWidth
                val h = img.getHeight
                Frame(r.id, f, w, h,
                  img.getRGB(0, 0) & 0xffffff, img.getRGB(w - 1, h - 1) & 0xffffff)
              }
            } finally reader.dispose()
          }
        } catch { case _: Exception => Nil }
        finally iis.close()
      }
    }
  }

  // --------------------------------------------------------------------------
  // Audio — REAL decode via `javax.sound.sampled` (WAV/AIFF/AU readers ship
  // with the JDK — the same zero-dependency argument as imageio above).
  // Payloads are genuine RIFF/AIFF containers synthesized under a
  // deterministic rule (rate/channels/frame-count and every 16-bit PCM
  // sample value are closed-form in the id), decoded back with the real
  // parser: container type from `AudioSystem.getAudioFileFormat`, stream
  // parameters from the decoded `AudioFormat`, and three amplitude probes
  // read out of the decoded PCM frames at fixed offsets — header parsing
  // alone cannot produce the probes.
  // --------------------------------------------------------------------------

  def genRate(id: Long): Int = 8000 + (id % 3).toInt * 4000
  def genChannels(id: Long): Int = 1 + (id % 2).toInt
  def genAudioFrames(id: Long): Int = 256 + ((id * 7) % 512).toInt
  def genAudioType(id: Long): String = if (id % 2 == 0) "WAVE" else "AIFF"

  /** 16-bit signed sample for (frame, channel) — integer-exact, so an SQL
    * oracle recomputes any probe without floating point.
    */
  def genSample(id: Long, f: Int, c: Int): Int =
    (((id * 31 + f * 17L + c * 7919L) % 65536L) - 32768L).toInt

  /** Encode a real audio file for `id` under the generation rule: 16-bit
    * PCM, WAV (little-endian) for even ids, AIFF (big-endian) for odd —
    * both lossless containers, so amplitude probes are exact.
    */
  def encodeAudio(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rate = genRate(id)
    val ch = genChannels(id)
    val nf = genAudioFrames(id)
    val big = id % 2 != 0 // AIFF carries big-endian PCM, WAV little-endian
    val pcm = new Array[Byte](nf * ch * 2)
    var i = 0
    var f = 0
    while (f < nf) {
      var c = 0
      while (c < ch) {
        val s = genSample(id, f, c)
        if (big) { pcm(i) = (s >> 8).toByte; pcm(i + 1) = s.toByte }
        else { pcm(i) = s.toByte; pcm(i + 1) = (s >> 8).toByte }
        i += 2
        c += 1
      }
      f += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat,
      16, ch, ch * 2, rate.toFloat, big)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nf.toLong)
    val out = new ByteArrayOutputStream()
    val typ = if (big) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE
    require(writeAudio(ais, typ, out) > 0, s"no $typ writer")
    out.toByteArray
  }

  /** Decoded audio metadata + three PCM probes: `s0`/`s_mid`/`s_last` are
    * the signed 16-bit samples at (frame 0, ch 0), (frame n/2, ch 0) and
    * (last frame, last channel), read from the DECODED stream in its own
    * byte order.
    */
  final case class AudioMeta(
      id: Long, kind: String, n_bytes: Long, format: String, sample_rate: Int,
      channels: Int, n_frames: Long, s0: Int, s_mid: Int, s_last: Int)

  def decodeAudio(id: Long, kind: String, payload: Array[Byte]): AudioMeta = {
    if (payload == null || payload.isEmpty)
      return AudioMeta(id, kind, 0L, "undecodable", 0, 0, 0L, 0, 0, 0)
    try {
      val typ = readAudioFormat(payload).getType.toString
      val ais = readAudioStream(payload)
      try {
        val fmt = ais.getFormat
        val ch = fmt.getChannels
        val nf = ais.getFrameLength
        val data = ais.readAllBytes()
        def sample(f: Long, c: Int): Int = {
          val off = ((f * ch + c) * 2).toInt
          if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
          else (data(off + 1) << 8) | (data(off) & 0xff)
        }
        AudioMeta(id, kind, payload.length.toLong, typ, fmt.getSampleRate.toInt,
          ch, nf, sample(0L, 0), sample(nf / 2, 0), sample(nf - 1, ch - 1))
      } finally ais.close()
    } catch {
      case _: Exception =>
        AudioMeta(id, kind, payload.length.toLong, "undecodable", 0, 0, 0L, 0, 0, 0)
    }
  }

  /** Batched audio decode over partitions — same embarrassingly-parallel
    * mapPartitions shape as [[extractMeta]].
    */
  def extractAudioMeta(rows: Dataset[MediaRow]): Dataset[AudioMeta] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions(_.map(r => decodeAudio(r.id, r.kind, r.payload)))
  }

  /** Windowed PCM features over the DECODED channel-0 sample stream: the
    * frame range splits into `nWin` equal windows (`win = f * nWin / nf`,
    * integer division — window `nWin-1` absorbs the remainder frames), and
    * each window reports frame count, summed absolute amplitude, peak
    * absolute amplitude, and sign-change count. A sign change between the
    * last frame of window w-1 and the first frame of w is attributed to w.
    * All values are exact integers read from the real decoded stream in its
    * own byte order, so the SQL oracle recomputes them from the generation
    * rule without floating point — a fake decode fails on every column.
    */
  final case class AudioWin(
      id: Long, win: Int, n: Long, abs_energy: Long, peak: Int, zero_cross: Long)

  def audioWindowFeatures(rows: Dataset[MediaRow], nWin: Int = 4): Dataset[AudioWin] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions(_.flatMap { r =>
      try {
        val ais = readAudioStream(r.payload)
        try {
          val fmt = ais.getFormat
          val ch = fmt.getChannels
          val nf = ais.getFrameLength.toInt
          val data = ais.readAllBytes()
          def sample(f: Int): Int = {
            val off = f * ch * 2
            if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
            else (data(off + 1) << 8) | (data(off) & 0xff)
          }
          val n = new Array[Long](nWin)
          val energy = new Array[Long](nWin)
          val peak = new Array[Int](nWin)
          val cross = new Array[Long](nWin)
          var prev = 0
          var f = 0
          while (f < nf) {
            val v = sample(f)
            val w = (f.toLong * nWin / nf).toInt
            n(w) += 1
            energy(w) += math.abs(v)
            if (math.abs(v) > peak(w)) peak(w) = math.abs(v)
            if (f > 0 && ((v < 0) != (prev < 0))) cross(w) += 1
            prev = v
            f += 1
          }
          (0 until nWin).iterator.filter(n(_) > 0)
            .map(w => AudioWin(r.id, w, n(w), energy(w), peak(w), cross(w)))
        } finally ais.close()
      } catch { case _: Exception => Iterator.empty }
    })
  }

  /** Byte-offset frame sampling over OPAQUE payloads (true video codecs do
    * not ship with the JDK): `1 + n_bytes % 8` sample points, checksum =
    * the actual byte at each offset — the explode shape of a container-level
    * sampler, kept for payload kinds with no JDK reader.
    */
  final case class ByteFrame(id: Long, frame_idx: Int, offset: Long, checksum: Long)

  def sampleByteFrames(rows: Dataset[MediaRow]): Dataset[ByteFrame] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.flatMap { r =>
      val n = r.payload.length.toLong
      val frames = (1 + n % 8).toInt
      (0 until frames).map { i =>
        val off = if (frames == 0) 0L else i * (n / math.max(frames, 1))
        val cs = if (n == 0) 0L else r.payload(math.min(off, n - 1).toInt).toLong & 0xffL
        ByteFrame(r.id, i, off, cs)
      }
    }
  }
}
