package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, decoded per-partition on the executors.
  *
  * The codecs are REAL, pure-JVM (no native libraries):
  *  - image: 8-bit grayscale PNG via `javax.imageio` (lossless, so the
  *    decoded raster equals the generation formula exactly);
  *  - audio: 8-bit unsigned PCM WAV via `javax.sound.sampled`;
  *  - video: a minimal framed container (`GFV1` magic, frame count,
  *    then length-prefixed PNG frames) — an honest toy mux whose frame
  *    DECODE is the real PNG path.
  *
  * The correctness contract: payloads are generated from closed-form
  * pixel/sample formulas of the media id, a SIDECAR table records the
  * expected dimensions/sums computed from the same formulas WITHOUT
  * decoding, and the queries decode the actual bytes — equality proves
  * the full encode→decode roundtrip on every row.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed cache file per ImageInputStream —
  // a temp-file create/delete around every decode/encode. Payloads here
  // are in-memory byte arrays; cache in memory. (Executor-side: this
  // object initializes once per JVM before first use.)
  ImageIO.setUseCache(false)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Real decode result: dimensions plus one value-sum per frame
    * (image: 1 frame of pixel sum; audio: 1 frame of sample sum,
    * width = sample count, height = 1; video: per-frame pixel sums). */
  case class Decoded(width: Int, height: Int, frameSums: Seq[Long])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      fingerprint: String,
      width: Int,
      height: Int,
      n_frames: Int,
      value_sum: Long)

  // ---- deterministic generation formulas (the sidecar's source of
  // truth; all arithmetic in Long, bounded small) ----------------------

  def imageWidth(id: Long): Int = (4 + math.floorMod(id, 13L)).toInt
  def imageHeight(id: Long): Int = (4 + math.floorMod(id, 11L)).toInt
  def pixel(id: Long, frame: Int, x: Int, y: Int): Int =
    math.floorMod(id * 31 + frame * 101L + x * 7L + y * 13L, 251L).toInt
  def audioSampleCount(id: Long): Int = (16 + math.floorMod(id, 33L)).toInt
  def audioSample(id: Long, i: Int): Int =
    math.floorMod(id * 17 + i * 5L, 256L).toInt
  def videoFrameCount(id: Long): Int = (2 + math.floorMod(id, 4L)).toInt

  def kindOf(id: Long): String = math.floorMod(id, 3L) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }

  /** Closed-form expected decode result — NO codec involved. */
  def expected(id: Long): Decoded = kindOf(id) match {
    case "image" =>
      val (w, h) = (imageWidth(id), imageHeight(id))
      val s = (for (y <- 0 until h; x <- 0 until w)
        yield pixel(id, 0, x, y).toLong).sum
      Decoded(w, h, Seq(s))
    case "audio" =>
      val n = audioSampleCount(id)
      Decoded(n, 1, Seq((0 until n).map(audioSample(id, _).toLong).sum))
    case _ =>
      val (w, h) = (imageWidth(id), imageHeight(id))
      val sums = (0 until videoFrameCount(id)).map(f =>
        (for (y <- 0 until h; x <- 0 until w)
          yield pixel(id, f, x, y).toLong).sum)
      Decoded(w, h, sums)
  }

  // ---- real encoders --------------------------------------------------

  private def encodeFramePng(id: Long, frame: Int): Array[Byte] = {
    val (w, h) = (imageWidth(id), imageHeight(id))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, pixel(id, frame, x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** One WAV format for BOTH the encoder and the resize re-encoder —
    * a drifted duplicate would make resized payloads round-trip
    * through a different format than fresh ones. */
  private val WavFormat = new AudioFormat(
    AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)

  private def encodeWav(id: Long): Array[Byte] = {
    val n = audioSampleCount(id)
    val data = Array.tabulate[Byte](n)(i => audioSample(id, i).toByte)
    val ais = new AudioInputStream(new ByteArrayInputStream(data),
      WavFormat, n)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private val VideoMagic = "GFV1".getBytes("US-ASCII")

  private def encodeVideo(id: Long): Array[Byte] = {
    val frames = (0 until videoFrameCount(id)).map(encodeFramePng(id, _))
    val out = new ByteArrayOutputStream()
    out.write(VideoMagic)
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(frames.length)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush()
    out.toByteArray
  }

  def encode(id: Long): MediaRow = kindOf(id) match {
    case "image" => MediaRow(id, "image", encodeFramePng(id, 0))
    case "audio" => MediaRow(id, "audio", encodeWav(id))
    case k => MediaRow(id, k, encodeVideo(id))
  }

  // ---- real decoders --------------------------------------------------

  // ImageIO.read scans the reader registry and allocates a fresh
  // reader per call — measurable at millions of rows. One PNG reader
  // per thread (readers are stateful, not thread-safe) is the standard
  // hot-loop form; setInput resets it per payload.
  private val pngReader =
    new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader =
        ImageIO.getImageReadersByFormatName("png").next()
    }

  private def readPng(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val reader = pngReader.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } catch {
      case e: Exception => throw new IllegalArgumentException(
        "not a decodable image payload", e)
    } finally iis.close()
  }

  private def decodePng(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = readPng(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, sum)
  }

  private def decodeWav(bytes: Array[Byte]): Decoded = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val data = ais.readAllBytes()
      Decoded(data.length, 1, Seq(data.foldLeft(0L)((s, b) => s + (b & 0xFF))))
    } finally ais.close()
  }

  private def decodeVideo(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 8 &&
      java.util.Arrays.equals(bytes.slice(0, 4), VideoMagic),
      "not a GFV1 video payload")
    val dis = new java.io.DataInputStream(
      new ByteArrayInputStream(bytes, 4, bytes.length - 4))
    val n = dis.readInt()
    var w = 0; var h = 0
    val sums = (0 until n).map { _ =>
      val len = dis.readInt()
      val frame = new Array[Byte](len)
      dis.readFully(frame)
      val (fw, fh, s) = decodePng(frame)
      if (w == 0) { w = fw; h = fh }
      s
    }
    Decoded(w, h, sums)
  }

  /** REAL decode of an opaque payload — the task-path entry point. */
  def decode(kind: String, payload: Array[Byte]): Decoded = kind match {
    case "image" =>
      val (w, h, s) = decodePng(payload); Decoded(w, h, Seq(s))
    case "audio" => decodeWav(payload)
    case "video" => decodeVideo(payload)
    case other => throw new IllegalArgumentException(s"unknown kind $other")
  }

  // ---- resize (decode → transform → re-encode, the preprocessing
  // stage of an image/audio training pipeline) --------------------------

  /** Output edge for an integer-factor nearest-neighbor downsample:
    * every factor-th source index, so ceil(dim / factor). */
  def resizedDim(dim: Int, factor: Int): Int = (dim + factor - 1) / factor

  private def resizeFramePng(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val img = readPng(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val (rw, rh) = (resizedDim(w, factor), resizedDim(h, factor))
    val out = new java.awt.image.BufferedImage(rw, rh,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val src = img.getRaster
    val dst = out.getRaster
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        // nearest-neighbor on the exact grid (x*factor, y*factor):
        // integer sampling, no interpolation — deterministic across
        // JVMs where Graphics2D filtering would not be
        dst.setSample(x, y, 0, src.getSample(x * factor, y * factor, 0))
        x += 1
      }
      y += 1
    }
    val buf = new ByteArrayOutputStream()
    ImageIO.write(out, "png", buf)
    buf.toByteArray
  }

  private def resizeWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val srcRate = ais.getFormat.getSampleRate
    val data = try ais.readAllBytes() finally ais.close()
    // decimation: every factor-th sample (the audio "resize")
    val dec = Array.tabulate[Byte](resizedDim(data.length, factor))(i =>
      data(i * factor))
    // the header rate must drop with the decimation (src/factor): the
    // clip then keeps its DURATION — decimation IS the downsample. Kept
    // at the source rate, an external player would render a
    // time-compressed, pitch-shifted clip (the in-framework decode
    // ignores the header rate, which is how the defect stayed
    // oracle-invisible). Floored to an integer Hz: the RIFF header
    // stores the rate as a 4-byte int anyway, so a fractional rate
    // would silently truncate on write. Clamped to >= 1 Hz — a factor
    // above the source rate would otherwise write an invalid 0-Hz
    // header while resizedDim still leaves a sample to carry.
    val rate = math.max(1, (srcRate / factor).toInt).toFloat
    val fmt = new AudioFormat(WavFormat.getEncoding, rate,
      WavFormat.getSampleSizeInBits, WavFormat.getChannels,
      WavFormat.getFrameSize, rate, WavFormat.isBigEndian)
    val out = new ByteArrayOutputStream()
    val res = new AudioInputStream(
      new ByteArrayInputStream(dec), fmt, dec.length)
    AudioSystem.write(res, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def resizeVideo(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(bytes.length >= 8 &&
      java.util.Arrays.equals(bytes.slice(0, 4), VideoMagic),
      "not a GFV1 video payload")
    val dis = new java.io.DataInputStream(
      new ByteArrayInputStream(bytes, 4, bytes.length - 4))
    val n = dis.readInt()
    val out = new ByteArrayOutputStream()
    out.write(VideoMagic)
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(n)
    (0 until n).foreach { _ =>
      val len = dis.readInt()
      val frame = new Array[Byte](len)
      dis.readFully(frame)
      val resized = resizeFramePng(frame, factor)
      dos.writeInt(resized.length)
      dos.write(resized)
    }
    dos.flush()
    out.toByteArray
  }

  /** REAL resize: decode the payload, nearest-neighbor downsample by
    * `factor` (audio: sample decimation), re-encode with the same
    * codec — returns a payload of the SAME kind/container. */
  def resize(kind: String, payload: Array[Byte], factor: Int): Array[Byte] =
    kind match {
      case "image" => resizeFramePng(payload, factor)
      case "audio" => resizeWav(payload, factor)
      case "video" => resizeVideo(payload, factor)
      case other => throw new IllegalArgumentException(s"unknown kind $other")
    }

  /** Closed-form expected decode of the RESIZED payload — no codec:
    * the nearest-neighbor grid lands on source indices i*factor, so
    * the resized sums restate the generation formulas at that stride. */
  def expectedResized(id: Long, factor: Int): Decoded = kindOf(id) match {
    case "image" =>
      val (rw, rh) = (resizedDim(imageWidth(id), factor),
        resizedDim(imageHeight(id), factor))
      val s = (for (y <- 0 until rh; x <- 0 until rw)
        yield pixel(id, 0, x * factor, y * factor).toLong).sum
      Decoded(rw, rh, Seq(s))
    case "audio" =>
      val n = resizedDim(audioSampleCount(id), factor)
      Decoded(n, 1,
        Seq((0 until n).map(i => audioSample(id, i * factor).toLong).sum))
    case _ =>
      val (rw, rh) = (resizedDim(imageWidth(id), factor),
        resizedDim(imageHeight(id), factor))
      val sums = (0 until videoFrameCount(id)).map(f =>
        (for (y <- 0 until rh; x <- 0 until rw)
          yield pixel(id, f, x * factor, y * factor).toLong).sum)
      Decoded(rw, rh, sums)
  }

  /** Batch resize + feature extraction: decode → downsample →
    * re-encode → decode AGAIN on the executors (the second decode is
    * what the roundtrip oracle checks — the resized bytes are a real
    * payload, not a projection). */
  def resizeFeatures(ds: Dataset[MediaRow], factor: Int):
      Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val resized = resize(r.kind, r.payload, factor)
        val d = decode(r.kind, resized)
        MediaFeatures(r.media_id, r.kind, resized.length.toLong,
          md5Hex(resized), d.width, d.height, d.frameSums.length,
          d.frameSums.sum)
      }
    }
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Batch feature extraction: decode on the executors, streaming over
    * rows (codec state, were one needed, would init once per
    * partition — the real cost model for media decode). */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val d = decode(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          md5Hex(r.payload), d.width, d.height, d.frameSums.length,
          d.frameSums.sum)
      }
    }
  }

  /** Frame sampling: media row -> one row per decoded frame, carrying
    * that frame's value sum. */
  def sampleFrames(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      decode(r.kind, r.payload).frameSums.zipWithIndex.map {
        case (s, i) => (r.media_id, r.kind, i, s)
      }
    }.toDF("media_id", "kind", "frame_idx", "frame_sum")
  }
}
