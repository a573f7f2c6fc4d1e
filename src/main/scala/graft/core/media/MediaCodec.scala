package graft.core.media

import java.nio.{ByteBuffer, ByteOrder}

/** From-scratch pure-JVM codecs for two public, trivially-specified media
  * containers — Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bpp
  * uncompressed, bottom-up rows padded to 4 bytes) and RIFF/WAVE (PCM,
  * 8-bit mono) — so the multimodal operators parse REAL formats instead of
  * a made-up header. Encoders exist so the synthetic corpus is genuine
  * BMP/WAV bytes (round-trip validated against `javax.imageio` /
  * `javax.sound.sampled` in MediaCodecSpec); decoders are hand-rolled and
  * defensive: any structural violation returns None rather than throwing.
  */
object MediaCodec {

  // ------------------------------------------------------------------ BMP

  /** Decoded BMP facts: header dims + pixel statistics (mean over the
    * `width*height*3` pixel bytes, padding excluded). */
  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
                           pixelOffset: Int, meanPixel: Double)

  private def rowSize(width: Int): Int = ((width * 3) + 3) / 4 * 4

  /** 24-bpp bottom-up BI_RGB BMP. `pixels` is row-major top-down BGR,
    * length `width*height*3`. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height * 3,
      s"bad BMP encode args: ${width}x$height with ${pixels.length} pixel bytes")
    val rs = rowSize(width)
    val dataSize = rs * height
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize) // file size
    bb.putShort(0).putShort(0)
    bb.putInt(54) // pixel data offset
    bb.putInt(40) // BITMAPINFOHEADER size
    bb.putInt(width).putInt(height) // positive height = bottom-up
    bb.putShort(1) // planes
    bb.putShort(24) // bpp
    bb.putInt(0) // BI_RGB
    bb.putInt(dataSize)
    bb.putInt(2835).putInt(2835) // 72 dpi in px/metre
    bb.putInt(0).putInt(0)
    // rows stored bottom-up: file row y holds image row (height-1-y)
    var y = height - 1
    while (y >= 0) {
      bb.put(pixels, y * width * 3, width * 3)
      var p = width * 3
      while (p < rs) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Header-only BMP parse: every structural check, no body scan
    * (`meanPixel` left 0). The cheap path for plumbing that needs offsets
    * and dims only. */
  def bmpHeaderInfo(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = bb.getInt(10)
    val hdrSize = bb.getInt(14)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28).toInt
    val compression = bb.getInt(30)
    // dimension caps also guard the int arithmetic below against overflow
    // (a flipped width bit could make width*3 wrap negative)
    if (hdrSize < 40 || width <= 0 || height <= 0 || bpp != 24 || compression != 0 ||
        width > (1 << 24) || height > (1 << 24))
      return None
    val rs = rowSize(width)
    if (pixelOffset < 54 || pixelOffset.toLong + rs.toLong * height > bytes.length)
      return None
    Some(BmpInfo(width, height, bpp, pixelOffset, 0.0))
  }

  /** Defensive BMP parse incl. pixel statistics; None on any violation. */
  def decodeBmp(bytes: Array[Byte]): Option[BmpInfo] =
    bmpHeaderInfo(bytes).map { info =>
      val rs = rowSize(info.width)
      var sum = 0L
      var y = 0
      while (y < info.height) {
        val rowStart = info.pixelOffset + y * rs
        var x = 0
        while (x < info.width * 3) { sum += bytes(rowStart + x) & 0xff; x += 1 }
        y += 1
      }
      info.copy(meanPixel = sum.toDouble / (info.width.toLong * info.height * 3))
    }

  /** Nearest-neighbor downsample by `factor` (pixel (x,y) ← source
    * (x*factor, y*factor)), re-encoded as BMP; returns (w2, h2, bytes) so
    * callers need no second decode. None if input isn't valid 24-bpp BMP. */
  def resizeBmp(bytes: Array[Byte], factor: Int): Option[(Int, Int, Array[Byte])] =
    bmpHeaderInfo(bytes).map { info =>
      val w2 = math.max(1, info.width / factor)
      val h2 = math.max(1, info.height / factor)
      val rs = rowSize(info.width)
      val out = new Array[Byte](w2 * h2 * 3)
      var y = 0
      while (y < h2) {
        val srcY = math.min(info.height - 1, y * factor)
        // bottom-up storage: image row r lives at file row (height-1-r)
        val srcRow = info.pixelOffset + (info.height - 1 - srcY) * rs
        var x = 0
        while (x < w2) {
          val srcX = math.min(info.width - 1, x * factor) * 3
          out(3 * (y * w2 + x)) = bytes(srcRow + srcX)
          out(3 * (y * w2 + x) + 1) = bytes(srcRow + srcX + 1)
          out(3 * (y * w2 + x) + 2) = bytes(srcRow + srcX + 2)
          x += 1
        }
        y += 1
      }
      (w2, h2, encodeBmp(w2, h2, out))
    }

  // ------------------------------------------------------------------ WAV

  /** Decoded WAV facts: fmt-chunk fields + data-chunk stats. */
  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Int, dataOffset: Int, meanSample: Double)

  /** PCM 8-bit mono RIFF/WAVE; 44-byte canonical header + raw samples. */
  def encodeWav(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + samples.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + samples.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16) // PCM fmt chunk size
    bb.putShort(1) // audio format = PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate) // byte rate = rate * channels * bytes/sample
    bb.putShort(1) // block align
    bb.putShort(8) // bits per sample
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(samples.length)
    bb.put(samples)
    bb.array()
  }

  /** Header-only RIFF chunk walk (no sample scan, `meanSample` left 0);
    * tolerates extra chunks between fmt and data; None on any violation. */
  def wavHeaderInfo(bytes: Array[Byte]): Option[WavInfo] = {
    def ascii(off: Int, n: Int): String =
      if (off + n <= bytes.length) new String(bytes, off, n, "US-ASCII") else ""
    if (bytes.length < 44 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii(off, 4)
      val size = bb.getInt(off + 4)
      if (size < 0 || off.toLong + 8 + size > bytes.length) return None // long: no int wrap
      if (id == "fmt " && size >= 16) {
        val audioFormat = bb.getShort(off + 8).toInt
        if (audioFormat != 1) return None // PCM only
        val channels = bb.getShort(off + 10).toInt
        val bits = bb.getShort(off + 22).toInt
        // canonical 8-bit mono only (like the 24-bpp BMP contract): every
        // downstream loop (meanSample, downsample stride) indexes one byte
        // per sample, so other layouts would misreport rather than decode
        if (channels != 1 || bits != 8) return None
        fmt = Some((bb.getInt(off + 12), channels, bits))
      } else if (id == "data") {
        data = Some((off + 8, size))
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    for ((rate, ch, bits) <- fmt; (dOff, dLen) <- data)
      yield WavInfo(rate, ch, bits, dLen, dOff, 0.0)
  }

  /** Defensive WAV parse incl. sample statistics; None on any violation. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] =
    wavHeaderInfo(bytes).map { info =>
      var sum = 0L
      var i = 0
      while (i < info.nSamples) { sum += bytes(info.dataOffset + i) & 0xff; i += 1 }
      info.copy(meanSample = if (info.nSamples == 0) 0.0 else sum.toDouble / info.nSamples)
    }

  /** Keep every `factor`-th sample (indices 0, factor, 2·factor, …),
    * re-encoded at the same rate; returns (kept sample count, bytes). None
    * if input isn't valid PCM WAV. */
  def downsampleWav(bytes: Array[Byte], factor: Int): Option[(Int, Array[Byte])] =
    wavHeaderInfo(bytes).map { info =>
      val n2 = (info.nSamples + factor - 1) / factor
      val out = new Array[Byte](n2)
      var i = 0
      while (i < n2) { out(i) = bytes(info.dataOffset + i * factor); i += 1 }
      (n2, encodeWav(out, info.sampleRate))
    }

  // ------------------------------------------------------------------ Y4M

  /** Decoded YUV4MPEG2 facts: stream-header dims, frame geometry, mean of
    * all frame-plane bytes (FRAME markers excluded). */
  final case class Y4mInfo(width: Int, height: Int, nFrames: Int,
                           frameSize: Int, headerLen: Int, meanByte: Double)

  private def y4mHeader(width: Int, height: Int): String =
    s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n"

  private val FrameMarker = "FRAME\n".getBytes("US-ASCII")

  /** YUV4MPEG2, C444 (one byte per component, frame = W·H·3 bytes): text
    * stream header, then `FRAME\n` + raw planes per frame. Each element of
    * `frames` must be exactly `width*height*3` bytes. */
  def encodeY4m(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.forall(_.length == width * height * 3),
      s"bad Y4M encode args: ${width}x$height")
    val header = y4mHeader(width, height).getBytes("US-ASCII")
    val out = ByteBuffer.allocate(header.length + frames.map(f => 6 + f.length).sum)
    out.put(header)
    frames.foreach { f => out.put(FrameMarker); out.put(f) }
    out.array()
  }

  /** Header-only Y4M parse: header tokens + strict FRAME walk (marker and
    * length checks, no byte summing — `meanByte` left 0). */
  def y4mHeaderInfo(bytes: Array[Byte]): Option[Y4mInfo] = y4mParse(bytes, withStats = false)

  /** Defensive Y4M parse incl. plane statistics; None on any violation. */
  def decodeY4m(bytes: Array[Byte]): Option[Y4mInfo] = y4mParse(bytes, withStats = true)

  /** Header tokens, then a strict FRAME walk — every frame complete, no
    * trailing garbage. None on any violation. */
  private def y4mParse(bytes: Array[Byte], withStats: Boolean): Option[Y4mInfo] = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    if (bytes.length < magic.length || !bytes.take(magic.length).sameElements(magic)) return None
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    val tokens = new String(bytes, 0, nl, "US-ASCII").split(" ")
    def tok(prefix: String): Option[String] =
      tokens.find(t => t.startsWith(prefix) && t.length > prefix.length).map(_.drop(prefix.length))
    val width = tok("W").flatMap(_.toIntOption).getOrElse(return None)
    val height = tok("H").flatMap(_.toIntOption).getOrElse(return None)
    // dim caps keep frameSize = W*H*3 far from Int overflow (a crafted
    // 32768x32768 header would otherwise wrap frameSize negative and crash
    // the walk instead of returning None)
    if (width <= 0 || height <= 0 || width > (1 << 12) || height > (1 << 12)) return None
    if (!tokens.contains("C444")) return None // only the encoded colourspace
    val frameSize = width * height * 3
    var off = nl + 1
    var n = 0
    var sum = 0L
    while (off < bytes.length) {
      if (off + FrameMarker.length > bytes.length ||
          !java.util.Arrays.equals(bytes, off, off + FrameMarker.length,
            FrameMarker, 0, FrameMarker.length)) return None
      off += FrameMarker.length
      if (off.toLong + frameSize > bytes.length) return None // truncated frame
      if (withStats) {
        var i = 0
        while (i < frameSize) { sum += bytes(off + i) & 0xff; i += 1 }
      }
      off += frameSize
      n += 1
    }
    val total = n.toLong * frameSize
    Some(Y4mInfo(width, height, n, frameSize, nl + 1,
      if (total == 0) 0.0 else sum.toDouble / total))
  }

  /** Nearest-neighbor downsample of every frame by `factor`, re-encoded;
    * returns (w2, h2, bytes). None if input isn't valid C444 Y4M. */
  def resizeY4m(bytes: Array[Byte], factor: Int): Option[(Int, Int, Array[Byte])] =
    y4mHeaderInfo(bytes).map { info =>
      val w2 = math.max(1, info.width / factor)
      val h2 = math.max(1, info.height / factor)
      val frames = (0 until info.nFrames).map { f =>
        val base = info.headerLen + f * (FrameMarker.length + info.frameSize) + FrameMarker.length
        val out = new Array[Byte](w2 * h2 * 3)
        var y = 0
        while (y < h2) {
          val srcY = math.min(info.height - 1, y * factor)
          var x = 0
          while (x < w2) {
            val srcX = math.min(info.width - 1, x * factor)
            var c = 0
            while (c < 3) {
              out(3 * (y * w2 + x) + c) = bytes(base + 3 * (srcY * info.width + srcX) + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        out
      }
      (w2, h2, encodeY4m(w2, h2, frames))
    }
}
