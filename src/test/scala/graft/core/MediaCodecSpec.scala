package graft.core

import java.nio.ByteOrder

import org.scalatest.funsuite.AnyFunSuite

import graft.core.media.MediaCodec

/** The BMP/WAV codecs are hand-rolled; the JDK's own readers
  * (`javax.imageio`, `javax.sound.sampled`) serve as INDEPENDENT decoders
  * of our encoder output, and our decoder is fuzz-checked to never throw on
  * malformed bytes. */
class MediaCodecSpec extends AnyFunSuite {

  private def pixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)

  test("BMP round-trip: decoder recovers dims, offset, and exact pixel mean") {
    for ((w, h) <- Seq((1, 1), (3, 2), (17, 5), (64, 48))) {
      val px = pixels(w, h)
      val info = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, px)).get
      assert(info.width == w && info.height == h && info.bitsPerPixel == 24)
      assert(info.pixelOffset == 54)
      val mean = px.iterator.map(b => (b & 0xff).toLong).sum.toDouble / px.length
      assert(math.abs(info.meanPixel - mean) < 1e-9)
    }
  }

  test("encoded BMP is a real BMP: javax.imageio reads identical pixels") {
    val (w, h) = (17, 9)
    val px = pixels(w, h)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaCodec.encodeBmp(w, h, px)))
    assert(img != null, "ImageIO could not parse our BMP")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val b = px(3 * (y * w + x)) & 0xff
      val g = px(3 * (y * w + x) + 1) & 0xff
      val r = px(3 * (y * w + x) + 2) & 0xff
      assert((img.getRGB(x, y) & 0xffffff) == ((r << 16) | (g << 8) | b),
        s"pixel ($x,$y) mismatch")
    }
  }

  test("encoded WAV is a real WAV: javax.sound.sampled parses format and samples") {
    val samples = Array.tabulate(1000)(i => ((i * 7) % 256).toByte)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(MediaCodec.encodeWav(samples, sampleRate = 8000)))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 && fmt.getSampleSizeInBits == 8)
    assert(ais.getFrameLength == samples.length.toLong)
    assert(ais.readAllBytes().sameElements(samples))
  }

  test("RIFF chunk walk tolerates an extra chunk before data") {
    val samples = Array[Byte](1, 2, 3, 4, 5)
    val base = MediaCodec.encodeWav(samples, 44100)
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ extra ++ base.drop(36) // after fmt chunk
    java.nio.ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8) // fix RIFF size
    val info = MediaCodec.decodeWav(spliced).get
    assert(info.nSamples == 5 && info.sampleRate == 44100 && info.channels == 1)
  }

  test("malformed payloads: decoders return None, never throw") {
    val goodBmp = MediaCodec.encodeBmp(4, 3, pixels(4, 3))
    val bpp8 = goodBmp.clone(); bpp8(28) = 8
    val hugeOffset = goodBmp.clone()
    java.nio.ByteBuffer.wrap(hugeOffset).order(ByteOrder.LITTLE_ENDIAN).putInt(10, 1 << 20)
    val goodWav = MediaCodec.encodeWav(Array[Byte](1, 2, 3))
    val floatWav = goodWav.clone(); floatWav(20) = 3 // IEEE-float format tag
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      "BM".getBytes("US-ASCII"),
      goodBmp.take(30), // truncated header
      goodBmp.take(60), // truncated pixels
      bpp8,
      hugeOffset,
      goodWav.take(20), // truncated fmt
      floatWav,
      Array.tabulate(128)(i => (i * 13).toByte)) // noise
    cases.foreach { c =>
      assert(MediaCodec.decodeBmp(c).isEmpty)
      assert(MediaCodec.decodeWav(c).isEmpty)
    }
  }

  test("decoders survive every truncation and every header bit-flip") {
    val bmp = MediaCodec.encodeBmp(9, 4, pixels(9, 4))
    val wav = MediaCodec.encodeWav(Array.tabulate(64)(_.toByte))
    for (n <- 0 to bmp.length) { MediaCodec.decodeBmp(bmp.take(n)); MediaCodec.decodeWav(bmp.take(n)) }
    for (n <- 0 to wav.length) { MediaCodec.decodeWav(wav.take(n)); MediaCodec.decodeBmp(wav.take(n)) }
    for (i <- 0 until 54) {
      val b = bmp.clone(); b(i) = (b(i) ^ 0x55).toByte
      MediaCodec.decodeBmp(b) // must return, never throw
    }
    for (i <- 0 until 44) {
      val w = wav.clone(); w(i) = (w(i) ^ 0x55).toByte
      MediaCodec.decodeWav(w)
    }
  }

  test("nearest-neighbor BMP resize halves dims and remains ImageIO-readable") {
    val (w, h) = (10, 7)
    val (w2, h2, out) = MediaCodec.resizeBmp(MediaCodec.encodeBmp(w, h, pixels(w, h)), 2).get
    assert(w2 == 5 && h2 == 3)
    val info = MediaCodec.decodeBmp(out).get
    assert(info.width == 5 && info.height == 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 5 && img.getHeight == 3)
  }

  test("Y4M round-trip: header dims, frame count, frame size, mean") {
    val (w, h) = (3, 2)
    val frames = Seq(pixels(3, 2), pixels(3, 2).map(b => (b + 1).toByte))
    val bytes = MediaCodec.encodeY4m(w, h, frames)
    // byte-exact container layout: public YUV4MPEG2 text header + markers
    val s = new String(bytes, "ISO-8859-1")
    assert(s.startsWith("YUV4MPEG2 W3 H2 F25:1 Ip A1:1 C444\n"))
    assert(s.indexOf("FRAME\n") == 35)
    assert(s.indexOf("FRAME\n", 36) == 35 + 6 + 18)
    val info = MediaCodec.decodeY4m(bytes).get
    assert(info.width == 3 && info.height == 2 && info.nFrames == 2 && info.frameSize == 18)
    val all = frames.flatten
    val mean = all.iterator.map(b => (b & 0xff).toLong).sum.toDouble / all.size
    assert(math.abs(info.meanByte - mean) < 1e-9)
  }

  test("Y4M resize halves dims per frame and keeps the frame count") {
    val frames = Seq.fill(3)(pixels(8, 6))
    val (w2, h2, out) = MediaCodec.resizeY4m(MediaCodec.encodeY4m(8, 6, frames), 2).get
    assert(w2 == 4 && h2 == 3)
    val info = MediaCodec.decodeY4m(out).get
    assert(info.width == 4 && info.height == 3 && info.nFrames == 3)
  }

  test("Y4M decoder rejects truncation, bad markers, and wrong colourspace") {
    val good = MediaCodec.encodeY4m(3, 2, Seq(pixels(3, 2))) // header 35 + 6 + 18
    // every truncation must return without throwing; the only valid prefix
    // shorter than the full stream is the bare header (a legal 0-frame clip)
    for (n <- 0 until good.length) {
      val d = MediaCodec.decodeY4m(good.take(n))
      if (n == 35) assert(d.exists(_.nFrames == 0), s"len $n")
      else assert(d.isEmpty, s"len $n")
    }
    val badMarker = good.clone(); badMarker(35) = 'G'
    assert(MediaCodec.decodeY4m(badMarker).isEmpty)
    val c420 = new String(good, "ISO-8859-1").replace("C444", "C420")
    assert(MediaCodec.decodeY4m(c420.getBytes("ISO-8859-1")).isEmpty)
    // crafted dims whose frame size would overflow Int must be rejected,
    // not crash the frame walk
    val huge = "YUV4MPEG2 W32768 H32768 F25:1 Ip A1:1 C444\nFRAME\n".getBytes("US-ASCII")
    assert(MediaCodec.decodeY4m(huge).isEmpty)
  }

  test("WAV downsample keeps exactly every factor-th sample") {
    val samples = Array.tabulate(11)(i => (i + 1).toByte)
    val (n2, out) = MediaCodec.downsampleWav(MediaCodec.encodeWav(samples), 4).get
    assert(n2 == 3) // indices 0, 4, 8
    val info = MediaCodec.decodeWav(out).get
    assert(info.nSamples == 3)
    assert(out.slice(info.dataOffset, info.dataOffset + 3).toSeq == Seq[Byte](1, 5, 9))
  }

  test("format sniffer answers (0, 0, false) on a zeroed magic byte — every modality") {
    // the corrupt-header twin (Multimodal.corruptHeaders) relies on this:
    // one flipped byte in the first block must fail the sniff, not parse
    val payloads = Seq(
      MediaCodec.encodeBmp(3, 2, pixels(3, 2)),
      MediaCodec.encodeWav(Array.tabulate(5)(_.toByte)),
      MediaCodec.encodeY4m(3, 2, Seq(pixels(3, 2))))
    for (good <- payloads) {
      assert(graft.ops.Multimodal.decode(good)._3, "pristine payload must parse")
      val bad = good.clone(); bad(0) = 0
      assert(graft.ops.Multimodal.decode(bad) === ((0, 0, false)))
    }
  }
}
