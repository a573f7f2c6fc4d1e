package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.media.MediaCodec

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * batched decode / feature-extraction over `mapPartitions`.
  *
  * Image and audio payloads are REAL formats parsed by from-scratch
  * pure-JVM codecs ([[graft.core.media.MediaCodec]]): 24-bpp Windows BMP
  * and PCM 8-bit RIFF/WAVE — the synthetic corpus is genuine BMP/WAV bytes
  * (cross-validated against `javax.imageio` / `javax.sound.sampled` in
  * MediaCodecSpec). Video keeps a clearly-marked deterministic stand-in (a
  * 16-byte "GRFT" header + raw body): no comparably trivial public video
  * container exists, and the container ships no codecs. The Spark plumbing
  * — binary column schema, partition-batched decode loops (the Scala
  * analog of `mapInPandas` batch shape), fixed feature schema — is
  * identical across all three.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      mean_byte: Double,
      header_ok: Boolean)

  private val GrftMagic = 0x47524654 // "GRFT"

  private def textBytes(text: String): Array[Byte] = text.getBytes("UTF-8")

  /** Deterministic media payload per document row:
    *  - image (doc_id % 3 == 0): real BMP, `(n_chars%64+1) × (n_chars%48+1)`
    *    24-bpp, pixel bytes cycling the UTF-8 text;
    *  - audio (doc_id % 3 == 1): real WAV, 8-bit PCM mono @8kHz, the UTF-8
    *    text bytes as samples;
    *  - video (doc_id % 3 == 2): GRFT stand-in — 16-byte header
    *    [magic|width|height|reserved] little-endian + text bytes as body. */
  def synthesize(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id", "text", "n_chars").as[(Long, String, Long)].map {
      case (id, text, nChars) =>
        val body = textBytes(text)
        id % 3 match {
          case 0 =>
            val w = (nChars % 64 + 1).toInt
            val h = (nChars % 48 + 1).toInt
            val px = new Array[Byte](w * h * 3)
            if (body.nonEmpty) {
              var i = 0
              while (i < px.length) { px(i) = body(i % body.length); i += 1 }
            }
            MediaRow(id, "image", MediaCodec.encodeBmp(w, h, px))
          case 1 =>
            MediaRow(id, "audio", MediaCodec.encodeWav(body))
          case _ =>
            val w = (nChars % 640 + 1).toInt
            val h = (nChars % 480 + 1).toInt
            val bb = java.nio.ByteBuffer.allocate(16 + body.length)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.putInt(GrftMagic).putInt(w).putInt(h).putInt(0).put(body)
            MediaRow(id, "video", bb.array())
        }
    }
  }

  private def isBmp(p: Array[Byte]) = p.length >= 2 && p(0) == 'B' && p(1) == 'M'
  private def isWav(p: Array[Byte]) =
    p.length >= 4 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
  private def isGrft(p: Array[Byte]) =
    p.length >= 16 && java.nio.ByteBuffer.wrap(p)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0) == GrftMagic

  /** GRFT stand-in decode (video): parse the 16-byte header, mean the body. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double, Boolean) = {
    if (!isGrft(payload)) (0, 0, 0.0, false)
    else {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(4); val h = bb.getInt(8)
      var sum = 0L
      var i = 16
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      val mean = if (payload.length > 16) sum.toDouble / (payload.length - 16) else 0.0
      (w, h, mean, true)
    }
  }

  /** Format-sniffing decode: (width, height, mean body byte, header_ok).
    * BMP reports pixel dims; WAV reports (n_samples, 1). */
  def decode(payload: Array[Byte]): (Int, Int, Double, Boolean) =
    if (isBmp(payload))
      MediaCodec.decodeBmp(payload)
        .map(i => (i.width, i.height, i.meanPixel, true)).getOrElse((0, 0, 0.0, false))
    else if (isWav(payload))
      MediaCodec.decodeWav(payload)
        .map(i => (i.nSamples, 1, i.meanSample, true)).getOrElse((0, 0, 0.0, false))
    else decodeStub(payload)

  /** Offset of the decoded payload body (BMP pixel array / WAV data chunk /
    * GRFT body) — read from the PARSED headers, not assumed. */
  def bodyOffset(payload: Array[Byte]): Int =
    if (isBmp(payload)) MediaCodec.decodeBmp(payload).map(_.pixelOffset).getOrElse(payload.length)
    else if (isWav(payload)) MediaCodec.decodeWav(payload).map(_.dataOffset).getOrElse(payload.length)
    else if (isGrft(payload)) 16
    else payload.length

  /** Batched feature extraction: one decode loop per partition (batch shape
    * preserved for a vectorized backend), schema fixed. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, mean, ok) = decode(m.payload)
        MediaFeatures(m.doc_id, m.modality, m.payload.length, w, h, mean, ok)
      }
    }
  }

  final case class ResizedMedia(
      doc_id: Long,
      modality: String,
      width_out: Int,
      height_out: Int,
      n_bytes_out: Int)

  /** Downsample by `factor`: BMP → nearest-neighbor re-encoded BMP; WAV →
    * every `factor`-th sample re-encoded; GRFT → halved header dims + every
    * `factor`-th body byte. Unparseable payloads yield a zero row. */
  def resizePayload(payload: Array[Byte], factor: Int): (Int, Int, Array[Byte]) = {
    if (isBmp(payload))
      MediaCodec.resizeBmp(payload, factor).flatMap { out =>
        MediaCodec.decodeBmp(out).map(i => (i.width, i.height, out))
      }.getOrElse((0, 0, Array.empty[Byte]))
    else if (isWav(payload))
      MediaCodec.downsampleWav(payload, factor).flatMap { out =>
        MediaCodec.decodeWav(out).map(i => (i.nSamples, 1, out))
      }.getOrElse((0, 0, Array.empty[Byte]))
    else {
      val (w, h, _, ok) = decodeStub(payload)
      if (!ok) (0, 0, Array.empty[Byte])
      else {
        val w2 = math.max(1, w / factor)
        val h2 = math.max(1, h / factor)
        val body = payload.drop(16)
        val kept = body.indices.collect { case i if i % factor == 0 => body(i) }.toArray
        val bb = java.nio.ByteBuffer.allocate(16 + kept.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(GrftMagic).putInt(w2).putInt(h2).putInt(0)
        bb.put(kept)
        (w2, h2, bb.array())
      }
    }
  }

  /** Batched resize over the media table. */
  def resize(media: Dataset[MediaRow], factor: Int = 2): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (w2, h2, out) = resizePayload(m.payload, factor)
      ResizedMedia(m.doc_id, m.modality, w2, h2, out.length)
    })
  }

  final case class FrameSample(
      doc_id: Long,
      modality: String,
      n_frames: Int,
      n_frames_kept: Int,
      n_bytes_kept: Int)

  /** Frame sampling over the PARSED payload body (BMP pixel array / WAV
    * data / GRFT body): consecutive `frameSize`-byte frames (last partial
    * frame counts); every `stride`-th frame is kept — the
    * video-keyframe-sampling shape. */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 16, stride: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val body = m.payload.length - bodyOffset(m.payload)
      val nFrames = (body + frameSize - 1) / frameSize
      var kept = 0
      var keptBytes = 0
      var f = 0
      while (f < nFrames) {
        if (f % stride == 0) {
          kept += 1
          keptBytes += math.min(frameSize, body - f * frameSize)
        }
        f += 1
      }
      FrameSample(m.doc_id, m.modality, nFrames, kept, keptBytes)
    })
  }

  /** End-to-end query: synth → decode → per-modality feature rollup. */
  def featureSummary(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    extractFeatures(synthesize(documents))
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        max("width").as("max_width"),
        min(when($"header_ok", 1).otherwise(0)).as("all_headers_ok"))
      .orderBy("modality")
  }

  /** Per-document features (deterministic; header-derived). */
  def features(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    extractFeatures(synthesize(documents)).toDF().orderBy("doc_id")
  }
}
