package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.media.MediaCodec

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * batched decode / feature-extraction over `mapPartitions`.
  *
  * All three modalities are REAL public formats parsed by from-scratch
  * pure-JVM codecs ([[graft.core.media.MediaCodec]]): 24-bpp Windows BMP
  * (image), PCM 8-bit RIFF/WAVE (audio), and YUV4MPEG2 C444 (video, with
  * genuine `FRAME`-delimited frames). The synthetic corpus is genuine
  * bytes in each format; BMP/WAV are cross-validated against
  * `javax.imageio` / `javax.sound.sampled` in MediaCodecSpec. The Spark
  * plumbing — binary column schema, partition-batched decode loops (the
  * Scala analog of `mapInPandas` batch shape), fixed feature schema — is
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
      header_ok: Boolean)

  private def textBytes(text: String): Array[Byte] = text.getBytes("UTF-8")

  /** `n` bytes cycling the document text from `off` (zero-filled when
    * empty) — indexes in place, no per-frame array copies. */
  private def cycled(body: Array[Byte], n: Int, off: Int = 0): Array[Byte] = {
    val out = new Array[Byte](n)
    if (body.nonEmpty) {
      var i = 0
      while (i < n) { out(i) = body((off + i) % body.length); i += 1 }
    }
    out
  }

  /** Deterministic media payload per document row:
    *  - image (doc_id % 3 == 0): real BMP, `(n_chars%64+1) × (n_chars%48+1)`
    *    24-bpp, pixel bytes cycling the UTF-8 text;
    *  - audio (doc_id % 3 == 1): real WAV, 8-bit PCM mono @8kHz, the UTF-8
    *    text bytes as samples;
    *  - video (doc_id % 3 == 2): real YUV4MPEG2, C444,
    *    `(n_chars%16+1) × (n_chars%12+1)`, `strlen(text)/64 + 1` frames of
    *    text-cycled planes. */
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
            MediaRow(id, "image", MediaCodec.encodeBmp(w, h, cycled(body, w * h * 3)))
          case 1 =>
            MediaRow(id, "audio", MediaCodec.encodeWav(body))
          case _ =>
            val w = (nChars % 16 + 1).toInt
            val h = (nChars % 12 + 1).toInt
            val nFrames = body.length / 64 + 1
            val frames = (0 until nFrames).map(f => cycled(body, w * h * 3, off = f * 64))
            MediaRow(id, "video", MediaCodec.encodeY4m(w, h, frames))
        }
    }
  }

  private def isBmp(p: Array[Byte]) = p.length >= 2 && p(0) == 'B' && p(1) == 'M'
  private def isWav(p: Array[Byte]) =
    p.length >= 4 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
  private def isY4m(p: Array[Byte]) =
    p.length >= 9 && new String(p, 0, 9, "US-ASCII") == "YUV4MPEG2"

  /** Format-sniffing HEADER parse: (width, height, header_ok). BMP/Y4M
    * report pixel dims; WAV reports (n_samples, 1). Header-only on every
    * branch — feature extraction must not pay an O(body) scan for fields
    * the header already carries (full-body decode lives in the codecs and
    * the resize/frame paths, which genuinely consume the body). */
  def decode(payload: Array[Byte]): (Int, Int, Boolean) =
    if (isBmp(payload))
      MediaCodec.bmpHeaderInfo(payload)
        .map(i => (i.width, i.height, true)).getOrElse((0, 0, false))
    else if (isWav(payload))
      MediaCodec.wavHeaderInfo(payload)
        .map(i => (i.nSamples, 1, true)).getOrElse((0, 0, false))
    else if (isY4m(payload))
      MediaCodec.y4mHeaderInfo(payload)
        .map(i => (i.width, i.height, true)).getOrElse((0, 0, false))
    else (0, 0, false)

  /** Offset of the decoded payload body (BMP pixel array / WAV data chunk /
    * Y4M first frame marker) — read from the PARSED headers (header-only
    * variants: no body scan on this path), not assumed. */
  def bodyOffset(payload: Array[Byte]): Int =
    if (isBmp(payload)) MediaCodec.bmpHeaderInfo(payload).map(_.pixelOffset).getOrElse(payload.length)
    else if (isWav(payload)) MediaCodec.wavHeaderInfo(payload).map(_.dataOffset).getOrElse(payload.length)
    else if (isY4m(payload)) MediaCodec.y4mHeaderInfo(payload).map(_.headerLen).getOrElse(payload.length)
    else payload.length

  /** Per-row feature extraction (header-only parse, no body scan). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val (w, h, ok) = decode(m.payload)
      MediaFeatures(m.doc_id, m.modality, m.payload.length, w, h, ok)
    }
  }

  final case class ResizedMedia(
      doc_id: Long,
      modality: String,
      width_out: Int,
      height_out: Int,
      n_bytes_out: Int)

  /** Downsample by `factor`: BMP/Y4M → nearest-neighbor re-encode; WAV →
    * every `factor`-th sample re-encoded. The codecs report the output
    * dims, so nothing is decoded twice. Unparseable payloads yield a zero
    * row. */
  def resizePayload(payload: Array[Byte], factor: Int): (Int, Int, Array[Byte]) = {
    if (isBmp(payload))
      MediaCodec.resizeBmp(payload, factor)
        .getOrElse((0, 0, Array.empty[Byte]))
    else if (isWav(payload))
      MediaCodec.downsampleWav(payload, factor)
        .map { case (n2, out) => (n2, 1, out) }
        .getOrElse((0, 0, Array.empty[Byte]))
    else if (isY4m(payload))
      MediaCodec.resizeY4m(payload, factor)
        .getOrElse((0, 0, Array.empty[Byte]))
    else (0, 0, Array.empty[Byte])
  }

  /** Batched resize over the media table. */
  def resize(media: Dataset[MediaRow], factor: Int = 2): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val (w2, h2, out) = resizePayload(m.payload, factor)
      ResizedMedia(m.doc_id, m.modality, w2, h2, out.length)
    }
  }

  final case class FrameSample(
      doc_id: Long,
      modality: String,
      n_frames: Int,
      n_frames_kept: Int,
      n_bytes_kept: Int)

  /** Frame sampling — the video-keyframe-sampling shape. For Y4M the
    * frames are the REAL container frames (`FRAME`-delimited planes; every
    * `stride`-th kept, counted in plane bytes); for byte-stream payloads
    * (BMP pixel array / WAV data) a "frame" is a consecutive
    * `frameSize`-byte block of the parsed body (last partial block
    * counts). */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 16, stride: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      MediaCodec.y4mHeaderInfo(m.payload) match {
        case Some(info) =>
          val kept = (info.nFrames + stride - 1) / stride
          FrameSample(m.doc_id, m.modality, info.nFrames, kept, kept * info.frameSize)
        case None =>
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
      }
    }
  }

  /** Header-corruption rule for the registered `m_features` /
    * `m_feature_summary` gates: payloads with `doc_id % HeaderCorruptMod
    * = 0 AND doc_id % 3 != 1` get their first magic byte zeroed. Without
    * it every synthesized header parses and `header_ok` is a constant
    * TRUE the driver gate can't distinguish from a sniffer that always
    * answers yes. Audio is spared so the per-modality `all_headers_ok`
    * rollup realizes BOTH values (sf0.01: image/video carry corrupt
    * members, audio stays clean). Shared with the DuckDB oracles. */
  val HeaderCorruptMod = 53L

  /** Deterministic corrupt-header twin: zero the magic's first byte on
    * the rule slice — length and body untouched, the smallest corruption
    * a real ingest meets (bit-rot in the first block) and the one every
    * format sniffer must catch. Production callers feed real payloads to
    * [[extractFeatures]] directly; this wrapper exists for the gates. */
  def corruptHeaders(media: Dataset[MediaRow],
                     mod: Long = HeaderCorruptMod): Dataset[MediaRow] = {
    require(mod > 0, s"corruptHeaders: mod must be > 0, got $mod")
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      if (m.doc_id % mod == 0 && m.doc_id % 3 != 1) {
        val p = m.payload.clone(); p(0) = 0; MediaRow(m.doc_id, m.modality, p)
      } else m
    }
  }

  /** End-to-end query: synth → corrupt-twin → decode → per-modality
    * feature rollup (`all_headers_ok` = the min over [[decode]]'s
    * verdicts, 0 for image/video and 1 for audio under the twin rule). */
  def featureSummary(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    extractFeatures(corruptHeaders(synthesize(documents)))
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        max("width").as("max_width"),
        min(when($"header_ok", 1).otherwise(0)).as("all_headers_ok"))
      .orderBy("modality")
  }

  /** Per-document features (deterministic, genuinely header-derived;
    * corrupt-twin rows surface as `(0, 0, header_ok = false)`). */
  def features(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    extractFeatures(corruptHeaders(synthesize(documents))).toDF().orderBy("doc_id")
  }
}
