package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * batched decode / feature-extraction over `mapPartitions`.
  *
  * The decode step is a STUB by design — real image/audio codecs are not in
  * this container — but everything Spark-side is real and tested: the
  * binary column schema, the deterministic synthetic payloads (a 16-byte
  * header we "parse" + body bytes), partition-batched iteration (the Scala
  * analog of `mapInPandas` batch shape), and the feature schema. Swapping
  * [[decodeStub]] for a JNI/codec call changes no plan shape.
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

  /** Deterministic fake media payload derived from a document row: a 16-byte
    * header [magic(4) | width(4) | height(4) | reserved(4)] little-endian,
    * then the UTF-8 text bytes as the "pixel" body. */
  def synthesize(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id", "text", "n_chars").as[(Long, String, Long)].map {
      case (id, text, nChars) =>
        val body = text.getBytes("UTF-8")
        val w = (nChars % 640 + 1).toInt
        val h = (nChars % 480 + 1).toInt
        val bb = java.nio.ByteBuffer.allocate(16 + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(0x47524654) // "GRFT"
        bb.putInt(w).putInt(h).putInt(0)
        bb.put(body)
        val modality = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRow(id, modality, bb.array())
    }
  }

  /** STUB decode: parses the 16-byte header and computes body statistics.
    * Deterministic stand-in for a real codec (===> replace here <===). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double, Boolean) = {
    if (payload.length < 16) (0, 0, 0.0, false)
    else {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val magic = bb.getInt()
      val w = bb.getInt(); val h = bb.getInt(); bb.getInt()
      var sum = 0L
      var i = 16
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      val mean = if (payload.length > 16) sum.toDouble / (payload.length - 16) else 0.0
      (w, h, mean, magic == 0x47524654)
    }
  }

  /** Batched feature extraction: one decode loop per partition (batch shape
    * preserved for a vectorized/codec backend), schema fixed. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, mean, ok) = decodeStub(m.payload)
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

  /** STUB resize: halves header dimensions (floor, min 1) and keeps every
    * `factor`-th body byte starting at offset 0 — a deterministic
    * nearest-neighbor downsample stand-in. Real codec goes where
    * [[decodeStub]] does; the Spark plumbing (binary in, binary out,
    * partition-batched) is the real thing. */
  def resizeStub(payload: Array[Byte], factor: Int): (Int, Int, Array[Byte]) = {
    val (w, h, _, ok) = decodeStub(payload)
    if (!ok) (0, 0, Array.empty[Byte])
    else {
      val w2 = math.max(1, w / factor)
      val h2 = math.max(1, h / factor)
      val body = payload.drop(16)
      val kept = body.indices.collect { case i if i % factor == 0 => body(i) }.toArray
      val bb = java.nio.ByteBuffer.allocate(16 + kept.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0x47524654).putInt(w2).putInt(h2).putInt(0)
      bb.put(kept)
      (w2, h2, bb.array())
    }
  }

  /** Batched resize over the media table. */
  def resize(media: Dataset[MediaRow], factor: Int = 2): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (w2, h2, out) = resizeStub(m.payload, factor)
      ResizedMedia(m.doc_id, m.modality, w2, h2, out.length)
    })
  }

  final case class FrameSample(
      doc_id: Long,
      modality: String,
      n_frames: Int,
      n_frames_kept: Int,
      n_bytes_kept: Int)

  /** STUB frame sampling: the body is treated as consecutive `frameSize`-byte
    * frames (last partial frame counts); every `stride`-th frame is kept —
    * the video-keyframe-sampling shape with a deterministic fake decoder. */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 16, stride: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val body = m.payload.length - 16
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

  /** Per-document features (deterministic; rows-only checked). */
  def features(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    extractFeatures(synthesize(documents)).toDF().orderBy("doc_id")
  }
}
