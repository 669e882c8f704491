package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with a typed metadata struct riding alongside.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape of the decode
  * step) is real and tested; the actual media decode is a clearly-marked
  * STUB (no image/audio codecs in this container) — a deterministic fake
  * that consumes the bytes the way a real decoder would (bounded batch,
  * per-partition, no driver collection).
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, codec: String, width: Int, height: Int,
                       nBytes: Long)
  case class MediaRecord(mediaId: Long, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
                           headerHex: String, byteMean: Double,
                           frames: Seq[Long])
  case class ResizedMedia(mediaId: Long, width: Int, height: Int,
                          bytes: Array[Byte])

  /** Synthesize a media table from the documents table: payload = UTF-8
    * bytes, metadata derived deterministically. Stands in for a real
    * `binaryFile`/blob-store scan. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        lit("fake/raw").as("codec"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        length(encode(col("text"), "UTF-8")).cast("long").as("nBytes"))
        .as("meta"))

  /** Column-level feature extraction that stays in codegen: byte length,
    * header bytes as hex, deterministic "frame sample" offsets. */
  def columnFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.kind").as("kind"),
      col("meta.nBytes").as("n_bytes"),
      upper(hex(substring(col("bytes"), 1, 8))).as("header_hex"))

  /** Container-level frame sampling over the opaque payload: split the
    * binary into fixed-size frames and keep every `stride`-th as a binary
    * slice. Pure Column composition (sequence → explode → substring) — full
    * whole-stage codegen, no UDF. This is the shortlist step a video/audio
    * pipeline runs BEFORE paying decode cost: only sampled frames reach
    * [[decodeFeatures]]'s per-partition codec. */
  def frameSample(media: DataFrame, frameBytes: Int = 64,
                  stride: Int = 4): DataFrame =
    media
      .where(col("meta.nBytes") > 0)
      .select(col("media_id"), col("bytes"),
        // the sequence step generates ONLY the kept indices — exploding
        // every frame and filtering stride-1 of stride away would push
        // stride× the rows through the Generate node for nothing
        explode(sequence(lit(0),
          expr(s"CAST((meta.nBytes + ${frameBytes - 1}) DIV $frameBytes AS INT) - 1"),
          lit(stride))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame_bytes"))

  /** Batched decode STUB via mapPartitions — the exact shape a real decoder
    * integration takes (per-partition init of the codec library, iterate
    * records, emit features). The byte-mean + frame-offset computation is a
    * deterministic fake standing in for decode/resize/frame-sample:
    * replace `decodeOne` with the real codec call when the libs exist. */
  def decodeFeatures(media: DataFrame, frameStride: Int = 32)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("bytes"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .mapPartitions { it =>
        // real integration: initialize the codec ONCE per partition here
        it.map { case (id, bytes, meta) => decodeOne(id, bytes, meta, frameStride) }
      }
  }

  /** Resize STUB with the real integration's exact Spark-side shape:
    * per-partition batch over (payload, metadata), emitting the target
    * dimensions plus a payload scaled to the target pixel count. The
    * "resampling" is a deterministic fake (stride-sampled bytes — a real
    * codec's decode→interpolate→encode slots into `resizeOne`); schema,
    * typing, and partitioning are the production contract. */
  def resize(media: DataFrame, targetW: Int, targetH: Int)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("media_id"), col("bytes"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .mapPartitions { it =>
        // real integration: initialize the codec ONCE per partition here
        it.map { case (id, bytes, meta) => resizeOne(id, bytes, meta, targetW, targetH) }
      }
  }

  /** STUB resample: byte count scales with the target/source pixel ratio
    * via even stride sampling over the WHOLE payload — deterministic,
    * codec-free. Output is capped at the source length (a byte-sampling
    * stub cannot synthesize data on upscale; the cap is the denominator
    * too, so sampling always spans the full payload rather than repeating
    * a prefix). */
  private def resizeOne(id: Long, bytes: Array[Byte], meta: MediaMeta,
                        targetW: Int, targetH: Int): ResizedMedia = {
    val srcPx = math.max(meta.width.toLong * meta.height, 1L)
    val scaled = math.max(
      (bytes.length.toLong * targetW * targetH / srcPx).toInt, 1)
    val outLen = math.min(scaled, math.max(bytes.length, 1))
    val out = Array.tabulate(outLen) { i =>
      if (bytes.isEmpty) 0.toByte
      else bytes((i.toLong * bytes.length / outLen).toInt)
    }
    ResizedMedia(id, targetW, targetH, out)
  }

  /** STUB decode: deterministic fake features from the raw payload. */
  private def decodeOne(id: Long, bytes: Array[Byte], meta: MediaMeta,
                        frameStride: Int): MediaFeatures = {
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / bytes.length
    val frames = 0L.until(bytes.length.toLong, frameStride.toLong)
    MediaFeatures(id, meta.kind, bytes.length.toLong,
      bytes.take(8).map("%02X".format(_)).mkString, mean, frames)
  }
}
