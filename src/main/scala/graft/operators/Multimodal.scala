package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with a typed metadata struct riding alongside.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape of the decode
  * step) is real and tested. IMAGE decode/resize is REAL — JDK ImageIO
  * handles every format it ships readers for (PNG/BMP/GIF/JPEG,
  * header-sniffed); payloads no reader claims (codec-less audio/video, the
  * synthetic corpora) take a clearly-labeled deterministic fallback so the
  * operator stays total — swap a native codec into [[decodeOne]]/
  * [[resizeOne]]'s per-partition loop for those.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, codec: String, width: Int, height: Int,
                       nBytes: Long)
  case class MediaRecord(mediaId: Long, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
                           headerHex: String, byteMean: Double,
                           frames: Seq[Long], decoded: Boolean,
                           width: Int, height: Int, pixelMean: Double,
                           sampleRate: Int, channels: Int,
                           audioFrames: Long, rmsAmplitude: Double)
  case class ResizedMedia(mediaId: Long, width: Int, height: Int,
                          bytes: Array[Byte], decoded: Boolean)

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
                  stride: Int = 4, maxFrames: Int = Int.MaxValue): DataFrame = {
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    // sequence() materializes the index array per row BEFORE explode, so a
    // degenerate payload (GBs of video against a small frameBytes) would
    // build a multi-million-element array in one row. maxFrames bounds
    // that: at most maxFrames kept indices per record — the last kept
    // index is (maxFrames-1)*stride (long arithmetic: the product
    // overflows Int at the defaults).
    val lastKept = math.min((maxFrames.toLong - 1) * stride,
      Int.MaxValue.toLong).toInt
    media
      .where(col("meta.nBytes") > 0)
      .select(col("media_id"), col("bytes"),
        // the sequence step generates ONLY the kept indices — exploding
        // every frame and filtering stride-1 of stride away would push
        // stride× the rows through the Generate node for nothing
        explode(sequence(lit(0),
          least(
            expr(s"CAST((meta.nBytes + ${frameBytes - 1}) DIV $frameBytes AS INT) - 1"),
            lit(lastKept)),
          lit(stride))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame_bytes"))
  }

  /** Batched decode via mapPartitions — per-partition codec init, iterate
    * records, emit features. Payloads ImageIO recognizes (header sniff, no
    * extension trust) decode for real: true dimensions plus a deterministic
    * mean over the RGB channel bytes. Unclaimed payloads keep the labeled
    * deterministic byte-level fallback (`decoded = false`) so the operator
    * is total over mixed media columns. */
  def decodeFeatures(media: DataFrame, frameStride: Int = 32,
                     maxFrames: Int = 4096)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    import spark.implicits._
    media.select(col("media_id"), col("bytes"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .mapPartitions { it =>
        // per-partition codec init: no disk-backed ImageInputStream cache —
        // executor-local tmp files for a per-record decode are pure overhead
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes, meta) =>
          decodeOne(id, bytes, meta, frameStride, maxFrames) }
      }
  }

  /** Resize via the same per-partition batch shape. ImageIO-decodable
    * payloads take the real path: deterministic nearest-neighbor resample
    * (explicit index map — NOT Graphics2D interpolation, whose output may
    * vary across JDK rendering pipelines) re-encoded as PNG. Unclaimed
    * payloads keep the byte-sampling fallback (`decoded = false`). */
  def resize(media: DataFrame, targetW: Int, targetH: Int)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    import spark.implicits._
    media.select(col("media_id"), col("bytes"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        it.map { case (id, bytes, meta) => resizeOne(id, bytes, meta, targetW, targetH) }
      }
  }

  /** 63-bit byte-level difference hash (dHash) of an opaque binary
    * payload — the perceptual-hash primitive image dataset curation
    * dedups on (resample to a tiny grid, hash the DERIVATIVE: each bit
    * says "is this sample brighter than its right neighbour", so the
    * hash survives re-encoding/brightness shifts that change absolute
    * bytes but not their ordering). Here the "pixels" are the raw
    * payload bytes resampled to a 9×8 grid (sample k of 72 reads byte
    * 1 + ⌊k·(n−1)/71⌋) — the deterministic stand-in this container's
    * codec-free multimodal path uses throughout; a real deployment
    * swaps the grid read for a decoded-luma read and keeps everything
    * downstream. 63 bits (9 rows × 7 comparisons) keep every shift and
    * sum inside non-negative BIGINT on every engine — bit 63 would wrap
    * Spark silently and ERROR DuckDB.
    *
    * Plan shape: hex the payload once per row, explode the 63-bit grid,
    * per-bit comparison + shift as CODEGEN'D built-ins, shift-sum
    * map-side-combined per id — one aggregate, no shuffle of payloads
    * (only the 8 B hash leaves the scan stage). The duplication of the
    * hex string across the 63 exploded rows looks wasteful but measures
    * FASTER than the per-row transform/aggregate HOF alternative (that
    * form never finished a 100× run this explode does in ~20 s:
    * higher-order-function lambdas are INTERPRETED, and 72 interpreted
    * conv/substr calls per row lose to 63 codegen'd row copies — the
    * q126 interpreted-lambda lesson again). Returns (id, simhash) ready
    * for [[Dedup.hammingNearDupPairs]]' pigeonhole banding. */
  def dhash63(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    def g(k: String) =
      s"CAST(conv(substring(hx, CAST(2 * (($k) * (n - 1) div 71) + 1 AS INT), 2), 16, 10) AS BIGINT)"
    val bitVal = expr(
      s"""CASE WHEN ${g("(bit div 7) * 8 + bit % 7")} >
         |          ${g("(bit div 7) * 8 + bit % 7 + 1")}
         |THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))
         |ELSE CAST(0 AS BIGINT) END""".stripMargin)
    media
      .select(col(idCol).as("id"), hex(col(bytesCol)).as("hx"),
        length(col(bytesCol)).cast("long").as("n"))
      // n >= 1: a zero-length payload has no gradient to hash, and the
      // degenerate n-1 = -1 index diverges across engines (Spark's
      // truncating `div` lands substring(hx, 1) on the empty string →
      // conv('') → hash 0, while a floor-division twin computes a negative
      // index and errors). Empty payloads are dropped — no hash row —
      // and the q141 oracle replays the same guard.
      .where(col("n") >= 1)
      .select(col("id"), col("hx"), col("n"),
        explode(sequence(lit(0L), lit(62L))).as("bit"))
      .select(col("id"), bitVal.as("bv"))
      .groupBy(col("id")).agg(sum(col("bv")).as("simhash"))
  }

  /** Header-sniffed image decode; None when no registered reader claims the
    * payload (ImageIO.read returns null) or the bytes are corrupt. NonFatal,
    * not just IOException: JDK readers throw RuntimeExceptions on malformed
    * bodies whose headers passed the sniff (truncated JPEG → CMMException,
    * corrupt GIF/BMP → ArrayIndexOutOfBounds) — crawled bytes must take the
    * fallback path, not fail the task. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** FALLBACK resample for unclaimed payloads: byte count scales with the
    * target/source pixel ratio via even stride sampling over the WHOLE
    * payload — deterministic, codec-free. Output is capped at the source
    * length (byte sampling cannot synthesize data on upscale; the cap is
    * the denominator too, so sampling always spans the full payload rather
    * than repeating a prefix). */
  private def resizeOne(id: Long, bytes: Array[Byte], meta: MediaMeta,
                        targetW: Int, targetH: Int): ResizedMedia =
    readImage(bytes) match {
      case Some(img) =>
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < targetH) {
          var x = 0
          while (x < targetW) {
            // long arithmetic: x * srcW overflows Int for large pano
            // resizes (product > 2^31 wraps negative → AIOOBE in getRGB)
            out.setRGB(x, y, img.getRGB(
              (x.toLong * img.getWidth / targetW).toInt,
              (y.toLong * img.getHeight / targetH).toInt))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        ResizedMedia(id, targetW, targetH, bos.toByteArray, decoded = true)
      case None =>
        val srcPx = math.max(meta.width.toLong * meta.height, 1L)
        val scaled = math.max(
          (bytes.length.toLong * targetW * targetH / srcPx).toInt, 1)
        val outLen = math.min(scaled, math.max(bytes.length, 1))
        val out = Array.tabulate(outLen) { i =>
          if (bytes.isEmpty) 0.toByte
          else bytes((i.toLong * bytes.length / outLen).toInt)
        }
        ResizedMedia(id, targetW, targetH, out, decoded = false)
    }

  /** Parsed PCM audio: (sampleRate, channels, frameCount, rms of the
    * normalized 16-bit samples). None when javax.sound has no provider for
    * the payload or the body is malformed — same NonFatal discipline as
    * [[readImage]]. Pure stream parsing, no audio device involved.
    *
    * The payload is first CONVERTED to signed 16-bit little-endian PCM via
    * `AudioSystem.getAudioInputStream(target, raw)` so the JDK normalizes
    * endianness (AIFF is big-endian), encoding (AU mu-law/A-law), and
    * sample width (24/32-bit WAV) before the sample loop — hand-decoding
    * the raw bytes as WAV-layout PCM would silently produce garbage RMS for
    * those formats. An unsupported conversion throws and falls to the
    * byte-level `decoded = false` path. The frame count is derived from the
    * samples actually read, not the header's `getFrameLength` claim, which
    * is NOT_SPECIFIED (-1) for unknown-length streams (e.g. AU data-size
    * 0xFFFFFFFF). */
  private def readAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = raw.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          src.getSampleRate, 16, src.getChannels,
          /* signed = */ true, /* bigEndian = */ false)
        val in =
          javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
        try {
          val buf = in.readAllBytes()
          val n = buf.length / 2
          var i = 0
          var sumSq = 0.0
          while (i < n) {
            val off = i * 2
            val v = ((buf(off) & 0xFF) | (buf(off + 1) << 8)).toShort / 32768.0
            sumSq += v * v
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          val channels = math.max(src.getChannels, 1)
          Some((src.getSampleRate.toInt, src.getChannels,
            n.toLong / channels, rms))
        } finally in.close()
      } finally raw.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode one record: real pixels when an image reader claims the
    * payload, real PCM stats when an audio provider does (WAV/AIFF/AU ship
    * with the JDK), the deterministic byte-level fallback otherwise.
    * Byte-level features (header hex, byte mean, stride frames) are
    * emitted for ALL paths — they are cheap and downstream filters key on
    * them uniformly. */
  private def decodeOne(id: Long, bytes: Array[Byte], meta: MediaMeta,
                        frameStride: Int, maxFrames: Int): MediaFeatures = {
    val byteMean =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / bytes.length
    // the frames FIELD is a bounded shortlist (maxFrames offsets), not a
    // full enumeration: materialized per ROW by the encoder, an unbounded
    // range would turn a GB-scale payload into a 10^8-element Seq in one
    // output row — full sampling belongs to [[frameSample]], which streams
    // one row per kept frame instead
    val frames = 0L.until(
      math.min(bytes.length.toLong, frameStride.toLong * maxFrames),
      frameStride.toLong)
    val headerHex = bytes.take(8).map("%02X".format(_)).mkString
    readImage(bytes) match {
      case Some(img) =>
        val (w, h) = (img.getWidth, img.getHeight)
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        MediaFeatures(id, meta.kind, bytes.length.toLong, headerHex, byteMean,
          frames, decoded = true, w, h, s.toDouble / (w.toLong * h * 3),
          sampleRate = 0, channels = 0, audioFrames = 0L, rmsAmplitude = 0.0)
      case None => readAudio(bytes) match {
        case Some((rate, ch, nFrames, rms)) =>
          MediaFeatures(id, meta.kind, bytes.length.toLong, headerHex,
            byteMean, frames, decoded = true, width = 0, height = 0,
            pixelMean = 0.0, sampleRate = rate, channels = ch,
            audioFrames = nFrames, rmsAmplitude = rms)
        case None =>
          MediaFeatures(id, meta.kind, bytes.length.toLong, headerHex,
            byteMean, frames, decoded = false, meta.width, meta.height,
            byteMean, sampleRate = 0, channels = 0, audioFrames = 0L,
            rmsAmplitude = 0.0)
      }
    }
  }
}
