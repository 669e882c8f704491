package graft

import org.apache.spark.sql.functions._

import graft.backup.Snapshot
import graft.functions.TextFunctions
import graft.operators.Multimodal

class TextMultimodalSpec extends SparkSpec {
  import sqlImplicits._

  test("shingles: fewer tokens than n → empty array; distinct applied") {
    val df = Seq("a b", "x y z x y z x y").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0).isEmpty)
    assert(got(1).toSet == Set("x y z", "y z x", "z x y"))
    assert(got(1).length == 3) // duplicates collapsed
  }

  test("langId: marker precedence and und fallback") {
    val got = Seq("the a the", "data table data", "group fast", "spark join")
      .toDF("text").select(TextFunctions.langId(col("text"))).collect()
      .map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "de", "und"))
  }

  test("token counts: whitespace vs regex runs") {
    val df = Seq("abc 123 x-y").toDF("text").select(
      TextFunctions.tokenCount(col("text")).as("ws"),
      TextFunctions.regexTokenCount(col("text")).as("re"))
    val r = df.collect().head
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 5) // abc, 123, x, -, y
  }

  test("rollingHash: deterministic, order-sensitive, distinct for distinct docs") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextFunctions.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(df(0) == df(2))
    assert(df(0) != df(1))
  }

  test("multimodal: stub decode preserves schema/batch shape") {
    val docs = Seq((7L, "hello world bytes")).toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.decodeFeatures(media)(spark).collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.mediaId == 7L)
    assert(f.nBytes == 17L)
    assert(f.headerHex == "68656C6C6F20776F") // "hello wo"
    assert(f.frames == Seq(0L)) // one 32-byte stride frame
    // column-level features agree with the mapPartitions path
    val colFeats = Multimodal.columnFeatures(media).collect().head
    assert(colFeats.getAs[String]("header_hex") == f.headerHex)
    assert(colFeats.getAs[Long]("n_bytes") == f.nBytes)
  }

  test("multimodal frame sampling: boundaries, stride, tail frame") {
    import sqlImplicits._
    import org.apache.spark.sql.functions._
    // 150 bytes → frames of 64: idx 0 (64B), 1 (64B), 2 (22B tail);
    // stride 2 keeps 0 and 2
    val docs = Seq((1L, "a" * 150), (2L, "xy")).toDF("doc_id", "text")
    val got = graft.operators.Multimodal.frameSample(
        graft.operators.Multimodal.fromDocuments(docs),
        frameBytes = 64, stride = 2)
      .select($"media_id", $"frame_idx", length($"frame_bytes").as("len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(got.toSeq == Seq((1L, 0, 64), (1L, 2, 22), (2L, 0, 2)))
  }

  test("multimodal frame caps: maxFrames bounds per-record materialization") {
    import sqlImplicits._
    // 150 bytes / 16-byte frames = 10 frames; stride 1 would keep all 10,
    // maxFrames 3 keeps exactly indices 0, 1, 2
    val docs = Seq((1L, "a" * 150)).toDF("doc_id", "text")
    val media = graft.operators.Multimodal.fromDocuments(docs)
    val capped = graft.operators.Multimodal.frameSample(
        media, frameBytes = 16, stride = 1, maxFrames = 3)
      .select($"frame_idx").collect().map(_.getInt(0)).sorted
    assert(capped.toSeq == Seq(0, 1, 2))
    // the decode-path frames shortlist: stride 8 over 150 bytes would be
    // 19 offsets; maxFrames 3 keeps 0, 8, 16
    val f = graft.operators.Multimodal.decodeFeatures(
      media, frameStride = 8, maxFrames = 3)(spark).collect().head
    assert(f.frames == Seq(0L, 8L, 16L))
    // defaults unchanged for small payloads (no cap in range)
    val fd = graft.operators.Multimodal.decodeFeatures(media)(spark)
      .collect().head
    assert(fd.frames == 0L.until(150L, 32L))
  }

  test("multimodal resize: batch shape, proportional payload, determinism") {
    import sqlImplicits._
    val docs = Seq((10L, "a" * 400), (11L, "b" * 40)).toDF("doc_id", "text")
    val media = graft.operators.Multimodal.fromDocuments(docs)
    val got = graft.operators.Multimodal.resize(media, targetW = 8, targetH = 8)
      .collect().map(r => r.mediaId -> r).toMap
    assert(got.keySet == Set(10L, 11L))
    assert(got.values.forall(r => r.width == 8 && r.height == 8))
    // payload scales with target/source pixel ratio, never empty
    assert(got.values.forall(r => r.bytes.nonEmpty))
    val again = graft.operators.Multimodal.resize(media, 8, 8)
      .collect().map(r => r.mediaId -> r.bytes.toSeq).toMap
    assert(got.view.mapValues(_.bytes.toSeq).toMap == again) // deterministic
  }

  test("multimodal: a real PNG decodes end-to-end — dimensions and pixels") {
    // 4×4 PNG with addressable pixels: (x,y) = rgb(60x, 60y, 128)
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, (x * 60 << 16) | (y * 60 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val media = Seq((42L, png, Multimodal.MediaMeta("image", "png", 4, 4,
      png.length.toLong))).toDF("media_id", "bytes", "meta")
    val f = Multimodal.decodeFeatures(media)(spark).collect().head
    assert(f.decoded, "PNG payload should take the real ImageIO path")
    assert(f.width == 4 && f.height == 4)
    // channel sums: R = 4·(0+60+120+180), G likewise, B = 128·16
    val expectedMean = (1440L + 1440L + 128L * 16).toDouble / (4L * 4 * 3)
    assert(f.pixelMean == expectedMean, s"pixelMean ${f.pixelMean}")
    assert(f.headerHex.startsWith("89504E47"), "PNG magic in header hex")

    // a payload no reader claims still flows through the labeled fallback
    val fake = Multimodal.decodeFeatures(
      Multimodal.fromDocuments(Seq((7L, "plain text")).toDF("doc_id", "text"))
    )(spark).collect().head
    assert(!fake.decoded)

    // resize 4×4 → 2×2: nearest-neighbor keeps source pixels (2x, 2y),
    // round-tripped through the PNG re-encode
    val r = Multimodal.resize(media, 2, 2)(spark).collect().head
    assert(r.decoded && r.width == 2 && r.height == 2)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.bytes))
    assert(back.getWidth == 2 && back.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 2)
      assert((back.getRGB(x, y) & 0xFFFFFF) ==
        ((2 * x * 60 << 16) | (2 * y * 60 << 8) | 128),
        s"pixel ($x,$y) wrong after resize")
    // upscale works on the real path too (the byte-sampling fallback
    // could only cap at source length)
    val up = Multimodal.resize(media, 8, 8)(spark).collect().head
    assert(up.decoded && javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(up.bytes)).getWidth == 8)

    // a corrupt body behind a valid PNG magic (the sniff passes, the
    // reader throws) must take the fallback — crawled bytes cannot be
    // allowed to fail the task
    val corrupt = Multimodal.decodeFeatures(
      Seq((43L, png.take(20), Multimodal.MediaMeta("image", "png", 4, 4,
        20L))).toDF("media_id", "bytes", "meta"))(spark).collect().head
    assert(!corrupt.decoded)
    // nonsensical target dims are a contract violation, not a silent 1-byte
    // payload
    intercept[IllegalArgumentException](Multimodal.resize(media, 0, 2)(spark))
  }

  test("multimodal: a real WAV decodes — rate, channels, frames, exact RMS") {
    // 800 samples of a ±16384 square wave at 8 kHz mono, 16-bit signed LE:
    // normalized amplitude is exactly ±0.5, so RMS is exactly 0.5
    val nSamples = 800
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val v: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val media = Seq((77L, wav, Multimodal.MediaMeta("audio", "wav", 0, 0,
      wav.length.toLong))).toDF("media_id", "bytes", "meta")
    val f = Multimodal.decodeFeatures(media)(spark).collect().head
    assert(f.decoded, "WAV payload should take the real javax.sound path")
    assert(f.headerHex.startsWith("52494646"), "RIFF magic in header hex")
    assert(f.sampleRate == 8000 && f.channels == 1 && f.audioFrames == 800L)
    assert(f.rmsAmplitude == 0.5, s"rms ${f.rmsAmplitude}")

    // a truncated WAV header takes the fallback, not a crash
    val corrupt = Multimodal.decodeFeatures(
      Seq((78L, wav.take(16), Multimodal.MediaMeta("audio", "wav", 0, 0,
        16L))).toDF("media_id", "bytes", "meta"))(spark).collect().head
    assert(!corrupt.decoded)
  }

  test("backup rotation: oldest beyond max are victims (test D15)") {
    val names = Seq(
      "mfp_db_backup_2021-01-05", "mfp_db_backup_2021-01-01",
      "mfp_db_backup_2021-01-03", "mfp_db_backup_2021-01-02",
      "mfp_db_backup_2021-01-04", "mfp_db_backup_2021-01-06")
    assert(Snapshot.rotationVictims(names, 5) == Seq("mfp_db_backup_2021-01-01"))
    assert(Snapshot.rotationVictims(names.take(3), 5).isEmpty)

    // foreign names sharing the prefix must not abort rotation (a stray
    // file would otherwise let snapshots accumulate unbounded) and are
    // neither counted nor rotated
    val withForeign = names ++ Seq("mfp_db_backup_old", "mfp_db_backup_2021-01-07.bak")
    assert(Snapshot.rotationVictims(withForeign, 5) ==
      Seq("mfp_db_backup_2021-01-01"))
  }

  test("same-day re-backup replaces the snapshot instead of merging versions") {
    // parquet part files are uuid-named: merging two store versions' files
    // into one snapshot dir would restore the UNION of both versions
    val src = tmpDir("snap-src")
    val dest = tmpDir("snap-dest") + "/mfp_db_backup_2021-01-01"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(src, "part-uuidA.parquet"), "v1")
    Snapshot.copyDir(src, dest)
    // store rewrites: the old part file is swapped for a new uuid
    java.nio.file.Files.delete(java.nio.file.Paths.get(src, "part-uuidA.parquet"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(src, "part-uuidB.parquet"), "v2")
    Snapshot.copyDir(src, dest)
    val files = new java.io.File(dest).listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("part-uuidB.parquet"),
      s"stale uuidA must not survive the re-backup: ${files.toSeq}")
  }

  test("dhash63: derivative hash survives brightness shift, flags edits") {
    def hashes(payloads: Seq[Array[Byte]]): Map[Long, Long] =
      graft.operators.Multimodal.dhash63(
          payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
            .toDF("id", "b"), "id", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = Array.tabulate[Byte](144)(i => ((i * 37 + 11) % 120).toByte)
    val brighter = base.map(b => (b + 100).toByte)     // +100, still ≤ 255
    val oneEdit = base.clone(); oneEdit(0) = (base(0) + 90).toByte
    val reversed = base.reverse
    val h = hashes(Seq(base, brighter, oneEdit, reversed))
    // uniform brightness shift preserves every byte ORDERING → same hash
    // (the property that makes dHash a perceptual hash, not a checksum)
    assert(h(1L) == h(0L), "brightness shift must not change the hash")
    // a single-sample edit flips at most the 2 bits that read it
    assert(java.lang.Long.bitCount(h(0L) ^ h(2L)) <= 2 && h(2L) != h(0L))
    // reversing the payload flips (almost) every comparison
    assert(java.lang.Long.bitCount(h(0L) ^ h(3L)) > 20)
    // top bit never set: 63-bit hashes stay non-negative on every engine
    assert(h.values.forall(_ >= 0L))
    // empty payload: no gradient to hash → the row is DROPPED, never a
    // degenerate hash-0 row (the n-1 = -1 index diverges across engines)
    val withEmpty = hashes(Seq(base, Array.empty[Byte]))
    assert(withEmpty.keySet == Set(0L) && withEmpty(0L) == h(0L))
  }

  test("hammingNearDupPairs over supplied hashes ≡ brute-force xor") {
    import org.apache.spark.sql.functions._
    val hs = Seq(0L -> 0x0F0FL, 1L -> 0x0F0EL, 2L -> 0x0F0CL,
      3L -> 0xFFFF00L, 4L -> 0xFFFF01L)
    val got = graft.operators.Dedup.hammingNearDupPairs(
        hs.toDF("id", "simhash"), maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(brute.nonEmpty && got == brute)
  }
}
