package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  test("payloads carry binary + typed metadata struct") {
    val df = Multimodal.payloads(spark, sfDir)
    assert(df.schema("payload").dataType.typeName == "binary")
    val meta = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("modality", "mime", "width", "height", "n_bytes"))
    val mods = df.select(col("meta.modality")).distinct().collect().map(_.getString(0)).toSet
    assert(mods.subsetOf(Set("image", "audio")))
  }

  test("decodeFeatures is deterministic, batched, and feature-normalized") {
    val a = Multimodal.decodeFeatures(spark, sfDir).collect()
    val b = Multimodal.decodeFeatures(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "stub decode must be deterministic")
    assert(a.length == 500)
    a.take(20).foreach { r =>
      // digest is 32-hex of the feature vector; stats summarize a
      // normalized histogram (mean * dim == sum ~= 1)
      assert(r.getAs[String]("feat_md5").matches("[0-9a-f]{32}"))
      val mean = r.getAs[Double]("feat_mean")
      val sum = mean * Multimodal.featureDim
      assert(sum > 0.99 && sum < 1.01, s"histogram must normalize, got $sum")
      assert(r.getAs[Double]("feat_min") <= mean && mean <= r.getAs[Double]("feat_max"))
    }
  }

  test("sampleFrames bounds the explode factor and offsets are consistent") {
    val frames = Multimodal.sampleFrames(spark, sfDir, everyN = 64, maxFrames = 8).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 8))
    frames.take(50).foreach { r =>
      assert(r.getAs[Int]("frame_offset") == r.getAs[Int]("frame_idx") * 64)
      assert(r.getAs[String]("frame_md5").length == 32)
    }
  }

  test("compression ratio is deterministic and low for repetitive text") {
    val a = TextAnalysis.compressionRatio(spark, sfDir).collect()
    val b = TextAnalysis.compressionRatio(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "deflate kernel must be deterministic")
    assert(a.length == 500)
    a.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio > 0.0 && ratio <= 1.5, s"doc ${r.getLong(0)} ratio $ratio out of range")
    }
  }

  test("metaStats prunes the payload column at the scan (columnar projection)") {
    val plan = Multimodal.metaStats(spark, sfDir).queryExecution.executedPlan.toString
    // the parquet scan must read only the columns the metadata needs
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("text") || plan.contains("octet_length"),
      "payload (text) bytes may only appear inside the length projection")
    val rows = Multimodal.metaStats(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 500)
  }

  test("mm6: block near-dup pairs are canonical with containment in (0, 1]") {
    val r = Multimodal.blockNearDup(spark, sfDir).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("doc_a") < row.getAs[Long]("doc_b"))
      assert(row.getAs[Long]("n_shared") >= 1)
      val c = row.getAs[Double]("containment")
      assert(c > 0.0 && c <= 1.0, s"containment $c out of range")
    }
    // exact duplicates (mm5's class) must surface here with containment 1
    val exactDups = Multimodal.payloadDedup(spark, sfDir)
      .filter(col("n_copies") > 1).count()
    if (exactDups > 0) {
      assert(r.exists(_.getAs[Double]("containment") == 1.0),
        "exact payload copies must appear as full-containment pairs")
    }
  }

  // === real container headers (r12 verdict #8): payloads written by ======
  // INDEPENDENT JVM encoders (ImageIO PNG, javax.sound WAV) must yield
  // their true header fields through the decode stage
  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def realWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    pcm.indices.foreach(i => pcm(i) = (i * 7 % 251).toByte)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("parsePngHeader reads true IHDR dimensions from an ImageIO-encoded PNG") {
    val mh = Multimodal.parsePngHeader(realPng(640, 360))
    assert(mh.contains(Multimodal.MediaHeader("png", 640, 360, 8)),
      s"expected 640x360 8-bit, got $mh")
    assert(Multimodal.parsePngHeader("just some text bytes".getBytes("UTF-8")).isEmpty)
    // truncated signature must not parse
    assert(Multimodal.parsePngHeader(realPng(4, 4).take(20)).isEmpty)
  }

  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("parseJpegHeader reads true SOF0 dimensions from an ImageIO-encoded JPEG") {
    val mh = Multimodal.parseJpegHeader(realJpeg(512, 288))
    assert(mh.contains(Multimodal.MediaHeader("jpeg", 512, 288, 8)),
      s"expected 512x288 8-bit baseline, got $mh")
    assert(Multimodal.parseJpegHeader("just some text bytes".getBytes("UTF-8")).isEmpty)
    // truncation mid-marker-stream must not parse (and not throw)
    assert(Multimodal.parseJpegHeader(realJpeg(4, 4).take(6)).isEmpty)
  }

  test("parseJpegHeader reads a progressive SOF2 frame header") {
    // hand-built marker stream: SOI, APP0 (fill-byte padded), SOF2
    // (progressive) with precision 8, height 600, width 800, 3 components
    val out = new java.io.ByteArrayOutputStream()
    def put(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xFF))
    put(0xFF, 0xD8)                    // SOI
    put(0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46) // APP0, len 4, 2 payload bytes
    put(0xFF, 0xFF, 0xC2)              // fill byte, then SOF2
    put(0x00, 0x11)                    // len 17 = 2 + 6 + 3*3
    put(0x08)                          // precision
    put(0x02, 0x58)                    // height 600
    put(0x03, 0x20)                    // width 800
    put(0x03)                          // 3 components
    put(0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val mh = Multimodal.parseJpegHeader(out.toByteArray)
    assert(mh.contains(Multimodal.MediaHeader("jpeg", 800, 600, 8)),
      s"expected 800x600 progressive, got $mh")
    // SOS before any SOF must yield None, not a scan into entropy data
    val noSof = new java.io.ByteArrayOutputStream()
    def put2(xs: Int*): Unit = xs.foreach(x => noSof.write(x & 0xFF))
    put2(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x02, 0x00, 0x00)
    assert(Multimodal.parseJpegHeader(noSof.toByteArray).isEmpty)
  }

  test("parseWavHeader reads true fmt-chunk fields from a javax.sound WAV") {
    val mh = Multimodal.parseWavHeader(realWav(44100, 2, 256))
    assert(mh.contains(Multimodal.MediaHeader("wav", 44100, 2, 16)),
      s"expected 44100 Hz stereo 16-bit, got $mh")
    val mono = Multimodal.parseWavHeader(realWav(16000, 1, 64))
    assert(mono.contains(Multimodal.MediaHeader("wav", 16000, 1, 16)))
    // "RIFF"-prefixed text without a valid fmt chunk must not sniff as audio
    assert(Multimodal.parseWavHeader("RIFFxxxxWAVEnot a chunk stream at all".getBytes).isEmpty)
  }

  test("sniffHeader never throws: adversarial chunk sizes and seeded byte fuzz") {
    // the review-caught crash: a RIFF/WAVE payload whose first chunk
    // size is near Int.MaxValue wrapped an Int cursor negative -> AIOOBE
    val adversarial = {
      val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(56); b.put("WAVE".getBytes)
      b.put("junk".getBytes); b.putInt(0x7FFFFF00) // not-fmt chunk, huge size
      b.put(new Array[Byte](40))
      b.array()
    }
    assert(Multimodal.parseWavHeader(adversarial).isEmpty,
      "a huge chunk size must fall off the end, not crash")
    // seeded fuzz: arbitrary bytes (with RIFF/WAVE and PNG-signature
    // prefixes planted to exercise the deep parse paths) must always
    // return cleanly
    val rnd = new scala.util.Random(20260814L)
    (1 to 300).foreach { i =>
      val len = rnd.nextInt(200)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      if (i % 3 == 0 && len >= 12) {
        "RIFF".getBytes.copyToArray(bytes, 0)
        "WAVE".getBytes.copyToArray(bytes, 8)
      }
      if (i % 5 == 0 && len >= 8)
        Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
          .map(_.toByte).copyToArray(bytes, 0)
      if (i % 7 == 0 && len >= 4) // JPEG SOI planted: random marker stream
        Array(0xFF, 0xD8).map(_.toByte).copyToArray(bytes, 0)
      Multimodal.sniffHeader(bytes) // must not throw
    }
  }

  test("decodeFeatures surfaces real header dims for container payloads (Spark path)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val png = realPng(320, 200)
    val wav = realWav(22050, 1, 128)
    val raw = "plain raw bytes, no container".getBytes("UTF-8")
    val jpg = realJpeg(512, 288)
    val in = Seq((1L, png, "image"), (2L, wav, "audio"), (3L, raw, "image"), (4L, jpg, "image"))
      .toDF("doc_id", "payload", "modality")
      .select(col("doc_id"), col("payload"),
        struct(col("modality"),
          lit("application/octet-stream").as("mime"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          octet_length(col("payload")).as("n_bytes")).as("meta"))
    val rows = Multimodal.decodeFeaturesOf(in).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Int]("width") == 320 && rows(1L).getAs[Int]("height") == 200,
      "PNG payload must carry its true pixel dimensions")
    assert(rows(2L).getAs[Int]("width") == 22050 && rows(2L).getAs[Int]("height") == 1,
      "WAV payload must carry (sample_rate, channels)")
    assert(rows(3L).getAs[Int]("width") == raw.length % 1920 &&
      rows(3L).getAs[Int]("height") == raw.length % 1080,
      "raw payloads keep the deterministic fallback dims the mm2 oracle mirrors")
    assert(rows(4L).getAs[Int]("width") == 512 && rows(4L).getAs[Int]("height") == 288,
      "JPEG payload must carry its true SOF0 pixel dimensions")
  }
}
