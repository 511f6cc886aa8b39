package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("frame sampling: strided fixed-size frames with per-frame features") {
    import spark.implicits._
    // 10-byte payload, 4-byte frames, stride 2 -> frames 0 and 2 sampled
    // (frame 2 is the 2-byte tail)
    val payload = "aaaabbbbcc"
    val media = Seq(Multimodal.MediaRow(7L, payload.getBytes("UTF-8"), "text/plain")).toDS()
    val got = Multimodal.fakeFrameSample(spark, media, frameBytes = 4, stride = 2)
      .collect().map(f => (f.frame_idx, f.n_bytes)).toList.sorted
    assert(got == List((0L, 4L), (2L, 2L)))
  }

  test("real image codec: PNG/JPEG/GIF/BMP bytes encode and decode through the JDK") {
    import spark.implicits._
    // genuine container bytes: magic numbers prove the encoder is real
    val png = Multimodal.encodeImage(5, 3, 100, "png")
    assert(png.take(8).toSeq == Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), "PNG signature")
    val jpg = Multimodal.encodeImage(9, 4, 30, "jpeg")
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "JPEG SOI marker")
    // decode through the pipeline: dims exact for every format, mean gray
    // exact for the lossless ones
    val rows = Seq(
      Multimodal.ImageRow(1L, png, "png"),
      Multimodal.ImageRow(2L, jpg, "jpeg"),
      Multimodal.ImageRow(3L, Multimodal.encodeImage(2, 7, 255, "gif"), "gif"),
      Multimodal.ImageRow(4L, Multimodal.encodeImage(6, 6, 0, "bmp"), "bmp")).toDS()
    val got = Multimodal.decodeImages(spark, rows).collect()
      .map(m => m.doc_id -> ((m.width, m.height, m.mean_gray))).toMap
    assert(got(1L) == ((5L, 3L, 100L)))
    assert(got(2L) == ((9L, 4L, -1L)), "JPEG: lossless dims, mean by contract -1")
    assert(got(3L) == ((2L, 7L, 255L)))
    assert(got(4L) == ((6L, 6L, 0L)))
  }

  test("real audio codec: WAVE PCM round-trips rate/channels/frames/peak") {
    import spark.implicits._
    val wav = Multimodal.encodeWav(16000, 2, 250, 123)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "RIFF/WAVE header")
    val got = Multimodal.decodeAudio(spark,
      Seq(Multimodal.MediaBytesRow(9L, wav)).toDS()).collect().head
    assert(got.sample_rate == 16000L && got.channels == 2L &&
      got.n_frames == 250L && got.peak == 123L)
    assert(got.duration_us == 250L * 1000000L / 16000L)
  }

  test("real video demux: MJPEG-AVI chunk walk + JDK JPEG decode per sampled frame") {
    import spark.implicits._
    val avi = Multimodal.encodeAviMjpeg(8, 6, nFrames = 5, grayOf = i => 40 * i)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ", "RIFF/AVI header")
    val got = Multimodal.sampleAviFrames(spark,
        Seq(Multimodal.MediaBytesRow(3L, avi)).toDS(), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L),
      s"stride 2 over 5 frames samples 0/2/4: ${got.toSeq}")
    assert(got.forall(f => f.width == 8L && f.height == 6L && f.n_bytes > 0),
      s"every sampled frame decodes through the real JPEG reader: ${got.toSeq}")
  }

  test("corrupt RIFF fails LOUDLY naming the doc (never a silent skip)") {
    import spark.implicits._
    val junk = "RIFX not an avi at all".getBytes("US-ASCII")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleAviFrames(spark,
        Seq(Multimodal.MediaBytesRow(42L, junk)).toDS()).collect()
    }
    assert(e.getMessage.contains("42") || e.getCause.getMessage.contains("42"),
      s"error must name the doc: ${e.getMessage}")
  }

  test("mp4 (ISO-BMFF) metadata demux: box walk recovers dims/codec/duration/samples") {
    import spark.implicits._
    val mp4 = Multimodal.encodeMp4(width = 640, height = 360, timescale = 1000,
      durationUnits = 2400, nSamples = 60)
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp", "ftyp box leads")
    val got = Multimodal.demuxMp4Meta(spark,
      Seq(Multimodal.MediaBytesRow(5L, mp4)).toDS()).collect().toSeq
    assert(got == Seq(Multimodal.Mp4Meta(5L, "avc1", 640L, 360L, 60L,
      2400L * 1000000L / 1000L)))
    // corrupt container: loud per-doc error
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.demuxMp4Meta(spark, Seq(Multimodal.MediaBytesRow(77L,
        "definitely not an mp4 container".getBytes("US-ASCII"))).toDS()).collect()
    }
    assert(e.getMessage.contains("77") || e.getCause.getMessage.contains("77"))
  }

  test("webm (EBML) metadata demux: vint element walk recovers dims/codec/duration") {
    import spark.implicits._
    val webm = Multimodal.encodeWebm(width = 1280, height = 720,
      durationTs = 4000L)
    assert((webm(0) & 0xff) == 0x1A && (webm(1) & 0xff) == 0x45,
      "EBML magic leads")
    val got = Multimodal.demuxWebmMeta(spark,
      Seq(Multimodal.MediaBytesRow(6L, webm)).toDS()).collect().toSeq
    assert(got == Seq(Multimodal.WebmMeta(6L, "V_VP9", 1280L, 720L, 4000L,
      1000000L)))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.demuxWebmMeta(spark, Seq(Multimodal.MediaBytesRow(88L,
        Array[Byte](0x1A, 0x45))).toDS()).collect()
    }
    assert(e.getMessage.contains("88") || e.getCause.getMessage.contains("88"))
  }

  /** Independent dHash restatement from encodePatternImage's documented
    * pixel formula — no image, no codec, pure arithmetic. */
  private def dhashFromFormula(seed: Long, bump: Long, bumpMinX: Int,
      bumpMaxY: Int): Long = {
    def gray(x: Int, y: Int): Long = {
      val b = if (x >= bumpMinX && y < bumpMaxY) bump else 0L
      (seed * 31L + x * (7L + seed % 5L) + y * 13L + b) % 256L
    }
    def pool(r: Int, c: Int): Long =
      (gray(2 * c, 2 * r) + gray(2 * c + 1, 2 * r) +
        gray(2 * c, 2 * r + 1) + gray(2 * c + 1, 2 * r + 1)) / 4L
    var h = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      h = (h << 1) | (if (pool(r, c) < pool(r, c + 1)) 1L else 0L)
    h
  }

  test("dhash: PNG round trip reproduces the pure-arithmetic hash for many seeds") {
    import spark.implicits._
    val seeds = Seq(0L, 1L, 2L, 3L, 4L, 17L, 123L, 4999L)
    val rows = seeds.map(s => Multimodal.ImageRow(s,
      Multimodal.encodePatternImage(18, 16, s), "png")).toDS()
    val got = Multimodal.dhashImages(spark, rows)
      .collect().map(r => r.doc_id -> r.dhash).toMap
    seeds.foreach { s =>
      assert(got(s) == dhashFromFormula(s, 0L, Int.MaxValue, 0), s"seed=$s")
    }
  }

  test("dhash: the planted bump can only touch bits 7 and 15 (pool column 8, rows 0-1)") {
    import spark.implicits._
    val seeds = Seq(0L, 7L, 42L, 99L)
    val rows = seeds.flatMap(s => Seq(
      Multimodal.ImageRow(s, Multimodal.encodePatternImage(18, 16, s), "png"),
      Multimodal.ImageRow(s + 1000L,
        Multimodal.encodePatternImage(18, 16, s, bump = 96,
          bumpMinX = 16, bumpMaxY = 4), "png"))).toDS()
    val got = Multimodal.dhashImages(spark, rows)
      .collect().map(r => r.doc_id -> r.dhash).toMap
    seeds.foreach { s =>
      val diff = got(s) ^ got(s + 1000L)
      val allowed = (1L << (63 - 7)) | (1L << (63 - 15))
      assert((diff & ~allowed) == 0L,
        s"seed=$s: bump flipped bits outside column 7: ${diff.toBinaryString}")
      assert(got(s + 1000L) ==
        dhashFromFormula(s, 96L, 16, 4), s"twin formula parity, seed=$s")
    }
  }

  test("dhash refuses non-poolable dimensions loudly, naming the doc") {
    import spark.implicits._
    val rows = Seq(Multimodal.ImageRow(7L,
      Multimodal.encodePatternImage(17, 16, 7L), "png")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.dhashImages(spark, rows).collect()
    }
    assert(e.getCause.getMessage.contains("doc 7"))
  }

  test("acoustic hash: WAVE round trip reproduces the pure-arithmetic hash; bump touches only bit 63") {
    import spark.implicits._
    def fromFormula(seed: Long, bump: Long, bumpMin: Int): Long = {
      def s(i: Int): Long =
        (seed * 37L + i * (11L + seed % 7L)) % 2048L - 1024L +
          (if (i >= bumpMin) bump else 0L)
      def energy(w: Int): Long =
        (0 until 8).map(j => math.abs(s(w * 8 + j))).sum
      (0 until 64).foldLeft(0L)((h, w) =>
        (h << 1) | (if (energy(w) < energy(w + 1)) 1L else 0L))
    }
    val seeds = Seq(0L, 1L, 6L, 7L, 123L, 4999L)
    val rows = seeds.flatMap(s => Seq(
      Multimodal.MediaBytesRow(s, Multimodal.encodePatternWav(8000, 520, s)),
      Multimodal.MediaBytesRow(s + 1000L,
        Multimodal.encodePatternWav(8000, 520, s, bump = 400,
          bumpMinFrame = 512)))).toDS()
    val got = Multimodal.ahashAudio(spark, rows)
      .collect().map(r => r.doc_id -> r.dhash).toMap
    seeds.foreach { s =>
      assert(got(s) == fromFormula(s, 0L, Int.MaxValue), s"seed=$s")
      assert(got(s + 1000L) == fromFormula(s, 400L, 512), s"twin seed=$s")
      assert(((got(s) ^ got(s + 1000L)) & ~1L) == 0L,
        s"seed=$s: bump leaked past bit 63")
    }
  }

  test("acoustic hash refuses non-windowable or non-mono input loudly") {
    import spark.implicits._
    val badFrames = Seq(Multimodal.MediaBytesRow(9L,
      Multimodal.encodePatternWav(8000, 519, 9L))).toDS()
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.ahashAudio(spark, badFrames).collect()
    }
    assert(e1.getCause.getMessage.contains("doc 9"))
    val stereo = Seq(Multimodal.MediaBytesRow(11L,
      Multimodal.encodeWav(8000, 2, 520, 100))).toDS()
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.ahashAudio(spark, stereo).collect()
    }
    assert(e2.getCause.getMessage.contains("doc 11"))
  }

  test("temporal video hash: MJPEG round trip reproduces the gray-formula bits; twin bump stays in bit 63") {
    import spark.implicits._
    def g(seed: Long, bump: Long)(i: Int): Int =
      ((seed * 13L + i * 37L + (if (i == 64) bump else 0L)) % 240L + 8L).toInt
    def fromFormula(seed: Long, bump: Long): Long =
      (0 until 64).foldLeft(0L)((h, i) =>
        (h << 1) | (if (g(seed, bump)(i) < g(seed, bump)(i + 1)) 1L else 0L))
    val seeds = Seq(0L, 1L, 5L, 123L, 4999L)
    val rows = seeds.flatMap(s => Seq(
      Multimodal.MediaBytesRow(s, Multimodal.encodeAviMjpeg(8, 8, 65, g(s, 0L))),
      Multimodal.MediaBytesRow(s + 1000L,
        Multimodal.encodeAviMjpeg(8, 8, 65, g(s, 120L))))).toDS()
    val got = Multimodal.thashVideo(spark, rows)
      .collect().map(r => r.doc_id -> r.dhash).toMap
    seeds.foreach { s =>
      assert(got(s) == fromFormula(s, 0L), s"seed=$s: JPEG error flipped a bit")
      assert(got(s + 1000L) == fromFormula(s, 120L), s"twin seed=$s")
      assert(((got(s) ^ got(s + 1000L)) & ~1L) == 0L,
        s"seed=$s: last-frame bump leaked past bit 63")
    }
  }

  test("temporal video hash refuses a wrong frame count loudly, naming the doc") {
    import spark.implicits._
    val rows = Seq(Multimodal.MediaBytesRow(13L,
      Multimodal.encodeAviMjpeg(8, 8, 64, i => 8 + (i * 37) % 240))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.thashVideo(spark, rows).collect()
    }
    assert(e.getCause.getMessage.contains("doc 13"))
  }

  test("AVI walk refuses truncated and corrupt-size containers loudly, never AIOOBE/spin") {
    import spark.implicits._
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def bytes(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    val ascii = (s: String) => s.getBytes("US-ASCII")

    // truncated exactly after a top-level LIST fourcc+size header: the
    // old walk read the subtype fourcc past the array end
    val truncated = bytes(ascii("RIFF"), le32(12), ascii("AVI "),
      ascii("LIST"), le32(100))
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleAviFrames(spark,
        Seq(Multimodal.MediaBytesRow(91L, truncated)).toDS()).collect()
    }
    assert(e1.getCause.getMessage.contains("doc 91"), e1.getCause.getMessage)

    // negative declared size: the old walk's `off += 8 + size` went
    // backwards and spun forever
    val negative = bytes(ascii("RIFF"), le32(20), ascii("AVI "),
      ascii("LIST"), le32(-8), ascii("movi"))
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.thashVideo(spark,
        Seq(Multimodal.MediaBytesRow(92L, negative)).toDS()).collect()
    }
    assert(e2.getCause.getMessage.contains("corrupt chunk size") &&
      e2.getCause.getMessage.contains("doc 92"), e2.getCause.getMessage)
  }

  test("acoustic hash refuses big-endian (AIFF) input instead of mishashing it") {
    import spark.implicits._
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      true /* signed */, true /* bigEndian */)
    val n = 650
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](2 * n)), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.ahashAudio(spark,
        Seq(Multimodal.MediaBytesRow(93L, bos.toByteArray)).toDS()).collect()
    }
    // the little-endian hand decode must never run on BE samples
    assert(e.getCause.getMessage.contains("doc 93") &&
      e.getCause.getMessage.contains("BE"), e.getCause.getMessage)
  }

  test("poolFeatures: average-pooled buckets match hand computation") {
    import spark.implicits._
    val v = (1 to 8).map(_.toFloat) // pool 8 -> 2: (1+2+3+4)/4=2.5, (5+6+7+8)/4=6.5
    val got = Seq(Tuple1(v)).toDF("f")
      .select(Multimodal.poolFeatures(col("f"), 8, 2).as("p"))
      .as[Seq[Double]].head()
    assert(got == Seq(2.5, 6.5))
  }
}
