package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): media payloads are
  * opaque `binary` columns traveling next to typed metadata; decode /
  * feature-extraction runs per-partition so one task amortizes codec setup
  * over a whole batch (the Spark-side shape of an image/audio pipeline).
  *
  * IMAGE and AUDIO decode are REAL (r13): the JDK itself ships codecs —
  * `javax.imageio` reads/writes PNG, JPEG, GIF and BMP, and
  * `javax.sound.sampled` reads/writes RIFF/WAVE PCM — so
  * [[decodeImages]] / [[decodeAudio]] run genuine byte-level
  * encode/decode with zero external dependencies, executor-side, one
  * shared codec registry per task. VIDEO demux is real too: MJPEG-AVI
  * chunk-walking with per-frame JDK JPEG decode ([[sampleAviFrames]],
  * r13), and mp4/webm METADATA demux by ISO-BMFF box / EBML element
  * walking ([[demuxMp4Meta]] / [[demuxWebmMeta]], r14 — duration, track
  * dims, codec id, sample count: container arithmetic, no codec needed).
  * The ONLY remaining stub is frame DECODE for codecs the JDK lacks
  * (H.264/VP9/webp/opus — absent from this container):
  * [[fakeDecodeFeatures]] / [[fakeFrameSample]] keep that fan-out shape,
  * clearly marked. A platform bound, not an engine gap.
  */
object Multimodal {

  // ImageIO must never try to touch a display; decode/encode of raster
  // formats is fully headless-safe once this is set
  System.setProperty("java.awt.headless", "true")

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Float])

  /** Attach a binary media column (here: UTF-8 bytes standing in for an
    * encoded image/audio blob) plus typed metadata. */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit("text/plain").as("media_type"))

  /** Input-split-independent fan-out for the heavy per-row codec stages:
    * their parallelism otherwise inherits the INPUT split count, and a
    * single multi-GB file (documents.parquet is one 594 KB file at bench
    * scale; one giant archive at 100 TB) serializes the whole decode stage
    * through one task. `fanOut > 0` forces a round-robin repartition to
    * exactly that many tasks ahead of the decode — one narrow shuffle of
    * the raw bytes, bought back many times over by parallel codec CPU.
    * `fanOut == 0` (the default) keeps the input splits untouched, so
    * existing plans and bench numbers are unchanged. */
  private[graft] def fanned[T](rows: Dataset[T], fanOut: Int): Dataset[T] = {
    require(fanOut >= 0, s"fanOut must be >= 0, got $fanOut")
    if (fanOut > 0) rows.repartition(fanOut) else rows
  }

  /** STUB decode + feature extraction for NON-JDK codecs (webp/opus/…,
    * whose libraries are absent from this container): features are a
    * deterministic function of the bytes (length + 8 byte-histogram
    * buckets), while the Spark plumbing — typed Dataset, mapPartitions
    * batch shape, schema — is real and tested. For formats the JDK itself
    * decodes, use the REAL paths: [[decodeImages]] / [[decodeAudio]].
    */
  def fakeDecodeFeatures(spark: SparkSession, media: Dataset[MediaRow],
      fanOut: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    fanned(media, fanOut).mapPartitions { rows =>
      // per-partition init of the (stub) "codec" happens once here
      rows.map { r =>
        val hist = new Array[Float](8)
        var i = 0
        while (i < r.media.length) { hist((r.media(i) & 0xff) >> 5) += 1f; i += 1 }
        MediaFeatures(r.doc_id, r.media.length.toLong, hist)
      }
    }
  }

  final case class FrameFeatures(doc_id: Long, frame_idx: Long, n_bytes: Long,
      features: Array[Float])

  /** STUB frame sampling: the payload is treated as consecutive fixed-size
    * "frames" (a real implementation would run a video demuxer per
    * partition, amortized like the decoder above); every `stride`-th frame
    * is decoded into the same 8-bucket byte-histogram features. The fan-out
    * shape (one input row -> many frame rows via an iterator, no
    * materialized intermediate collection per doc) is the real contract for
    * a 100 TB video corpus. */
  def fakeFrameSample(spark: SparkSession, media: Dataset[MediaRow],
      frameBytes: Int = 64, stride: Int = 2,
      fanOut: Int = 0): Dataset[FrameFeatures] = {
    import spark.implicits._
    fanned(media, fanOut).mapPartitions { rows =>
      rows.flatMap { r =>
        // ceil: the trailing partial frame is still a frame
        val nFrames = math.max(1, (r.media.length + frameBytes - 1) / frameBytes)
        Iterator.range(0, nFrames, stride).map { fi =>
          val start = fi * frameBytes
          val end = math.min(start + frameBytes, r.media.length)
          val hist = new Array[Float](8)
          var i = start
          while (i < end) { hist((r.media(i) & 0xff) >> 5) += 1f; i += 1 }
          FrameFeatures(r.doc_id, fi.toLong, (end - start).toLong, hist)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL image codec path (JDK javax.imageio — PNG/JPEG/GIF/BMP)

  /** Encode a constant-gray `width`×`height` raster as real `format`
    * ("png" | "jpeg" | "gif" | "bmp") bytes — the deterministic test
    * corpus generator for the decode pipeline (a production pipeline
    * reads its binary column from storage instead). */
  // per-THREAD codec plugin caches: every ImageIO.read/write scans the
  // JVM-global, lock-synchronized plugin registry, so per-row codec calls
  // pay a registry scan each, and CONCURRENT tasks serialize on the
  // registry locks (measured: a 32-way local fan-out of the AVI decode ran
  // slower than one task). A thread-cached reader/writer touches the
  // registry once per (task thread, format); the codec work itself is then
  // lock-free. ImageReader/Writer instances are not thread-safe — exactly
  // why the cache key is the thread.
  private val readerCache =
    ThreadLocal.withInitial[java.util.HashMap[String, javax.imageio.ImageReader]](
      () => new java.util.HashMap())
  private val writerCache =
    ThreadLocal.withInitial[java.util.HashMap[String, javax.imageio.ImageWriter]](
      () => new java.util.HashMap())
  private[ops] def cachedReader(format: String): javax.imageio.ImageReader = {
    val m = readerCache.get()
    var r = m.get(format)
    if (r == null) {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName(format)
      require(it.hasNext, s"no JDK reader for image format '$format'")
      r = it.next(); m.put(format, r)
    }
    r
  }
  private def cachedWriter(format: String): javax.imageio.ImageWriter = {
    val m = writerCache.get()
    var w = m.get(format)
    if (w == null) {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName(format)
      require(it.hasNext, s"no JDK writer for image format '$format'")
      w = it.next(); m.put(format, w)
    }
    w
  }

  def encodeImage(width: Int, height: Int, gray: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (gray & 0xff) * 0x010101
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val w = cachedWriter(format)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { w.setOutput(ios); w.write(img) } finally { ios.close() }
    bos.toByteArray
  }

  /** Deterministic per-pixel PATTERN image — the generator twin for the
    * perceptual-hash oracles ([[dhashImages]]): every pixel derives from
    * arithmetic the oracle can restate, so the PNG encode → decode → pool
    * → compare chain is hash-gated end to end. Gray value:
    * `(seed*31 + x*(7 + seed%5) + y*13 + bump?) % 256`, where the bump
    * adds `bump` on pixels with `x >= bumpMinX && y < bumpMaxY` (a planted
    * localized perturbation — a near-duplicate at a provably bounded
    * Hamming distance). The per-seed x-slope (`7 + seed%5`) matters:
    * a seed-independent slope would make adjacent-pixel COMPARISONS —
    * exactly what dHash measures — identical across all seeds. */
  def encodePatternImage(width: Int, height: Int, seed: Long,
      bump: Int = 0, bumpMinX: Int = Int.MaxValue, bumpMaxY: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val slope = 7L + seed % 5L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val lin = seed * 31L + x * slope + y * 13L +
          (if (x >= bumpMinX && y < bumpMaxY) bump.toLong else 0L)
        val g = (lin % 256L).toInt
        img.setRGB(x, y, g * 0x010101)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val w = cachedWriter("png")
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { w.setOutput(ios); w.write(img) } finally { ios.close() }
    bos.toByteArray
  }

  final case class DhashRow(doc_id: Long, dhash: Long)

  /** Perceptual dHash (r17) — the difference hash the image-dedup family
    * keys on: decode (REAL ImageIO), average-pool the red channel to a
    * 9×8 grid in exact integer arithmetic (requires width % 9 == 0 and
    * height % 8 == 0 so pooling is a whole-pixel floor mean — loud
    * refusal otherwise; production images hit a resize first), then one
    * bit per adjacent-pool comparison (`pool(r,c) < pool(r,c+1)`), packed
    * row-major MSB-first (bit for (r,c) sits at 63 − (r*8+c)). Gradients
    * and re-encodes survive (comparisons, not values); per-partition
    * decode, shuffle-free. Pairing rides [[graft.ops.Dedup.hammingPairs]]
    * — the same pigeonhole block join SimHash uses. */
  def dhashImages(spark: SparkSession, rows: Dataset[ImageRow],
      fanOut: Int = 0): Dataset[DhashRow] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      it.map { r =>
        val reader = cachedReader(r.format)
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.media))
        reader.setInput(iis)
        val img =
          try reader.read(0)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"undecodable ${r.format} payload for doc ${r.doc_id}", e)
          } finally iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        require(w % 9 == 0 && h % 8 == 0,
          s"dhash needs width % 9 == 0 and height % 8 == 0 for exact " +
            s"pooling, got ${w}x$h for doc ${r.doc_id}")
        val bw = w / 9
        val bh = h / 8
        val pool = Array.ofDim[Long](8, 9)
        var pr = 0
        while (pr < 8) {
          var pc = 0
          while (pc < 9) {
            var sum = 0L
            var dy = 0
            while (dy < bh) {
              var dx = 0
              while (dx < bw) {
                sum += (img.getRGB(pc * bw + dx, pr * bh + dy) >> 16) & 0xff
                dx += 1
              }
              dy += 1
            }
            pool(pr)(pc) = sum / (bw.toLong * bh)
            pc += 1
          }
          pr += 1
        }
        var hash = 0L
        pr = 0
        while (pr < 8) {
          var pc = 0
          while (pc < 8) {
            hash = (hash << 1) | (if (pool(pr)(pc) < pool(pr)(pc + 1)) 1L else 0L)
            pc += 1
          }
          pr += 1
        }
        DhashRow(r.doc_id, hash)
      }
    }
  }

  final case class ImageRow(doc_id: Long, media: Array[Byte], format: String)
  /** `mean_gray` = rounded mean of the red channel over every pixel; −1
    * for formats whose lossy quantization makes it non-derivable (JPEG —
    * dimensions are still lossless there). */
  final case class ImageMeta(doc_id: Long, format: String, width: Long,
      height: Long, mean_gray: Long)

  /** REAL decode: `ImageIO.read` per row, per-partition (the reader
    * registry is JVM-global, so one task amortizes codec lookup over its
    * whole batch). Yields dimensions for every JDK-readable format and the
    * exact mean gray for lossless ones. */
  def decodeImages(spark: SparkSession, rows: Dataset[ImageRow],
      fanOut: Int = 0): Dataset[ImageMeta] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      it.map { r =>
        // thread-cached reader keyed by the row's declared format — one
        // registry scan per (thread, format) instead of per row, and no
        // global-lock serialization across concurrent decode tasks
        val reader = cachedReader(r.format)
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.media))
        reader.setInput(iis)
        val img =
          try reader.read(0)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"undecodable ${r.format} payload for doc ${r.doc_id}", e)
          } finally iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        val mean =
          if (r.format == "jpeg") -1L
          else {
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
              y += 1
            }
            sum / (w.toLong * h)
          }
        ImageMeta(r.doc_id, r.format, w.toLong, h.toLong, mean)
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL video path: MJPEG-in-AVI — the RIFF container grammar (same
  // family as WAVE) carrying one genuine JPEG per frame, so DEMUX is
  // honest chunk-walking and per-frame DECODE is the JDK's real JPEG
  // codec. No external libraries; only non-RIFF containers (mp4/webm)
  // remain out of reach ([[fakeFrameSample]] keeps their fan-out shape).

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** Encode `nFrames` constant-gray frames as a structurally valid MJPEG
    * AVI (RIFF avih/strh/strf headers + a movi LIST of `00dc` JPEG
    * chunks, word-aligned) — the deterministic corpus generator for the
    * demux pipeline. */
  def encodeAviMjpeg(width: Int, height: Int, nFrames: Int,
      grayOf: Int => Int, fps: Int = 10): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      fourcc(id) ++ le32(body.length) ++ padded
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(kind) ++ body
    val frames = (0 until nFrames).map { i =>
      encodeImage(width, height, grayOf(i), "jpeg")
    }
    // minimal-but-correct headers: avih (main header, 14 dwords), one
    // video stream's strh (56 bytes) + strf (BITMAPINFOHEADER, 'MJPG')
    val avih = chunk("avih", le32(1000000 / fps) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(-1) ++ le32(0) ++
      Array[Byte](0, 0, 0, 0, width.toShort.toByte, (width >> 8).toByte,
        height.toShort.toByte, (height >> 8).toByte))
    val strf = chunk("strf", le32(40) ++ le32(width) ++ le32(height) ++
      Array[Byte](1, 0, 24, 0) ++ fourcc("MJPG") ++
      le32(width * height * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Long, width: Long,
      height: Long, n_bytes: Long)

  /** Shared RIFF/AVI walk for every MJPEG consumer: validate the header,
    * find the `movi` LIST, and return a LAZY iterator of `(frameIdx,
    * start, size)` for its `00dc` chunks. Bounds and sizes are validated
    * loudly — a truncated container or a corrupt (negative / overrunning)
    * chunk size refuses naming the doc, never an
    * ArrayIndexOutOfBoundsException and never a backwards-`off` spin. */
  private def aviMjpegChunks(b: Array[Byte], doc: Long)
      : Iterator[(Long, Int, Int)] = {
    def u32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def cc(off: Int): String = {
      require(off + 4 <= b.length, s"doc $doc: truncated AVI at offset $off")
      new String(b, off, 4, "US-ASCII")
    }
    require(b.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      s"doc $doc: not an AVI")
    // top-level chunk walk to the movi LIST — in LONG arithmetic: a
    // crafted size near Int.MaxValue must end the walk (or refuse), never
    // wrap `off` negative and index the array at a huge negative offset
    var off = 12L
    var movi = -1
    var moviEnd = -1
    while (movi < 0 && off + 8 <= b.length) {
      val size = u32(off.toInt + 4)
      require(size >= 0, s"doc $doc: corrupt chunk size $size at offset $off")
      if (cc(off.toInt) == "LIST" && off + 12 <= b.length &&
          cc(off.toInt + 8) == "movi") {
        movi = off.toInt + 12
        // clamp: a declared size overrunning the buffer bounds the walk,
        // it must not carry reads past the array
        moviEnd = math.min(off + 8L + size, b.length.toLong).toInt
      }
      off += 8L + size + (size & 1)
    }
    require(movi >= 0, s"doc $doc: no movi list")
    val mEnd = moviEnd
    new Iterator[(Long, Int, Int)] {
      private var p = movi
      private var fi = 0L
      private var nextC: (Long, Int, Int) = advance()
      private def advance(): (Long, Int, Int) = {
        while (p + 8 <= mEnd) {
          val id = cc(p); val size = u32(p + 4)
          // bounded by the movi LIST itself, not the whole buffer — a
          // size carrying reads into trailing chunks (idx1) is corrupt
          require(size >= 0 && p + 8L + size <= mEnd,
            s"doc $doc: corrupt frame chunk size $size at offset $p")
          val start = p + 8
          p += 8 + size + (size & 1)
          if (id == "00dc") {
            val out = (fi, start, size)
            fi += 1
            return out
          }
        }
        null
      }
      override def hasNext: Boolean = nextC != null
      override def next(): (Long, Int, Int) = {
        val out = nextC; nextC = advance(); out
      }
    }
  }

  /** REAL frame sampling: walk the RIFF tree to the `movi` LIST, iterate
    * its `00dc` chunks, decode every `stride`-th frame through the JDK
    * JPEG reader. One input row fans out to its sampled frames via an
    * iterator — the same no-materialized-intermediate contract as the
    * stub, now over genuine container bytes. */
  def sampleAviFrames(spark: SparkSession, rows: Dataset[MediaBytesRow],
      stride: Int = 2, fanOut: Int = 0): Dataset[VideoFrame] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      // thread-cached JPEG reader (see the cache comment above): one
      // registry scan per task thread, lock-free decode per frame
      val jpegReader = cachedReader("jpeg")
      it.flatMap { r =>
        val b = r.media
        aviMjpegChunks(b, r.doc_id).collect {
          case (idx, start, size) if idx % stride == 0 =>
            // MemoryCacheImageInputStream directly: ImageIO
            // .createImageInputStream would hit the global registry
            // for a stream SPI lookup on every frame
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(b, start, size))
            jpegReader.setInput(iis)
            val img =
              try jpegReader.read(0)
              catch {
                case e: Exception => throw new IllegalArgumentException(
                  s"doc ${r.doc_id}: undecodable frame $idx", e)
              } finally iis.close()
            VideoFrame(r.doc_id, idx, img.getWidth.toLong,
              img.getHeight.toLong, size.toLong)
        }
      }
    }
  }

  /** Temporal difference hash (r17) — the VIDEO member of the perceptual-
    * dedup family ([[dhashImages]] spatial, [[ahashAudio]] acoustic):
    * demux the MJPEG-AVI `movi` list (the same honest chunk walk as
    * [[sampleAviFrames]]), decode EVERY frame through the JDK JPEG codec,
    * take each frame's mean red level (exact integer floor), and emit one
    * bit per adjacent-FRAME mean comparison — the scene-progression
    * signature that survives constant brightness shifts and re-encodes.
    * Requires exactly 65 frames (loud refusal; production video hits a
    * frame sampler first). On [[encodeAviMjpeg]] pattern videos whose
    * inter-frame gray deltas are ≥ 37 levels, JPEG's flat-field
    * reconstruction error (a few levels of DC quantization + color
    * rounding) can never flip a comparison, so the bits equal the frame-
    * formula comparisons the oracle restates. Per-partition decode,
    * shuffle-free; pairing rides [[graft.ops.Dedup.hammingPairs]]. */
  def thashVideo(spark: SparkSession, rows: Dataset[MediaBytesRow],
      fanOut: Int = 0): Dataset[DhashRow] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      val jpegReader = cachedReader("jpeg")
      it.map { r =>
        val b = r.media
        val means = scala.collection.mutable.ArrayBuffer.empty[Long]
        aviMjpegChunks(b, r.doc_id).foreach { case (idx, start, size) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(b, start, size))
          jpegReader.setInput(iis)
          val img =
            try jpegReader.read(0)
            catch {
              case e: Exception => throw new IllegalArgumentException(
                s"doc ${r.doc_id}: undecodable frame $idx", e)
            } finally iis.close()
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
          means += sum / (w.toLong * h)
        }
        require(means.size == 65,
          s"temporal hash needs exactly 65 frames, got ${means.size} " +
            s"for doc ${r.doc_id}")
        var hash = 0L
        var i = 0
        while (i < 64) {
          hash = (hash << 1) | (if (means(i) < means(i + 1)) 1L else 0L)
          i += 1
        }
        DhashRow(r.doc_id, hash)
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL mp4 (ISO-BMFF) METADATA demux (r14): box walking needs NO codec —
  // duration, track dimensions, codec fourcc, and sample counts are pure
  // container arithmetic, exactly what a multimodal pipeline FILTERS on
  // (resolution/duration gates) before ever paying a decode. Frame DECODE
  // for these containers stays platform-bound (no H.264/VP9 in the JDK,
  // [[fakeDecodeFeatures]] keeps that shape); the demux below is honest
  // byte-level parsing, same discipline as the AVI walker above.

  private def be32(v: Int): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** Encode a structurally valid single-track ISO-BMFF (mp4) file:
    * ftyp + moov(mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stsd +
    * stsz))))) + a token mdat — the deterministic corpus generator for the
    * demux pipeline. Dimensions ride tkhd as 16.16 fixed point, duration
    * rides mdhd in `timescale` units, the sample count rides stsz, the
    * codec fourcc is the stsd entry type. */
  def encodeMp4(width: Int, height: Int, timescale: Int, durationUnits: Int,
      nSamples: Int, codec: String = "avc1"): Array[Byte] = {
    def box(tp: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8) ++ fourcc(tp) ++ body
    val ftyp = box("ftyp",
      fourcc("isom") ++ be32(512) ++ fourcc("isom") ++ fourcc("mp42"))
    // mvhd v0: verflags, create, modify, timescale, duration, rate, volume,
    // reserved(10), matrix(36), predefined(24), next_track_ID
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(durationUnits) ++ be32(0x00010000) ++
      Array[Byte](1, 0) ++ new Array[Byte](10) ++ identityMatrix ++
      new Array[Byte](24) ++ be32(2))
    // tkhd v0: verflags(flags=3: enabled|in-movie), create, modify,
    // track_ID, reserved, duration, reserved(8), layer, alt_group, volume,
    // reserved, matrix(36), width/height as 16.16
    val tkhd = box("tkhd", be32(3) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(durationUnits) ++ new Array[Byte](8) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++ identityMatrix ++
      be32(width << 16) ++ be32(height << 16))
    val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(durationUnits) ++
      Array[Byte](0x55, (0xc4 & 0xff).toByte, 0, 0)) // und language + predef
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ fourcc("vide") ++
      new Array[Byte](12) ++ Array[Byte](0))
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      (be32(16) ++ fourcc(codec) ++ new Array[Byte](8)))
    val stsz = box("stsz", be32(0) ++ be32(1) ++ be32(nSamples))
    val stbl = box("stbl", stsd ++ stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", Array[Byte](0, 0, 0, 0))
    ftyp ++ moov ++ mdat
  }

  private def identityMatrix: Array[Byte] =
    be32(0x00010000) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000)

  final case class Mp4Meta(doc_id: Long, codec: String, width: Long,
      height: Long, n_samples: Long, duration_us: Long)

  /** REAL demux: walk the box tree (moov → trak → tkhd/mdia → mdhd/hdlr/
    * minf → stbl → stsd/stsz), one output row per track — duration in
    * microseconds from the media timescale, dimensions from tkhd's 16.16
    * fields, codec from the first stsd entry, sample count from stsz.
    * Malformed containers fail LOUDLY naming the doc. Per-partition,
    * iterator fan-out, zero shuffles — the AVI walker's contract. */
  def demuxMp4Meta(spark: SparkSession, rows: Dataset[MediaBytesRow],
      fanOut: Int = 0): Dataset[Mp4Meta] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      it.flatMap { r =>
        val b = r.media
        def u32(off: Int): Long =
          ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
            ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
        def cc(off: Int): String = new String(b, off, 4, "US-ASCII")
        // children of the box spanning [off, end): (type, payloadOff, payloadEnd)
        def boxes(off: Int, end: Int): Iterator[(String, Int, Int)] =
          new Iterator[(String, Int, Int)] {
            private var p = off
            override def hasNext: Boolean = p + 8 <= end
            override def next(): (String, Int, Int) = {
              val size = u32(p)
              require(size >= 8 && p + size <= end,
                s"doc ${r.doc_id}: corrupt box size $size at offset $p")
              val out = (cc(p + 4), p + 8, p + size.toInt)
              p += size.toInt
              out
            }
          }
        def find(off: Int, end: Int, tp: String): Option[(Int, Int)] =
          boxes(off, end).collectFirst { case (`tp`, s, e) => (s, e) }
        val (moovS, moovE) = find(0, b.length, "moov").getOrElse(
          throw new IllegalArgumentException(s"doc ${r.doc_id}: no moov box"))
        boxes(moovS, moovE).collect { case ("trak", ts, te) =>
          val (tkS, _) = find(ts, te, "tkhd").getOrElse(
            throw new IllegalArgumentException(s"doc ${r.doc_id}: trak without tkhd"))
          val width = u32(tkS + 76) >> 16
          val height = u32(tkS + 80) >> 16
          val (mdS, mdE) = find(ts, te, "mdia").getOrElse(
            throw new IllegalArgumentException(s"doc ${r.doc_id}: trak without mdia"))
          val (mhS, _) = find(mdS, mdE, "mdhd").getOrElse(
            throw new IllegalArgumentException(s"doc ${r.doc_id}: mdia without mdhd"))
          val timescale = u32(mhS + 12)
          val duration = u32(mhS + 16)
          val (mnS, mnE) = find(mdS, mdE, "minf").getOrElse(
            throw new IllegalArgumentException(s"doc ${r.doc_id}: mdia without minf"))
          val (sbS, sbE) = find(mnS, mnE, "stbl").getOrElse(
            throw new IllegalArgumentException(s"doc ${r.doc_id}: minf without stbl"))
          val (sdS, _) = find(sbS, sbE, "stsd").getOrElse(
            throw new IllegalArgumentException(s"doc ${r.doc_id}: stbl without stsd"))
          val codec = cc(sdS + 12) // first entry: size(4) then fourcc
          val nSamples = find(sbS, sbE, "stsz")
            .map { case (s, _) => u32(s + 8) }.getOrElse(-1L)
          Mp4Meta(r.doc_id, codec, width, height, nSamples,
            duration * 1000000L / timescale)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL webm (EBML/Matroska) METADATA demux (r14): element walking —
  // variable-length ids/sizes instead of fixed boxes, same no-codec
  // container arithmetic.

  private def ebmlSize(n: Int): Array[Byte] = {
    // 4-byte size vint (marker 0x10 in the first byte): bounded but ample
    // for generated metadata bodies (< 2^28)
    require(n < (1 << 28), "ebml size out of encodable range")
    Array[Byte]((0x10 | (n >>> 24)).toByte, (n >>> 16).toByte,
      (n >>> 8).toByte, n.toByte)
  }
  private def ebmlEl(id: Array[Byte], body: Array[Byte]): Array[Byte] =
    id ++ ebmlSize(body.length) ++ body
  private def ebmlUint(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    (0 until len).map(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte).toArray
  }

  /** Encode a structurally valid single-track webm skeleton: EBML header
    * (DocType "webm") + Segment(Info(TimestampScale, Duration) +
    * Tracks(TrackEntry(TrackNumber, TrackType, CodecID, Video(PixelWidth,
    * PixelHeight)))) — the deterministic corpus generator for the demux. */
  def encodeWebm(width: Int, height: Int, durationTs: Long,
      timestampScaleNs: Long = 1000000L, codec: String = "V_VP9"): Array[Byte] = {
    val header = ebmlEl(Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte),
      ebmlEl(Array[Byte](0x42, 0x82.toByte), "webm".getBytes("US-ASCII")))
    val info = ebmlEl(Array[Byte](0x15, 0x49, 0xA9.toByte, 0x66),
      ebmlEl(Array[Byte](0x2A, 0xD7.toByte, 0xB1.toByte),
        ebmlUint(timestampScaleNs)) ++
      ebmlEl(Array[Byte](0x44, 0x89.toByte), {
        val bits = java.lang.Double.doubleToLongBits(durationTs.toDouble)
        (0 until 8).map(i => ((bits >>> (8 * (7 - i))) & 0xff).toByte).toArray
      }))
    val video = ebmlEl(Array[Byte](0xE0.toByte),
      ebmlEl(Array[Byte](0xB0.toByte), ebmlUint(width.toLong)) ++
      ebmlEl(Array[Byte](0xBA.toByte), ebmlUint(height.toLong)))
    val entry = ebmlEl(Array[Byte](0xAE.toByte),
      ebmlEl(Array[Byte](0xD7.toByte), ebmlUint(1L)) ++
      ebmlEl(Array[Byte](0x83.toByte), ebmlUint(1L)) ++
      ebmlEl(Array[Byte](0x86.toByte), codec.getBytes("US-ASCII")) ++
      video)
    val tracks = ebmlEl(Array[Byte](0x16, 0x54, 0xAE.toByte, 0x6B), entry)
    val segment = ebmlEl(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67),
      info ++ tracks)
    header ++ segment
  }

  final case class WebmMeta(doc_id: Long, codec: String, width: Long,
      height: Long, duration_ts: Long, timescale_ns: Long)

  /** REAL demux: general EBML vint reader (ids keep their marker, sizes
    * strip it), recursive descent through Segment → Info/Tracks →
    * TrackEntry → Video, one row per track entry. Malformed streams fail
    * LOUDLY naming the doc. */
  def demuxWebmMeta(spark: SparkSession, rows: Dataset[MediaBytesRow],
      fanOut: Int = 0): Dataset[WebmMeta] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      it.flatMap { r =>
        val b = r.media
        // (value, bytesConsumed); keepMarker for IDs
        def vint(off: Int, keepMarker: Boolean): (Long, Int) = {
          require(off < b.length, s"doc ${r.doc_id}: truncated EBML vint")
          val first = b(off) & 0xff
          require(first != 0, s"doc ${r.doc_id}: invalid EBML vint at $off")
          val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
          require(off + len <= b.length, s"doc ${r.doc_id}: truncated EBML vint")
          var v = (if (keepMarker) first else first & ((1 << (8 - len)) - 1)).toLong
          var i = 1
          while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
          (v, len)
        }
        def uintAt(off: Int, end: Int): Long = {
          var v = 0L; var i = off
          while (i < end) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
          v
        }
        // elements of [off, end): (id, bodyOff, bodyEnd)
        def els(off: Int, end: Int): Iterator[(Long, Int, Int)] =
          new Iterator[(Long, Int, Int)] {
            private var p = off
            override def hasNext: Boolean = p < end
            override def next(): (Long, Int, Int) = {
              val (id, n1) = vint(p, keepMarker = true)
              val (sz, n2) = vint(p + n1, keepMarker = false)
              val bodyOff = p + n1 + n2
              require(bodyOff + sz <= end,
                s"doc ${r.doc_id}: EBML element overruns its parent at $p")
              p = bodyOff + sz.toInt
              (id, bodyOff, bodyOff + sz.toInt)
            }
          }
        def find(off: Int, end: Int, id: Long): Option[(Int, Int)] =
          els(off, end).collectFirst { case (`id`, s, e) => (s, e) }
        val (segS, segE) = find(0, b.length, 0x18538067L).getOrElse(
          throw new IllegalArgumentException(s"doc ${r.doc_id}: no Segment"))
        val (infoS, infoE) = find(segS, segE, 0x1549A966L).getOrElse(
          throw new IllegalArgumentException(s"doc ${r.doc_id}: no Info"))
        val tsScale = find(infoS, infoE, 0x2AD7B1L)
          .map { case (s, e) => uintAt(s, e) }.getOrElse(1000000L)
        val durTs = find(infoS, infoE, 0x4489L).map { case (s, e) =>
          require(e - s == 8 || e - s == 4,
            s"doc ${r.doc_id}: Duration must be a float")
          if (e - s == 8) java.lang.Double.longBitsToDouble(uintAt(s, e)).toLong
          else java.lang.Float.intBitsToFloat(uintAt(s, e).toInt).toLong
        }.getOrElse(-1L)
        val (trS, trE) = find(segS, segE, 0x1654AE6BL).getOrElse(
          throw new IllegalArgumentException(s"doc ${r.doc_id}: no Tracks"))
        els(trS, trE).collect { case (0xAEL, es, ee) =>
          val codec = find(es, ee, 0x86L)
            .map { case (s, e) => new String(b, s, e - s, "US-ASCII") }
            .getOrElse("")
          val (w, h) = find(es, ee, 0xE0L).map { case (vs, ve) =>
            (find(vs, ve, 0xB0L).map { case (s, e) => uintAt(s, e) }.getOrElse(-1L),
              find(vs, ve, 0xBAL).map { case (s, e) => uintAt(s, e) }.getOrElse(-1L))
          }.getOrElse((-1L, -1L))
          WebmMeta(r.doc_id, codec, w, h, durTs, tsScale)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL audio codec path (JDK javax.sound.sampled — RIFF/WAVE PCM)

  /** Encode `nFrames` frames of constant-amplitude 16-bit little-endian
    * PCM at `sampleRate` Hz × `channels` as a real WAVE file. */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int,
      amplitude: Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < pcm.length) {
      pcm(i) = (amplitude & 0xff).toByte
      pcm(i + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 2
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic PATTERN audio — the generator twin for the acoustic-
    * fingerprint oracles ([[ahashAudio]]): mono 16-bit PCM whose every
    * sample derives from arithmetic the oracle can restate:
    * `s(i) = ((seed*37 + i*(11 + seed%7)) % 2048) − 1024`, plus `bump`
    * on frames `i >= bumpMinFrame` (a planted localized perturbation).
    * The per-seed slope varies the sawtooth period per document. */
  def encodePatternWav(sampleRate: Int, nFrames: Int, seed: Long,
      bump: Int = 0, bumpMinFrame: Int = Int.MaxValue): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val slope = 11L + seed % 7L
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = ((seed * 37L + i * slope) % 2048L - 1024L +
        (if (i >= bumpMinFrame) bump.toLong else 0L)).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Acoustic difference hash (r17) — the audio member of the perceptual-
    * dedup family ([[dhashImages]] is the image member): REAL WAVE decode,
    * the mono 16-bit PCM body split into 65 equal windows (requires
    * `nFrames % 65 == 0` — loud refusal; production audio hits a resample
    * first), per-window energy = Σ|sample| in exact integer arithmetic,
    * one bit per adjacent-window comparison (`energy(w) < energy(w+1)`),
    * packed row-major MSB-first. Energy COMPARISONS survive constant gain
    * and re-encodes the way dHash survives brightness; pairing rides
    * [[graft.ops.Dedup.hammingPairs]]. Per-partition decode, shuffle-free. */
  def ahashAudio(spark: SparkSession, rows: Dataset[MediaBytesRow],
      fanOut: Int = 0): Dataset[DhashRow] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val f = ais.getFormat
        require(f.getChannels == 1 && f.getSampleSizeInBits == 16,
          s"acoustic hash needs mono 16-bit PCM, got ${f.getChannels}ch/" +
            s"${f.getSampleSizeInBits}bit for doc ${r.doc_id}")
        // the hand decode below is little-endian SIGNED — big-endian
        // (AIFF) or unsigned PCM would silently yield garbage energies
        // and a valid-looking hash instead of the loud refusal
        require(f.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            !f.isBigEndian,
          s"acoustic hash needs little-endian PCM_SIGNED, got " +
            s"${f.getEncoding}/${if (f.isBigEndian) "BE" else "LE"} " +
            s"for doc ${r.doc_id}")
        val body = ais.readAllBytes()
        val nFrames = body.length / 2
        require(nFrames % 65 == 0,
          s"acoustic hash needs frame count % 65 == 0 for exact windowing," +
            s" got $nFrames for doc ${r.doc_id}")
        val win = nFrames / 65
        val energy = new Array[Long](65)
        var w = 0
        while (w < 65) {
          var sum = 0L
          var i = 0
          while (i < win) {
            val off = 2 * (w * win + i)
            val s = ((body(off) & 0xff) | (body(off + 1) << 8)).toShort
            sum += math.abs(s.toLong)
            i += 1
          }
          energy(w) = sum
          w += 1
        }
        var hash = 0L
        w = 0
        while (w < 64) {
          hash = (hash << 1) | (if (energy(w) < energy(w + 1)) 1L else 0L)
          w += 1
        }
        DhashRow(r.doc_id, hash)
      }
    }
  }

  final case class MediaBytesRow(doc_id: Long, media: Array[Byte])
  final case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
      n_frames: Long, duration_us: Long, peak: Long)

  /** REAL decode: `AudioSystem.getAudioInputStream` parses the RIFF
    * headers (rate, channels, frame count) and the PCM body streams
    * through a peak-amplitude scan — the feature-extraction shape of an
    * audio-quality gate, exact because PCM is lossless. */
  def decodeAudio(spark: SparkSession, rows: Dataset[MediaBytesRow],
      fanOut: Int = 0): Dataset[AudioMeta] = {
    import spark.implicits._
    fanned(rows, fanOut).mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val f = ais.getFormat
        val frames = ais.getFrameLength
        val body = ais.readAllBytes()
        var peak = 0L
        var i = 0
        while (i + 1 < body.length) {
          val s = ((body(i) & 0xff) | (body(i + 1) << 8)).toShort
          val a = math.abs(s.toLong)
          if (a > peak) peak = a
          i += 2
        }
        AudioMeta(r.doc_id, f.getSampleRate.toLong, f.getChannels.toLong,
          frames, frames * 1000000L / f.getSampleRate.toLong, peak)
      }
    }
  }

  /** Resize analog: average-pool a feature vector down to `outDim` buckets —
    * the Spark-side shape of an image resize (the math is real; only the
    * pixels are fake). Declarative, so it fuses into the scan. */
  def poolFeatures(features: org.apache.spark.sql.Column, inDim: Int,
      outDim: Int): org.apache.spark.sql.Column = {
    require(inDim % outDim == 0, "inDim must divide by outDim")
    val w = inDim / outDim
    transform(sequence(lit(0), lit(outDim - 1)), b =>
      aggregate(slice(features, b * w + 1, lit(w)),
        lit(0.0), (acc, x) => acc + x.cast("double")) / w)
  }
}
