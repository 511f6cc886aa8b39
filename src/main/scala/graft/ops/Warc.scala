package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** WARC (Web ARChive, ISO 28500) record plumbing (r14): real pretraining
  * corpora arrive as WARC files — concatenated records, each a
  * `WARC/1.0\r\n` version line, CRLF-separated named headers (the payload
  * length rides `Content-Length`), a blank line, the payload, and a
  * closing double-CRLF. [[split]] walks that grammar per file and fans
  * each archive out to its records through an iterator (one input row →
  * N record rows, nothing materialized per archive) — the ingestion step
  * UPSTREAM of [[Clean.extractHtml]]: WARC → response records → HTML →
  * text, all per-partition and shuffle-free until the caller aggregates.
  *
  * Scale shape: an archive parses in one forward pass (O(bytes), no
  * backtracking — Content-Length addresses each payload exactly), so a
  * 100 TB crawl is embarrassingly parallel at archive granularity;
  * malformed records fail LOUDLY naming the document, never silently
  * resynchronize (a skew-prone crawl wants dead archives surfaced, not
  * absorbed).
  *
  * [[encode]] builds spec-shaped archives deterministically — the test
  * corpus generator (a production pipeline reads its archives from
  * storage), same discipline as the media encoders in [[Multimodal]].
  */
object Warc {

  final case class WarcRecord(doc_id: Long, rec_idx: Long, rec_type: String,
      target_uri: String, payload: String)

  private val Crlf = "\r\n"

  /** Deterministic WARC bytes: one record per (type, uri, payload) triple,
    * minimal conformant headers (version line, WARC-Type, WARC-Target-URI
    * when non-empty, Content-Length, blank line, payload, double CRLF). */
  def encode(records: Seq[(String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    records.foreach { case (recType, uri, payload) =>
      sb.append("WARC/1.0").append(Crlf)
      sb.append("WARC-Type: ").append(recType).append(Crlf)
      if (uri.nonEmpty) sb.append("WARC-Target-URI: ").append(uri).append(Crlf)
      sb.append("Content-Length: ")
        .append(payload.getBytes("UTF-8").length).append(Crlf)
      sb.append(Crlf)
      sb.append(payload)
      sb.append(Crlf).append(Crlf)
    }
    sb.toString.getBytes("UTF-8")
  }

  /** gzip twin of [[encode]]: one gzip MEMBER per record, concatenated —
    * the Common Crawl wire convention (`.warc.gz`), whose per-record
    * members are what make range-addressed record fetches possible in
    * real deployments. */
  def encodeGz(records: Seq[(String, String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(encode(Seq(r)))
      // close(), not just finish(): each member stream owns a native zlib
      // Deflater that otherwise leaks until finalization — a many-million-
      // record encode pass accumulates native memory. Closing the shared
      // ByteArrayOutputStream underneath is a no-op, so this is safe.
      g.close()
    }
    bos.toByteArray
  }

  /** One exportable document: `uri` is the record's WARC-Target-URI,
    * `host_id`/`doc_id` key the bounded sharding. */
  final case class WetDoc(doc_id: Long, host_id: Long, uri: String, text: String)

  /** One exported shard: a gzipped WARC archive of `conversion` records
    * for docs of `host_id` whose `doc_id div docsPerShard == block`. */
  final case class WetShard(host_id: Long, block: Long, media: Array[Byte])

  /** The EXPORT direction of the pipeline (r15 query-embedded, r16 lifted
    * to a first-class operator): extracted text written back out as
    * Common-Crawl-shaped WET shards — gzipped WARC archives of
    * `conversion` records, the format [[splitGz]] re-ingests.
    *
    * Scale shape: shards are BOUNDED — one archive per
    * (host, doc_id div docsPerShard), never one unbounded archive per
    * host — so each mapGroups task holds O(docsPerShard) rows however
    * large a host's corpus grows; the one shuffle is the group key.
    * Records sort by doc_id within a shard, so shard bytes are
    * deterministic (re-running the export is idempotent byte-for-byte).
    * The round trip back through [[splitGz]] is the correctness gate
    * (p_wet_export's DuckDB oracle + WarcSpec's shard-bound pin). */
  def encodeShards(spark: SparkSession, docs: Dataset[WetDoc],
      docsPerShard: Int = 64): Dataset[WetShard] = {
    require(docsPerShard >= 1, s"docsPerShard must be >= 1, got $docsPerShard")
    import spark.implicits._
    docs.groupByKey(d => (d.host_id, d.doc_id / docsPerShard))
      .mapGroups { (key: (Long, Long), it: Iterator[WetDoc]) =>
        val recs = it.toSeq.sortBy(_.doc_id)
          .map(d => ("conversion", d.uri, d.text))
        WetShard(key._1, key._2, encodeGz(recs))
      }
  }

  /** Land [[encodeShards]]' output as `.warc.gz` FILES under `outDir`,
    * one per shard, named `wet-h<host>-b<block>[-e<epoch>].warc.gz` —
    * deterministic names + overwrite-on-create, so re-running an export
    * (or replaying a streaming epoch: [[graft.streaming.Daemon
    * .wetExportStream]] passes its batch id as `epoch`) rewrites the same
    * keys byte-identically instead of duplicating shards. Writes happen
    * EXECUTOR-SIDE (each task writes its own partition's shards through
    * the Hadoop FS API); only the file count returns to the driver. */
  def writeShardFiles(shards: Dataset[WetShard], outDir: String,
      epoch: Option[Long] = None): Long = {
    val spark = shards.sparkSession
    import spark.implicits._
    val suffix = epoch.map(e => s"-e$e").getOrElse("")
    // ship the SESSION's Hadoop conf to the writer tasks — a fresh
    // `new Configuration()` drops spark.hadoop.* overrides (object-store
    // credentials/endpoints), so a configured remote export would
    // mis-target while local tests pass (every other ops/ writer reads
    // sparkContext.hadoopConfiguration; Configuration is a Writable, so
    // SerializableWritable carries it without a private-API dependency)
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    shards.mapPartitions { it =>
      var n = 0L
      var fs: org.apache.hadoop.fs.FileSystem = null
      it.foreach { sh =>
        if (fs == null)
          fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(outDir), confSer.value)
        val p = new org.apache.hadoop.fs.Path(outDir,
          s"wet-h${sh.host_id}-b${sh.block}$suffix.warc.gz")
        val os = fs.create(p, true)
        try os.write(sh.media) finally os.close()
        n += 1
      }
      Iterator.single(n)
    }.reduce(_ + _)
  }

  /** Read every WET shard file under `outDir` back as records — the
    * re-ingest half of the export round trip. One row per file (the
    * doc_id is a hash of the file name — stable, collision-irrelevant for
    * error attribution), fanned to records by [[splitGz]]. */
  def readShardFiles(spark: SparkSession, outDir: String,
      fanOut: Int = 0): Dataset[WarcRecord] = {
    import spark.implicits._
    val archives = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      .load(outDir)
      .select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("path")).as("doc_id"),
        org.apache.spark.sql.functions.col("content").as("media"))
      .as[Multimodal.MediaBytesRow]
    splitGz(spark, archives, fanOut)
  }

  /** [[split]] over `.warc.gz` archives: the JDK's GZIPInputStream reads
    * concatenated members transparently, so the record walker runs over
    * the decompressed stream — same grammar, same loud failures. Per-doc
    * decompression is executor-side CPU, linear in archive size. */
  def splitGz(spark: SparkSession,
      archives: Dataset[Multimodal.MediaBytesRow],
      fanOut: Int = 0): Dataset[WarcRecord] = {
    import spark.implicits._
    Multimodal.fanned(archives, fanOut).mapPartitions { it =>
      it.flatMap { r =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val bytes = try in.readAllBytes() finally in.close()
        recordsOf(r.doc_id, bytes)
      }
    }
  }

  /** Fan each archive out to its records: forward-pass header parse,
    * Content-Length-addressed payload slice, iterator per archive. */
  def split(spark: SparkSession,
      archives: Dataset[Multimodal.MediaBytesRow],
      fanOut: Int = 0): Dataset[WarcRecord] = {
    import spark.implicits._
    Multimodal.fanned(archives, fanOut).mapPartitions { it =>
      it.flatMap(r => recordsOf(r.doc_id, r.media))
    }
  }

  /** The record walker shared by [[split]] and [[splitGz]]. */
  private def recordsOf(docId: Long, b: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
          private var p = 0
          private var idx = 0L
          private def lineEnd(from: Int): Int = {
            var i = from
            while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
            require(i + 1 < b.length,
              s"doc ${docId}: truncated WARC header line at offset $from")
            i
          }
          override def hasNext: Boolean = p < b.length
          override def next(): WarcRecord = {
            val ve = lineEnd(p)
            val version = new String(b, p, ve - p, "UTF-8")
            require(version.startsWith("WARC/"),
              s"doc ${docId}: expected a WARC version line at offset $p, got '$version'")
            p = ve + 2
            var recType = ""
            var uri = ""
            var len = -1L
            // headers until the blank line
            while (!(p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n')) {
              val he = lineEnd(p)
              val line = new String(b, p, he - p, "UTF-8")
              val colon = line.indexOf(':')
              require(colon > 0,
                s"doc ${docId}: malformed WARC header '$line' at offset $p")
              val name = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
              val value = line.substring(colon + 1).trim
              name match {
                case "warc-type" => recType = value
                case "warc-target-uri" => uri = value
                case "content-length" => len = value.toLong
                case _ => () // unknown headers pass through
              }
              p = he + 2
            }
            require(len >= 0,
              s"doc ${docId}: WARC record ${idx} lacks Content-Length")
            p += 2 // the blank line
            require(p + len <= b.length,
              s"doc ${docId}: WARC record ${idx} payload overruns the archive")
            val payload = new String(b, p, len.toInt, "UTF-8")
            p += len.toInt
            // closing double CRLF — required between records; a missing
            // FINAL terminator (truncated upload) is tolerated at the end
            if (p < b.length) {
              require(p + 4 <= b.length && b(p) == '\r' && b(p + 1) == '\n' &&
                b(p + 2) == '\r' && b(p + 3) == '\n',
                s"doc ${docId}: WARC record $idx missing its closing " +
                  "double-CRLF terminator")
              p += 4
            }
            val out = WarcRecord(docId, idx, recType, uri, payload)
            idx += 1
            out
          }
        }
}
