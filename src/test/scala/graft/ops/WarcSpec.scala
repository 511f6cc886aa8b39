package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def split(bytes: Array[Byte], id: Long = 1L): Seq[Warc.WarcRecord] = {
    import spark.implicits._
    Warc.split(spark, Seq(Multimodal.MediaBytesRow(id, bytes)).toDS())
      .collect().toSeq.sortBy(_.rec_idx)
  }

  test("encode/split round trip: multi-record archive fans out in order") {
    val bytes = Warc.encode(Seq(
      ("warcinfo", "", "software: graft"),
      ("response", "https://a.example/x", "<p>alpha</p>"),
      ("response", "https://a.example/y", "<p>beta</p>")))
    val got = split(bytes)
    assert(got.map(r => (r.rec_idx, r.rec_type, r.target_uri, r.payload)) == Seq(
      (0L, "warcinfo", "", "software: graft"),
      (1L, "response", "https://a.example/x", "<p>alpha</p>"),
      (2L, "response", "https://a.example/y", "<p>beta</p>")))
  }

  test("unknown headers pass through; payload may contain CRLFs and header-ish text") {
    val tricky = "WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a real record"
    val bytes = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:1234>\r\n" +
      "WARC-Target-URI: https://t.example/\r\n" +
      s"Content-Length: ${tricky.getBytes("UTF-8").length}\r\n" +
      "\r\n" + tricky + "\r\n\r\n").getBytes("UTF-8")
    val got = split(bytes)
    assert(got.size == 1 && got.head.payload == tricky,
      "Content-Length addresses the payload exactly — no resync scanning")
  }

  test("warc.gz: member-per-record gzip round-trips through the multi-member reader") {
    import spark.implicits._
    val recs = Seq(
      ("warcinfo", "", "software: graft"),
      ("response", "https://gz.example/a", "<p>gz alpha</p>"),
      ("response", "https://gz.example/b", "<p>gz beta</p>"))
    val gz = Warc.encodeGz(recs)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b, "gzip magic leads")
    // genuinely multi-member: a second gzip magic appears past the first
    assert(gz.drop(2).sliding(2).exists(w =>
      (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b),
      "one gzip member per record (the Common Crawl convention)")
    val got = Warc.splitGz(spark,
        Seq(Multimodal.MediaBytesRow(4L, gz)).toDS())
      .collect().toSeq.sortBy(_.rec_idx)
    assert(got.map(r => (r.rec_type, r.target_uri, r.payload)) ==
      recs.map { case (t, u, p) => (t, u, p) })
  }

  test("truncated final terminator tolerated; mid-archive corruption fails naming the doc") {
    val ok = Warc.encode(Seq(("response", "u", "x")))
    assert(split(ok.dropRight(4), id = 5L).head.payload == "x",
      "archive ending exactly at the payload still parses")
    // record 0 lacks its terminator but record 1 follows -> loud failure
    val bad = Warc.encode(Seq(("response", "u", "x"))).dropRight(4) ++
      Warc.encode(Seq(("response", "v", "y")))
    val e = intercept[org.apache.spark.SparkException] { split(bad, id = 7L) }
    assert(e.getMessage.contains("7") || e.getCause.getMessage.contains("7"))
    // missing Content-Length -> loud failure
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("UTF-8")
    val e2 = intercept[org.apache.spark.SparkException] { split(noLen, id = 9L) }
    assert(e2.getMessage.contains("9") || e2.getCause.getMessage.contains("9"))
  }

  test("fanOut makes record fan-out input-split-independent (one giant archive != one task)") {
    import spark.implicits._
    // 8 archives landing in ONE input partition — the documents.parquet /
    // giant-.warc.gz shape where the decode stage would serialize
    val archives = (0 until 8).map { i =>
      Multimodal.MediaBytesRow(i.toLong,
        Warc.encode(Seq(("response", s"https://h$i.example/", s"<p>doc $i</p>"))))
    }
    val oneSplit = spark.createDataset(archives).coalesce(1)
    // default (fanOut=0) inherits the single input split — unchanged behavior
    assert(Warc.split(spark, oneSplit).rdd.getNumPartitions == 1)
    // requested fan-out drives the decode stage's task count
    val fanned = Warc.split(spark, oneSplit, fanOut = 4)
    assert(fanned.rdd.getNumPartitions == 4)
    // and the record multiset is identical either way
    assert(fanned.collect().map(r => (r.doc_id, r.target_uri)).sorted.toSeq ==
      Warc.split(spark, oneSplit).collect().map(r => (r.doc_id, r.target_uri)).sorted.toSeq)
    // same contract on the gz face and the media decode faces
    val gz = (0 until 8).map { i =>
      Multimodal.MediaBytesRow(i.toLong,
        Warc.encodeGz(Seq(("response", s"https://h$i.example/", "x"))))
    }
    assert(Warc.splitGz(spark, spark.createDataset(gz).coalesce(1), fanOut = 3)
      .rdd.getNumPartitions == 3)
    val imgs = (0 until 8).map { i =>
      Multimodal.ImageRow(i.toLong, Multimodal.encodeImage(2, 2, 100, "png"), "png")
    }
    assert(Multimodal.decodeImages(spark, spark.createDataset(imgs).coalesce(1),
      fanOut = 5).rdd.getNumPartitions == 5)
  }

  test("encodeShards: bounded (host, doc-block) shards, deterministic bytes, round trip") {
    import spark.implicits._
    // 130 docs on one host + 3 on another, docsPerShard=64: the single
    // host must split into blocks of 64/64/2 — never one unbounded archive
    val docs = ((0 until 130).map(i =>
        Warc.WetDoc(i.toLong, 1L, s"https://h1.example/doc/$i", s"text $i")) ++
      (200 until 203).map(i =>
        Warc.WetDoc(i.toLong, 2L, s"https://h2.example/doc/$i", s"text $i")))
    val shards = Warc.encodeShards(spark, spark.createDataset(docs)).collect()
    val byKey = shards.map(sh => (sh.host_id, sh.block) -> sh.media).toMap
    assert(byKey.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 3L)))
    // shard sizes are the doc-block sizes (one conversion record per doc)
    def nRecs(m: Array[Byte]): Int = Warc.splitGz(spark,
      spark.createDataset(Seq(Multimodal.MediaBytesRow(0L, m)))).collect().length
    assert(nRecs(byKey((1L, 0L))) == 64)
    assert(nRecs(byKey((1L, 1L))) == 64)
    assert(nRecs(byKey((1L, 2L))) == 2)
    assert(nRecs(byKey((2L, 3L))) == 3)
    // deterministic: a re-run yields byte-identical shards (records sort
    // by doc_id inside each shard regardless of input order)
    val rerun = Warc.encodeShards(spark,
        spark.createDataset(scala.util.Random.shuffle(docs))).collect()
      .map(sh => (sh.host_id, sh.block) -> sh.media).toMap
    byKey.foreach { case (k, m) =>
      assert(java.util.Arrays.equals(rerun(k), m), s"shard $k not deterministic") }
    // round trip: every doc comes back with its uri and payload intact
    val all = Warc.splitGz(spark, spark.createDataset(
      shards.map(sh => Multimodal.MediaBytesRow(sh.host_id * 1000 + sh.block, sh.media)).toSeq))
      .collect().map(r => (r.target_uri, r.payload)).toSet
    assert(all == docs.map(d => (d.uri, d.text)).toSet)
    // the bound is enforced
    intercept[IllegalArgumentException](
      Warc.encodeShards(spark, spark.createDataset(docs), docsPerShard = 0))
  }
}
