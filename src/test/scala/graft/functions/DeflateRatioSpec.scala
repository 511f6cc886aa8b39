package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class DeflateRatioSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ratio(s: String): Long =
    DeflateRatio.compute(UTF8String.fromString(s))

  /** Independent restatement through the one-shot array API — a different
    * code path into zlib than the kernel's streaming loop. */
  private def reference(s: String): Long = {
    val raw = s.getBytes("UTF-8")
    if (raw.isEmpty) return 1000L
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw); d.finish()
      val out = new Array[Byte](raw.length * 2 + 64)
      var n = 0
      while (!d.finished()) n += d.deflate(out, n, out.length - n)
      n.toLong * 1000L / raw.length
    } finally d.end()
  }

  test("kernel matches the one-shot zlib restatement") {
    val texts = Seq("hello world", "a" * 500,
      "the quick brown fox jumps over the lazy dog " * 10,
      (0 until 24).map(i => f"block$i%04d-payload").mkString(" "))
    texts.foreach(t => assert(ratio(t) == reference(t), s"t=${t.take(30)}"))
  }

  test("empty text is 1000 per-mille by convention") {
    assert(ratio("") == 1000L)
  }

  test("round trip: deflated bytes inflate back to the input") {
    val s = "prove the kernel really deflates " * 8
    val raw = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, true)
    val out = new Array[Byte](raw.length * 2 + 64)
    d.setInput(raw); d.finish()
    var n = 0
    while (!d.finished()) n += d.deflate(out, n, out.length - n)
    d.end()
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(out, 0, n)
    val back = new Array[Byte](raw.length + 16)
    val m = inf.inflate(back)
    inf.end()
    assert(m == raw.length && back.take(m).sameElements(raw))
    assert(ratio(s) == n.toLong * 1000L / raw.length)
  }

  test("the planted oracle classes sit far from the 250 threshold") {
    // exactly the t_compress_ratio constructions (md5 hex via MessageDigest)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    for (docId <- Seq(0L, 3L, 123L, 4999L)) {
      val repeated = md5hex(s"cr-$docId") * 24
      val distinct = (0 until 23 + 1).map(j => md5hex(s"cr-$docId-$j")).mkString
      val r1 = ratio(repeated)
      val r2 = ratio(distinct)
      assert(r1 < 125L, s"repeated-block ratio $r1 not <2x under threshold")
      assert(r2 > 500L, s"distinct-block ratio $r2 not >2x over threshold")
    }
  }

  test("repetition monotonicity: more repeats compress further") {
    val block = "abcdefghijklmnopqrstuvwxyz012345"
    assert(ratio(block * 32) < ratio(block * 4))
    assert(ratio(block * 4) < ratio(block))
  }

  test("thread-local deflater is reset per call: same input, same answer, any order") {
    val a = "aaaa " * 100
    val b = (0 until 100).map(i => f"w$i%03x").mkString(" ")
    val first = (ratio(a), ratio(b))
    // interleave in the other order on the same thread
    assert((ratio(b), ratio(a)) == (first._2, first._1))
    assert((ratio(a), ratio(b)) == first)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("hello world", "", "a" * 200, "x y z " * 30).toDF("t")
    def run(mode: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(DeflateRatio(col("t"))).as[Long].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
