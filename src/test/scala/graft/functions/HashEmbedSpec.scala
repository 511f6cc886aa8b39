package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class HashEmbedSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def embed(s: String, dim: Int): Seq[Long] = {
    val a = HashEmbed.compute(UTF8String.fromString(s), dim)
    (0 until a.numElements()).map(a.getLong)
  }

  /** Independent restatement: hex-string md5 prefix via BigInteger (the
    * oracle's CAST('0x'||hex13 AS BIGINT) form), regex tokenization,
    * BigDecimal-free floor(x+0.5) — written differently from the kernel
    * on purpose. */
  private def reference(s: String, dim: Int): Seq[Long] = {
    val toks = s.trim.split("\\s+").filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Long](dim)
    toks.foreach { tok =>
      val d = md.digest(tok.getBytes("UTF-8"))
      md.reset()
      val hex = d.map(b => f"${b & 0xff}%02x").mkString
      val hv = new java.math.BigInteger(hex.take(13), 16).longValueExact()
      val idx = ((hv / 2) % dim).toInt
      counts(idx) += (if (hv % 2 == 0) 1L else -1L)
    }
    val ssq = counts.map(c => c * c).sum
    if (ssq == 0L) Seq.fill(dim)(0L)
    else counts.toSeq.map(c =>
      math.floor(1e6 * c / math.sqrt(ssq.toDouble) + 0.5).toLong)
  }

  test("kernel matches the independent hex/BigInteger restatement") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "one", "a a a a a", "  padded   whitespace\ttabs\nnewlines  ",
      "", "   ", "mixed 123 !@# text here repeated text here")
    for (t <- texts; dim <- Seq(4, 16, 64))
      assert(embed(t, dim) == reference(t, dim), s"t='$t' dim=$dim")
  }

  test("empty and whitespace-only text embed as the zero vector") {
    assert(embed("", 16) == Seq.fill(16)(0L))
    assert(embed(" \t\n ", 16) == Seq.fill(16)(0L))
  }

  test("the vector is micro-unit L2-normalized: sum of squares ~ 1e12") {
    val v = embed("the quick brown fox jumps over the lazy dog", 16)
    val ssq = v.map(x => x * x).sum
    // each component is independently rounded, so the norm is within
    // dim/2 rounding steps of exactly 1e12
    assert(math.abs(ssq - 1000000000000L) < 2e7, s"ssq=$ssq")
  }

  test("identical text embeds identically; token order is irrelevant") {
    val a = embed("alpha beta gamma", 16)
    assert(a == embed("alpha beta gamma", 16))
    assert(a == embed("  gamma   alpha\tbeta ", 16)) // bag-of-words
  }

  test("tokenHash equals the 13-hex-char md5 prefix") {
    for (tok <- Seq("a", "hello", "你好", "x" * 100)) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      val want = new java.math.BigInteger(hex.take(13), 16).longValueExact()
      assert(HashEmbed.tokenHash(tok) == want, s"tok=$tok")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "", "a a b b", "single").toDF("t")
    def run(mode: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(HashEmbed(col("t"), 16)).as[Seq[Long]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
