package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TokenCountSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def n(s: String): Long = TokenCount.compute(UTF8String.fromString(s))

  test("whitespace words count as before on non-CJK text") {
    assert(n("hello world") == 2L)
    assert(n("  a\tb\nc  ") == 3L)
    assert(n("one") == 1L)
    assert(n("a,b c") == 2L) // punctuation rides its word run
    assert(n("\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440") == 2L) // Cyrillic = words
    assert(n("caf\u00e9 au lait") == 3L) // accented Latin = words
  }

  test("empty and whitespace-only count 1 \u2014 the split([''])=1 legacy pin") {
    assert(n("") == 1L)
    assert(n("   \t\n") == 1L)
    assert(n("\u000b\u000c") == 1L) // VT/FF ARE java-regex \s whitespace
    assert(n("a\u000bb") == 2L) // ...and they split word runs
  }

  test("each CJK codepoint is one token") {
    assert(n("\u4f60\u597d\u4e16\u754c") == 4L) // 4 Han, no spaces
    assert(n("\u3053\u3093\u306b\u3061\u306f") == 5L) // 5 hiragana
    assert(n("\uce74\ud0c0\uce74\ub098") == 4L) // 4 Hangul
    assert(n("\u30ab\u30bf \u30ab\u30ca") == 4L) // space between changes nothing
  }

  test("mixed-script chunks segment at CJK boundaries") {
    assert(n("abc\u4f60\u597ddef") == 4L) // abc + 2 Han + def
    assert(n("hello \u4e16\u754c world") == 4L)
    assert(n("v2\u306e\u30c6\u30b9\u30c8") == 5L) // v2 + \u306e + \u30c6\u30b9\u30c8(3)
  }

  test("astral-plane Han counts once (surrogate pair decodes)") {
    val ext = new String(Character.toChars(0x20000)) // CJK Extension B
    assert(n(ext) == 1L)
    assert(n("a" + ext + "b") == 3L)
  }

  test("kernel is count-identical to the whitespace split on non-CJK rows") {
    import spark.implicits._
    val rows = Seq("plain ascii words", "", "   ", "a", "x,y;z .",
      "\u043f\u0440\u0438\u0432\u0435\u0442 abc", "tab\tsep\tvals",
      "caf\u00e9 \u00fcber stra\u00dfe")
    val df = rows.toDF("t")
    val got = df.select(
      TokenCount(col("t")).as("k"),
      size(split(trim(col("t")), "\\s+")).cast("long").as("w"))
      .as[(Long, Long)].collect()
    got.foreach { case (k, w) => assert(k == w) }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("Hello \u4f60\u597d world", "", "\u3072\u3089\u304c\u306a",
      "abc\u4f60\u597ddef").toDF("t")
    def run(mode: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(TokenCount(col("t"))).as[Long].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }

  test("gopher gate verdict is CJK-correct on a mixed-script fixture") {
    import spark.implicits._
    // a 40-Han doc: whitespace-split would read 1 token and FAIL the
    // >= 30 token floor; char-per-token reads 40 and the band admits it
    val han = "\u4f60\u597d\u4e16\u754c\u518d\u89c1\u671b\u671b" * 5
    assert(han.length == 40)
    assert(n(han) == 40L)
    // the gate composition (token band only \u2014 stopword/dup signals are
    // orthogonal and pinned elsewhere)
    val df = Seq(("cjk", han), ("short", "too few words here"))
      .toDF("id", "text")
      .select(col("id"), TokenCount(col("text")).as("n_tokens"))
      .withColumn("in_band", col("n_tokens") >= 30 && col("n_tokens") <= 1000)
    val m = df.as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("cjk") == ((40L, true)))
    assert(m("short") == ((4L, false)))
  }

  private def chunks(s: String, w: Int, st: Int): Seq[String] = {
    val a = TokenChunks.compute(UTF8String.fromString(s), w, st)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("token chunks are byte-identical to word chunks on non-CJK text") {
    val texts = Seq("", "   ", "one", "a b c d e f g h i",
      "  leading and   multi  spaced\ttabs\nnewlines  ",
      "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 abc def ghi")
    for (t <- texts; (w, st) <- Seq((3, 2), (4, 4), (2, 1))) {
      val tc = chunks(t, w, st)
      val wc = WordChunks.compute(UTF8String.fromString(t), w, st)
      val wcs = (0 until wc.numElements()).map(i => wc.getUTF8String(i).toString)
      assert(tc == wcs, s"text=$t w=$w st=$st")
    }
  }

  test("pure-Han chunks are substring windows (token == codepoint)") {
    val han = "\u4f60\u597d\u4e16\u754c\u518d\u89c1\u671b\u671b" // 8 chars
    assert(chunks(han, 3, 2) == Seq(
      han.substring(0, 3), han.substring(2, 5), han.substring(4, 7),
      han.substring(6, 8)))
    // counted windows: each chunk's token count equals its window size
    chunks(han, 3, 2).dropRight(1).foreach(c => assert(n(c) == 3L))
  }

  test("mixed-script chunks keep source spacing (no invented spaces)") {
    // tokens: abc, \u4f60, \u597d, def, \u4e16, ghi = 6
    val t = "abc\u4f60\u597d def\u4e16  ghi"
    assert(chunks(t, 6, 6) == Seq("abc\u4f60\u597d def\u4e16 ghi"))
    assert(chunks(t, 4, 2) == Seq("abc\u4f60\u597d def", "\u597d def\u4e16 ghi"))
    // a chunk starting mid-CJK-run never carries a leading space
    assert(chunks("\u4f60\u597d\u4e16", 2, 1) ==
      Seq("\u4f60\u597d", "\u597d\u4e16"))
  }

  test("token chunks codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("Hello \u4f60\u597d world", "", "abc\u4f60\u597ddef \u3072",
      "plain words only here").toDF("t")
    def run(mode: String): Seq[Seq[String]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(TokenChunks(col("t"), 3, 2)).as[Seq[String]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }

  test("token budget denominated in CJK tokens takes the right prefix") {
    import spark.implicits._
    // two docs of 10 Han chars each + one 2-word ASCII doc, budget 12:
    // the md5-ordered prefix must stop once cumulative CJK tokens pass 12
    val docs = Seq(
      (1L, "s", "\u4f60\u597d\u4e16\u754c\u518d" * 2), // 10 tokens
      (2L, "s", "\u671b\u671b\u54c8\u54c8\u55e8" * 2), // 10 tokens
      (3L, "s", "two words")) // 2 tokens
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        TokenCount(col("text")).as("n_tok"))
    val kept = graft.ops.Mixture.budgetPrefix(docs, "source", "n_tok",
      lit(12L), hexDigits = 1).select("doc_id").as[Long].collect().toSet
    // md5("1")=c4..., md5("2")=c8..., md5("3")=ec... -> order 1,2,3:
    // cum 10 (keep), 20 (>12 drop), 22 (drop)
    assert(kept == Set(1L))
  }
}
