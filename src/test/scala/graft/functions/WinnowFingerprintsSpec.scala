package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WinnowFingerprintsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fps(s: String, k: Int, w: Int): Seq[Long] = {
    val a = WinnowFingerprints.compute(UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map(a.getLong)
  }

  /** Independent restatement of the definition: hex-string md5 prefix via
    * BigInteger (the oracle's CAST('0x'||hex13 AS BIGINT)), windows as
    * plain slices — written differently from the kernel on purpose. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = (0 until n).map { i =>
      val gram = new String(cps, i, k)
      val d = md.digest(gram.getBytes("UTF-8"))
      md.reset()
      val hex = d.map(b => f"${b & 0xff}%02x").mkString
      new java.math.BigInteger(hex.take(13), 16).longValueExact()
    }
    val wins = if (n < w) Seq(h) else h.sliding(w).toSeq
    wins.map(_.min).distinct.sorted
  }

  test("kernel matches the independent hex/BigInteger restatement") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaa", "abcdefgh", "abcdefg", "", "mixed 123 !@# text here")
    for (t <- texts; (k, w) <- Seq((8, 4), (4, 2), (3, 5)))
      assert(fps(t, k, w) == reference(t, k, w), s"t=$t k=$k w=$w")
  }

  test("shorter than k yields empty; k <= len < k+w-1 yields the clamped window") {
    assert(fps("abc", 8, 4).isEmpty)
    assert(fps("abcdefgh", 8, 4).size == 1) // one gram, one clamped window
  }

  test("grams are codepoints: astral chars count once and never collide as split surrogates") {
    val ext1 = new String(Character.toChars(0x20000)) // CJK Extension B
    val ext2 = new String(Character.toChars(0x20001)) // a DIFFERENT ideograph
    val a = "sharedprefix" + ext1 + "tail"
    val b = "sharedprefix" + ext2 + "tail"
    assert(fps(a, 8, 4) == reference(a, 8, 4))
    assert(fps(b, 8, 4) == reference(b, 8, 4))
    // a code-unit walk would UTF-8-encode each unpaired surrogate half as
    // '?' and make the two texts' gram sets identical — they must differ
    assert(fps(a, 8, 4) != fps(b, 8, 4))
    // length in codepoints: 7 codepoints < k=8 -> empty even though the
    // UTF-16 length is 8
    assert(fps("abcdef" + ext1, 8, 4).isEmpty)
  }

  test("the winnowing guarantee: a shared span >= w+k-1 forces a shared fingerprint") {
    val k = 8; val w = 4
    val shared = "thisexactsharedsubstringislongenough" // 36 chars >= 11
    val a = "leftcontextonethatisdifferent" + shared + "tailone"
    val b = "completelyotherleadin" + shared + "anothertail"
    val common = fps(a, k, w).toSet intersect fps(b, k, w).toSet
    assert(common.nonEmpty, "documents sharing a long substring must share a fingerprint")
    // and two unrelated strings (no shared 8-gram at all) share nothing
    val c = fps("abcdefghijklmnopqrstuvwxyz", k, w).toSet
    val d = fps("0123456789012345678901234567", k, w).toSet
    assert((c intersect d).isEmpty)
  }

  test("fingerprint density is the winnowing fraction, not all grams") {
    val t = ("the quick brown fox jumps over the lazy dog " * 20).filterNot(_ == ' ')
    val n = t.length - 8 + 1
    val sel = fps(t, 8, 4).size
    // expected ~2/(w+1) of positions, loosely bounded; repetition dedups more
    assert(sel < n / 2, s"selected $sel of $n grams - winnowing must thin the set")
    assert(sel > 0)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "", "aaaaaaaaaa", "abcdefgh").toDF("t")
    def run(mode: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(WinnowFingerprints(col("t"), 8, 4)).as[Seq[Long]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
  test("r18 strict validation: surrogate/overlong/out-of-range bytes take the String fallback") {
    // the r17 structural check accepted WTF-8-ish sequences and hashed their
    // raw bytes, silently diverging from the r16 String walk (which decodes
    // them as replacement chars). The strict validator must route every such
    // input through the fallback, i.e. equal the reference over toString.
    def bad(prefixLen: Int, seq: Array[Int]): Array[Byte] = {
      val pre = ("x" * prefixLen).getBytes("UTF-8")
      val post = "abcdefghij".getBytes("UTF-8")
      pre ++ seq.map(_.toByte) ++ post
    }
    val cases = Seq(
      "surrogate ED A0 80" -> bad(3, Array(0xed, 0xa0, 0x80)),
      "surrogate ED BF BF" -> bad(3, Array(0xed, 0xbf, 0xbf)),
      "overlong C0 AF" -> bad(3, Array(0xc0, 0xaf)),
      "overlong C1 81" -> bad(3, Array(0xc1, 0x81)),
      "overlong E0 80 AF" -> bad(3, Array(0xe0, 0x80, 0xaf)),
      "overlong F0 80 80 AF" -> bad(3, Array(0xf0, 0x80, 0x80, 0xaf)),
      "beyond U+10FFFF F4 90 80 80" -> bad(3, Array(0xf4, 0x90, 0x80, 0x80)),
      "invalid start F5" -> bad(3, Array(0xf5, 0x80)),
      "stray continuation 80" -> bad(3, Array(0x80)),
      "truncated tail E4 B8" ->
        ("abcdefghij".getBytes("UTF-8") ++ Array(0xe4.toByte, 0xb8.toByte)))
    for ((name, bytes) <- cases) {
      val u = UTF8String.fromBytes(bytes)
      val a = WinnowFingerprints.compute(u, 4, 3)
      val got = (0 until a.numElements()).map(a.getLong)
      assert(got == reference(u.toString, 4, 3), name)
    }
    // and strictly-valid boundary forms must still take the fast path and
    // agree with the reference: E0 A0 80 (lowest 3-byte), ED 9F BF (just
    // below surrogates), F0 90 80 80 (lowest 4-byte), F4 8F BF BF (U+10FFFF)
    val edge = "ab".getBytes("UTF-8") ++
      Array(0xe0, 0xa0, 0x80, 0xed, 0x9f, 0xbf, 0xf0, 0x90, 0x80, 0x80,
        0xf4, 0x8f, 0xbf, 0xbf).map(_.toByte) ++ "cdefgh".getBytes("UTF-8")
    val ue = UTF8String.fromBytes(edge)
    val ae = WinnowFingerprints.compute(ue, 4, 3)
    assert((0 until ae.numElements()).map(ae.getLong) == reference(ue.toString, 4, 3))
  }

  test("r17 byte-walk equals the String walk on mixed multibyte text") {
    // the optimized kernel walks UTF-8 byte offsets directly; this pins it
    // against the independent codepoint/String reference on text mixing
    // 1-, 2-, 3- and 4-byte encodings at every gram boundary
    val ext = new String(Character.toChars(0x20000))
    val mixed = s"a\u00e9\u4e2d${ext}b\u00fc\u65e5${ext}cdef\u00e8\u4e16xyz"
    for ((k, w) <- Seq((8, 4), (3, 2), (2, 5)))
      assert(fps(mixed, k, w) == reference(mixed, k, w), s"k=$k w=$w")
  }

}
