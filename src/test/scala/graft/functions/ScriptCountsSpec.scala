package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ScriptCountsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def counts(s: String): (Long, Long, Long, Long) = {
    val r = ScriptCounts.compute(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("ASCII letters are Latin; spaces, digits, punctuation are other") {
    assert(counts("Hello world 42!") == (10L, 0L, 0L, 5L))
    assert(counts("") == (0L, 0L, 0L, 0L))
  }

  test("accented Latin counts as Latin; Cyrillic and CJK bucket correctly") {
    assert(counts("caf\u00e9") == (4L, 0L, 0L, 0L))
    assert(counts("\u043f\u0440\u0438\u0432\u0435\u0442") == (0L, 6L, 0L, 0L))
    assert(counts("\u4f60\u597d") == (0L, 0L, 2L, 0L)) // Han
    assert(counts("\u3053\u3093") == (0L, 0L, 2L, 0L)) // Hiragana
    assert(counts("\uce74\ud0c0") == (0L, 0L, 2L, 0L)) // Hangul
    assert(counts("mixed \u043c\u0438\u0440 \u4e16\u754c") ==
      (5L, 3L, 2L, 2L))
  }

  test("astral-plane codepoints count once (surrogate pairs decode)") {
    // U+20000 is a CJK Extension B ideograph: one codepoint, two chars
    val s = new String(Character.toChars(0x20000))
    assert(counts(s) == (0L, 0L, 1L, 0L))
    assert(counts("a" + s + "b") == (2L, 0L, 1L, 0L))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("Hello \u043c\u0438\u0440 \u4f60\u597d",
      "ascii only", "").toDF("t")
    def run(mode: String): Seq[(Long, Long, Long, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(ScriptCounts(col("t")).as("s"))
        .select("s.latin", "s.cyrillic", "s.cjk", "s.other")
        .as[(Long, Long, Long, Long)].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
