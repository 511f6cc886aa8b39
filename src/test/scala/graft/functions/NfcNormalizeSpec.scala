package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class NfcNormalizeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(NfcNormalize(col("t")).as("n"))
      .as[String].collect().head
  }

  test("combining marks compose") {
    assert(norm("Cafe\u0301") == "Caf\u00e9")
    assert(norm("nai\u0308ve") == "na\u00efve")
    assert(norm("A\u030a") == "\u00c5")
  }

  test("precomposed text is unchanged") {
    assert(norm("Caf\u00e9 na\u00efve") == "Caf\u00e9 na\u00efve")
  }

  test("pure ASCII returns the exact input object (zero-copy fast path)") {
    val in = UTF8String.fromString("plain ascii text, unchanged 123")
    assert(NfcNormalize.compute(in) eq in)
  }

  test("already-normalized non-ASCII returns the exact input object") {
    val in = UTF8String.fromString("Caf\u00e9")
    assert(NfcNormalize.compute(in) eq in)
  }

  test("matches java.text.Normalizer on fuzzed mark soups") {
    val rnd = new scala.util.Random(1414L)
    val pieces = Vector("a", "e\u0301", "\u00e9", "o\u0308", "A\u030a",
      "\u00c5", " ", "Z", "\u1e69", "s\u0323\u0307", "\uac00", "\u1100\u1161")
    (1 to 200).foreach { _ =>
      val s = (0 until rnd.nextInt(20)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString
      val expect = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(NfcNormalize.compute(UTF8String.fromString(s)).toString == expect)
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("Cafe\u0301", "ascii", "", "s\u0323\u0307", "\uac00").toDF("t")
    def run(mode: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(NfcNormalize(col("t")).as("n")).as[String].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
