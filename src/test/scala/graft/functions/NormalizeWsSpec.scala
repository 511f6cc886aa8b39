package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class NormalizeWsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val texts = Seq(
    "The  Quick\tBrown\n\nFOX",
    "  leading and trailing  ",
    "\t\r\n",                        // whitespace-only -> single space
    "",
    "Ünïcode NBSP stays ẞharp", // U+00A0 is NOT Java \s -> preserved
    "tabs\tandverticalfeeds\rmixed  runs",
    "no_whitespace_at_all"
  )

  test("byte-identical to lower(regexp_replace(text, '\\s+', ' ')) on edge cases") {
    import spark.implicits._
    val df = texts.toDF("text")
    val native = df.select(NormalizeWs(col("text")).as("t")).as[String].collect().toSeq
    val regex = df.select(lower(regexp_replace(col("text"), "\\s+", " ")).as("t"))
      .as[String].collect().toSeq
    assert(native == regex)
  }

  test("seeded fuzz: byte-identical to the regex chain on random whitespace soups") {
    import spark.implicits._
    val rnd = new scala.util.Random(424242L)
    val pieces = Vector("a", "Bc", "ẞ", "Ü", " ", " ", "\t", "\n", "\r", "\f", "", "9", "_")
    val fuzz = (1 to 150).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString
    }
    val df = fuzz.toDF("text")
    val native = df.select(NormalizeWs(col("text")).as("t")).as[String].collect().toSeq
    val regex = df.select(lower(regexp_replace(col("text"), "\\s+", " ")).as("t"))
      .as[String].collect().toSeq
    assert(native == regex)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = texts.toDF("text")
    def run(mode: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(NormalizeWs(col("text")).as("t")).as[String].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
