package graft.functions

import graft.ops.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WordChunksSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog again and again", // > 1 window
    "short doc",                                                   // < 1 window
    "  leading  and   trailing   whitespace  ",                    // multi-space
    "exactly four words here",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",         // many windows
    "oneword",
    ""                                                             // empty
  )

  test("native chunks are byte-identical to the HOF chain across window/stride shapes") {
    import spark.implicits._
    val df = docs.toDF("text")
    for ((w, s) <- Seq((4, 3), (5, 5), (3, 1), (32, 24))) {
      val native = df.select(Text.chunk(col("text"), w, s).as("c")).as[Seq[String]].collect().toSeq
      val hof = df.select(Text.chunkHof(col("text"), w, s).as("c")).as[Seq[String]].collect().toSeq
      assert(native == hof, s"window=$w stride=$s")
    }
  }

  test("codegen and interpreted paths agree for chunks and ngrams") {
    import spark.implicits._
    val df = docs.toDF("text")
    def run(codegen: String): (Seq[Seq[String]], Seq[Seq[String]]) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try (
        df.select(WordChunks(col("text"), 4, 3).as("c")).as[Seq[String]].collect().toSeq,
        df.select(WordNgrams(col("text"), 2).as("g")).as[Seq[String]].collect().toSeq)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, "doGenCode must match nullSafeEval")
  }

  test("chunk boundaries: clamped tail, stride overlap, short-doc identity") {
    import spark.implicits._
    val out = Seq("a b c d e f g h i j").toDF("text")
      .select(WordChunks(col("text"), 4, 3).as("c")).as[Seq[String]].head()
    // positions 0,3,6 then ceil((10-4)/3)+1 = 3 chunks... (10-4)/3=2 -> 3 chunks
    assert(out == Seq("a b c d", "d e f g", "g h i j"))
    val short = Seq("tiny doc").toDF("text")
      .select(WordChunks(col("text"), 32, 24).as("c")).as[Seq[String]].head()
    assert(short == Seq("tiny doc"), "a doc shorter than one window yields itself")
  }

  test("seeded fuzz: native chunks/ngrams match their declarative pins on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val alphabet = Vector("a", "bb", "Ccc", "d1", "&", "ẞ")
    val ws = Vector(" ", "  ", "\t", "\n", " \r ")
    val fuzz = (1 to 120).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(ws(rnd.nextInt(ws.size))) +
        (if (rnd.nextBoolean()) " " else "")
    }
    val df = fuzz.toDF("text")
    for ((w, s) <- Seq((4, 3), (7, 2))) {
      val native = df.select(Text.chunk(col("text"), w, s).as("c")).as[Seq[String]].collect().toSeq
      val hof = df.select(Text.chunkHof(col("text"), w, s).as("c")).as[Seq[String]].collect().toSeq
      assert(native == hof, s"chunks window=$w stride=$s")
    }
    // ngrams: distinct(native multiset) must equal the shingles kernel
    val ng = df.select(WordNgrams(col("text"), 2).as("g")).as[Seq[String]].collect().toSeq
    val sh = df.select(WordShingles(col("text"), 2).as("g")).as[Seq[String]].collect().toSeq
    assert(ng.map(_.distinct) == sh, "distinct ngrams == shingles on every doc")
  }

  test("ngrams keep duplicates in document order (the multiset shingles drop)") {
    import spark.implicits._
    val g = Seq("Spam spam SPAM eggs spam spam").toDF("text")
      .select(WordNgrams(col("text"), 2).as("g")).as[Seq[String]].head()
    assert(g == Seq("spam spam", "spam spam", "spam eggs", "eggs spam", "spam spam"))
    // same positions and casing as WordShingles, minus the distinct
    val sh = Seq("Spam spam SPAM eggs spam spam").toDF("text")
      .select(WordShingles(col("text"), 2).as("g")).as[Seq[String]].head()
    assert(g.distinct == sh)
    val one = Seq("word").toDF("text")
      .select(WordNgrams(col("text"), 3).as("g")).as[Seq[String]].head()
    assert(one == Seq("word"), "short docs yield one clamped gram")
    val empty = Seq("").toDF("text")
      .select(WordNgrams(col("text"), 2).as("g")).as[Seq[String]].head()
    assert(empty == Seq.empty, "empty text yields no grams")
  }
}
