package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RepetitionStatsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val docs = Seq(
    (1L, "spam spam spam eggs spam spam"),       // heavy repetition
    (2L, "all distinct words here now"),         // no duplicate bigram
    (3L, "x y x y x"),                           // tie at count 2 -> lex-min wins
    (4L, "oneword"),                             // single clamped gram
    (5L, "The   quick  brown FOX the QUICK brown") // case/whitespace normalization
  )

  /** The relational formulation the expression replaced — the semantic pin. */
  private def relational(df: org.apache.spark.sql.DataFrame) = {
    val c = df.select(col("doc_id"), explode(WordNgrams(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val wp = Window.partitionBy("doc_id")
    val wr = Window.partitionBy("doc_id").orderBy(col("c").desc, col("g"))
    c.withColumn("rn", row_number().over(wr))
      .withColumn("n_grams", sum("c").over(wp))
      .withColumn("n_dup", sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).over(wp))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("g").as("top_gram"), col("c").as("max_rep"),
        col("n_grams"), col("n_dup"))
  }

  test("native stats equal the relational explode/groupBy/window formulation") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val native = df.select(col("doc_id"), RepetitionStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.top_gram").as("top_gram"),
        col("st.max_rep").as("max_rep"), col("st.n_grams").as("n_grams"),
        col("st.n_dup").as("n_dup"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val rel = relational(df)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(native == rel)
    assert(native(3L)._1 == "x y", "tie at equal count breaks to the lex-min bigram")
  }

  test("hand-computed fixture: counts, duplicates and clamping") {
    import spark.implicits._
    // bigrams of "spam spam spam eggs spam spam":
    //   spam spam, spam spam, spam eggs, eggs spam, spam spam -> 5 grams,
    //   'spam spam' x3 (dup), others x1 -> n_dup = 3
    val st = Seq("spam spam spam eggs spam spam").toDF("text")
      .select(RepetitionStats(col("text")).as("st"))
      .select("st.n_grams", "st.max_rep", "st.top_gram", "st.n_dup").head()
    assert((st.getLong(0), st.getLong(1), st.getString(2), st.getLong(3)) ==
      ((5L, 3L, "spam spam", 3L)))
    // one word: a single clamped "bigram" with count 1, nothing duplicated
    val one = Seq("oneword").toDF("text")
      .select(RepetitionStats(col("text")).as("st"))
      .select("st.n_grams", "st.max_rep", "st.top_gram", "st.n_dup").head()
    assert((one.getLong(0), one.getLong(1), one.getString(2), one.getLong(3)) ==
      ((1L, 1L, "oneword", 0L)))
    // empty text: the zero row (gram-less docs are filtered by the query)
    val empty = Seq("").toDF("text")
      .select(RepetitionStats(col("text")).as("st"))
      .select("st.n_grams", "st.max_rep", "st.top_gram", "st.n_dup").head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.isNullAt(2) && empty.getLong(3) == 0L)
  }

  test("seeded fuzz: native stats match the relational form on random repetitive docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(8472L)
    // small vocab -> lots of genuine bigram repetition and count ties
    val vocab = Vector("x", "y", "zz", "x", "Q")
    val fuzz = (1 to 100).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = fuzz.toDF("doc_id", "text")
    val native = df.select(col("doc_id"), RepetitionStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.top_gram"), col("st.max_rep"),
        col("st.n_grams"), col("st.n_dup"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val rel = relational(df)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(native == rel)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    def run(mode: String): Seq[(Long, Long, String, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(RepetitionStats(col("text")).as("st"))
        .select("st.n_grams", "st.max_rep", "st.top_gram", "st.n_dup")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
