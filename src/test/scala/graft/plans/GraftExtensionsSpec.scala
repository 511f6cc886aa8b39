package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The extensions entry point: a session built with GraftExtensions exposes
  * the native kernels to pure-SQL users and carries the pruning rule. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = {
    // force a fresh session so withExtensions actually applies (getOrCreate
    // would silently return an already-active session)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    // leave the session for following suites (shared SparkContext); the
    // extensions are additive
  }

  test("native kernels are callable from SQL and agree with the Column API") {
    import spark.implicits._
    Seq((1L, "the quick brown fox the quick")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val row = spark.sql(
      """SELECT simhash64(split(lower(trim(text)), '\\s+')) AS sh,
                word_shingles(text, 3) AS wsh,
                jaccard_pct(word_shingles(text, 3), word_shingles(text, 3)) AS jp,
                cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
                size(minhash_signature(word_shingles(text, 3), 16)) AS nsig,
                size(minhash_band_keys(word_shingles(text, 3), 64, 8)) AS nband,
                word_chunks(text, 4, 3) AS wch,
                word_ngrams(text, 2) AS wng,
                repetition_stats(text).n_grams AS rng
         FROM ext_docs""").head()
    val viaColumn = Seq("the quick brown fox the quick").toDF("text")
      .select(graft.ops.Dedup.simhash(org.apache.spark.sql.functions.col("text")))
      .as[Long].head()
    assert(row.getAs[Long]("sh") == viaColumn, "SQL and Column APIs must agree")
    assert(row.getAs[Seq[String]]("wsh").head == "the quick brown")
    assert(row.getAs[Long]("jp") == 100L)
    assert(row.getAs[Double]("cs") == 1.0)
    assert(row.getAs[Int]("nsig") == 16 && row.getAs[Int]("nband") == 8)
    assert(row.getAs[scala.collection.Seq[String]]("wch").toSeq ==
      Seq("the quick brown fox", "fox the quick"))
    assert(row.getAs[scala.collection.Seq[String]]("wng").head == "the quick" &&
      row.getAs[scala.collection.Seq[String]]("wng").size == 5)
    assert(row.getAs[Long]("rng") == 5L)
  }

  test("extension session carries the dim-bucket pruning rule") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-ext-world").toString
    val w = new graft.world.World(spark, path, Seq(
      graft.world.DimSpec("d0", graft.core.DimMapping(0, 99, 10)),
      graft.world.DimSpec("d1", graft.core.DimMapping(0, 99, 10))))
    w.create((0L until 100L).map(i => (i, i)).toDF("d0", "d1"))
    val p = w.df.where(col("d0") < 20).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("c0"), p)
  }
}
