package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MixtureSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** the naive definition: one global running sum per source */
  private def naive(df: org.apache.spark.sql.DataFrame,
      budget: org.apache.spark.sql.Column): Set[Long] = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    df.withColumn("_cum", sum(col("w")).over(w))
      .where(col("_cum") <= budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  private def mk(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "w")
  }

  test("matches the naive per-source running-sum prefix on fuzzed data") {
    val rnd = new scala.util.Random(77L)
    val rows = (1L to 400L).map { i =>
      (i, s"s${rnd.nextInt(5)}", (rnd.nextInt(50) + 1).toLong)
    }
    val df = mk(rows)
    val budget = (regexp_extract(col("source"), "(\\d+)", 1).cast("long") + 1) * 300
    for (h <- Seq(1, 2)) {
      val got = Mixture.budgetPrefix(df, "source", "w", budget, hexDigits = h)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == naive(df, budget), s"hexDigits=$h")
    }
  }

  test("budget edges: zero takes nothing, oversized takes everything, exact boundary is inclusive") {
    val df = mk(Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L)))
    assert(Mixture.budgetPrefix(df, "source", "w", lit(0L)).count() == 0)
    assert(Mixture.budgetPrefix(df, "source", "w", lit(1000L)).count() == 3)
    // budget exactly equal to a prefix sum: that doc is IN (inclusive)
    val atTwenty = Mixture.budgetPrefix(df, "source", "w", lit(20L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(atTwenty == naive(df, lit(20L)))
    assert(atTwenty.size == 2)
  }

  test("zero-weight docs follow the inclusive-prefix definition at every bucket boundary") {
    // the r14-ADVICE seam: a zero-weight doc leading a bucket whose prefix
    // START equals the budget is inside the naive inclusive prefix
    // (cum == budget), so the straddle filter must admit _cumStart ==
    // budget. Budgets are taken from the data's own bucket starts so the
    // exact seam is exercised for every bucket, not left to fuzz luck.
    val rnd = new scala.util.Random(15L)
    val rows = (1L to 200L).map { i =>
      (i, "s", if (i % 3 == 0) 0L else (rnd.nextInt(20) + 1).toLong)
    }
    val df = mk(rows)
    val starts = df
      .withColumn("_bk",
        conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
          .cast("long"))
      .groupBy("_bk").agg(sum("w").as("bw"))
      .withColumn("cs", sum("bw").over(Window.orderBy("_bk")) - col("bw"))
      .select("cs").collect().map(_.getLong(0)).toSet
    for (b <- starts) {
      val got = Mixture.budgetPrefix(df, "source", "w", lit(b), hexDigits = 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == naive(df, lit(b)), s"budget=$b")
    }
  }

  test("negative weights fail loudly — prefix semantics are undefined there") {
    val df = mk(Seq((1L, "a", 5L), (2L, "a", -1L)))
    val e = intercept[Throwable](
      Mixture.budgetPrefix(df, "source", "w", lit(10L)).collect())
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${chain(t.getCause)}"
    assert(chain(e).contains("negative w"), chain(e).take(300))
  }

  test("temperatureBudgets: alpha=1 is proportional, alpha=0.5 up-samples small sources, total bounded") {
    import spark.implicits._
    // sources with 10_000 / 90_000 weight: proportional split is 10/90;
    // sqrt-flattened is 100/300 = 25/75 — the small source gains share
    val df = Seq(("a", 10000L), ("b", 90000L)).toDF("source", "w")
      .withColumn("doc_id", monotonically_increasing_id())
    def budgets(alpha: Double): Map[String, Long] =
      Mixture.temperatureBudgets(df, "source", "w", 1000L, alpha)
        .select("source", "_sbudget").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(budgets(1.0) == Map("a" -> 100L, "b" -> 900L))
    assert(budgets(0.5) == Map("a" -> 250L, "b" -> 750L))
    // floor division can only under-allocate, never overshoot the total
    for (alpha <- Seq(1.0, 0.7, 0.5)) {
      val total = budgets(alpha).values.sum
      assert(total <= 1000L && total >= 998L, s"alpha=$alpha got $total")
    }
    // an all-zero-weight corpus gets budget 0 everywhere — never a
    // divide-by-zero from deep inside the plan
    val zeros = Seq(("a", 0L), ("b", 0L)).toDF("source", "w")
      .withColumn("doc_id", monotonically_increasing_id())
    assert(Mixture.temperatureBudgets(zeros, "source", "w", 1000L, 1.0)
      .select("_sbudget").collect().map(_.getLong(0)).toSeq == Seq(0L, 0L))
  }

  test("temperaturePrefix composes: per-source takes equal budgetPrefix at the flattened budgets") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val df = (1L to 300L).map { i =>
      (i, s"s${rnd.nextInt(3)}", (rnd.nextInt(40) + 1).toLong)
    }.toDF("doc_id", "source", "w")
    val got = Mixture.temperaturePrefix(df, "source", "w", 2000L,
        alpha = 0.5, hexDigits = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // reference: flattened budgets joined back, naive running-sum prefix
    val b = Mixture.temperatureBudgets(df, "source", "w", 2000L, 0.5)
      .select(col("source"), col("_sbudget"))
    val naiveRef = df.join(b, "source")
      .withColumn("_cum", sum(col("w")).over(
        Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .where(col("_cum") <= col("_sbudget"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == naiveRef)
  }

  test("budgets are independent per source") {
    val df = mk(Seq((1L, "s0", 5L), (2L, "s0", 5L), (3L, "s1", 5L), (4L, "s1", 5L)))
    val budget = when(col("source") === "s0", 5L).otherwise(100L)
    val got = Mixture.budgetPrefix(df, "source", "w", budget)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s0" -> 1L, "s1" -> 2L))
  }

  test("output carries the input columns, nothing else") {
    val df = mk(Seq((1L, "a", 3L)))
    assert(Mixture.budgetPrefix(df, "source", "w", lit(10L)).columns.toSeq ==
      Seq("doc_id", "source", "w"))
  }
}
