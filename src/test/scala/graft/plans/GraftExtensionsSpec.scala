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

  test("the r14 crawl/text kernels are callable from SQL") {
    val row = spark.sql(
      """SELECT url_canonical('HTTPS://A.com:443/P?utm_source=x&b=1#f') AS uc,
                nfc_normalize('Cafe\u0301') AS nn,
                html_extract('<p>Hello</p><div><a href="/">nav</a></div>') AS he,
                html_links('<a href="/x">a</a><a href=/y>b</a>') AS hl,
                script_counts('ab \u043c\u0438\u0440').cyrillic AS cyr
         FROM (SELECT 1)""").head()
    assert(row.getAs[String]("uc") == "https://a.com/P?b=1")
    assert(row.getAs[String]("nn") == "Caf\u00e9")
    assert(row.getAs[String]("he") == "Hello")
    assert(row.getAs[scala.collection.Seq[String]]("hl").toSeq == Seq("/x", "/y"))
    assert(row.getAs[Long]("cyr") == 3L)
  }

  test("the r17 embedding/quality kernels are callable from SQL") {
    import spark.implicits._
    val row = spark.sql(
      """SELECT hash_embed('alpha beta gamma', 16) AS emb,
                deflate_ratio(repeat('abcdefgh', 64)) AS dr_rep,
                deflate_ratio('') AS dr_empty
         FROM (SELECT 1)""").head()
    val viaColumn = Seq("alpha beta gamma").toDF("t")
      .select(graft.functions.HashEmbed(
        org.apache.spark.sql.functions.col("t"), 16))
      .as[Seq[Long]].head()
    assert(row.getAs[scala.collection.Seq[Long]]("emb").toSeq == viaColumn,
      "SQL and Column APIs must agree")
    assert(row.getAs[Long]("dr_rep") < 150L, "repeated block must compress")
    assert(row.getAs[Long]("dr_empty") == 1000L)
  }

  test("global rank-family windows auto-route off the single-reducer plan") {
    import spark.implicits._
    // duplicate keys on purpose: rank/dense_rank tie semantics must survive
    // the rewrite (ties never span range-partition slices)
    val rows = (0 until 211).map(i => (i.toLong, (i * 7919 % 23).toLong))
    rows.toDF("id", "k").createOrReplaceTempView("gw_rows")
    val df = spark.sql(
      """SELECT id, k,
                RANK()       OVER (ORDER BY k) AS r,
                DENSE_RANK() OVER (ORDER BY k) AS d,
                ROW_NUMBER() OVER (ORDER BY k, id) AS rn
         FROM gw_rows""")

    // the global window must be GONE from the optimized plan, replaced by
    // the custom node; the physical plan must carry the custom operator
    // and no WindowExec at all
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(df.queryExecution.optimizedPlan.collectFirst {
      case w: LWindow => w }.isEmpty,
      s"no logical Window may remain:\n${df.queryExecution.optimizedPlan}")
    assert(df.queryExecution.optimizedPlan.collectFirst {
      case s: ScalableWindowPlan => s }.nonEmpty,
      s"rewrite must have fired:\n${df.queryExecution.optimizedPlan}")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("ScalableWindow [") &&
      !phys.replace("ScalableWindow [", "").contains("Window ["),
      s"physical plan must use ONLY the custom window operator:\n$phys")

    // exact results, including tie groups
    val got = df.collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._1)
    val sortedKeys = rows.map(_._2).sorted
    val expect = rows.sortBy(_._1).map { case (id, k) =>
      val rank = sortedKeys.indexWhere(_ == k) + 1
      val dense = sortedKeys.distinct.indexWhere(_ == k) + 1
      (id, rank, dense)
    }
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == expect,
      "rank and dense_rank must match the reference computation")
    // row_number over the total order (k, id) is deterministic: sort by
    // (k, id) and number
    val rnExpect = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    assert(got.forall { case (id, _, _, rn) => rnExpect(id) == rn },
      "row_number over a total order must match the reference computation")
  }

  test("rewritten plan is result-identical to the vanilla single-reducer plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 500).map(i => (i.toLong, rnd.nextInt(40).toLong))
      .toDF("id", "k").createOrReplaceTempView("gw_fuzz")
    val sql = """SELECT id, RANK() OVER (ORDER BY k DESC) AS r,
                        DENSE_RANK() OVER (ORDER BY k DESC) AS d,
                        ROW_NUMBER() OVER (ORDER BY k DESC, id) AS rn
                 FROM gw_fuzz"""
    def run() = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).sortBy(_._1).toSeq
    val rewritten = run()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      classOf[GlobalWindowRewrite].getName)
    val vanilla = try run()
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert(rewritten == vanilla,
      "two-phase rewrite must agree with the single-reducer plan (desc order, ties)")
  }

  test("running SUM/COUNT global windows auto-route and agree with vanilla") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // nullable values with entire key runs null: SUM's null semantics (null
    // until the first non-null value globally, earlier-slice totals carried
    // into all-null local prefixes) must survive the rewrite
    (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(50).toLong,
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(100).toLong))
    }.toDF("id", "k", "v").createOrReplaceTempView("gw_agg")
    val sql = """SELECT id,
                        SUM(v)   OVER (ORDER BY k, id) AS s,
                        COUNT(v) OVER (ORDER BY k, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
                 FROM gw_agg"""
    def run() = spark.sql(sql).collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .sortBy(_._1).toSeq
    val df = spark.sql(sql)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(df.queryExecution.optimizedPlan.collectFirst {
      case w: LWindow => w }.isEmpty &&
      df.queryExecution.optimizedPlan.collectFirst {
        case s: ScalableWindowPlan => s }.nonEmpty,
      s"running aggregates must route to the custom node:\n${df.queryExecution.optimizedPlan}")
    val rewritten = run()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      classOf[GlobalWindowRewrite].getName)
    val vanilla = try run()
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert(rewritten == vanilla,
      "running SUM/COUNT rewrite must agree with the single-reducer plan")
  }

  test("stacked global windows and decimal SUM agree with vanilla at 20k rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // two DIFFERENT order specs -> two stacked custom operators; decimal
    // values exercise the typed offset addition; heavy ties exercise the
    // peer-group buffering
    (0 until 20000).map { i =>
      (i.toLong, rnd.nextInt(300).toLong, BigDecimal(rnd.nextInt(10000)) / 100)
    }.toDF("id", "k", "v").createOrReplaceTempView("gw_stack")
    val sql = """SELECT id,
                        SUM(v) OVER (ORDER BY k, id) AS s,
                        RANK() OVER (ORDER BY v DESC) AS r
                 FROM gw_stack"""
    def run() = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getDecimal(1), r.getInt(2))).sortBy(_._1).toSeq
    val rewritten = run()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      classOf[GlobalWindowRewrite].getName)
    val vanilla = try run()
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert(rewritten == vanilla,
      "stacked custom windows must agree with the single-reducer plans")
  }

  test("unsupported window forms are left alone (decimal avg, bounded frames, try_avg)") {
    import spark.implicits._
    (0 until 40).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "k")
      .createOrReplaceTempView("gw_skip")
    // (FILTER-clause window aggregates never reach the optimizer \u2014 the
    // analyzer rejects them \u2014 so only decomposability gaps are probed here.
    // AVG itself is now auto-routed for DoubleType results; what must stay
    // vanilla: decimal AVG \u2014 its precision/scale propagation \u2014 try_avg's
    // on-overflow-null, and bounded frames.)
    for (sql <- Seq(
      "SELECT AVG(CAST(k AS DECIMAL(10,2))) OVER (ORDER BY id) AS a FROM gw_skip",
      "SELECT TRY_AVG(k) OVER (ORDER BY id) AS a FROM gw_skip",
      "SELECT SUM(k) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a FROM gw_skip")) {
      val p = spark.sql(sql).queryExecution.optimizedPlan.toString
      assert(!p.contains("ScalableWindowPlan"), s"must not rewrite: $sql\n$p")
    }
    // and the routed AVG really is the DoubleType form
    val routed = spark.sql("SELECT AVG(k) OVER (ORDER BY id) AS a FROM gw_skip")
    assert(routed.queryExecution.optimizedPlan.toString.contains("ScalableWindowPlan"),
      "double AVG must auto-route")
  }

  test("interval SUM windows are not rewritten; ANSI long overflow stays loud") {
    import spark.implicits._
    // Spark 4's Sum also produces ANSI intervals \u2014 the exec's typed adder
    // doesn't, so eligibility must leave them on the vanilla plan
    (1 to 10).map(i => (i.toLong, i)).toDF("id", "h").createOrReplaceTempView("gw_iv")
    val iv = spark.sql(
      "SELECT id, SUM(make_dt_interval(0, h, 0, 0)) OVER (ORDER BY id) AS s FROM gw_iv")
    assert(!iv.queryExecution.optimizedPlan.toString.contains("ScalableWindowPlan"),
      s"interval sums must stay vanilla:\n${iv.queryExecution.optimizedPlan}")
    assert(iv.count() == 10, "the vanilla interval window must still run")

    // ANSI (the Spark 4 default) errors on running-sum overflow; the
    // rewrite must error too, not wrap to negative garbage
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    Seq((1L, Long.MaxValue / 2 + 1), (2L, Long.MaxValue / 2 + 1))
      .toDF("id", "v").createOrReplaceTempView("gw_ovf")
    val q = spark.sql("SELECT id, SUM(v) OVER (ORDER BY id) AS s FROM gw_ovf")
    assert(q.queryExecution.optimizedPlan.toString.contains("ScalableWindowPlan"))
    val e = intercept[Exception](q.collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[ArithmeticException] ||
      String.valueOf(c.getMessage).toLowerCase.contains("overflow")),
      s"expected an overflow error, got $e")
  }

  test("partitioned windows are left alone") {
    import spark.implicits._
    (0 until 50).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "k")
      .createOrReplaceTempView("gw_part")
    val df = spark.sql(
      "SELECT id, RANK() OVER (PARTITION BY k ORDER BY id) AS r FROM gw_part")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "a partitioned window must not be rewritten")
    assert(!df.queryExecution.optimizedPlan.toString.contains("ScalableWindowPlan"))
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
