package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge-case pins for the custom global-window operator, each compared
  * against the vanilla single-reducer plan on the same session (rule
  * excluded via conf): empty input, one giant tie group, null order keys
  * under both null orderings, descending order, and fewer distinct keys
  * than shuffle partitions (the RangePartitioner legitimately collapses to
  * fewer partitions than configured). */
class ScalableWindowExecSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def bothWays(sql: String, expectRewrite: Boolean = true): (Seq[String], Seq[String]) = {
    def run(): Seq[String] = spark.sql(sql).collect().map(_.toString).sorted.toSeq
    val df = spark.sql(sql)
    if (expectRewrite)
      assert(df.queryExecution.optimizedPlan.collectFirst {
        case s: ScalableWindowPlan => s }.nonEmpty,
        s"rewrite must fire for: $sql\n${df.queryExecution.optimizedPlan}")
    val rewritten = run()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      classOf[GlobalWindowRewrite].getName)
    val vanilla = try {
      // the comparison is vacuous unless the exclusion really produced
      // the vanilla plan — pin it, so a future change to how the rule is
      // registered can't silently turn every r == v into exec-vs-itself
      assert(spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
        case s: ScalableWindowPlan => s }.isEmpty,
        "excluded-rule leg must plan vanilla")
      run()
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    (rewritten, vanilla)
  }

  test("empty input produces empty output") {
    import spark.implicits._
    // empty relations constant-fold away before any window exists — the
    // point here is that the OUTPUT (schema + emptiness) matches vanilla
    Seq.empty[(Long, Long)].toDF("id", "k").createOrReplaceTempView("swe_empty")
    val (r, v) = bothWays(
      "SELECT id, RANK() OVER (ORDER BY k) AS r, SUM(k) OVER (ORDER BY k, id) AS s FROM swe_empty",
      expectRewrite = false)
    assert(r.isEmpty && v.isEmpty)
  }

  test("one giant tie group (every key equal)") {
    import spark.implicits._
    (0 until 1000).map(i => (i.toLong, 7L)).toDF("id", "k")
      .createOrReplaceTempView("swe_ties")
    val (r, v) = bothWays(
      "SELECT id, RANK() OVER (ORDER BY k) AS r, DENSE_RANK() OVER (ORDER BY k) AS d," +
        " SUM(k) OVER (ORDER BY k) AS s FROM swe_ties")
    // rank 1 / dense 1 / peer-inclusive sum 7000 for every row, both plans
    assert(r == v)
    assert(r.forall(_.contains(",1,1,7000]")), s"sample: ${r.take(2)}")
  }

  test("null order keys, default and NULLS LAST orderings") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (i.toLong, if (i % 7 == 0) None else Some((i % 13).toLong))
    }
    rows.toDF("id", "k").createOrReplaceTempView("swe_nulls")
    for (ord <- Seq("k", "k DESC", "k NULLS LAST", "k DESC NULLS FIRST")) {
      val (r, v) = bothWays(
        s"SELECT id, RANK() OVER (ORDER BY $ord) AS r, DENSE_RANK() OVER (ORDER BY $ord) AS d FROM swe_nulls")
      assert(r == v, s"ordering '$ord' diverged")
    }
  }

  test("fewer distinct keys than shuffle partitions (collapsed partitioner)") {
    import spark.implicits._
    // 2 distinct keys, 4 configured partitions: RangePartitioner yields
    // fewer slices than configured and the offsets must still line up
    (0 until 100).map(i => (i.toLong, (i % 2).toLong)).toDF("id", "k")
      .createOrReplaceTempView("swe_few")
    val (r, v) = bothWays(
      "SELECT id, RANK() OVER (ORDER BY k) AS r, ROW_NUMBER() OVER (ORDER BY k, id) AS rn," +
        " COUNT(k) OVER (ORDER BY k, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c" +
        " FROM swe_few")
    assert(r == v)
  }

  test("ntile / percent_rank / cume_dist closed forms match vanilla, ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    (0 until 997).map(i => (i.toLong, rnd.nextInt(40).toLong)).toDF("id", "k")
      .createOrReplaceTempView("swe_dist")
    // 997 % 4 = 1 exercises the uneven-tile split; ties exercise the
    // tie-aware rank in percent_rank and peer-inclusive cume_dist
    val (r, v) = bothWays(
      """SELECT id, NTILE(4) OVER (ORDER BY k, id) AS t,
                PERCENT_RANK() OVER (ORDER BY k) AS pr,
                CUME_DIST() OVER (ORDER BY k) AS cd
         FROM swe_dist""")
    assert(r == v)
    // N < k edge: every row its own tile, numbered by position
    Seq((1L, 9L), (2L, 3L)).toDF("id", "k").createOrReplaceTempView("swe_tiny")
    val (r2, v2) = bothWays(
      "SELECT id, NTILE(5) OVER (ORDER BY k, id) AS t FROM swe_tiny")
    assert(r2 == v2)
    // percent_rank WITHOUT cume_dist in the window takes the STREAMING
    // path (no peer buffer) — its tie handling must hold there too
    val (r3, v3) = bothWays(
      "SELECT id, PERCENT_RANK() OVER (ORDER BY k) AS pr FROM swe_dist")
    assert(r3 == v3)
  }

  test("ROWS-framed SUM alone takes the streaming path and stays exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    (0 until 3000).map { i =>
      (i.toLong, rnd.nextInt(25).toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000).toLong))
    }.toDF("id", "k", "v").createOrReplaceTempView("swe_rows")
    // no RANGE aggregate, no CUME_DIST in the window -> no peer buffer;
    // the running sum advances inside the streaming one-in-one-out loop
    val (r, v) = bothWays(
      """SELECT id, SUM(v) OVER (ORDER BY k, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
         FROM swe_rows""")
    assert(r == v)
  }

  test("running MIN/MAX/AVG match vanilla on tie-heavy data with nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // few distinct keys -> big tie groups (the RANGE default frame is
    // peer-inclusive, so every tie group must agree with vanilla); ~20%
    // null values exercise the null-skipping of all three aggregates.
    // AVG inputs are integer-valued so the double prefix sums are exact
    // under any addition grouping — the comparison is bit-for-bit.
    (0 until 1500).map { i =>
      (i.toLong, rnd.nextInt(6).toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(500).toLong))
    }.toDF("id", "k", "v").createOrReplaceTempView("swe_mma")
    val (r, v) = bothWays(
      """SELECT id, MIN(v) OVER (ORDER BY k) AS mn,
                MAX(v) OVER (ORDER BY k) AS mx,
                AVG(CAST(v AS DOUBLE)) OVER (ORDER BY k) AS av
         FROM swe_mma""")
    assert(r == v)
    // ROWS frame -> the streaming (no peer buffer) path
    val (r2, v2) = bothWays(
      """SELECT id, MIN(v) OVER (ORDER BY k, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn,
                MAX(v) OVER (ORDER BY k, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx,
                AVG(CAST(v AS DOUBLE)) OVER (ORDER BY k, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS av
         FROM swe_mma""")
    assert(r2 == v2)
    // string MIN/MAX: any orderable type rides the same slice-totals shape
    (0 until 300).map(i => (i.toLong, s"w${rnd.nextInt(20)}"))
      .toDF("id", "s").createOrReplaceTempView("swe_str")
    val (r3, v3) = bothWays(
      "SELECT id, MIN(s) OVER (ORDER BY id) AS mn, MAX(s) OVER (ORDER BY id) AS mx FROM swe_str")
    assert(r3 == v3)
  }

  test("all-null aggregate inputs stay null end to end") {
    import spark.implicits._
    (0 until 100).map(i => (i.toLong, (i % 3).toLong, Option.empty[Long]))
      .toDF("id", "k", "v").createOrReplaceTempView("swe_allnull")
    val (r, v) = bothWays(
      """SELECT id, MIN(v) OVER (ORDER BY k) AS mn,
                MAX(v) OVER (ORDER BY k) AS mx,
                AVG(CAST(v AS DOUBLE)) OVER (ORDER BY k) AS av,
                SUM(v) OVER (ORDER BY k) AS s
         FROM swe_allnull""")
    assert(r == v)
    assert(r.forall(_.endsWith(",null,null,null,null]")), s"sample: ${r.take(2)}")
  }

  test("LAG/LEAD auto-route under assumeTotalOrder matches vanilla") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    (0 until 800).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "v").createOrReplaceTempView("swe_lag")
    spark.conf.set("spark.graft.window.assumeTotalOrder", "true")
    try {
      // id is unique, so the order is total and vanilla is deterministic;
      // k=7 with 4 slices of ~200 exercises within-slice lag, and k=250
      // EXCEEDS the expected slice size, so donors must chain across
      // multiple predecessor slices
      for (k <- Seq(1, 7, 250)) {
        val (r, v) = bothWays(
          s"""SELECT id, LAG(v, $k) OVER (ORDER BY id) AS lg,
                  LEAD(v, $k) OVER (ORDER BY id) AS ld,
                  LAG(v, $k, -1) OVER (ORDER BY id) AS lgd
             FROM swe_lag""")
        assert(r == v, s"offset $k diverged")
      }
      // mixed with streaming kinds in one window
      val (r2, v2) = bothWays(
        """SELECT id, LAG(v, 2) OVER (ORDER BY id) AS lg,
                ROW_NUMBER() OVER (ORDER BY id) AS rn,
                SUM(v) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS s
           FROM swe_lag""")
      assert(r2 == v2)
    } finally spark.conf.unset("spark.graft.window.assumeTotalOrder")
  }

  test("LAG/LEAD stay vanilla without the conf; ties fail loudly with it") {
    import spark.implicits._
    (0 until 100).map(i => (i.toLong, (i % 5).toLong))
      .toDF("id", "k").createOrReplaceTempView("swe_lagties")
    // conf off: the rewrite must not touch offset functions
    val p = spark.sql("SELECT LAG(id, 1) OVER (ORDER BY id) AS l FROM swe_lagties")
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("ScalableWindowPlan"), s"must stay vanilla without conf:\n$p")
    spark.conf.set("spark.graft.window.assumeTotalOrder", "true")
    try {
      // the assertion is CHECKED: ORDER BY k has ties (k repeats 20x), so
      // the exec must refuse — donor values under ties can belong to a
      // different tie permutation than the emission read
      val df = spark.sql("SELECT LAG(id, 1) OVER (ORDER BY k) AS l FROM swe_lagties")
      assert(df.queryExecution.optimizedPlan.toString.contains("ScalableWindowPlan"))
      val e = intercept[Exception](df.collect())
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.getMessage != null) &&
        causes(e).exists(c => c.getMessage != null &&
          c.getMessage.contains("assumeTotalOrder")),
        s"expected the ties check to fire, got: $e")
      // mixing with a peer-buffered kind stays vanilla even with the conf
      val mixed = spark.sql(
        """SELECT LAG(id, 1) OVER (ORDER BY id) AS l,
                  CUME_DIST() OVER (ORDER BY id) AS cd
           FROM swe_lagties""").queryExecution.optimizedPlan.toString
      assert(!mixed.contains("ScalableWindowPlan"),
        s"offset + peer-buffered must stay vanilla:\n$mixed")
    } finally spark.conf.unset("spark.graft.window.assumeTotalOrder")
  }

  test("tie-group buffer spills under vanilla's thresholds and stays exact") {
    import spark.implicits._
    // one giant tie group (the adversarial shape) with thresholds forced
    // tiny: the group buffer must go through its spill path — in-memory
    // cap 16 rows, spill file every 32 — and still emit the same
    // peer-inclusive results as vanilla
    (0 until 2000).map(i => (i.toLong, 5L, (i % 97).toLong))
      .toDF("id", "k", "v").createOrReplaceTempView("swe_spill")
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "16")
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "32")
    try {
      val (r, v) = bothWays(
        """SELECT id, CUME_DIST() OVER (ORDER BY k) AS cd,
                  SUM(v) OVER (ORDER BY k) AS s,
                  MIN(v) OVER (ORDER BY k) AS mn
           FROM swe_spill""")
      assert(r == v)
    } finally {
      spark.conf.unset("spark.sql.windowExec.buffer.in.memory.threshold")
      spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
    }
  }

  test("single row") {
    import spark.implicits._
    Seq((1L, 5L)).toDF("id", "k").createOrReplaceTempView("swe_one")
    val (r, v) = bothWays(
      "SELECT id, RANK() OVER (ORDER BY k) AS r, SUM(k) OVER (ORDER BY k, id) AS s FROM swe_one")
    assert(r == v && r.length == 1)
  }
}
