package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The two-phase prefix aggregation must be indistinguishable from the
  * single-reducer global window it replaces — on every N mod k shape — while
  * actually running the data-sized window per slice. */
class ScalableWindowSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4") // > 1 slice, forces real offsets
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Deterministic pseudo-shuffled rows: id, a scrambled order key, a value. */
  private def rows(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val key = (i * 7919) % n  // permutation-ish scramble (7919 prime)
      (i.toLong, key.toLong, (i % 13).toLong)
    }.toDF("id", "key", "v").repartition(4) // arbitrary placement, not sorted
  }

  test("runningSum matches the single-reducer global window exactly") {
    val df = rows(1003)
    val order = Seq(col("key"), col("id")) // unique tie-break
    val scalable = ScalableWindow.runningSum(df, order, col("v"), "run")
      .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = df.withColumn("run", sum("v").over(
        Window.orderBy(col("key"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "run").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scalable == naive)
  }

  test("runningSum null semantics match the single-reducer window (all-null slice prefixes)") {
    import spark.implicits._
    // keys 0..59 range-partition into slices; values null except at a few
    // keys, so entire slice PREFIXES are null — rows there must inherit the
    // earlier slices' total (null only before the first non-null globally)
    val df = (0 until 60).map { i =>
      (i.toLong, i.toLong, if (i == 7 || i == 40) Some(i.toLong) else None)
    }.toDF("id", "key", "v").repartition(4)
    val order = Seq(col("key"), col("id"))
    val scalable = ScalableWindow.runningSum(df, order, col("v"), "run")
      .select("id", "run").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val naive = df.withColumn("run", sum("v").over(
        Window.orderBy(col("key"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "run").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(scalable == naive)
    assert(scalable(0L).isEmpty && scalable(7L).contains(7L) && scalable(20L).contains(7L),
      "sanity: null before first value, carried total afterwards")
  }

  test("runningMin/Max/Avg match the single-reducer window, nulls included") {
    import spark.implicits._
    // ~1/5 null values; integer-valued doubles keep the AVG prefix sums
    // exact under any addition grouping, so the compare is bit-for-bit
    val rnd = new scala.util.Random(17)
    val df = (0 until 900).map { i =>
      (i.toLong, ((i * 7919) % 900).toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(400).toLong))
    }.toDF("id", "key", "v").repartition(4)
    val order = Seq(col("key"), col("id"))
    val w = Window.orderBy(col("key"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def collectOpt(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("id"), col(c)).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.get(1)))).toMap
    assert(collectOpt(ScalableWindow.runningMin(df, order, col("v"), "m"), "m") ==
      collectOpt(df.withColumn("m", min("v").over(w)), "m"))
    assert(collectOpt(ScalableWindow.runningMax(df, order, col("v"), "m"), "m") ==
      collectOpt(df.withColumn("m", max("v").over(w)), "m"))
    assert(collectOpt(ScalableWindow.runningAvg(df, order, col("v"), "a"), "a") ==
      collectOpt(df.withColumn("a", avg("v").over(w)), "a"))
    // all-null prefix slices: min/avg must inherit the earlier slices'
    // state, null only before the first non-null globally
    val sparse = (0 until 60).map { i =>
      (i.toLong, i.toLong, if (i == 7 || i == 40) Some(i.toLong) else None)
    }.toDF("id", "key", "v").repartition(4)
    val sOrder = Seq(col("key"), col("id"))
    assert(collectOpt(ScalableWindow.runningMin(sparse, sOrder, col("v"), "m"), "m") ==
      collectOpt(sparse.withColumn("m", min("v").over(w)), "m"))
    assert(collectOpt(ScalableWindow.runningAvg(sparse, sOrder, col("v"), "a"), "a") ==
      collectOpt(sparse.withColumn("a", avg("v").over(w)), "a"))
    // the fused one-pass face equals the three singles (and vanilla)
    val fused = ScalableWindow.runningMinMaxAvg(
      df, order, col("v"), col("v"), "fmn", "fmx", "fav")
    val want = df.withColumn("fmn", min("v").over(w))
      .withColumn("fmx", max("v").over(w))
      .withColumn("fav", avg("v").over(w))
    for (c <- Seq("fmn", "fmx", "fav"))
      assert(collectOpt(fused, c) == collectOpt(want, c), s"fused $c diverged")
  }

  test("rowNumber matches global row_number, and the data-sized window is sliced") {
    val df = rows(500)
    val order = Seq(col("key"), col("id"))
    val out = ScalableWindow.rowNumber(df, order, "rn")
    val scalable = out.select("id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = df.withColumn("rn",
        row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scalable == naive)
    // the window over the DATA runs per-slice (keyed by _pid); only the
    // offsets table (one row per slice) may use a global window
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("_pid"), s"expected slice-keyed window:\n$plan")
  }

  test("ntile matches SQL NTILE on remainder, exact-division and N<k shapes") {
    for (n <- Seq(1003, 1000, 3)) { // N%4 = 3, 0, and N < k
      val df = rows(n)
      val order = Seq(col("key"), col("id"))
      val scalable = ScalableWindow.ntile(df, order, 4, "ph")
        .select("id", "ph").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val naive = df.withColumn("ph",
          ntile(4).over(Window.orderBy(col("key"), col("id"))).cast("long"))
        .select("id", "ph").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(scalable == naive, s"N=$n")
    }
  }

  test("rank is a bijection onto 1..N at a size where AQE reshapes exchanges") {
    // the slice-consistency failure mode produces ranks BEYOND N (offsets
    // added to local values from a differently-coalesced branch) — a
    // bijection check catches it structurally, independent of any oracle
    val df = rows(20000)
    val rks = ScalableWindow.rowNumber(df, Seq(col("key"), col("id")), "rn")
      .select("rn").collect().map(_.getLong(0)).sorted
    assert(rks.head == 1L && rks.last == 20000L && rks.length == 20000 &&
      rks.distinct.length == 20000, "ranks must be exactly 1..N")
  }

  /** Rows with HEAVY ties: ~20 rows per key value, so tie groups are real
    * and (at 4 slices) key groups sit well inside and right at boundaries. */
  private def tiedRows(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      ((i * 7919) % n + 0L, ((i * 31) % (n / 20)).toLong, (i % 13).toLong)
    }.toDF("id", "key", "v").repartition(4)
  }

  test("rank and denseRank match the single-reducer window on duplicate keys") {
    val df = tiedRows(1000)
    val order = Seq(col("key")) // NOT a total order — ties are the point
    val scalable = ScalableWindow.denseRank(
        ScalableWindow.rank(df, order, "rnk"), order, "drnk")
      .select("id", "rnk", "drnk").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val naive = df
      .withColumn("rnk", rank().over(Window.orderBy(col("key"))).cast("long"))
      .withColumn("drnk", dense_rank().over(Window.orderBy(col("key"))).cast("long"))
      .select("id", "rnk", "drnk").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(scalable == naive)
  }

  test("rank offsets are tie-aware across a forced boundary tie group") {
    // every row shares ONE key value -> all rows are a single tie group; if
    // equal keys could straddle slices, per-slice rank restarts would show
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, 7L)).toDF("id", "key").repartition(4)
    val out = ScalableWindow.rank(df, Seq(col("key")), "rnk")
      .select("rnk").distinct().collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L), "a single global tie group must rank 1 everywhere")
    val dout = ScalableWindow.denseRank(df, Seq(col("key")), "drnk")
      .select("drnk").distinct().collect().map(_.getLong(0))
    assert(dout.toSeq == Seq(1L))
  }

  test("combined rankAndDenseRank / lagAndLead equal their two-pass forms") {
    val df = tiedRows(600)
    val keyOrder = Seq(col("key"))
    val both = ScalableWindow.rankAndDenseRank(df, keyOrder, "rnk", "drnk")
      .select("id", "rnk", "drnk").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val twoPass = ScalableWindow.denseRank(
        ScalableWindow.rank(df, keyOrder, "rnk"), keyOrder, "drnk")
      .select("id", "rnk", "drnk").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(both == twoPass)
    val df2 = rows(501)
    val order = Seq(col("key"), col("id"))
    val shifted = ScalableWindow.lagAndLead(df2, order, col("v"), 2, "lg", "ld")
      .select("id", "lg", "ld").collect()
      .map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    val sep = ScalableWindow.lead(
        ScalableWindow.lag(df2, order, col("v"), 2, "lg"), order, col("v"), 2, "ld")
      .select("id", "lg", "ld").collect()
      .map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    assert(shifted == sep)
  }

  test("lag and lead match the single-reducer window, incl. k > slice size") {
    // 10 rows over 4 slices: slices of ~2-3 rows, so k=3 forces donors to
    // come from non-adjacent slices
    for ((n, k) <- Seq((1003, 1), (1003, 3), (10, 3))) {
      val df = rows(n)
      val order = Seq(col("key"), col("id"))
      val scalable = ScalableWindow.lead(
          ScalableWindow.lag(df, order, col("v"), k, "lg"), order, col("v"), k, "ld")
        .select("id", "lg", "ld").collect()
        .map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2))))).toMap
      val w = Window.orderBy(col("key"), col("id"))
      val naive = df
        .withColumn("lg", lag(col("v"), k).over(w))
        .withColumn("ld", lead(col("v"), k).over(w))
        .select("id", "lg", "ld").collect()
        .map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2))))).toMap
      assert(scalable == naive, s"n=$n k=$k")
    }
  }

  test("distribution matches single-reducer PERCENT_RANK and CUME_DIST on duplicate keys") {
    import spark.implicits._
    // key = i % 37: every key a tie group, groups span slice-boundary sizes
    val df = (1 to 1003).map(i => (i.toLong, (i % 37).toLong)).toDF("id", "key")
      .repartition(4)
    val got = ScalableWindow.distribution(df, Seq(col("key")), "pct", "cd")
      .select("id", "pct", "cd").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val naive = df
      .withColumn("pct", percent_rank().over(Window.orderBy("key")))
      .withColumn("cd", cume_dist().over(Window.orderBy("key")))
      .select("id", "pct", "cd").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == naive, "distribution stats must equal the single-reducer window bit-for-bit")
    Pins.releaseAll()
  }

  test("distribution edges: N = 1 and all-equal keys") {
    import spark.implicits._
    val one = ScalableWindow.distribution(
        Seq((1L, 5L)).toDF("id", "key"), Seq(col("key")), "pct", "cd")
      .select("pct", "cd").collect().head
    assert(one.getDouble(0) == 0.0 && one.getDouble(1) == 1.0)
    val allTies = (1 to 40).map(i => (i.toLong, 9L)).toDF("id", "key")
    val r = ScalableWindow.distribution(allTies, Seq(col("key")), "pct", "cd")
      .select("pct", "cd").distinct().collect()
    assert(r.length == 1 && r.head.getDouble(0) == 0.0 && r.head.getDouble(1) == 1.0,
      "one global tie group: pct 0 everywhere, cume 1 everywhere")
    Pins.releaseAll()
  }

  test("pinned slice checkpoints are released by Pins.releaseAll") {
    val sc = spark.sparkContext
    Pins.releaseAll() // clear anything earlier tests pinned
    val before = sc.getPersistentRDDs.keySet
    val df = rows(500)
    val order = Seq(col("key"), col("id"))
    ScalableWindow.runningSum(df, order, col("v"), "run").collect()
    ScalableWindow.rank(df, Seq(col("key")), "rnk").collect()
    ScalableWindow.lag(df, order, col("v"), 1, "lg").collect()
    assert(Pins.retainedCount > 0, "operators should have pinned checkpoints")
    Pins.releaseAll()
    assert(Pins.retainedCount == 0)
    // unpersist is async (blocking = false); poll briefly for the blocks to
    // leave the context's persistent-RDD map
    val deadline = System.nanoTime() + 10000000000L
    def leaked = sc.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"pinned RDDs still persisted: $leaked")
  }

  test("descending order keys work end to end") {
    val df = rows(200)
    val order = Seq(col("key").desc, col("id"))
    val scalable = ScalableWindow.rowNumber(df, order, "rn")
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = df.withColumn("rn",
        row_number().over(Window.orderBy(col("key").desc, col("id"))).cast("long"))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scalable == naive)
  }
}
