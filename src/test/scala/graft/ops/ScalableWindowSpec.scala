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
