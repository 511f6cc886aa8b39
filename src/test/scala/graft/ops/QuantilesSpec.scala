package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Exact-quantile pins: the two-phase order statistic must equal the
  * brute-force sorted-array lookup at every requested fraction, including
  * tie-heavy data (rank assignment within a tie group is arbitrary, the
  * value at a rank is not) and nulls (excluded, as SQL aggregates do). */
class QuantilesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def brute(values: Seq[Double], q: Double): Double = {
    val sorted = values.sorted
    // same ulp-guarded rank as the op (see Quantiles scaladoc) — a bare
    // ceil(q*size) would itself overshoot on products like 0.07*100
    val x = q * sorted.size
    sorted(math.max(math.ceil(x - x * 4e-16).toLong, 1L).toInt - 1)
  }

  test("FP-hostile fractions hit the intended integer rank (DuckDB-probed)") {
    import spark.implicits._
    // 0.07*100 = 7.000000000000001 in doubles; the intended (and DuckDB's)
    // answer is the 7th element, not the 8th — the ulp guard must snap it
    val values = (1 to 100).map(_.toDouble)
    val got = Quantiles.exactQuantiles(
        values.toDF("v").repartition(4), col("v"), Seq(0.07, 0.14, 0.28, 0.55))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    Pins.releaseAll()
    assert(got == Map(0.07 -> 7.0, 0.14 -> 14.0, 0.28 -> 28.0, 0.55 -> 55.0))
  }

  test("matches brute-force order statistics on seeded fuzz with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 3) {
      val n = 997 + trial * 251
      // coarse value grid -> many ties at every quantile boundary
      val values = Seq.fill(n)((rnd.nextInt(50) * 2.5) + 1.0)
      val qs = Seq(0.01, 0.07, 0.25, 0.5, 0.75, 0.9, 1.0)
      val got = Quantiles.exactQuantiles(
          values.toDF("v").repartition(4), col("v"), qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      Pins.releaseAll()
      assert(got.keySet == qs.toSet, s"one row per fraction, got ${got.keySet}")
      qs.foreach(q => assert(got(q) == brute(values, q),
        s"trial $trial q=$q: got ${got(q)}, want ${brute(values, q)}"))
    }
  }

  test("grouped quantiles match per-group brute force, including tiny and tied groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    // group sizes 1, 2, and a few hundred; coarse grid -> ties
    val rows = Seq(("solo", 42.0), ("pair", 1.0), ("pair", 2.0)) ++
      Seq.fill(613)(("big", (rnd.nextInt(40) * 1.25) + 0.5)) ++
      Seq.fill(257)(("mid", (rnd.nextInt(10) * 3.0) + 2.0))
    val qs = Seq(0.07, 0.25, 0.5, 0.75, 1.0)
    val got = Quantiles.groupedExactQuantiles(
        rows.toDF("k", "v").repartition(4), col("k"), col("v"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet == byKey.keySet.flatMap(k => qs.map(k -> _)),
      "one row per (group, fraction)")
    for ((k, vs) <- byKey; q <- qs)
      assert(got((k, q)) == brute(vs, q), s"group $k q=$q")
    // nulls excluded per group
    val withNulls = Seq(("a", Some(10.0)), ("a", None), ("a", Some(30.0)),
      ("b", None), ("b", Some(7.0))).toDF("k", "v")
    val g2 = Quantiles.groupedExactQuantiles(withNulls, col("k"), col("v"), Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(g2 == Map(("a", 0.5) -> 10.0, ("a", 1.0) -> 30.0,
      ("b", 0.5) -> 7.0, ("b", 1.0) -> 7.0))
  }

  test("nulls are excluded; a duplicated-rank fraction pair agrees") {
    import spark.implicits._
    val values = Seq(Some(10.0), None, Some(30.0), Some(20.0), None, Some(40.0))
    val df = values.toDF("v").repartition(3)
    // n=4 after null-drop: q=0.5 -> rank 2 -> 20; q=0.26..0.5 share rank 2
    val got = Quantiles.exactQuantiles(df, col("v"), Seq(0.26, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    Pins.releaseAll()
    assert(got == Map(0.26 -> 20.0, 0.5 -> 20.0, 1.0 -> 40.0))
  }
}
