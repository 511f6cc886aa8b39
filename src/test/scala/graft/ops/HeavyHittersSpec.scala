package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the two-phase exact heavy-hitter scheme. The dangerous failure
  * mode is a FALSE NEGATIVE in candidate generation (a globally-heavy key
  * whose copies are spread so thin no partition emits it) — the pigeonhole
  * floor must make that impossible; the verify stage already guarantees no
  * false positives.
  */
class HeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df(keys: Seq[Long], slices: Int) = {
    import spark.implicits._
    spark.sparkContext.parallelize(keys, slices).toDF("k")
  }

  test("exact counts above the threshold, nothing below") {
    val keys = Seq.fill(10)(1L) ++ Seq.fill(7)(2L) ++ Seq.fill(3)(3L) ++ Seq(4L)
    val got = HeavyHitters.exact(df(keys, 4), "k", minCount = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 7L)))
  }

  test("a heavy key spread evenly across partitions still surfaces") {
    // key 42 appears exactly twice in each of 4 partitions (global 8); with
    // T = 8 the local floor is ceil(8/4) = 2, met in every partition only
    // at the boundary — a floor off by one would lose it entirely
    val spread = (0 until 4).flatMap(p => Seq(42L, 42L) ++ Seq.tabulate(6)(i => p * 100L + i))
    val got = HeavyHitters.exact(df(spread, 4), "k", minCount = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((42L, 8L)))
  }

  test("seeded fuzz: matches brute-force GROUP BY / HAVING") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 2000
      // zipf-ish: low keys heavy, long uniform tail
      val keys = Seq.fill(n) {
        if (rnd.nextInt(3) == 0) rnd.nextInt(5).toLong
        else rnd.nextInt(500).toLong
      }
      val t = 20L + trial * 10
      val input = df(keys, 4)
      val got = HeavyHitters.exact(input, "k", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = input.groupBy("k").agg(count(lit(1)).as("n"))
        .where(col("n") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"trial $trial, threshold $t")
    }
  }
}
