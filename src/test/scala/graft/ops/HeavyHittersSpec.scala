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

  test("string keys match brute-force GROUP BY / HAVING") {
    import spark.implicits._
    val words = Seq.fill(9)("alpha") ++ Seq.fill(6)("beta") ++
      Seq.fill(2)("gamma") ++ Seq("delta")
    val input = spark.sparkContext.parallelize(words, 4).toDF("w")
    val got = HeavyHitters.exactString(input, "w", minCount = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("alpha", 9L), ("beta", 6L)))
  }

  test("capped local map stays exact under overflow (cardinality >> cap)") {
    // cap of 16 against ~600 distinct keys per partition: every partition
    // overflows many times; the median-flush must keep emitting evicted
    // keys as candidates so the final answer still equals brute force
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(6000) {
      if (rnd.nextInt(4) == 0) rnd.nextInt(3).toLong else rnd.nextInt(2000).toLong
    }
    val input = df(keys, 4)
    for (t <- Seq(5L, 40L, 300L)) {
      val got = HeavyHitters.exact(input, "k", t, localMapCap = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = input.groupBy("k").agg(count(lit(1)).as("n"))
        .where(col("n") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"threshold $t with cap 16")
    }
  }

  test("a heavy key spread at the floor survives a tiny cap") {
    // same boundary case as above but with cap 4, so the heavy key itself
    // gets evicted and re-inserted mid-partition — the flush emission path
    // is what must carry it into the candidate set
    val spread = (0 until 4).flatMap(p => Seq.tabulate(6)(i => p * 100L + i) ++ Seq(42L, 42L))
    val got = HeavyHitters.exact(df(spread, 4), "k", minCount = 8, localMapCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((42L, 8L)))
  }

  test("minCount <= partition count degrades to the naive distinct pass") {
    import spark.implicits._
    // floor = ceil(3/4) = 1: every key is a candidate and phase 1 can prune
    // nothing, so the candidate volume must equal exactly what the naive
    // GROUP BY would shuffle — one entry per (partition, distinct key) —
    // not the capped count map's emission, and certainly not one per row
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(3000)(rnd.nextInt(200).toLong)
    val ks = spark.sparkContext.parallelize(keys, 4)
    val naiveVolume = ks.mapPartitions(it => Iterator(it.toSet.size)).sum().toLong
    val candVolume = HeavyHitters.candidates(
      ks.toDS(), minCount = 3L, cap = HeavyHitters.DefaultLocalMapCap).count()
    assert(candVolume == naiveVolume,
      s"floor-1 candidates must equal naive volume: $candVolume vs $naiveVolume")
    // and the end-to-end answer stays exact in this regime — via the plain
    // GROUP BY plan (exact() routes minCount <= P up front; no
    // mapPartitions candidate stage, whose floor-1 distinct pass can
    // re-emit beyond-cap keys per occurrence, in the plan)
    val routed = HeavyHitters.exact(df(keys, 4), "k", minCount = 3)
    assert(!routed.queryExecution.optimizedPlan.toString.contains("MapPartitions"),
      s"floor-1 regime must plan the naive GROUP BY:\n${routed.queryExecution.optimizedPlan}")
    val got = routed
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df(keys, 4).groupBy("k").agg(count(lit(1)).as("n"))
      .where(col("n") >= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // the string face takes the same fallback
    val words = spark.sparkContext.parallelize(keys.map(k => s"w$k"), 4)
    val naiveStr = words.mapPartitions(it => Iterator(it.toSet.size)).sum().toLong
    val candStr = HeavyHitters.candidates(
      words.toDS(), minCount = 4L, cap = HeavyHitters.DefaultLocalMapCap).count()
    assert(candStr == naiveStr)
  }

  test("regime routing is planning-free: parallelism estimate, not df.rdd") {
    // minCount = 5 exceeds the session's defaultParallelism-based estimate
    // (local[4] -> 4), so the two-phase candidates plan must be chosen EVEN
    // when the input physically has more partitions (8 here) — the old
    // df.rdd probe would have read 8, routed naive, and paid a second
    // physical planning of the scan to find out. The in-task pigeonhole
    // floor still uses the TRUE partition count, so the answer is exact
    // either way; this pins that routing no longer touches the plan.
    val keys = Seq.fill(200)(1L) ++ (100L until 200L)
    val routed = HeavyHitters.exact(df(keys, 8), "k", minCount = 5)
    assert(routed.queryExecution.optimizedPlan.toString.contains("MapPartitions"),
      s"estimate-based routing must pick the candidates plan:\n" +
        routed.queryExecution.optimizedPlan)
    val got = routed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 200L)))
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
