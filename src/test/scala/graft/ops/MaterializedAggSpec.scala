package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Incremental materialized aggregate: delta application from the commit-
  * log change feed, exact micro-unit reversal on deletes, emptied-group
  * destruction, cursor semantics, and the intent-marker rebuild recovery.
  */
class MaterializedAggSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("graft-mv").toString

  /** Base rows: (id, grp derived id % 3, v). Written through the connector
    * so every batch is a versioned commit the change feed can diff. */
  private def write(path: String, rows: Seq[(Long, Double)],
      mode: String = "append"): Unit = {
    import spark.implicits._
    rows.toDF("id", "v")
      .withColumn("grp", col("id") % 3)
      .withColumn("c0", expr("id DIV 16"))
      .write.format("graft").mode(mode).save(path)
  }

  /** Expected view content recomputed naively from `rows`. */
  private def expected(rows: Seq[(Long, Double)]): Set[(Long, Long, Long)] =
    rows.groupBy(_._1 % 3).map { case (g, rs) =>
      (g, rs.size.toLong, rs.map(r => math.round(r._2 * 1e6)).sum)
    }.toSet

  private def content(mv: MaterializedAgg): Set[(Long, Long, Long)] =
    mv.df.select("grp", "n", "s_v_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("initialize builds exact state; refresh applies insert deltas only") {
    val base = tmp() + "/base"; val mvp = tmp() + "/mv"
    val b1 = Seq((1L, 1.25), (2L, 2.5), (3L, 0.125), (4L, 10.0))
    write(base, b1)
    val mv = new MaterializedAgg(spark, base, mvp, Seq("grp"), Seq("v"))
    val v1 = mv.initialize()
    assert(mv.cursor == v1)
    assert(content(mv) == expected(b1))
    // second commit touches one existing group and creates a new-grp row mix
    val b2 = Seq((5L, 0.5), (33L, 7.75))
    write(base, b2)
    val v2 = mv.refresh()
    assert(v2 > v1 && mv.cursor == v2)
    assert(content(mv) == expected(b1 ++ b2))
    // already current: no-op
    assert(mv.refresh() == v2)
  }

  test("deletes reverse exactly and emptied groups are destroyed") {
    val base = tmp() + "/base"; val mvp = tmp() + "/mv"
    val b1 = Seq((1L, 1.25), (2L, 2.5), (3L, 0.125), (4L, 10.0), (7L, 3.5))
    write(base, b1)
    val mv = new MaterializedAgg(spark, base, mvp, Seq("grp"), Seq("v"))
    mv.initialize()
    // truncate-overwrite: the feed reports every old row as delete and the
    // new set as insert — groups 1 (ids 1,4,7) and 2 (id 2) shrink, group
    // 0 (id 3) vanishes entirely and must leave NO state row behind
    val b2 = Seq((1L, 1.25), (2L, 9.0))
    write(base, b2, mode = "overwrite")
    mv.refresh()
    assert(content(mv) == expected(b2))
    assert(mv.df.where(col("grp") === 0L).isEmpty, "emptied group destroyed")
  }

  test("MIN/MAX: deletes recompute the dirty groups; insert-only groups stay delta") {
    val base = tmp() + "/base"; val mvp = tmp() + "/mv"
    // group 1: ids 1,4,7 with max v=10 at id 4; group 2: id 2; group 0: id 3
    val b1 = Seq((1L, 1.25), (2L, 2.5), (3L, 0.125), (4L, 10.0), (7L, 3.5))
    write(base, b1)
    val mv = new MaterializedAgg(spark, base, mvp, Seq("grp"), Seq("v"),
      minMaxCols = Seq("v"))
    mv.initialize()
    def minsMaxs(): Map[Long, (Long, Long)] =
      mv.df.select("grp", "mn_v_micro", "mx_v_micro").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(minsMaxs() == Map(0L -> ((125000L, 125000L)),
      1L -> ((1250000L, 10000000L)), 2L -> ((2500000L, 2500000L))))
    // the delta-only killer: a truncate-overwrite DELETES group 1's
    // extreme (id 4, v=10) — the new max must be the runner-up 3.5, which
    // only a recompute of the dirty group can know
    val b2 = Seq((1L, 1.25), (7L, 3.5), (2L, 2.5))
    write(base, b2, mode = "overwrite")
    mv.refresh()
    assert(minsMaxs() == Map(1L -> ((1250000L, 3500000L)),
      2L -> ((2500000L, 2500000L))),
      "a delete that removes the extreme must surface the recomputed runner-up")
    // insert-only commit: extremes tighten monotonically, no recompute path
    val b3 = Seq((10L, 20.0), (5L, 0.0625)) // grp 1 gains a new max; grp 2 a new min
    write(base, b3)
    mv.refresh()
    assert(minsMaxs() == Map(
      1L -> ((1250000L, 20000000L)), 2L -> ((62500L, 2500000L))))
    // count/sum stayed exact throughout (pure delta for all groups)
    assert(content(mv).map(t => (t._1, t._2)) ==
      expected(b2 ++ b3).map(t => (t._1, t._2)))
  }

  test("a minmax-free refresh never plans a base snapshot scan") {
    // the delete-dirty MIN/MAX recompute is the ONLY refresh step allowed
    // to open a pinned base snapshot; a count/sum-only view's refresh must
    // stay pure delta (change feed + view state) — a snapshot scan creeping
    // onto that path is the regression class this pin closes. Detection:
    // snapshot scans declare themselves in the physical plan description.
    val base = tmp() + "/base"; val mvp = tmp() + "/mv"
    write(base, Seq((1L, 1.0), (2L, 2.0), (17L, 3.0)))
    val mv = new MaterializedAgg(spark, base, mvp, Seq("grp"), Seq("v"))
    mv.initialize()
    write(base, Seq((2L, 5.0)))
    write(base, Seq((40L, 4.0)))
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      mv.refresh()
      // QueryExecutionListener delivery is async on the listener bus
      Thread.sleep(500)
      val snapScans = plans.toArray.map(_.toString).filter(_.contains("Snapshot: v"))
      assert(snapScans.isEmpty,
        s"count/sum-only refresh planned a base snapshot scan:\n${snapScans.headOption.getOrElse("")}")
    } finally spark.listenerManager.unregister(listener)
    assert(content(mv) ==
      expected(Seq((1L, 1.0), (2L, 2.0), (17L, 3.0), (2L, 5.0), (40L, 4.0))))
  }

  test("a leftover intent marker forces an exact rebuild, not a delta") {
    val base = tmp() + "/base"; val mvp = tmp() + "/mv"
    val b1 = Seq((1L, 1.0), (2L, 2.0))
    write(base, b1)
    val mv = new MaterializedAgg(spark, base, mvp, Seq("grp"), Seq("v"))
    mv.initialize()
    val b2 = Seq((3L, 3.0))
    write(base, b2)
    // simulate a torn refresh: marker present, state half-trustworthy
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(mvp), spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(mvp, "_graft_mv_refresh_intent"),
      true).close()
    val v = mv.refresh()
    assert(mv.cursor == v)
    assert(content(mv) == expected(b1 ++ b2), "rebuild lands on exact state")
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(mvp, "_graft_mv_refresh_intent")))
    // and a subsequent normal refresh still works incrementally
    val b3 = Seq((6L, 0.0625))
    write(base, b3)
    mv.refresh()
    assert(content(mv) == expected(b1 ++ b2 ++ b3))
  }

  test("streaming face: commit stream drives refresh, restart converges") {
    val base = tmp() + "/base"; val mvp = tmp() + "/mv"
    val cp = tmp() + "/cp"
    val b1 = Seq((1L, 1.5), (2L, 2.5), (4L, 4.0))
    write(base, b1)
    val mv = new MaterializedAgg(spark, base, mvp, Seq("grp"), Seq("v"))
    // virgin view: the first trigger initializes it
    def runOnce(): Unit = {
      val q = graft.streaming.Daemon.mvRefreshStream(mv, cp, interval = "1 second")
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }
    runOnce()
    assert(content(mv) == expected(b1))
    val b2 = Seq((5L, 0.25), (9L, 9.0))
    write(base, b2)
    runOnce() // restart from the same checkpoint: picks up the new commit
    assert(content(mv) == expected(b1 ++ b2))
    // an extra run with no new commits is a no-op
    val before = mv.cursor
    runOnce()
    assert(mv.cursor == before && content(mv) == expected(b1 ++ b2))
  }

  test("multi-column groups and multiple sum columns") {
    import spark.implicits._
    val base = tmp() + "/base"; val mvp = tmp() + "/mv"
    def w(rows: Seq[(Long, Double, Double)]): Unit =
      rows.toDF("id", "v", "u")
        .withColumn("grp", col("id") % 2)
        .withColumn("grp2", expr("CASE WHEN id % 4 < 2 THEN 'a' ELSE 'b' END"))
        .withColumn("c0", expr("id DIV 16"))
        .write.format("graft").mode("append").save(base)
    w(Seq((1L, 1.5, 0.25), (2L, 2.0, 0.5), (5L, 3.0, 0.125)))
    val mv = new MaterializedAgg(spark, base, mvp,
      Seq("grp", "grp2"), Seq("v", "u"))
    mv.initialize()
    w(Seq((6L, 4.0, 1.0)))
    mv.refresh()
    val got = mv.df.select("grp", "grp2", "n", "s_v_micro", "s_u_micro")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "a", 2L, 4500000L, 375000L),   // ids 1, 5 (1%4=1, 5%4=1 -> 'a')
      (0L, "b", 2L, 6000000L, 1500000L))) // ids 2, 6 (2%4=2, 6%4=2 -> 'b')
  }
}
