package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-shape guards: the properties that make these queries survive a 100x
  * scale-up are visible in the physical plan — filter/projection pushdown to
  * the parquet scan, broadcast joins for small dimensions, map-side partial
  * aggregation, and partition pruning on world bucket columns. A regression
  * here (e.g. an accidental UDF breaking pushdown) is a performance bug even
  * while results stay correct.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // plan STRINGS are the assertion surface here; default metadata
    // truncation (100 chars) would hide pushed-filter entries
    .config("spark.sql.maxMetadataStringLength", "2000")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def plan(name: String): String =
    Registry.all(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("filter + projection reach the parquet scan (PushedFilters / ReadSchema)") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,48.0)"), s"filter must be pushed:\n$p")
    // projection pruning: scan must not read all 11 lineitem columns
    assert(!p.contains("l_returnflag"), s"unneeded column read:\n$p")
  }

  test("q5 star join broadcasts the small dimension tables") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q3 aggregates lineitem revenue BELOW the join (pre-agg, then join)") {
    val qe = Registry.all("q3_top_revenue").fn(spark, sf).queryExecution
    // in the OPTIMIZED plan, the revenue Aggregate must sit under a Join —
    // i.e. some join has an aggregate (not a raw lineitem scan) as a child
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val aggBelowJoin = qe.optimizedPlan.collect {
      case j: Join if j.children.exists(c => c.collectFirst {
        case a: Aggregate => a }.isDefined) => j
    }
    assert(aggBelowJoin.nonEmpty,
      s"expected an Aggregate below a Join:\n${qe.optimizedPlan}")
    // and no second aggregation above the joins (the pre-agg key is unique)
    val topAgg = qe.optimizedPlan.collectFirst {
      case a: Aggregate if a.collectFirst { case j: Join => j }.isDefined => a
    }
    assert(topAgg.isEmpty, s"no re-aggregation above the join expected:\n${qe.optimizedPlan}")
  }

  test("q1 aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.toLowerCase.contains("partial_sum") || p.contains("partial"),
      s"expected partial aggregation:\n$p")
  }

  test("world selection prunes partitions, not just rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-plan-world").toString
    val w = new graft.world.World(spark, path, Seq(
      graft.world.DimSpec("d0", graft.core.DimMapping(0, 99, 10)),
      graft.world.DimSpec("d1", graft.core.DimMapping(0, 99, 10))))
    w.create((0L until 100L).map(i => (i, i)).toDF("d0", "d1"))
    val sel = w.select(0, graft.core.Bounds.to(0, 19))
    val p = sel.iter().queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("c0"),
      s"bucket predicate must hit partition filters:\n$p")
    // only 2 of 10 c0 directories may be listed
    val scanned = sel.iter().select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned.forall(f => f.contains("c0=0/") || f.contains("c0=1/")),
      s"files outside pruned buckets were read: $scanned")
  }

  test("w_zorder_scan: partition pruning AND pushed residual dim filters on the z-world scan") {
    // the two mechanisms that make the z-layout pay off must BOTH be in the
    // plan: bucket dirs pruned (PartitionFilters on c*), and the row-exact
    // box residual pushed to parquet (PushedFilters on both dims) where the
    // z-tightened row-group envelopes can skip row groups
    val p = plan("w_zorder_scan")
    assert(p.contains("PartitionFilters") && p.contains("c0"),
      s"bucket predicate must hit partition filters:\n$p")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(event_id,2000)") &&
      p.contains("GreaterThanOrEqual(user_id,64)"),
      s"residual box filters on both dims must be pushed to the scan:\n$p")
  }

  test("q_global_window_auto runs on ScalableWindowExec, not the single-reducer WindowExec") {
    val p = plan("q_global_window_auto")
    assert(p.contains("ScalableWindow ["),
      s"the custom operator must be in the executed plan:\n$p")
    assert(!p.replace("ScalableWindow [", "").contains("Window ["),
      s"no vanilla WindowExec may remain:\n$p")
  }

  test("raw dim-range predicate (no Select DSL) prunes partitions via DimBucketPruning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-plan-raw").toString
    val w = new graft.world.World(spark, path, Seq(
      graft.world.DimSpec("d0", graft.core.DimMapping(0, 99, 10)),
      graft.world.DimSpec("d1", graft.core.DimMapping(0, 99, 10))))
    w.create((0L until 100L).map(i => (i, i)).toDF("d0", "d1"))
    // plain where() — the path every non-DSL user takes
    val q = w.df.where(col("d0").between(0, 19))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("c0"),
      s"raw range must be rewritten into a c0 partition filter:\n$p")
    val scanned = q.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned.nonEmpty && scanned.forall(f => f.contains("c0=0/") || f.contains("c0=1/")),
      s"files outside pruned buckets were read: $scanned")
    assert(q.count() == 20L, "row-exact residual filter still applies")
    // out-of-domain tail is clamped, not emptied
    assert(w.df.where(col("d0") >= 90 && col("d0") <= 5000).count() == 10L)
  }

  test("raw isin predicate prunes to the chunk set (In path of DimBucketPruning)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-plan-isin").toString
    val w = new graft.world.World(spark, path, Seq(
      graft.world.DimSpec("d0", graft.core.DimMapping(0, 99, 10)),
      graft.world.DimSpec("d1", graft.core.DimMapping(0, 99, 10))))
    w.create((0L until 100L).map(i => (i, i)).toDF("d0", "d1"))
    // values hit chunks {0, 1, 9}; 5000 is out of domain (no such row exists)
    val q = w.df.where(col("d0").isin(5L, 15L, 97L, 5000L))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("c0"),
      s"isin must be rewritten into a c0 chunk-set partition filter:\n$p")
    assert(q.count() == 3L)
    val scanned = q.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned.nonEmpty && scanned.forall(f =>
      f.contains("c0=0/") || f.contains("c0=1/") || f.contains("c0=9/")),
      s"only chunks 0/1/9 may be listed: $scanned")
  }

  test("wrapping u64 domain: sign-straddling and negative-literal predicates prune correctly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-plan-wrap").toString
    // full u64 domain [0, 2^64-1] (endIncl = -1L), 16 chunks of 2^60
    val w = new graft.world.World(spark, path, Seq(
      graft.world.DimSpec("d0", graft.core.DimMapping(0L, -1L, 1L << 60))))
    // chunk 0 (5), chunk 15 (2^64-5 = -5L), chunk 4 (2^62)
    w.create(Seq(5L, -5L, 1L << 62).map(v => (v, v)).toDF("d0", "payload"))
    // signed `<= 10` denotes [Long.MinValue, 10]: straddles the sign
    // boundary, so the implied bucket predicate must be the two-piece Or
    // (c0=0 for [0,10], c0 in [8,15] for the negative half) — not empty,
    // not unpruned
    val q1 = w.df.where(col("d0") <= 10L)
    val p1 = q1.queryExecution.executedPlan.toString
    assert(p1.contains("PartitionFilters") && p1.contains("c0"),
      s"straddling range must still produce a c0 partition filter:\n$p1")
    assert(q1.count() == 2L, "rows 5 and -5 both satisfy signed <= 10")
    val scanned1 = q1.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned1.forall(f => f.contains("c0=0/") || (8 to 15).exists(i => f.contains(s"c0=$i/"))),
      s"chunk 4 (2^62) must be pruned by the straddle Or: $scanned1")
    assert(!scanned1.exists(_.contains("c0=4/")), s"chunk 4 not pruned: $scanned1")
    // equality with a negative literal: single chunk in the wrapped half
    val q2 = w.df.where(col("d0") === lit(-5L))
    assert(q2.count() == 1L)
    val scanned2 = q2.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned2.forall(_.contains("c0=15/")),
      s"negative equality must prune to chunk 15 only: $scanned2")
  }

  test("hint ids reach the scan as pushed In-filter (row-group skipping)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-plan-hint").toString
    val w = new graft.world.World(spark, path, Seq(
      graft.world.DimSpec("d0", graft.core.DimMapping(0, 99, 10)),
      graft.world.DimSpec("d1", graft.core.DimMapping(0, 99, 10))))
    w.create((0L until 100L).map(i => (i, i)).toDF("d0", "d1"))
    val p = w.selectAll.hints(Seq(3L, 7L)).iter().queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("In(d0"), s"In must be pushed:\n$p")
  }

  test("pivot combines map-side; LATERAL decorrelates to a group-limit join, not a per-row subquery") {
    val p = plan("q_pivot")
    assert(p.contains("partial_pivotfirst"),
      s"pivot must aggregate partially before the shuffle:\n$p")
    val l = Registry.all("q_sql_lateral").fn(spark, sf)
    l.collect()
    val lp = l.queryExecution.executedPlan.toString
    assert(lp.contains("WindowGroupLimit"),
      s"correlated LATERAL LIMIT must plan as a pushed group-limit:\n$lp")
    assert(!lp.contains("CartesianProduct"), lp)
  }

  test("runtime bloom-filter join pruning engages for a selective shuffle join") {
    import org.apache.spark.sql.functions._
    // at cluster scale a selective dimension filter should semi-filter the
    // fact scan BEFORE the shuffle (runtime row-level filtering); force the
    // shuffle-join path (no broadcast) and check the optimizer injects the
    // bloom filter
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val l = Tables.t(spark, sf, "lineitem")
      val p = Tables.t(spark, sf, "part").where(col("p_size") === 1)
      val q = l.join(p, l("l_partkey") === p("p_partkey")).select("l_orderkey", "p_name")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"selective dim filter must inject a runtime bloom filter on the fact side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("decontamination joins the eval gram set by broadcast, no cartesian") {
    val df = Registry.all("p_decontaminate").fn(spark, sf)
    df.collect() // AQE finalizes join strategies at runtime
    val p = df.queryExecution.executedPlan.toString
    // the held-out split's distinct gram set is the small side by
    // construction — it must come to the train grams, not shuffle them
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast gram join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pipeline stats queries aggregate partially before their shuffles") {
    for (name <- Seq("p_length_hist", "t_tfidf")) {
      val p = plan(name)
      assert(p.contains("HashAggregate") && p.toLowerCase.contains("partial"),
        s"$name must map-side combine:\n$p")
    }
  }

  test("t_repetition computes per-doc stats without any exchange before the output sort") {
    // the native RepetitionStats kernel replaced explode->groupBy->window;
    // the only exchange left should be the final ORDER BY's range partition
    val p = plan("t_repetition")
    assert(!p.contains("HashAggregate") && !p.contains("Window"),
      s"per-doc stats must not aggregate or window:\n$p")
    assert(p.contains("repetition_stats"), p)
  }

  test("rollup/cube expand the pre-aggregate, not the fact table") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand}
    for (name <- Seq("q_rollup", "q_cube", "q_grouping_sets")) {
      val qe = Registry.all(name).fn(spark, sf).queryExecution
      val expandOverAgg = qe.optimizedPlan.collect {
        case e: Expand if e.collectFirst { case a: Aggregate => a }.isDefined => e
      }
      assert(expandOverAgg.nonEmpty,
        s"$name must Expand above the finest-grouping Aggregate:\n${qe.optimizedPlan}")
    }
  }

  test("p_pii_redact scrubs per-row: no aggregate, window, or join — only the output sort") {
    // seeding + counting + the three-stage redact chain are all row-local;
    // anything else appearing here means the scrubber stopped streaming
    val p = plan("p_pii_redact")
    assert(!p.contains("HashAggregate") && !p.contains("Window") &&
      !p.contains("Join"), s"PII scrub must stay per-row:\n$p")
  }

  test("q_heavy_hitters verifies candidates only (semi join above the local-count scan)") {
    val p = plan("q_heavy_hitters")
    // the exact recount happens AFTER the candidate semi-join prune
    assert(p.contains("LeftSemi"), s"expected candidate semi-join:\n$p")
    assert(p.contains("HashAggregate"), s"expected exact recount aggregate:\n$p")
  }

  test("whole-stage codegen covers the dedup signature pipeline (no UDFs)") {
    val df = Registry.all("t_fingerprint").fn(spark, sf)
    df.collect() // AQE only shows WholeStageCodegen spans in the final plan
    val p = df.queryExecution.executedPlan.toString
    // codegen'd spans print as "*(n) Operator" in the final AQE plan
    assert(p.contains("*(1)"), s"expected whole-stage-codegen spans:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }
}
