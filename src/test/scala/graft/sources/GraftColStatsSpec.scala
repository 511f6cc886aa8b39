package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** ANALYZE-computed column statistics (sources/GraftColStats.scala):
  * `CALL system.analyze` runs ONE aggregate job, persists a versioned
  * `_graft_colstats` sidecar, and the connector serves it through DSv2
  * `Statistics.columnStats()` — so catalyst attribute stats (and, with
  * spark.sql.cbo.enabled, filter/join selectivity estimation) work on
  * graft worlds like on ANALYZEd native tables. Staleness guards:
  * type-mismatched (renamed/widened) columns and version-pinned scans
  * serve nothing.
  */
class GraftColStatsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-cswh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.cbo.enabled", "true")
    .config("spark.sql.catalog.acat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.acat.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def attrStats(df: org.apache.spark.sql.DataFrame)
      : Map[String, org.apache.spark.sql.catalyst.plans.logical.ColumnStat] =
    df.queryExecution.optimizedPlan.stats.attributeStats.toSeq
      .map { case (a, s) => a.name -> s }.toMap

  test("analyze computes exact stats in one job; sidecar + meta table + serving agree") {
    spark.sql("CREATE TABLE acat.t (id BIGINT, k BIGINT, s STRING, c0 BIGINT)")
    spark.range(1000).selectExpr("id", "id % 10 AS k",
        "CASE WHEN id % 4 = 0 THEN NULL ELSE concat('val_', id % 5) END AS s",
        "id % 2 AS c0")
      .writeTo("acat.t").append()

    val ret = spark.sql("CALL acat.system.analyze(table => 't', exact => true)")
      .collect()(0)
    assert(ret.getLong(0) === 4L) // analyzed_columns
    assert(ret.getLong(1) === 1000L)

    // the sidecar, via the metadata table
    val m = spark.sql("SELECT * FROM acat.t.colstats ORDER BY col").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("id").getLong(2) === 1000L)          // ndv
    assert(m("id").getString(4) === "0")          // min
    assert(m("id").getString(5) === "999")        // max
    assert(m("k").getLong(2) === 10L)
    assert(m("k").getLong(3) === 0L)              // nulls
    assert(m("s").getLong(2) === 5L)
    assert(m("s").getLong(3) === 250L)            // ids ≡ 0 (mod 4)
    assert(m("s").isNullAt(4) && m("s").isNullAt(5)) // no string bounds
    assert(m("s").getLong(6) === 5L)              // avg_len of 'val_N'
    assert(m("s").getLong(7) === 5L)
    assert(m("c0").getLong(2) === 2L)
    assert(m("id").getBoolean(9))                 // exact

    // served into catalyst attribute stats on the bare scan
    val st = attrStats(spark.table("acat.t"))
    assert(st("k").distinctCount.contains(BigInt(10)))
    assert(st("id").min.contains(0L) && st("id").max.contains(999L))
    assert(st("s").nullCount.contains(BigInt(250)))

    // CBO consumes them: equality on k estimates rows/ndv, not a guess
    val est = spark.table("acat.t").where("k = 3")
      .queryExecution.optimizedPlan.stats.rowCount
    assert(est.isDefined)
    val rc = est.get.toLong
    assert(rc >= 80 && rc <= 120, s"k=3 estimated $rc rows, want ~100")
  }

  test("approx mode lands within HLL tolerance") {
    spark.sql("CREATE TABLE acat.ap (id BIGINT, c0 BIGINT)")
    spark.range(5000).selectExpr("id", "id % 2 AS c0")
      .writeTo("acat.ap").append()
    spark.sql("CALL acat.system.analyze(table => 'ap')")
    val ndv = spark.sql("SELECT ndv FROM acat.ap.colstats WHERE col = 'id'")
      .collect()(0).getLong(0)
    // HLL++ default rsd is 0.05 (one standard deviation) — allow 3 sigma
    assert(math.abs(ndv - 5000L) <= 750L, s"approx ndv $ndv vs 5000")
    val ex = spark.sql("SELECT exact FROM acat.ap.colstats WHERE col = 'id'")
      .collect()(0).getBoolean(0)
    assert(!ex)
  }

  test("column subset; unknown column refused; nested types refused by name") {
    spark.sql("CREATE TABLE acat.sub (a BIGINT, b BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO acat.sub VALUES (1, 10, 0), (2, 20, 0)")
    spark.sql("CALL acat.system.analyze(table => 'sub', columns => 'a')")
    val cols = spark.sql("SELECT col FROM acat.sub.colstats").collect()
      .map(_.getString(0)).toSet
    assert(cols === Set("a"))
    val e = intercept[Exception] {
      spark.sql("CALL acat.system.analyze(table => 'sub', columns => 'nope')")
    }
    assert(e.getMessage.contains("no column 'nope'"))
  }

  test("staleness guards: renamed column stops serving; pinned scan serves nothing") {
    spark.sql("CREATE TABLE acat.g (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO acat.g VALUES (1, 10, 0), (2, 20, 1), (3, 30, 0)") // v1
    spark.sql("CALL acat.system.analyze(table => 'g', exact => true)")
    assert(attrStats(spark.table("acat.g")).contains("v"))

    // rename: the analyzed name is gone; the new name has no stats row
    spark.sql("ALTER TABLE acat.g RENAME COLUMN v TO w")
    val after = attrStats(spark.table("acat.g"))
    assert(!after.contains("v") || after("v").distinctCount.isEmpty)
    assert(!after.contains("w"))
    // and planning still works
    assert(spark.sql("SELECT sum(w) FROM acat.g").collect()(0).getLong(0) === 60L)

    // a version-pinned read reports no column stats (sidecar describes live)
    val pinned = spark.read.format("graft")
      .option("graft.snapshot", "1").load(s"$warehouse/g")
    assert(attrStats(pinned).isEmpty)
  }

  test("equi-height histogram: skew-aware range estimation beats uniform interpolation") {
    spark.sql("CREATE TABLE acat.h (v BIGINT, c0 BIGINT)")
    // 9000 rows of v=5 plus a thin uniform tail 100..1099: uniform
    // interpolation would call `v <= 5` a ~0.5% slice; the histogram
    // knows it's ~90% of the table
    spark.range(10000).selectExpr(
        "CASE WHEN id < 9000 THEN 5 ELSE 100 + (id - 9000) END AS v",
        "id % 2 AS c0")
      .writeTo("acat.h").append()
    spark.sql("CALL acat.system.analyze(table => 'h', exact => true, histogram => 8)")

    val m = spark.sql("SELECT hist_bins FROM acat.h.colstats WHERE col = 'v'")
      .collect()(0).getLong(0)
    assert(m === 8L)

    // served into catalyst: histogram present with the declared bins
    val st = attrStats(spark.table("acat.h"))
    val hist = st("v").histogram
    assert(hist.isDefined)
    assert(hist.get.bins.length === 8)
    assert(math.abs(hist.get.height - 1250.0) < 1.0) // 10000 / 8

    // CBO range estimate: with the histogram, v <= 5 reads as the skewed
    // mass it is, not a uniform sliver
    val est = spark.table("acat.h").where("v <= 5")
      .queryExecution.optimizedPlan.stats.rowCount
    assert(est.isDefined)
    val rc = est.get.toLong
    assert(rc > 5000, s"histogram-backed estimate $rc; uniform would be ~50")
  }

  test("the payoff: ANALYZE flips a filtered-dim join from sort-merge to broadcast") {
    // fact (200k rows) joins a 50k-row dim whose on-disk size exceeds the
    // broadcast threshold; the dim is filtered to 0.1% of its rows. The
    // PLANNER can only know the filter is selective from column stats:
    // without them the filter estimate stays dim-sized -> sort-merge
    // join; after ANALYZE the k-bounds estimate shrinks it under the
    // threshold -> broadcast hash join. Same query, same data, the join
    // strategy decision is the statistics.
    spark.sql("CREATE TABLE acat.f (id BIGINT, k BIGINT, c0 BIGINT)")
    spark.range(200000).selectExpr("id", "id % 50000 AS k", "id % 4 AS c0")
      .writeTo("acat.f").append()
    spark.sql("CREATE TABLE acat.d (k BIGINT, payload STRING, c0 BIGINT)")
    spark.range(50000).selectExpr("id AS k",
        "concat(md5(CAST(id AS STRING)), md5(CAST(id + 1 AS STRING))) AS payload",
        "id % 4 AS c0")
      .writeTo("acat.d").append()

    def joinPlan(): String = spark.sql(
      """SELECT f.id, d.payload FROM acat.f f
         JOIN acat.d d ON f.k = d.k WHERE d.k < 50""")
      .queryExecution.sparkPlan.toString

    val dimBytes = spark.table("acat.d").queryExecution.optimizedPlan
      .stats.sizeInBytes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (dimBytes / 4).toString)
    try {
      assert(joinPlan().contains("SortMergeJoin"),
        "without stats the filtered dim must not broadcast")
      spark.sql("CALL acat.system.analyze(table => 'd', exact => true)")
      assert(joinPlan().contains("BroadcastHashJoin"),
        "with stats the 0.1% filter estimate must fall under the threshold")
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("NaN contamination never reaches the served bounds") {
    // Spark's min/max order NaN above every double — unguarded, a single
    // NaN row becomes the served max and poisons range estimation
    spark.sql("CREATE TABLE acat.nan (v DOUBLE, c0 BIGINT)")
    spark.range(100).selectExpr(
        "CASE WHEN id = 7 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS v",
        "id % 2 AS c0")
      .writeTo("acat.nan").append()
    spark.sql("CALL acat.system.analyze(table => 'nan', exact => true, histogram => 4)")
    val r = spark.sql("SELECT min, max FROM acat.nan.colstats WHERE col = 'v'")
      .collect()(0)
    assert(r.getString(0).toDouble === 0.0)
    assert(r.getString(1).toDouble === 99.0, s"NaN leaked: ${r.getString(1)}")
    val st = attrStats(spark.table("acat.nan"))
    assert(st("v").max.contains(99.0))
    val hist = st("v").histogram
    assert(hist.isDefined &&
      hist.get.bins.forall(b => !b.lo.isNaN && !b.hi.isNaN))
  }

  test("legacy unversioned world: ANALYZE supplies the planner's base row count") {
    // hand-built pre-versioning layout — schema sidecar + chunk dir, no
    // manifest (so no live counts): the scan reports no numRows until an
    // ANALYZE sidecar provides the advisory base estimate; a bucket-
    // pruned scan must NOT inherit the whole-table number
    val p = s"$warehouse/legacy"
    spark.range(100).selectExpr("id", "CAST(0 AS BIGINT) AS c0")
      .write.parquet(s"$p/c0=0")
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(p),
      new org.apache.hadoop.conf.Configuration())
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$p/_graft_schema.json"), true)
    out.write(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("c0",
        org.apache.spark.sql.types.LongType))).json.getBytes("UTF-8"))
    out.close()

    def rowCount() = spark.read.format("graft").load(p)
      .queryExecution.optimizedPlan.stats.rowCount
    assert(rowCount().isEmpty)
    GraftColStats.analyze(spark, p, Seq.empty, exact = true)
    assert(rowCount().contains(BigInt(100)))
    // pruned scan: no whole-table fallback
    val pruned = spark.read.format("graft").load(p).where("c0 = 1")
    assert(pruned.count() === 0L)
  }

  test("unanalyzed table: empty stats, no crash; re-analyze refreshes version stamp") {
    spark.sql("CREATE TABLE acat.u (id BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO acat.u VALUES (1, 0)")
    assert(attrStats(spark.table("acat.u")).isEmpty)
    assert(spark.sql("SELECT * FROM acat.u.colstats").collect().isEmpty)

    spark.sql("CALL acat.system.analyze(table => 'u')")
    val v1 = spark.sql("SELECT analyzed_version FROM acat.u.colstats LIMIT 1")
      .collect()(0).getLong(0)
    spark.sql("INSERT INTO acat.u VALUES (2, 0)")
    spark.sql("CALL acat.system.analyze(table => 'u')")
    val v2 = spark.sql("SELECT analyzed_version FROM acat.u.colstats LIMIT 1")
      .collect()(0).getLong(0)
    assert(v2 > v1)
    val rows = spark.sql("SELECT ndv FROM acat.u.colstats WHERE col = 'id'")
      .collect()(0).getLong(0)
    assert(rows === 2L)
  }
}
