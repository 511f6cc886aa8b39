package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Write-in-place commits (sources/GraftWrite.scala): once a table's
  * commit log is authoritative, overwrite and row-level COW land fresh
  * files DIRECTLY in their final cell directories — invisible until the
  * manifest seals — and the commit performs ZERO file moves. On S3-class
  * stores a rename is a full copy, so the staged swap paid every fresh
  * byte twice; in-place is the object-store-correct shape the
  * manifest-only liveness design (r10) was built to enable. Staged swaps
  * remain for virgin paths (no manifest yet — physical-walk readers) and
  * forced driver-driven cycles.
  */
class GraftInPlaceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-ipw").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.ipc", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.ipc.warehouse", warehouse)
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def moves(): Long = GraftStage.movesPerformed.get()

  test("versioned upsert is zero-copy (r14): in-place tasks, displaced rows vector, zero moves") {
    import graft.core.DimMapping
    import graft.world.{DimSpec, World}
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("graft-ip-upsert").toString + "/w"
    // big cell (ids 64..127) so the conflict stays under the DV cutover
    val w = new World(spark, path, Seq(
      DimSpec("d0", DimMapping(0, 1023, 64)), DimSpec("d1", DimMapping(0, 1023, 16))))
    import spark.implicits._
    w.create((64L to 127L).map(i => (i, 514L)).toDF("d0", "d1"))
    // seal v1 (first point write COWs); the log is authoritative after
    w.insert(Seq((300L, 300L)).toDF("d0", "d1"))
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    val root = new Path(path)
    def live = GraftVersions.readEntries(fs, root,
      GraftVersions.latestVersion(fs, root).get)
    val pre = live.map(e => e.rel -> e.size).toMap
    val before = moves()
    w.withBuckets(Seq((65L, 600L), (400L, 400L)).toDF("d0", "d1"))
      .write.format("graft").mode("append").option("graft.mode", "upsert")
      .save(path)
    assert(moves() == before,
      "a versioned upsert writes its bytes once: zero stage moves")
    assert(GraftUpsertWrite.lastSummary(path)
      .contains(GraftUpsertWrite.UpsertSummary(2L, 1L)),
      "in-place commit still aggregates row and displaced counts")
    val after = live
    assert(after.exists(_.dv.isDefined),
      "the displaced row retires into a deletion vector")
    assert(pre.forall { case (rel, sz) =>
      after.exists(e => e.rel == rel && e.size == sz) },
      "every pre-upsert file stays live, byte-identical")
    val out = w.df.select("d0", "d1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == ((64L to 127L).map(i => (i, 514L)).toSet -
      ((65L, 514L)) + ((65L, 600L)) + ((300L, 300L)) + ((400L, 400L))),
      "replace-on-conflict applied through the zero-copy path")
  }

  test("versioned overwrite + COW: zero file moves, snapshots intact") {
    spark.sql("CREATE TABLE ipc.t (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO ipc.t VALUES (1, 10, 0), (2, 20, 1)") // v1: log authoritative
    val before = moves()
    spark.sql("INSERT OVERWRITE ipc.t VALUES (1, 11, 0), (2, 20, 1)") // v2 dynamic
    spark.sql("UPDATE ipc.t SET v = 999 WHERE id = 2")               // v3 COW
    spark.sql("""MERGE INTO ipc.t USING (SELECT 3L id, 30L v, 0L c0) s
                 ON t.id = s.id
                 WHEN NOT MATCHED THEN INSERT *""")                  // v4 rowlevel
    assert(moves() == before,
      s"authoritative-log overwrite/COW must move zero files " +
        s"(moved ${moves() - before})")
    // content exact through all three in-place commits
    assert(spark.sql("SELECT id, v FROM ipc.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 11L), (2L, 999L), (3L, 30L)))
    // every superseded state stays addressable (bytes never moved)
    assert(spark.sql("SELECT v FROM ipc.t VERSION AS OF 1 WHERE id = 1")
      .head.getLong(0) == 10L)
    assert(spark.sql("SELECT v FROM ipc.t VERSION AS OF 2 WHERE id = 2")
      .head.getLong(0) == 20L)
    assert(spark.sql("SELECT v FROM ipc.t VERSION AS OF 3 WHERE id = 2")
      .head.getLong(0) == 999L)
  }

  test("virgin path still stages: first overwrite has no manifest to hide behind") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-ipv").toString + "/w"
    assert(!GraftStage.manifestAuthoritative(path))
    val before = moves()
    Seq((1L, 0L), (2L, 1L)).toDF("id", "c0")
      .write.format("graft").mode("overwrite").save(path)
    assert(moves() > before, "virgin-path overwrite must use the staged swap")
    assert(spark.read.format("graft").load(path).count() == 2L)
    // and the NEXT overwrite (log now live) is in-place
    val mid = moves()
    Seq((3L, 0L)).toDF("id", "c0")
      .write.format("graft").mode("overwrite").save(path)
    assert(moves() == mid, "post-baseline overwrite must write in place")
    assert(spark.read.format("graft").load(path)
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("streaming epochs write in place once the log is live") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("graft-ips").toString + "/w"
    val cp = Files.createTempDirectory("graft-ips-cp").toString
    val src = MemoryStream[(Long, Long)]
    val q = src.toDF().toDF("d0", "v")
      .withColumn("c0", (col("d0") / 10).cast("long"))
      .writeStream.format("graft")
      .option("checkpointLocation", cp)
      .start(path)
    try {
      // epoch 1 on a virgin path: staged (no manifest yet to hide behind)
      src.addData((1L, 10L)); q.processAllAvailable()
      val afterFirst = moves()
      // every later epoch: the log is authoritative -> zero moves
      src.addData((2L, 20L)); q.processAllAvailable()
      src.addData((11L, 110L)); q.processAllAvailable()
      assert(moves() == afterFirst,
        "post-baseline stream epochs must write in place")
      assert(spark.read.format("graft").load(path)
        .select("d0").as[Long].collect().toSeq.sorted == Seq(1L, 2L, 11L))
    } finally q.stop()
  }

  test("in-place debris is invisible: an unmanifested file never enters a read") {
    spark.sql("CREATE TABLE ipc.d (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO ipc.d VALUES (1, 10, 0)")
    val path = s"$warehouse/d"
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    // plant crash debris: copy the live file under a fresh name in the
    // same cell — exactly what a write that died pre-seal leaves behind
    val cell = new Path(path, "c0=0")
    val live = fs.listStatus(cell).filter(_.isFile).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
      new Path(cell, "part-debris-deadbeef.parquet"), false,
      new Configuration())
    assert(spark.sql("SELECT count(*) FROM ipc.d").head.getLong(0) == 1L,
      "unmanifested bytes must not be read")
    // the next commit does not resurrect it either
    spark.sql("INSERT INTO ipc.d VALUES (2, 20, 0)")
    assert(spark.sql("SELECT count(*) FROM ipc.d").head.getLong(0) == 2L)
  }
}
