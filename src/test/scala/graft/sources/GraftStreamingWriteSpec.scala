package graft.sources

import graft.core._
import graft.world.{DimSpec, World}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Native `writeStream.format("graft")` — the daemon's write-behind as a
  * DSv2 streaming sink: per-epoch staged appends, Complete-mode truncate,
  * graft.mode=upsert `World::insert` semantics, and exactly-once epoch
  * replay via the `_graft_commits` markers.
  */
class GraftStreamingWriteSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-sw").toString + "/world"

  test("streaming append: epochs accumulate, restart from checkpoint does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    val cp = Files.createTempDirectory("graft-sw-cp").toString
    val src = MemoryStream[(Long, Long)]
    def start() = src.toDF().toDF("d0", "v")
      .withColumn("c0", col("d0") / 10 cast "long")
      .writeStream.format("graft")
      .option("checkpointLocation", cp)
      .start(path)

    val q = start()
    try {
      src.addData((1L, 10L), (15L, 150L))
      q.processAllAvailable()
      val r1 = spark.read.format("graft").load(path)
      assert(r1.select("d0").as[Long].collect().toSet == Set(1L, 15L))
      assert(new java.io.File(s"$path/c0=1").isDirectory,
        "streamed rows land in their chunk directories")
      src.addData((22L, 220L))
      q.processAllAvailable()
      assert(spark.read.format("graft").load(path).count() == 3)
    } finally q.stop()

    // restart from the same checkpoint: already-committed offsets replay
    // nothing; new data lands exactly once
    val q2 = start()
    try {
      src.addData((33L, 330L))
      q2.processAllAvailable()
      val all = spark.read.format("graft").load(path)
        .select("d0").as[Long].collect().toSeq
      assert(all.sorted == Seq(1L, 15L, 22L, 33L), s"no duplication, got $all")
    } finally q2.stop()
    assert(new java.io.File(s"$path/_graft_commits").isDirectory,
      "committed epochs are recorded")
    assert(!new java.io.File(path).getParentFile.listFiles
      .exists(_.getName.contains("__graft_epoch_")),
      "no staging grids left behind")
  }

  test("auto-compact: graft.compact.maxFiles bounds live files per cell, cursor intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    val cp = Files.createTempDirectory("graft-sw-ac-cp").toString
    val src = MemoryStream[(Long, Long)]
    val q = src.toDF().toDF("d0", "v")
      .withColumn("c0", col("d0") / 10 cast "long")
      .writeStream.format("graft")
      .option("checkpointLocation", cp)
      .option("graft.compact.maxFiles", "2")
      .start(path)
    try {
      // 5 epochs into ONE cell: without compaction that is 5 live files
      for (i <- 1 to 5) { src.addData((i.toLong, i * 10L)); q.processAllAvailable() }
    } finally q.stop()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val live = GraftVersions.liveRels(fs, root).get
    assert(live.count(_.startsWith("c0=0/")) <= 2,
      s"auto-compaction keeps the cell at or under the bound: $live")
    // data intact and readable through the connector (manifest-resolved)
    val got = spark.read.format("graft").load(path)
      .select("d0", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1 to 5).map(i => (i.toLong, i * 10L)).toSet)
    // the version cursor survived: no barrier, commits keep sealing
    assert(!GraftVersions.hasBarrier(fs, root),
      "auto-compaction must not degrade the stream's version cursor")
    assert(GraftVersions.latestVersion(fs, root).nonEmpty)
  }

  test("graft.maxBytesPerTrigger bounds each micro-batch's admitted bytes") {
    import spark.implicits._
    val path = tmp()
    // three single-row append commits through the connector
    for (i <- 1 to 3)
      Seq((i.toLong, i * 10L, i.toLong)).toDF("d0", "v", "c0")
        .write.format("graft").mode("append").save(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    assert(GraftVersions.latestVersion(fs, root).contains(3L))
    val schema = GraftDataSource.sidecarSchema(path)
    // a cap of ONE BYTE still admits the first pending commit (progress
    // guarantee), and only it — each trigger advances exactly one version
    val stream = new GraftMicroBatchStream(path, schema, Array.empty,
      maxBytesPerTrigger = Some(1L))
    val limit = org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    val o1 = stream.latestOffset(GraftVersionOffset(0L), limit)
    assert(o1 == GraftVersionOffset(1L), s"one-byte cap admits one commit: $o1")
    val o2 = stream.latestOffset(o1, limit)
    assert(o2 == GraftVersionOffset(2L))
    // a generous cap admits the whole backlog in one batch
    val big = new GraftMicroBatchStream(path, schema, Array.empty,
      maxBytesPerTrigger = Some(1L << 30))
    assert(big.latestOffset(GraftVersionOffset(0L), limit) ==
      GraftVersionOffset(3L))
    // composes with maxVersionsPerTrigger: the tighter bound wins
    val both = new GraftMicroBatchStream(path, schema, Array.empty,
      maxVersionsPerTrigger = Some(2L), maxBytesPerTrigger = Some(1L << 30))
    assert(both.latestOffset(GraftVersionOffset(0L), limit) ==
      GraftVersionOffset(2L))
  }

  test("epoch replay after a successful commit is discarded (marker idempotence)") {
    import spark.implicits._
    val path = tmp()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "d0 BIGINT, v BIGINT, c0 BIGINT")
    val sw = new GraftStreamingWrite(path, schema, GraftStreamingWrite.Append)
    def stage(): Unit = Seq((1L, 10L, 0L), (2L, 20L, 0L)).toDF("d0", "v", "c0")
      .write.format("graft").mode("append").save(path + "__graft_epoch_7")
    stage()
    sw.commit(7L, Array.empty)
    assert(spark.read.format("graft").load(path).count() == 2)
    // a restarted query re-runs epoch 7's tasks, then re-commits
    stage()
    sw.commit(7L, Array.empty)
    assert(spark.read.format("graft").load(path).count() == 2,
      "replayed epoch is a no-op: the marker says it already committed")
    assert(!new java.io.File(path + "__graft_epoch_7").exists,
      "replayed stage is still cleaned up")
    // a NEW epoch still lands
    Seq((3L, 30L, 0L)).toDF("d0", "v", "c0")
      .write.format("graft").mode("append").save(path + "__graft_epoch_8")
    sw.commit(8L, Array.empty)
    assert(spark.read.format("graft").load(path).count() == 3)
  }

  test("streaming upsert: conflicting dim-0 ids replaced per epoch (daemon write-behind)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    val cp = Files.createTempDirectory("graft-sw-cp").toString
    val w = new World(spark, path, Seq(DimSpec("d0", DimMapping(0, 99, 10))))
    w.create(Seq((5L, 50L), (15L, 150L)).toDF("d0", "v"))
    val src = MemoryStream[(Long, Long)]
    val q = w.withBuckets(src.toDF().toDF("d0", "v"))
      .writeStream.format("graft")
      .option("graft.mode", "upsert")
      .option("checkpointLocation", cp)
      .start(path)
    try {
      src.addData((5L, 999L), (25L, 250L)) // one conflict, one fresh
      q.processAllAvailable()
      val got = spark.read.format("graft").load(path)
        .select("d0", "v").as[(Long, Long)].collect().toMap
      assert(got == Map(5L -> 999L, 15L -> 150L, 25L -> 250L),
        s"epoch upsert replaced id 5 and added id 25, got $got")
    } finally q.stop()
  }

  test("streaming upsert epoch on a versioned world goes merge-on-read: zero pre-existing bytes move (r14)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    val cp = Files.createTempDirectory("graft-sw-cp").toString
    val w = new World(spark, path, Seq(DimSpec("d0", DimMapping(0, 99, 10))))
    // cell c0=1 holds TEN rows so the epoch's single conflict stays under
    // the DV cutover fraction (a gutted file would correctly rewrite)
    w.create(((10L to 19L).map(i => (i, 150L)) :+ (5L, 50L)).toDF("d0", "v"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), new org.apache.hadoop.conf.Configuration())
    val root = new org.apache.hadoop.fs.Path(path)
    def live = GraftVersions.readEntries(fs, root,
      GraftVersions.latestVersion(fs, root).get)
    val src = MemoryStream[(Long, Long)]
    val q = w.withBuckets(src.toDF().toDF("d0", "v"))
      .writeStream.format("graft")
      .option("graft.mode", "upsert")
      .option("checkpointLocation", cp)
      .start(path)
    try {
      // epoch 1 on the UNVERSIONED world: COW, seals the first manifests
      src.addData((5L, 999L), (25L, 250L))
      q.processAllAvailable()
      val pre = live.map(e => e.rel -> e.size).toMap
      // epoch 2: the log is authoritative now — the epoch's tasks write
      // IN PLACE and the commit retires the conflicting row into a
      // DELETION VECTOR, sealing vectors + the tasks' own files; every
      // pre-epoch file stays live at its exact size AND the epoch's bytes
      // are written exactly once (zero stage moves — at 100 TB: a 10-row
      // CDC epoch writes ~10 sidecar entries + 10 rows, never the touched
      // gigabyte cells, and never twice)
      val movesBefore = GraftStage.movesPerformed.get()
      src.addData((15L, 888L), (35L, 350L))
      q.processAllAvailable()
      assert(GraftStage.movesPerformed.get() == movesBefore,
        "an authoritative-log upsert epoch performs ZERO stage moves")
      val after = live
      assert(after.exists(_.dv.isDefined),
        "a versioned upsert epoch must take the deletion-vector path")
      assert(pre.forall { case (rel, sz) =>
        after.exists(e => e.rel == rel && e.size == sz) },
        "an upsert epoch must move zero pre-existing bytes")
      val got = spark.read.format("graft").load(path)
        .select("d0", "v").as[(Long, Long)].collect().toMap
      val expect = (10L to 19L).map(i => i -> 150L).toMap ++
        Map(5L -> 999L, 15L -> 888L, 25L -> 250L, 35L -> 350L)
      assert(got == expect,
        s"epoch upserts applied through the MoR path, got $got")
    } finally q.stop()
  }

  test("Complete output mode truncates: each epoch replaces the world") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    val cp = Files.createTempDirectory("graft-sw-cp").toString
    val src = MemoryStream[Long]
    val agg = src.toDF().toDF("d0")
      .withColumn("c0", col("d0") / 10 cast "long")
      .groupBy("c0").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("graft")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .start(path)
    try {
      src.addData(1L, 2L, 11L)
      q.processAllAvailable()
      val r1 = spark.read.format("graft").load(path)
        .select("c0", "n").as[(Long, Long)].collect().toMap
      assert(r1 == Map(0L -> 2L, 1L -> 1L))
      src.addData(3L)
      q.processAllAvailable()
      val r2 = spark.read.format("graft").load(path)
        .select("c0", "n").as[(Long, Long)].collect().toMap
      assert(r2 == Map(0L -> 3L, 1L -> 1L),
        s"the world holds exactly the LATEST aggregate state, got $r2")
    } finally q.stop()
  }

  test("streaming onto a WAP branch: epochs stage invisibly, fast_forward publishes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    // seed main so the table is versioned (branch streams need the log)
    Seq((1L, 10L, 0L)).toDF("d0", "v", "c0")
      .write.format("graft").mode("append").save(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    GraftVersions.createBranch(fs, root, "ingest")

    val cp = Files.createTempDirectory("graft-sw-br-cp").toString
    val src = MemoryStream[(Long, Long)]
    val q = src.toDF().toDF("d0", "v")
      .withColumn("c0", col("d0") / 10 cast "long")
      .writeStream.format("graft")
      .option("checkpointLocation", cp)
      .option("graft.branch", "ingest")
      .start(path)
    try {
      src.addData((2L, 20L)); q.processAllAvailable()
      src.addData((15L, 150L)); q.processAllAvailable()
      // two epochs drained: main still shows only the seed row
      assert(spark.read.format("graft").load(path)
        .select("d0").as[Long].collect().toSet == Set(1L),
        "staged epochs must be invisible to main readers")
      // the branch read shows the staged epochs (audit face)
      assert(spark.read.format("graft").option("graft.branch", "ingest")
        .load(path).select("d0").as[Long].collect().toSet == Set(1L, 2L, 15L))
      assert(GraftVersions.branchVersions(fs, root, "ingest").size == 2,
        "one branch commit per drained epoch")
    } finally q.stop()
    // publish the drained epochs: main flips to the branch head atomically
    GraftVersions.fastForward(fs, root, "ingest")
    assert(spark.read.format("graft").load(path)
      .select("d0").as[Long].collect().toSet == Set(1L, 2L, 15L))

    // streaming UPSERT stages on a branch too (r13): each epoch's
    // World::insert resolves conflicts against the BRANCH HEAD — the fork
    // state for epoch 1, epoch 1's staged state for epoch 2 — and seals
    // on the branch chain; fast_forward publishes the merged state.
    val w2 = new World(spark, path, Seq(DimSpec("d0", DimMapping(0, 99, 10))))
    GraftVersions.createBranch(fs, root, "ingest2")
    val src2 = MemoryStream[(Long, Long)]
    val q2 = w2.withBuckets(src2.toDF().toDF("d0", "v"))
      .writeStream.format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sw-br-cp2").toString)
      .option("graft.branch", "ingest2")
      .option("graft.mode", "upsert")
      .start(path)
    try {
      // epoch 1: one conflict with the FORK state (d0=2), one fresh row
      src2.addData((2L, 999L), (55L, 550L)); q2.processAllAvailable()
      // epoch 2: a conflict with epoch 1's OWN staged row — branch-head
      // resolution, not main's
      src2.addData((55L, 551L)); q2.processAllAvailable()
      assert(spark.read.format("graft").load(path)
        .select("d0", "v").as[(Long, Long)].collect().toMap ==
        Map(1L -> 10L, 2L -> 20L, 15L -> 150L),
        "staged upsert epochs must be invisible to main readers")
      assert(spark.read.format("graft").option("graft.branch", "ingest2")
        .load(path).select("d0", "v").as[(Long, Long)].collect().toMap ==
        Map(1L -> 10L, 2L -> 999L, 15L -> 150L, 55L -> 551L),
        "the branch head shows per-epoch replace-on-conflict state")
    } finally q2.stop()
    GraftVersions.fastForward(fs, root, "ingest2")
    assert(spark.read.format("graft").load(path)
      .select("d0", "v").as[(Long, Long)].collect().toMap ==
      Map(1L -> 10L, 2L -> 999L, 15L -> 150L, 55L -> 551L),
      "fast_forward publishes the merged upsert state atomically")
  }
}
