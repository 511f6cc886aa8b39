package graft.sources

import graft.core.DimMapping
import graft.world.{DimSpec, World}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Commit versioning over the chunk grid: every connector/catalog write
  * seals a manifest, superseded chunk files stay IN PLACE (liveness lives
  * only in manifests — zero renames, the object-store-safe shape) until
  * retention deletes them, and the catalog exposes `VERSION AS OF` /
  * `TIMESTAMP AS OF` reads plus `system.rollback` /
  * `system.expire_versions` maintenance — the snapshot-isolation layer the
  * reference's whole-chunk replace
  * (/root/reference/tokio-fs/src/lib.rs:84-107) has no answer to.
  */
class GraftVersionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-vwh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.vcat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.vcat.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(sql: String): Set[(Long, Long)] =
    spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("DML history: VERSION AS OF addresses every committed state") {
    spark.sql("CREATE TABLE vcat.t (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.t VALUES (1, 10, 0), (11, 110, 1), (21, 210, 2)") // v1
    spark.sql("UPDATE vcat.t SET v = v + 1000 WHERE c0 = 1")                      // v2 (COW)
    spark.sql("DELETE FROM vcat.t WHERE c0 = 2")                                  // v3 (metadata)

    assert(rows("SELECT id, v FROM vcat.t") == Set((1L, 10L), (11L, 1110L)),
      "current state reflects all three statements")
    assert(rows("SELECT id, v FROM vcat.t VERSION AS OF 1") ==
      Set((1L, 10L), (11L, 110L), (21L, 210L)), "v1 = post-insert state")
    assert(rows("SELECT id, v FROM vcat.t VERSION AS OF 2") ==
      Set((1L, 10L), (11L, 1110L), (21L, 210L)), "v2 = post-update state")
    assert(rows("SELECT id, v FROM vcat.t VERSION AS OF 3") ==
      Set((1L, 10L), (11L, 1110L)), "v3 = post-delete state")
    // far-future TIMESTAMP AS OF resolves to the newest commit
    assert(rows("SELECT id, v FROM vcat.t TIMESTAMP AS OF '2100-01-01'") ==
      Set((1L, 10L), (11L, 1110L)))
    // bucket pruning still applies on the frozen file list
    val pruned = spark.sql("SELECT id, v FROM vcat.t VERSION AS OF 1 WHERE c0 = 1")
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((11L, 110L)))
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("Snapshot: v1"), s"snapshot scan declared in plan:\n$desc")
    // a missing version fails at analysis with the available range
    val e = intercept[Exception](spark.sql("SELECT * FROM vcat.t VERSION AS OF 99"))
    assert(e.getMessage.contains("no committed version 99"))
  }

  test("snapshot tables are read-only (catalog and path API)") {
    import spark.implicits._
    spark.sql("CREATE TABLE vcat.ro (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.ro VALUES (1, 10, 0)")
    val path = s"$warehouse/ro"
    // path-API snapshot read works…
    val snap = spark.read.format("graft").option("graft.snapshot", "1").load(path)
    assert(snap.select("id").as[Long].collect().toSeq == Seq(1L))
    // …but a write against a snapshot-pinned table is refused
    val e = intercept[Exception] {
      Seq((2L, 20L, 0L)).toDF("id", "v", "c0")
        .write.format("graft").option("graft.snapshot", "1")
        .mode("append").save(path)
    }
    assert(e.getMessage.contains("read-only"), s"got: ${e.getMessage}")
  }

  test("rollback restores a committed state and seals it as a NEW version") {
    spark.sql("CREATE TABLE vcat.rb (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.rb VALUES (1, 10, 0), (11, 110, 1)") // v1
    spark.sql("UPDATE vcat.rb SET v = -1 WHERE id = 11")             // v2
    assert(rows("SELECT id, v FROM vcat.rb") == Set((1L, 10L), (11L, -1L)))
    val out = spark.sql("CALL vcat.system.rollback(table => 'rb', version => 1)")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L), "rollback seals version 3")
    assert(rows("SELECT id, v FROM vcat.rb") == Set((1L, 10L), (11L, 110L)),
      "current state is the v1 state again")
    assert(rows("SELECT id, v FROM vcat.rb VERSION AS OF 2") ==
      Set((1L, 10L), (11L, -1L)),
      "history is append-only: the rolled-back state stays addressable")
    assert(rows("SELECT id, v FROM vcat.rb VERSION AS OF 3") ==
      Set((1L, 10L), (11L, 110L)))
  }

  test("expire_versions prunes manifests and unreachable history") {
    spark.sql("CREATE TABLE vcat.ex (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.ex VALUES (1, 10, 0)")       // v1
    spark.sql("UPDATE vcat.ex SET v = 20 WHERE id = 1")      // v2
    spark.sql("UPDATE vcat.ex SET v = 30 WHERE id = 1")      // v3
    val n = spark.sql("CALL vcat.system.expire_versions(table => 'ex', keep => 1)")
      .collect().head.getLong(0)
    assert(n == 3L, s"v0 baseline, v1, v2 expire; got $n")
    assert(rows("SELECT id, v FROM vcat.ex") == Set((1L, 30L)),
      "live reads untouched by retention")
    assert(rows("SELECT id, v FROM vcat.ex VERSION AS OF 3") == Set((1L, 30L)),
      "the kept version still reads")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM vcat.ex VERSION AS OF 1").collect())
    assert(e.getMessage.contains("no committed version 1"))
    assert(!new java.io.File(s"$warehouse/ex/_graft_history").exists() ||
      new java.io.File(s"$warehouse/ex/_graft_history").listFiles().isEmpty,
      "history files only expired snapshots could reach are gone")
    // the vacuum: retired-in-place files only the dropped manifests
    // referenced are physically deleted; exactly the kept version's file
    // set remains in the cell
    val fsRoot = java.nio.file.Paths.get(s"$warehouse/ex")
    val remaining = java.nio.file.Files.walk(fsRoot).iterator()
    var parquets = 0
    while (remaining.hasNext) {
      if (remaining.next().toString.endsWith(".parquet")) parquets += 1
    }
    assert(parquets == 1,
      s"expire vacuums retired bytes: one live file expected, got $parquets")
  }

  test("a rollback claim shields the target's bytes from a concurrent expire") {
    spark.sql("CREATE TABLE vcat.cl (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.cl VALUES (1, 10, 0)")   // v1
    spark.sql("UPDATE vcat.cl SET v = 20 WHERE id = 1")  // v2
    spark.sql("UPDATE vcat.cl SET v = 30 WHERE id = 1")  // v3
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/cl")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an in-flight rollback to v1: claim written, target root read (the
    // rollback protocol's steps 1-2), seal not yet landed
    val claim = GraftVersions.writeClaim(fs, root, 1L)
    val entriesV1 = GraftVersions.readEntries(fs, root, 1L)
    assert(entriesV1.nonEmpty)
    // the racing expire drops v1's manifest (it is past retention) but —
    // because claims are read after the manifest drops — MUST spare v1's
    // data files, which the in-flight rollback is about to re-reference.
    // (Without the claim this vacuum deletes them: the
    // "expire_versions prunes" test above pins exactly that.)
    spark.sql("CALL vcat.system.expire_versions(table => 'cl', keep => 1)")
    entriesV1.foreach { e =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(root, e.rel)),
        s"claimed version's ${e.rel} must survive the concurrent expire")
    }
    // the rollback completes by dropping its claim; live reads were never
    // disturbed either way
    fs.delete(claim, false)
    assert(GraftVersions.readClaims(fs, root).isEmpty)
    assert(rows("SELECT id, v FROM vcat.cl") == Set((1L, 30L)))
  }

  test("stale claims are crash debris: expire's claim read sweeps them") {
    spark.sql("CREATE TABLE vcat.cls (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.cls VALUES (1, 10, 0)") // v1
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/cls")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = GraftVersions.writeClaim(fs, root, 1L)
    // age the claim past the TTL (a rollback that died mid-flight)
    fs.setTimes(claim, System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
    assert(GraftVersions.readClaims(fs, root).isEmpty,
      "an aged-out claim is ignored")
    assert(!fs.exists(claim), "and swept, so it cannot pin bytes forever")
  }

  test("declared retention: commits self-expire the log; tags survive; clearing stops it") {
    spark.sql("CREATE TABLE vcat.ar (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.ar VALUES (1, 10, 0)")                    // v0+v1
    spark.sql("CALL vcat.system.set_retention(table => 'ar', keep => 2)")
    spark.sql("UPDATE vcat.ar SET v = 20 WHERE id = 1")                   // v2
    spark.sql("UPDATE vcat.ar SET v = 30 WHERE id = 1")                   // v3
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(warehouse), new org.apache.hadoop.conf.Configuration())
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/ar")
    assert(GraftVersions.listVersions(fs, root) == Seq(2L, 3L),
      "each seal expired the log down to keep=2, no maintenance call")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM vcat.ar VERSION AS OF 1").collect())
    assert(e.getMessage.contains("no committed version 1"))
    assert(rows("SELECT id, v FROM vcat.ar") == Set((1L, 30L)))
    // a tagged version rides out the per-commit expiry
    spark.sql("CALL vcat.system.tag(table => 'ar', name => 'pin2', version => 2)")
    spark.sql("UPDATE vcat.ar SET v = 40 WHERE id = 1")                   // v4
    assert(GraftVersions.listVersions(fs, root) == Seq(2L, 3L, 4L))
    assert(rows("SELECT id, v FROM vcat.ar VERSION AS OF 'pin2'") == Set((1L, 20L)))
    // keep <= 0 clears the declaration: the log grows again
    spark.sql("CALL vcat.system.set_retention(table => 'ar', keep => 0)")
    spark.sql("UPDATE vcat.ar SET v = 50 WHERE id = 1")                   // v5
    assert(GraftVersions.listVersions(fs, root) == Seq(2L, 3L, 4L, 5L))
  }

  test("declared compaction: appends self-compact touched cells over the bound") {
    spark.sql("CREATE TABLE vcat.ac (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("CALL vcat.system.set_compaction(table => 'ac', max_files => 2)")
    for (i <- 1 to 4)
      spark.sql(s"INSERT INTO vcat.ac VALUES ($i, ${i * 10}, 0)")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(warehouse), new org.apache.hadoop.conf.Configuration())
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/ac")
    val live = GraftVersions.liveRels(fs, root).get
    assert(live.count(_.startsWith("c0=0/")) <= 2,
      s"the appended cell self-compacted at the bound: $live")
    assert(rows("SELECT id, v FROM vcat.ac") ==
      (1 to 4).map(i => (i.toLong, i * 10L)).toSet, "content intact")
    assert(!GraftVersions.hasBarrier(fs, root),
      "auto-compaction is a versioned overwrite, never a barrier")
    // cells the append did NOT touch are never rewritten: fragment another
    // cell, clear the policy, and append elsewhere
    spark.sql("CALL vcat.system.set_compaction(table => 'ac', max_files => 0)")
    for (i <- 5 to 7)
      spark.sql(s"INSERT INTO vcat.ac VALUES ($i, ${i * 10}, 1)")
    val after = GraftVersions.liveRels(fs, root).get
    assert(after.count(_.startsWith("c0=1/")) == 3,
      "cleared policy: appends fragment again (no silent rewrites)")
  }

  test("commit CAS under real contention: 8 concurrent appenders, zero lost rows") {
    // the r10 OCC claim stress-tested: 8 threads x 4 single-row INSERTs
    // race on the version counter; every loser must re-begin on the
    // winner's manifest and replay its delta. A single silently-dropped
    // manifest entry (the pre-CAS failure mode) loses a row from the
    // final manifest-resolved readback and fails the set equality.
    spark.sql("CREATE TABLE vcat.ccstress (id BIGINT, v BIGINT, c0 BIGINT)")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val fs = (0 until 8).map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            for (i <- 0 until 4)
              spark.sql(s"INSERT INTO vcat.ccstress VALUES (${t * 100 + i}, $t, ${t % 3})")
        })
      }
      fs.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val want = (for { t <- 0 until 8; i <- 0 until 4 } yield (t * 100 + i).toLong).toSet
    assert(spark.sql("SELECT id FROM vcat.ccstress").collect()
      .map(_.getLong(0)).toSet == want, "all 32 rows survive the contention")
    // the log itself is healthy: versions strictly ascending, latest
    // manifest's live set backs the same count
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(warehouse), new org.apache.hadoop.conf.Configuration())
    val vs = GraftVersions.listVersions(hfs,
      new org.apache.hadoop.fs.Path(s"$warehouse/ccstress"))
    assert(vs == vs.sorted && vs.nonEmpty, s"dense ascending log: $vs")
  }

  test("rollback races expire: the sealed table is ALWAYS fully readable") {
    // the r15 claims-protocol invariant under real thread interleaving:
    // whatever order a rollback (reuse-by-reference from a NON-latest
    // root) and an expire_versions (which drops that very root) land in,
    // the table's latest manifest must never reference deleted bytes.
    // Each op may individually refuse loudly (target expired first) —
    // that is the benign outcome; an unreadable table is the bug.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 6) {
        val tbl = s"rbrace$round"
        spark.sql(s"CREATE TABLE vcat.$tbl (id BIGINT, v BIGINT, c0 BIGINT)")
        spark.sql(s"INSERT INTO vcat.$tbl VALUES (1, 10, 0)")    // v1
        spark.sql(s"UPDATE vcat.$tbl SET v = 20 WHERE id = 1")   // v2
        spark.sql(s"UPDATE vcat.$tbl SET v = 30 WHERE id = 1")   // v3
        val rb = pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            try { spark.sql(
              s"CALL vcat.system.rollback(table => '$tbl', version => 1)")
              .collect(); "rolled-back" }
            catch { case e: Exception => s"refused: ${e.getMessage.take(60)}" }
        })
        val ex = pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            try { spark.sql(
              s"CALL vcat.system.expire_versions(table => '$tbl', keep => 1)")
              .collect(); "expired" }
            catch { case e: Exception => s"refused: ${e.getMessage.take(60)}" }
        })
        val (r1, r2) = (rb.get(120, java.util.concurrent.TimeUnit.SECONDS),
          ex.get(120, java.util.concurrent.TimeUnit.SECONDS))
        // the LATEST state must read completely — whichever op won
        val got = spark.sql(s"SELECT id, v FROM vcat.$tbl").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == Set((1L, 10L)) || got == Set((1L, 30L)),
          s"round $round [$r1 | $r2]: latest readback corrupt: $got")
        // and every file the latest manifest references exists on disk
        val root = new org.apache.hadoop.fs.Path(s"$warehouse/$tbl")
        val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val latest = GraftVersions.listVersions(hfs, root).last
        GraftVersions.readEntries(hfs, root, latest).foreach { e =>
          assert(hfs.exists(new org.apache.hadoop.fs.Path(root, e.rel)),
            s"round $round [$r1 | $r2]: latest v$latest references " +
              s"deleted ${e.rel}")
        }
        spark.sql(s"DROP TABLE vcat.$tbl")
      }
    } finally pool.shutdown()
  }

  test("writable branches: stage, audit, fast-forward; abandon leaves main untouched") {
    import spark.implicits._
    spark.sql("CREATE TABLE vcat.wap (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.wap VALUES (1, 10, 0)") // main v1
    spark.sql("""CALL vcat.system.set_check(table => 'wap', name => 'v_pos',
      expr => 'v > 0')""")
    val path = s"$warehouse/wap"
    def stage(b: String, rows: (Long, Long, Long)*): Unit =
      rows.toSeq.toDF("id", "v", "c0").write.format("graft")
        .option("graft.branch", b).mode("append").save(path)
    val fork = spark.sql("CALL vcat.system.branch(table => 'wap', name => 'st1')")
      .collect().head.getLong(0)
    assert(fork == 1L)
    stage("st1", (2L, 20L, 0L))
    stage("st1", (11L, 110L, 1L))
    // the declared CHECK gates branch staging exactly like main writes
    intercept[Exception](stage("st1", (3L, -5L, 0L)))
    // WRITE phase done; AUDIT: main untouched, the branch handle sees the
    // staged state
    assert(rows("SELECT id, v FROM vcat.wap") == Set((1L, 10L)),
      "staged commits are invisible to main readers")
    val staged = spark.read.format("graft").option("graft.branch", "st1")
      .load(path).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(staged == Set((1L, 10L), (2L, 20L), (11L, 110L)))
    // PUBLISH: pure metadata, main's next version = the branch head
    val pubV = spark.sql(
      "CALL vcat.system.fast_forward(table => 'wap', branch => 'st1')")
      .collect().head.getLong(0)
    assert(pubV == 2L)
    assert(rows("SELECT id, v FROM vcat.wap") ==
      Set((1L, 10L), (2L, 20L), (11L, 110L)))
    assert(spark.sql("CALL vcat.system.branches(table => 'wap')")
      .collect().isEmpty, "publish drops the branch")
    // pre-publish history is intact
    assert(rows("SELECT id, v FROM vcat.wap VERSION AS OF 1") == Set((1L, 10L)))
    // ABANDON: staged rows never reach main
    spark.sql("CALL vcat.system.branch(table => 'wap', name => 'bad')")
    stage("bad", (99L, 990L, 9L))
    spark.sql("CALL vcat.system.drop_branch(table => 'wap', name => 'bad')")
    assert(rows("SELECT id, v FROM vcat.wap") ==
      Set((1L, 10L), (2L, 20L), (11L, 110L)), "abandoned branch: main untouched")
    // DIVERGENCE: main advanced since the fork -> publish refuses loudly
    spark.sql("CALL vcat.system.branch(table => 'wap', name => 'late')")
    stage("late", (5L, 50L, 0L))
    spark.sql("INSERT INTO vcat.wap VALUES (21, 210, 2)")
    val e = intercept[Exception](spark.sql(
      "CALL vcat.system.fast_forward(table => 'wap', branch => 'late')"))
    assert(e.getMessage.contains("advanced"), s"got: ${e.getMessage}")
    // overwrite STAGES on the branch (r11 full-DML WAP): the branch head
    // flips to the overwritten state, main never sees it
    val mainBefore = rows("SELECT id, v FROM vcat.wap")
    Seq((7L, 70L, 0L)).toDF("id", "v", "c0").write.format("graft")
      .option("graft.branch", "late").mode("overwrite").save(path)
    assert(spark.read.format("graft").option("graft.branch", "late").load(path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((7L, 70L)),
      "branch head reflects the staged truncate")
    assert(rows("SELECT id, v FROM vcat.wap") == mainBefore,
      "main untouched by the staged overwrite")
    // upsert STAGES on the branch too (r13): replace-on-conflict resolves
    // against the BRANCH HEAD — the staged (7, 70) row, not main's state
    new graft.world.World(spark, path,
      Seq(graft.world.DimSpec("id", graft.core.DimMapping(0, 99, 10))))
    Seq((7L, 71L, 0L), (42L, 420L, 4L)).toDF("id", "v", "c0")
      .write.format("graft")
      .option("graft.branch", "late").option("graft.mode", "upsert")
      .mode("append").save(path)
    assert(spark.read.format("graft").option("graft.branch", "late").load(path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((7L, 71L), (42L, 420L)),
      "branch upsert displaced the staged conflict and added the fresh row")
    assert(rows("SELECT id, v FROM vcat.wap") == mainBefore,
      "main untouched by the staged upsert")
  }

  test("regrid reseals geometry as a versioned commit; old snapshots keep reading") {
    spark.sql("CREATE TABLE vcat.rg (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.rg SELECT id, id * 10, id DIV 10 FROM range(0, 40)") // v1
    val out = spark.sql(
      "CALL vcat.system.regrid(table => 'rg', buckets => 'id DIV 5 AS c0, id % 2 AS c1')")
      .collect()
    assert(out.head.getLong(0) == 2L, "regrid seals the next version")
    // content hash-identical through the geometry change
    assert(rows("SELECT id, v FROM vcat.rg") ==
      (0L until 40L).map(i => (i, i * 10)).toSet)
    // the new geometry is live and routes later writes
    assert(spark.sql("SELECT DISTINCT c1 FROM vcat.rg").collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
    spark.sql("INSERT INTO vcat.rg VALUES (100, 1000, 20, 0)")
    assert(new java.io.File(s"$warehouse/rg/c0=20/c1=0").isDirectory,
      "post-regrid INSERT routes by the new bucket columns")
    // a snapshot pinned BEFORE the regrid reads its own geometry: old
    // files' bucket values come from their own paths, and a predicate on
    // them prunes against that historical geometry
    assert(rows("SELECT id, v FROM vcat.rg VERSION AS OF 1") ==
      (0L until 40L).map(i => (i, i * 10)).toSet)
    assert(rows("SELECT id, v FROM vcat.rg VERSION AS OF 1 WHERE c0 = 2") ==
      (20L until 30L).map(i => (i, i * 10)).toSet)
    // a NULL-producing bucket expression is refused before any mutation
    val e = intercept[Exception](spark.sql(
      "CALL vcat.system.regrid(table => 'rg', buckets => 'IF(id < 50, id, NULL) AS c0')"))
    assert(e.getMessage.contains("NULL"))
    assert(rows("SELECT id, v FROM vcat.rg").size == 41, "refusal left the table intact")
  }

  test("first versioned commit writes a v0 baseline of the pre-existing world") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vbase").toString + "/world"
    val w = new World(spark, path, Seq(DimSpec("d0", DimMapping(0, 99, 10))))
    w.create(Seq((1L, 10L), (15L, 150L)).toDF("d0", "v")) // pre-versioning world
    // connector append = first versioned commit: v0 baseline + v1
    w.withBuckets(Seq((25L, 250L)).toDF("d0", "v"))
      .write.format("graft").mode("append").save(path)
    def at(v: Int): Set[Long] =
      w.snapshot(v).select("d0").as[Long].collect().toSet
    assert(at(0) == Set(1L, 15L), "v0 = the world as it was before versioning")
    assert(at(1) == Set(1L, 15L, 25L), "v1 = post-append")
  }

  test("snapshot scans keep aggregate pushdown (footer stats from history files)") {
    spark.sql("CREATE TABLE vcat.ag (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.ag SELECT id, id * 10, id DIV 10 FROM range(0, 30)") // v1
    spark.sql("UPDATE vcat.ag SET v = 0 WHERE id % 2 = 0")                           // v2
    val agg = spark.sql(
      "SELECT c0, COUNT(*) AS n, MAX(v) AS mx FROM vcat.ag VERSION AS OF 1 GROUP BY c0")
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("GraftAggScan") && p.contains("Snapshot: v1"),
      s"snapshot aggregate answered from footer metadata:\n$p")
    val got = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 10L, 90L), (1L, 10L, 190L), (2L, 10L, 290L)),
      "v1 (pre-update) maxima, not the zeroed ones")
    // SUM reads the writer's footer metadata sums from the SAME retired
    // history files (the three-feature composition w_snapshot_agg gates)
    val sums = spark.sql(
      "SELECT c0, SUM(v) AS sv FROM vcat.ag VERSION AS OF 1 GROUP BY c0")
    assert(sums.queryExecution.executedPlan.toString.contains("SUM(v)"))
    assert(sums.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 450L), (1L, 1450L), (2L, 2450L)),
      "v1 sums from history metadata, not the zeroed live files")
  }

  test("INSERT OVERWRITE (truncate) retires the whole grid in the manifest layer") {
    spark.sql("CREATE TABLE vcat.ow (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.ow VALUES (1, 10, 0), (11, 110, 1)")  // v1
    spark.sql("INSERT OVERWRITE vcat.ow VALUES (99, 990, 9)")         // v2 (truncate)
    assert(rows("SELECT id, v FROM vcat.ow") == Set((99L, 990L)))
    assert(rows("SELECT id, v FROM vcat.ow VERSION AS OF 1") ==
      Set((1L, 10L), (11L, 110L)),
      "the pre-overwrite state survives the truncate in history")
  }

  test("manifest-only liveness: a COW UPDATE moves ZERO data files") {
    spark.sql("CREATE TABLE vcat.mo (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.mo VALUES (1, 10, 0), (2, 20, 0), (11, 110, 1)") // v1
    def treeFiles(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(s"$warehouse/mo")
      val it = java.nio.file.Files.walk(root).iterator()
      val out = scala.collection.mutable.Map[String, Long]()
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet"))
          out(root.relativize(p).toString) =
            java.nio.file.Files.getLastModifiedTime(p).toMillis
      }
      out.toMap
    }
    val before = treeFiles()
    spark.sql("UPDATE vcat.mo SET v = -1 WHERE id = 1") // v2: cell COW
    val after = treeFiles()
    // every pre-update file is still at its original path, byte-untouched —
    // retirement is a manifest omission, never a rename (on an object store
    // a rename is a full copy; this is the 100-TB-safe shape)
    before.foreach { case (rel, mtime) =>
      assert(after.contains(rel), s"superseded file $rel must stay in place")
      assert(after(rel) == mtime, s"superseded file $rel must not be rewritten")
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$warehouse/mo/_graft_history")),
      "no history directory exists under manifest-only retirement")
    // liveness moved in the manifest layer only: v1 still reads the old
    // rows, the live table the new ones, and rollback is a manifest rewrite
    assert(rows("SELECT id, v FROM vcat.mo") ==
      Set((1L, -1L), (2L, 20L), (11L, 110L)))
    assert(rows("SELECT id, v FROM vcat.mo VERSION AS OF 1") ==
      Set((1L, 10L), (2L, 20L), (11L, 110L)))
    spark.sql("CALL vcat.system.rollback(table => 'mo', version => 1)") // v3
    assert(treeFiles().keySet == after.keySet,
      "rollback is a manifest rewrite: zero file moves")
    assert(rows("SELECT id, v FROM vcat.mo") ==
      Set((1L, 10L), (2L, 20L), (11L, 110L)))
  }

  test("commit CAS: an interleaved add-only commit replays; a retiring one aborts loudly") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.sql("CREATE TABLE vcat.cc (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.cc VALUES (1, 10, 0)") // v1
    val root = new Path(s"$warehouse/cc")
    val fs = FileSystem.get(root.toUri, new org.apache.hadoop.conf.Configuration())
    // writer A begins against v1…
    val a = GraftVersions.beginCommit(fs, root)
    // …but a concurrent INSERT seals v2 first
    spark.sql("INSERT INTO vcat.cc VALUES (11, 110, 1)") // v2
    // A adds a file that is already physically in place (simulate its move)
    val cell = new Path(root, "c0=0")
    val src = fs.listStatus(cell).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val extra = new Path(cell, "part-cas-extra.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, extra, false,
      spark.sparkContext.hadoopConfiguration)
    val sealedAt = GraftVersions.sealCommit(fs, root, a, Set.empty,
      Seq(GraftVersions.ManifestEntry(GraftVersions.relOf(root, extra),
        fs.getFileStatus(extra).getLen)))
    assert(sealedAt == 3L, "the loser re-begins on the winner's state (v3)")
    val m3 = GraftVersions.readManifest(fs, root, 3L).toSet
    assert(m3.contains(GraftVersions.relOf(root, extra)) &&
      GraftVersions.readManifest(fs, root, 2L).forall(m3.contains),
      "both commits' files survive: neither manifest entry was dropped")
    // a RETIRING commit that loses the race must abort loudly, not replay
    val b = GraftVersions.beginCommit(fs, root)
    spark.sql("INSERT INTO vcat.cc VALUES (21, 210, 2)") // v4 wins the race
    val e = intercept[java.util.ConcurrentModificationException](
      GraftVersions.sealCommit(fs, root, b,
        removed = Set(GraftVersions.relOf(root, extra)), added = Seq.empty))
    assert(e.getMessage.contains("concurrent"))
    assert(rows("SELECT id, v FROM vcat.cc").map(_._1) == Set(1L, 11L, 21L),
      "the aborted commit changed nothing")
  }

  test("clean_stages removes aged orphan staging grids only") {
    spark.sql("CREATE TABLE vcat.cs (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.cs VALUES (1, 10, 0)")
    val old = new java.io.File(s"$warehouse/cs__graft_rowlevel_stage_deadbeef01")
    assert(old.mkdirs()); new java.io.File(old, "part-0-0-0.parquet").createNewFile()
    assert(old.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000))
    val fresh = new java.io.File(s"$warehouse/cs__graft_upsert_stage_ffffffff02")
    assert(fresh.mkdirs())
    val n = spark.sql(
      "CALL vcat.system.clean_stages(table => 'cs', older_than_hours => 24)")
      .collect().head.getLong(0)
    assert(n == 1L, s"exactly the aged orphan removed, got $n")
    assert(!old.exists, "aged orphan gone")
    assert(fresh.exists, "a fresh (possibly live) stage is untouched")
    assert(rows("SELECT id, v FROM vcat.cs") == Set((1L, 10L)))
  }

  test("system.versions lists the commit log (version, seal time, file count)") {
    spark.sql("CREATE TABLE vcat.vh (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.vh VALUES (1, 10, 0)")
    spark.sql("INSERT INTO vcat.vh VALUES (11, 110, 1)")
    val hist = spark.sql("CALL vcat.system.versions(table => 'vh')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(_._1).toSeq == Seq(0L, 1L, 2L), "v0 baseline + two inserts")
    assert(hist.map(_._3).toSeq == Seq(0L, 1L, 2L),
      "live-file counts per version (empty baseline, then one file per insert)")
    assert(hist.forall(_._2 > 0L), "seal timestamps populated")
  }

  test("streaming sink: graft.versions.keep bounds the commit log per epoch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft-vsk").toString + "/world"
    val cp = Files.createTempDirectory("graft-vsk-cp").toString
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = src.toDF().toDF("d0", "v")
      .withColumn("c0", col("d0") / 10 cast "long")
      .writeStream.format("graft")
      .option("checkpointLocation", cp)
      .option("graft.versions.keep", "2")
      .start(path)
    try {
      for (i <- 1 to 4) { src.addData((i.toLong, i * 10L)); q.processAllAvailable() }
    } finally q.stop()
    val manifests = new java.io.File(s"$path/_graft_versions").listFiles()
      .count(_.getName.endsWith(".manifest"))
    assert(manifests <= 2, s"retention keeps the log bounded, got $manifests")
    assert(spark.read.format("graft").load(path).count() == 4,
      "retention never touches live data")
  }

  test("World rewrites are versioned commits, not barriers; an explicit barrier heals by walk") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vbar").toString + "/world"
    val w = new World(spark, path, Seq(DimSpec("d0", DimMapping(0, 99, 10))))
    w.create(Seq((1L, 10L), (15L, 150L)).toDF("d0", "v"))
    w.withBuckets(Seq((25L, 250L)).toDF("d0", "v"))
      .write.format("graft").mode("append").save(path)          // v0 baseline + v1
    // r11: World.insert rides the connector's bucket-scoped overwrite —
    // a CAS-sealed versioned commit (v2), NOT a barrier: superseded files
    // retire in the manifest only and EVERY snapshot stays addressable
    w.insert(Seq((1L, 999L)).toDF("d0", "v"))                   // v2
    w.withBuckets(Seq((35L, 350L)).toDF("d0", "v"))
      .write.format("graft").mode("append").save(path)          // v3 incremental
    def at(v: Int) = spark.read.format("graft")
      .option("graft.snapshot", v.toString).load(path)
      .select("d0", "v").as[(Long, Long)].collect().toMap
    assert(at(1) == Map(1L -> 10L, 15L -> 150L, 25L -> 250L),
      "pre-insert snapshot survives the rewrite (no barrier, bytes in place)")
    assert(at(2) == Map(1L -> 999L, 15L -> 150L, 25L -> 250L))
    assert(at(3) == Map(1L -> 999L, 15L -> 150L, 25L -> 250L, 35L -> 350L))
    // the barrier MACHINERY stays for legacy/external tree surgery: an
    // explicit noteBarrier syncs retired files away, degrades live reads
    // to the walk, and the next seal heals from it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), new org.apache.hadoop.conf.Configuration())
    GraftVersions.noteBarrier(fs, new org.apache.hadoop.fs.Path(path))
    w.withBuckets(Seq((45L, 450L)).toDF("d0", "v"))
      .write.format("graft").mode("append").save(path)          // v4 — walk seal
    assert(at(4) == Map(1L -> 999L, 15L -> 150L, 25L -> 250L, 35L -> 350L,
      45L -> 450L), "post-barrier walk seal is exact")
    // the sync deleted v1's retired c0=0 file — that snapshot fails LOUDLY
    val e = intercept[Exception](at(1))
    assert(e.getMessage.contains("version barrier") ||
      Option(e.getCause).exists(_.getMessage.contains("version barrier")),
      s"got: ${e.getMessage}")
  }

  test("change feed: manifest diff tags inserted and deleted rows by cell") {
    spark.sql("CREATE TABLE vcat.cf (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.cf VALUES (1, 10, 0), (11, 110, 1), (21, 210, 2)") // v1
    spark.sql("UPDATE vcat.cf SET v = -1 WHERE id = 11")                           // v2
    spark.sql("DELETE FROM vcat.cf WHERE c0 = 2")                                  // v3
    def ch(b: Long, t: Long): Set[(String, Long, Long)] =
      GraftChanges.between(spark, s"$warehouse/cf", b, t)
        .select("_change_type", "id", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(ch(1, 2) == Set(("insert", 11L, -1L), ("delete", 11L, 110L)),
      "the rewritten cell's rows appear on both sides; untouched cells absent")
    assert(ch(2, 3) == Set(("delete", 21L, 210L)),
      "a metadata DELETE's dropped cell reports pure deletes")
    assert(ch(1, 3) == Set(("insert", 11L, -1L), ("delete", 11L, 110L),
      ("delete", 21L, 210L)), "spans compose across intermediate versions")
    assert(ch(1, 1).isEmpty, "self-diff is empty")
    // the pinned read declares itself and refuses writes like any pin
    val plan = spark.read.format("graft").option("graft.changes", "1,2")
      .load(s"$warehouse/cf").queryExecution.executedPlan.toString
    assert(plan.contains("Changes: v1..v2"), s"plan declares the diff pin:\n$plan")
    val e = intercept[Exception] {
      import spark.implicits._
      Seq((9L, 9L, 0L)).toDF("id", "v", "c0").write.format("graft")
        .option("graft.changes", "1,2").mode("append").save(s"$warehouse/cf")
    }
    assert(e.getMessage.contains("read-only"))
  }

  test("snapshots read through schema evolution (added column NULL in old versions)") {
    spark.sql("CREATE TABLE vcat.se (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.se VALUES (1, 10, 0)")                  // v1
    spark.sql("ALTER TABLE vcat.se ADD COLUMN note STRING")
    spark.sql("INSERT INTO vcat.se VALUES (11, 110, 1, 'tagged')")      // v2
    val got = spark.sql("SELECT id, note FROM vcat.se VERSION AS OF 1")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, None)),
      "pre-alter snapshot reads under the CURRENT schema; the added column " +
        "surfaces as NULL exactly like pre-alter live files do")
    val now = spark.sql("SELECT id, note FROM vcat.se").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(now == Set((1L, None), (11L, Some("tagged"))))
  }

  test("tags: VERSION AS OF by name, path-API twin, listing, drop, and validation") {
    spark.sql("CREATE TABLE vcat.tg (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.tg VALUES (1, 10, 0)")            // v1
    spark.sql("UPDATE vcat.tg SET v = 99 WHERE c0 = 0")           // v2
    spark.sql("CALL vcat.system.tag(table => 'tg', name => 'release-1', version => 1)")
    assert(rows("SELECT id, v FROM vcat.tg VERSION AS OF 'release-1'") ==
      Set((1L, 10L)), "tag resolves to the pre-update state")
    val byTag = spark.read.format("graft")
      .option("graft.snapshot", "release-1").load(s"$warehouse/tg")
    assert(byTag.select("v").collect().map(_.getLong(0)).toSeq == Seq(10L))
    val listed = spark.sql("CALL vcat.system.tags(table => 'tg')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(listed == Set(("release-1", 1L)))
    // unknown tag and invalid name are loud
    val e = intercept[Exception](
      spark.sql("SELECT * FROM vcat.tg VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("neither a commit version nor a tag"))
    val e2 = intercept[Exception](spark.sql(
      "CALL vcat.system.tag(table => 'tg', name => '9bad', version => 1)"))
    assert(e2.getMessage.contains("must match"))
    // tagging an uncommitted version is refused
    val e3 = intercept[Exception](spark.sql(
      "CALL vcat.system.tag(table => 'tg', name => 'ok', version => 9)"))
    assert(e3.getMessage.contains("no committed version 9"))
    spark.sql("CALL vcat.system.drop_tag(table => 'tg', name => 'release-1')")
    assert(spark.sql("CALL vcat.system.tags(table => 'tg')").count() == 0)
  }

  test("expire_versions retains tagged versions and the history they reach") {
    spark.sql("CREATE TABLE vcat.tr (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.tr VALUES (1, 10, 0)")   // v1
    spark.sql("UPDATE vcat.tr SET v = v + 1 WHERE c0 = 0") // v2 (retires v1's file)
    spark.sql("UPDATE vcat.tr SET v = v + 1 WHERE c0 = 0") // v3
    spark.sql("UPDATE vcat.tr SET v = v + 1 WHERE c0 = 0") // v4
    spark.sql("CALL vcat.system.tag(table => 'tr', name => 'pinned', version => 1)")
    spark.sql("CALL vcat.system.expire_versions(table => 'tr', keep => 2)")
    // v1 survives via the tag WITH its history bytes; v2 is expired
    assert(rows("SELECT id, v FROM vcat.tr VERSION AS OF 'pinned'") ==
      Set((1L, 10L)), "tagged version stays readable past retention")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM vcat.tr VERSION AS OF 2").collect())
    assert(e.getMessage.contains("no committed version 2"))
    // dropping the tag re-enters retention: the next expire removes v1
    spark.sql("CALL vcat.system.drop_tag(table => 'tr', name => 'pinned')")
    spark.sql("CALL vcat.system.expire_versions(table => 'tr', keep => 2)")
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM vcat.tr VERSION AS OF 1").collect())
    assert(e2.getMessage.contains("no committed version 1"))
  }

  test("streaming reads of a snapshot are refused (frozen commit)") {
    spark.sql("CREATE TABLE vcat.st (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO vcat.st VALUES (1, 10, 0)")
    val q = spark.readStream.format("graft").option("graft.snapshot", "1")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v BIGINT, c0 BIGINT"))
      .load(s"$warehouse/st")
      .writeStream.format("console")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-vst-cp").toString)
      .start()
    // the refusal surfaces on the stream thread, not at start()
    val e = intercept[Exception](q.processAllAvailable())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("streaming reads take the live table")),
      s"got: ${messages(e).mkString(" | ")}")
  }
}
