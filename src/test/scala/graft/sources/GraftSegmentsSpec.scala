package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** SEGMENTED manifests (format v3): past a size threshold the root holds
  * only segment references and entries live in immutable uuid-named
  * segment files keyed by chunk cell — so a commit's metadata WRITE is
  * O(touched cells + root), never O(total live files). Without this,
  * every streaming epoch on a million-file world rewrote the full listing.
  * The suite drives the PUBLIC GraftVersions API under a lowered
  * segmentation threshold (`graft.manifest.segmentTarget`); the driver's
  * oracle worlds stay on flat v2 (they are far below the default
  * threshold), so this spec is where v3 earns its keep. */
class GraftSegmentsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val conf = new Configuration()
  private lazy val fs = FileSystem.get(conf)

  override protected def beforeAll(): Unit =
    System.setProperty("graft.manifest.segmentTarget", "4")
  override def afterAll(): Unit =
    System.clearProperty("graft.manifest.segmentTarget")

  private def newRoot(): Path =
    new Path(Files.createTempDirectory("graft-segs").toString)

  // rows = 0 marks the entry stats-complete, so sealing never opens the
  // (nonexistent) file's footer — this suite tests the log, not the data
  private def entry(rel: String): GraftVersions.ManifestEntry =
    GraftVersions.ManifestEntry(rel, 1L, rows = 0L)

  private def cellFiles(cell: Int, files: Range): Seq[String] =
    files.map(i => s"c0=$cell/part-$cell-$i.parquet")

  private def seal(root: Path, removed: Set[String],
      added: Seq[String]): Long = {
    val c = GraftVersions.beginCommit(fs, root)
    GraftVersions.sealCommit(fs, root, c, removed, added.map(entry))
  }

  private def rawText(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def segRelsOf(root: Path, v: Long): Set[String] =
    rawText(GraftVersions.manifestPath(root, v)).split('\n').toSeq
      .filter(_.startsWith("seg\t")).map(_.split('\t')(2)).toSet

  test("a large seal writes a v3 root; read-back is exact; a small world stays flat v2") {
    val root = newRoot()
    val files = (0 until 10).flatMap(c => cellFiles(c, 0 until 4)) // 40 files
    val v = seal(root, Set.empty, files)
    val raw = rawText(GraftVersions.manifestPath(root, v))
    assert(raw.startsWith("graft-manifest-v3 "), s"v3 root expected:\n$raw")
    assert(segRelsOf(root, v).nonEmpty)
    // the modulus scaled with the entry count (target 4 -> S > 1)
    assert(raw.split('\n').head.split(' ')(3).toInt > 1)
    assert(GraftVersions.readEntries(fs, root, v).map(_.rel).toSet ==
      files.toSet)

    val tiny = newRoot()
    val tv = seal(tiny, Set.empty, cellFiles(0, 0 until 8))
    assert(rawText(GraftVersions.manifestPath(tiny, tv))
      .startsWith("graft-manifest-v2 "), "below threshold stays flat")
  }

  test("an incremental seal reuses every untouched segment by reference") {
    val root = newRoot()
    val files = (0 until 10).flatMap(c => cellFiles(c, 0 until 4))
    val v1 = seal(root, Set.empty, files)
    val segs1 = segRelsOf(root, v1)
    // touch ONE cell: remove a file, add two
    val v2 = seal(root, Set(s"c0=3/part-3-0.parquet"), cellFiles(3, 10 until 12))
    val segs2 = segRelsOf(root, v2)
    assert((segs2 -- segs1).size <= 1, // the one touched cell's segment
      s"expected at most one new segment, got ${(segs2 -- segs1)}")
    assert((segs1 intersect segs2).nonEmpty, "untouched segments carried over")
    val expect = files.toSet - "c0=3/part-3-0.parquet" ++
      cellFiles(3, 10 until 12)
    assert(GraftVersions.readEntries(fs, root, v2).map(_.rel).toSet == expect)
    // the reused segment FILES were not rewritten: v1 still reads exactly
    assert(GraftVersions.readEntries(fs, root, v1).map(_.rel).toSet == files.toSet)
  }

  test("rollback and branch publish reuse the source root's segments wholesale") {
    val root = newRoot()
    // 24 files: inside S=4's [9, 32] band with room for the branch's +1
    // (a fixture at exactly 32 would cross the modulus-doubling bound and
    // legitimately rewrite everything)
    val files = (0 until 6).flatMap(c => cellFiles(c, 0 until 4))
    // rollback verifies restored rels exist on disk: give them real bytes
    // (after the baseline begin, so the v0 walk stays empty)
    val c1 = GraftVersions.beginCommit(fs, root)
    files.foreach { rel =>
      val out = fs.create(new Path(root, rel), true); out.write('x'); out.close()
    }
    val v1 = GraftVersions.sealCommit(fs, root, c1, Set.empty, files.map(entry))
    seal(root, Set(files.head), Seq.empty) // v2 drops one file
    val rb = GraftVersions.rollback(fs, root, v1)
    assert(segRelsOf(root, rb) == segRelsOf(root, v1),
      "rollback root = the target's segment refs, byte-new root only")
    assert(GraftVersions.readEntries(fs, root, rb).map(_.rel).toSet ==
      files.toSet)

    GraftVersions.createBranch(fs, root, "wap")
    val bc = GraftVersions.beginBranchCommit(fs, root, "wap")
    GraftVersions.sealCommit(fs, root, bc, Set.empty,
      Seq(entry("c0=0/part-0-99.parquet")))
    val pub = GraftVersions.fastForward(fs, root, "wap")
    assert(GraftVersions.readEntries(fs, root, pub).map(_.rel).toSet ==
      files.toSet + "c0=0/part-0-99.parquet")
    assert((segRelsOf(root, pub) intersect segRelsOf(root, rb)).nonEmpty,
      "published root reuses the fork's untouched segments")
  }

  test("expire deletes exactly the segments only dropped roots referenced") {
    val root = newRoot()
    val files = (0 until 10).flatMap(c => cellFiles(c, 0 until 4))
    val v1 = seal(root, Set.empty, files)
    val segs1 = segRelsOf(root, v1)
    val v2 = seal(root, Set("c0=5/part-5-0.parquet"), cellFiles(5, 20 until 21))
    val segs2 = segRelsOf(root, v2)
    val vdir = new Path(root, "_graft_versions")
    assert(GraftVersions.expire(fs, root, keep = 1) == 2L) // v0 baseline + v1
    (segs1 -- segs2).foreach { rel =>
      assert(!fs.exists(new Path(vdir, rel)), s"dropped-only segment $rel")
    }
    segs2.foreach { rel =>
      assert(fs.exists(new Path(vdir, rel)), s"live segment $rel survives")
    }
    assert(GraftVersions.readEntries(fs, root, v2).map(_.rel).size == 40)
  }

  test("the orphan sweep reports aged unreferenced segments, never referenced ones") {
    val root = newRoot()
    val v = seal(root, Set.empty, (0 until 8).flatMap(c => cellFiles(c, 0 until 4)))
    val vdir = new Path(root, "_graft_versions")
    val junk = new Path(vdir, "segs/seg-deadbeef.seg")
    val out = fs.create(junk, true); out.write("debris\n".getBytes); out.close()
    fs.setTimes(junk, 1000L, -1) // ancient
    val orphans = GraftVersions.orphanFiles(fs, root, olderThanMs = 60000L)
    assert(orphans.map(_.getName).contains("seg-deadbeef.seg"))
    segRelsOf(root, v).foreach { rel =>
      assert(!orphans.map(_.toString).exists(_.endsWith(rel)),
        s"referenced segment $rel must never be swept")
    }
  }

  test("an incremental seal's metadata write is a small fraction of the full listing") {
    val root = newRoot()
    // 1000 files across 100 cells — big enough that the fraction is meaningful
    val files = (0 until 100).flatMap(c => cellFiles(c, 0 until 10))
    val v1 = seal(root, Set.empty, files)
    val vdir = new Path(root, "_graft_versions")
    def segBytes(rels: Set[String]): Long =
      rels.toSeq.map(r => fs.getFileStatus(new Path(vdir, r)).getLen).sum
    val fullBytes = fs.getFileStatus(GraftVersions.manifestPath(root, v1)).getLen +
      segBytes(segRelsOf(root, v1))
    val v2 = seal(root, Set("c0=42/part-42-0.parquet"), cellFiles(42, 99 until 100))
    val newBytes = fs.getFileStatus(GraftVersions.manifestPath(root, v2)).getLen +
      segBytes(segRelsOf(root, v2) -- segRelsOf(root, v1))
    // one touched cell out of 100: the seal writes the root + ~1 segment,
    // not the thousand-entry listing
    assert(newBytes * 4 < fullBytes,
      s"incremental seal wrote $newBytes bytes vs $fullBytes for the full state")
  }

  test("the change-feed diff cancels shared segments without reading them") {
    val root = newRoot()
    val files = (0 until 10).flatMap(c => cellFiles(c, 0 until 4))
    val v1 = seal(root, Set.empty, files)
    val v2 = seal(root, Set("c0=3/part-3-0.parquet"), cellFiles(3, 10 until 12))
    def diffRels = GraftVersions
      .diffFiles(fs, root, v1, v2, Array.empty).map(_._3.rel).toSet
    assert(diffRels == cellFiles(3, 10 until 12).toSet)
    // the proof that shared segments are never LOADED: delete one shared
    // segment file — the diff still answers exactly (a full two-sided
    // read would now fail), while a full snapshot read fails loudly
    val shared = segRelsOf(root, v1) intersect segRelsOf(root, v2)
    assert(shared.nonEmpty)
    fs.delete(new Path(new Path(root, "_graft_versions"), shared.head), false)
    assert(diffRels == cellFiles(3, 10 until 12).toSet)
    intercept[IllegalStateException] { GraftVersions.readEntries(fs, root, v2) }
  }

  test("catalog SQL end-to-end over a segmented log: DML, time travel, rollback") {
    val warehouse = Files.createTempDirectory("graft-segwh").toString
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.segcat", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.segcat.warehouse", warehouse)
      .getOrCreate()
    try {
      spark.sql("CREATE TABLE segcat.t (id BIGINT, v BIGINT, c0 BIGINT)")
      // 24 cells -> 24 files: past the lowered threshold, the log is v3
      val values = (0 until 24).map(i => s"($i, ${i * 10}, $i)").mkString(", ")
      spark.sql(s"INSERT INTO segcat.t VALUES $values") // v1
      val root = new Path(s"$warehouse/t")
      assert(rawText(GraftVersions.manifestPath(root, 1L))
        .startsWith("graft-manifest-v3 "), "the catalog table's log is segmented")

      spark.sql("UPDATE segcat.t SET v = v + 1000 WHERE c0 = 7") // v2
      spark.sql("DELETE FROM segcat.t WHERE c0 = 3")             // v3
      def vsum(q: String): Long =
        spark.sql(q).collect().map(_.getLong(0)).head
      val base = (0 until 24).map(_ * 10L).sum
      assert(vsum("SELECT sum(v) FROM segcat.t VERSION AS OF 1") == base)
      assert(vsum("SELECT sum(v) FROM segcat.t VERSION AS OF 2") == base + 1000)
      assert(vsum("SELECT sum(v) FROM segcat.t") == base + 1000 - 30)
      // the v2 seal touched one cell: it reuses most of v1's segments
      val s1 = segRelsOf(root, 1L)
      val s2 = segRelsOf(root, 2L)
      assert((s1 intersect s2).nonEmpty && (s2 -- s1).size <= 2,
        s"catalog UPDATE reuses untouched segments: v1=$s1 v2=$s2")
      spark.sql("CALL segcat.system.rollback(table => 't', version => 1)")
      assert(vsum("SELECT sum(v) FROM segcat.t") == base)

      // the .manifests metadata table exposes the log's physiology:
      // every root segmented, incremental seals reusing segments
      val mrows = spark.sql(
        "SELECT version, format, entries, segments, reused_segments " +
          "FROM segcat.t.manifests ORDER BY version").collect()
      // v0 is the empty-world baseline (flat by size); everything after
      // crossed the threshold and is segmented
      assert(mrows.filter(_.getLong(0) >= 1L)
        .forall(_.getString(1) == "segmented"), mrows.mkString(","))
      assert(mrows.filter(_.getLong(0) >= 2L).forall(_.getLong(4) > 0L),
        "every incremental seal reused segments from its predecessor")

      // rewrite_manifests: fresh layout, zero reuse, identical content
      val rw = spark.sql("CALL segcat.system.rewrite_manifests(table => 't')")
        .collect().head.getLong(0)
      val last = spark.sql(
        s"SELECT entries, reused_segments FROM segcat.t.manifests " +
          s"WHERE version = $rw").collect().head
      assert(last.getLong(1) == 0L, "a rewritten layout reuses nothing")
      assert(vsum("SELECT sum(v) FROM segcat.t") == base,
        "rewrite_manifests moves no data")
    } finally spark.stop()
  }

  test("streaming epochs over a segmented log: each seal reuses untouched segments") {
    // the highest-frequency seal path is exactly what segmentation exists
    // for: a small epoch into a big world must write ~its own cells of
    // metadata, not the world's whole listing — pinned per epoch here
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val path = Files.createTempDirectory("graft-segstream").toString + "/w"
      val cp = Files.createTempDirectory("graft-segstream-cp").toString
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      val q = src.toDF().toDF("d0", "v")
        .withColumn("c0", org.apache.spark.sql.functions.col("d0"))
        .writeStream.format("graft")
        .option("checkpointLocation", cp)
        .start(path)
      try {
        src.addData((0L until 24L).map(i => (i, i * 10)): _*) // 24 cells
        q.processAllAvailable()
        src.addData((3L, 999L), (7L, 777L)) // an epoch touching 2 cells
        q.processAllAvailable()
        val root = new Path(path)
        val vs = GraftVersions.listVersions(fs, root)
        assert(vs.size >= 2, s"two epochs sealed: $vs")
        val (f1, _, s1, rels1) = GraftVersions.rootSummary(fs, root, vs(vs.size - 2))
        val (f2, n2, _, rels2) = GraftVersions.rootSummary(fs, root, vs.last)
        assert(f1 == "segmented" && f2 == "segmented", s"$f1/$f2")
        assert(n2 == 26L, s"24 + 2 appended rows-as-files: $n2")
        val reused = rels2.count(rels1.toSet.contains)
        assert(reused > 0 && (rels2.size - reused) <= 2,
          s"the 2-cell epoch rewrote <=2 segments of $s1 (reused $reused)")
      } finally q.stop()
    } finally spark.stop()
  }

  test("rewrite_manifests keeps a log inside the stay-segmented band segmented") {
    val root = newRoot()
    val files = (0 until 10).flatMap(c => cellFiles(c, 0 until 4))
    seal(root, Set.empty, files) // 40 entries -> v3
    // mass-delete down into the hysteresis band [target, 4*target)
    val v2 = seal(root, files.drop(10).toSet, Seq.empty) // 10 entries remain
    assert(rawText(GraftVersions.manifestPath(root, v2))
      .startsWith("graft-manifest-v3 "), "band keeps the log segmented")
    val rw = GraftVersions.rewriteManifests(fs, root)
    val raw = rawText(GraftVersions.manifestPath(root, rw))
    assert(raw.startsWith("graft-manifest-v3 "),
      s"a fresh layout inside the band must stay segmented:\n$raw")
    assert((segRelsOf(root, rw) intersect segRelsOf(root, v2)).isEmpty,
      "a rewritten layout shares no segment files with its predecessor")
    assert(GraftVersions.readEntries(fs, root, rw).map(_.rel).toSet ==
      files.take(10).toSet)
  }

  test("8 add-only sealers race on a segmented log: contiguous chain, nothing dropped") {
    val root = newRoot()
    seal(root, Set.empty, (0 until 10).flatMap(c => cellFiles(c, 0 until 4)))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        try {
          // each writer adds its own file to its own cell — CAS losses
          // replay via sealCommit's add-only re-begin
          seal(root, Set.empty, Seq(s"c0=$t/part-race-$t.parquet"))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing sealers failed: ${errs.peek()}")
    val versions = GraftVersions.listVersions(fs, root)
    assert(versions == (0L to 9L), s"contiguous chain expected: $versions")
    val live = GraftVersions.readEntries(fs, root,
      versions.last).map(_.rel).toSet
    (0 until 8).foreach { t =>
      assert(live.contains(s"c0=$t/part-race-$t.parquet"),
        s"writer $t's file must survive the race")
    }
    assert(live.size == 48, s"40 base + 8 raced files: ${live.size}")
  }

  test("a missing referenced segment fails loudly, naming the segment") {
    val root = newRoot()
    val v = seal(root, Set.empty, (0 until 8).flatMap(c => cellFiles(c, 0 until 4)))
    val vdir = new Path(root, "_graft_versions")
    val victim = segRelsOf(root, v).head
    fs.delete(new Path(vdir, victim), false)
    val e = intercept[IllegalStateException] {
      GraftVersions.readEntries(fs, root, v)
    }
    assert(e.getMessage.contains("segment") && e.getMessage.contains("missing"))
  }
}
