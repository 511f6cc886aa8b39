package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Session-scoped write-audit-publish: `SET graft.wap.branch = <name>`
  * routes EVERY DML statement — INSERT, INSERT OVERWRITE, UPDATE, MERGE,
  * DELETE — through the named branch of each table it touches, and reads
  * audit the staged state; `system.fast_forward` publishes atomically.
  * Tables without the branch serve reads from main (source tables need no
  * fork) but refuse writes loudly. The r10 branch machinery carried
  * appends only; this is the full-DML face (sources/GraftRowLevel.scala,
  * GraftWrite.scala branch arms).
  */
class GraftWapSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-wap").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.wap", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.wap.warehouse", warehouse)
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(sql: String): Set[(Long, Long)] =
    spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("full-DML WAP cycle: stage invisibly, audit, publish, main flips atomically") {
    spark.sql("CREATE TABLE wap.t (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO wap.t VALUES (1, 10, 0), (2, 20, 1), (3, 30, 1)") // main v1
    spark.sql("CALL wap.system.branch(table => 't', name => 'audit')")

    spark.conf.set("graft.wap.branch", "audit")
    try {
      spark.sql("INSERT INTO wap.t VALUES (4, 40, 0)")          // branch append
      spark.sql("UPDATE wap.t SET v = 21 WHERE id = 2")          // branch COW
      spark.sql("""MERGE INTO wap.t USING (SELECT 1L id) s ON t.id = s.id
                   WHEN MATCHED THEN DELETE""")                  // branch merge-delete
      // the session reads the STAGED state
      assert(rows("SELECT id, v FROM wap.t") ==
        Set((2L, 21L), (3L, 30L), (4L, 40L)))
    } finally spark.conf.unset("graft.wap.branch")

    // outside the WAP session main is untouched
    assert(rows("SELECT id, v FROM wap.t") ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)))

    spark.sql("CALL wap.system.fast_forward(table => 't', branch => 'audit')")
    assert(rows("SELECT id, v FROM wap.t") ==
      Set((2L, 21L), (3L, 30L), (4L, 40L)),
      "publish flips main to the staged state")
    // pre-publish main state stays addressable
    assert(rows("SELECT id, v FROM wap.t VERSION AS OF 1") ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("bucket DELETE and INSERT OVERWRITE stage on the branch too") {
    spark.sql("CREATE TABLE wap.o (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO wap.o VALUES (1, 10, 0), (2, 20, 1)")
    spark.sql("CALL wap.system.branch(table => 'o', name => 'b2')")
    spark.conf.set("graft.wap.branch", "b2")
    try {
      spark.sql("DELETE FROM wap.o WHERE c0 = 1")                       // metadata delete
      spark.sql("INSERT OVERWRITE wap.o VALUES (9, 90, 0)")             // dynamic overwrite
      assert(rows("SELECT id, v FROM wap.o") == Set((9L, 90L)))
    } finally spark.conf.unset("graft.wap.branch")
    assert(rows("SELECT id, v FROM wap.o") == Set((1L, 10L), (2L, 20L)),
      "main untouched by staged delete/overwrite")
    spark.sql("CALL wap.system.fast_forward(table => 'o', branch => 'b2')")
    assert(rows("SELECT id, v FROM wap.o") == Set((9L, 90L)))
  }

  test("missing branch: reads fall back to main, writes refuse loudly") {
    spark.sql("CREATE TABLE wap.m (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO wap.m VALUES (1, 10, 0)")
    spark.conf.set("graft.wap.branch", "nope")
    try {
      assert(rows("SELECT id, v FROM wap.m") == Set((1L, 10L)),
        "an unforked SOURCE table keeps serving main")
      val e = intercept[Exception] {
        spark.sql("INSERT INTO wap.m VALUES (2, 20, 0)")
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
      assert(msgs(e).contains("system.branch"),
        s"refusal must name the remedy, got: ${msgs(e)}")
      // and nothing leaked
      assert(rows("SELECT id, v FROM wap.m") == Set((1L, 10L)))
    } finally spark.conf.unset("graft.wap.branch")
  }

  test("abandoned staging: drop_branch leaves main exactly as it was") {
    spark.sql("CREATE TABLE wap.a (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO wap.a VALUES (1, 10, 0)")
    spark.sql("CALL wap.system.branch(table => 'a', name => 'oops')")
    spark.conf.set("graft.wap.branch", "oops")
    try {
      spark.sql("UPDATE wap.a SET v = 0 WHERE id = 1")
      spark.sql("INSERT INTO wap.a VALUES (2, 2, 0)")
    } finally spark.conf.unset("graft.wap.branch")
    spark.sql("CALL wap.system.drop_branch(table => 'a', name => 'oops')")
    assert(rows("SELECT id, v FROM wap.a") == Set((1L, 10L)))
    // next statements (no WAP) commit to main normally
    spark.sql("INSERT INTO wap.a VALUES (3, 3, 0)")
    assert(rows("SELECT id, v FROM wap.a") == Set((1L, 10L), (3L, 3L)))
  }

  test("cross-table publish: both tables go live in one all-or-nothing cycle") {
    spark.sql("CREATE TABLE wap.p1 (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("CREATE TABLE wap.p2 (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO wap.p1 VALUES (1, 10, 0)")
    spark.sql("INSERT INTO wap.p2 VALUES (1, 100, 0)")
    spark.sql("CALL wap.system.branch(table => 'p1', name => 'rel')")
    spark.sql("CALL wap.system.branch(table => 'p2', name => 'rel')")
    spark.conf.set("graft.wap.branch", "rel")
    try {
      spark.sql("INSERT INTO wap.p1 VALUES (2, 20, 0)")
      spark.sql("UPDATE wap.p2 SET v = 101 WHERE id = 1")
    } finally spark.conf.unset("graft.wap.branch")
    // mains untouched while staged
    assert(rows("SELECT id, v FROM wap.p1") == Set((1L, 10L)))
    assert(rows("SELECT id, v FROM wap.p2") == Set((1L, 100L)))
    // default table list = every table with the branch
    val out = spark.sql("CALL wap.system.publish(branch => 'rel')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("p1", 2L), ("p2", 2L)), s"published: $out")
    assert(rows("SELECT id, v FROM wap.p1") == Set((1L, 10L), (2L, 20L)))
    assert(rows("SELECT id, v FROM wap.p2") == Set((1L, 101L)))
    // branches dropped by the publish
    assert(spark.sql("CALL wap.system.branches(table => 'p1')").collect().isEmpty)
  }

  test("cross-table publish aborts whole on a mid-cycle failure, zero mains changed") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.sql("CREATE TABLE wap.f1 (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("CREATE TABLE wap.f2 (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO wap.f1 VALUES (1, 10, 0)")
    spark.sql("INSERT INTO wap.f2 VALUES (1, 100, 0)")
    spark.sql("CALL wap.system.branch(table => 'f1', name => 'rel')")
    spark.sql("CALL wap.system.branch(table => 'f2', name => 'rel')")
    spark.conf.set("graft.wap.branch", "rel")
    try {
      spark.sql("INSERT INTO wap.f1 VALUES (2, 20, 0)")
      spark.sql("INSERT INTO wap.f2 VALUES (2, 200, 0)")
    } finally spark.conf.unset("graft.wap.branch")

    def tbl(t: String): (FileSystem, Path) = {
      val p = s"$warehouse/$t"
      (FileSystem.get(new java.net.URI(p), new Configuration()), new Path(p))
    }
    val tables = Seq(tbl("f1"), tbl("f2"))

    // injected failure between the first and second CLAIM: the publish must
    // abort whole, release the first table's claim, and change NO main
    intercept[RuntimeException] {
      GraftVersions.fastForwardAll(tables, "rel", failpoint = (phase, i) =>
        if (phase == "claim" && i == 1)
          throw new RuntimeException("injected mid-publish failure"))
    }
    assert(rows("SELECT id, v FROM wap.f1") == Set((1L, 10L)),
      "f1's main is untouched after the aborted publish")
    assert(rows("SELECT id, v FROM wap.f2") == Set((1L, 100L)))

    // a STALE FORK on the second table aborts before any claim is promoted
    spark.sql("INSERT INTO wap.f2 VALUES (9, 900, 0)") // main f2 advances
    val e = intercept[java.util.ConcurrentModificationException] {
      GraftVersions.fastForwardAll(tables, "rel")
    }
    assert(e.getMessage.contains("no table was changed"), e.getMessage)
    assert(rows("SELECT id, v FROM wap.f1") == Set((1L, 10L)),
      "f1 stayed unpublished even though ITS branch was valid")

    // the released claims don't wedge later publishes: f1 alone still works
    val v = GraftVersions.fastForwardAll(Seq(tbl("f1")), "rel")
    assert(v == Seq(2L))
    assert(rows("SELECT id, v FROM wap.f1") == Set((1L, 10L), (2L, 20L)))
  }

  test("a crash between promotes resumes: the next publish completes the cycle") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{FileSystem, Path}
    spark.sql("CREATE TABLE wap.r1 (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("CREATE TABLE wap.r2 (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO wap.r1 VALUES (1, 10, 0)")
    spark.sql("INSERT INTO wap.r2 VALUES (1, 100, 0)")
    spark.sql("CALL wap.system.branch(table => 'r1', name => 'rel')")
    spark.sql("CALL wap.system.branch(table => 'r2', name => 'rel')")
    spark.conf.set("graft.wap.branch", "rel")
    try {
      spark.sql("INSERT INTO wap.r1 VALUES (2, 20, 0)")
      spark.sql("INSERT INTO wap.r2 VALUES (2, 200, 0)")
    } finally spark.conf.unset("graft.wap.branch")
    def tbl(t: String): (FileSystem, Path) = {
      val p = s"$warehouse/$t"
      (FileSystem.get(new java.net.URI(p), new Configuration()), new Path(p))
    }
    val tables = Seq(tbl("r1"), tbl("r2"))
    // simulated CRASH between the two promotes: r1 published, r2 not —
    // the intents make this state recoverable, not stuck
    intercept[RuntimeException] {
      GraftVersions.fastForwardAll(tables, "rel", failpoint = (phase, i) =>
        if (phase == "promote" && i == 1)
          throw new RuntimeException("injected crash mid-promote"))
    }
    assert(rows("SELECT id, v FROM wap.r1") == Set((1L, 10L), (2L, 20L)),
      "r1's promote landed before the crash")
    assert(rows("SELECT id, v FROM wap.r2") == Set((1L, 100L)),
      "r2 is still unpublished")
    assert(GraftVersions.readPublishIntent(tbl("r2")._1, tbl("r2")._2, "rel")
      .contains(2L), "the intent survives the crash")
    // re-running the publish RESUMES: r2 promotes, both cycles clean up
    val v = GraftVersions.fastForwardAll(tables, "rel")
    assert(v == Seq(2L, 2L))
    assert(rows("SELECT id, v FROM wap.r2") == Set((1L, 100L), (2L, 200L)))
    Seq("r1", "r2").foreach { t =>
      val (fs, root) = tbl(t)
      assert(GraftVersions.readPublishIntent(fs, root, "rel").isEmpty,
        s"$t's intent cleaned up")
      assert(GraftVersions.listBranches(fs, root).isEmpty,
        s"$t's branch dropped")
    }
  }
}
