package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The SQL front door: worlds as catalog tables. CREATE/INSERT/INSERT
  * OVERWRITE (truncate and dynamic per-chunk)/SELECT/DROP run through
  * `GraftCatalog` with the same connector planning the path API gets —
  * including directory pruning and the staged overwrite commit.
  */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graftcat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.graftcat.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("CREATE / INSERT INTO / pruned SELECT / DROP through pure SQL") {
    spark.sql("CREATE TABLE graftcat.t (d0 BIGINT, d1 BIGINT, c0 BIGINT)")
    assert(new java.io.File(s"$warehouse/t/_graft_schema.json").isFile,
      "create materializes the sidecar — the table IS a world directory")
    // routing is explicit: the INSERT provides the bucket column
    spark.sql("""INSERT INTO graftcat.t
                 SELECT id, id * 2, id DIV 10 FROM range(0, 40)""")
    assert(new java.io.File(s"$warehouse/t/c0=3").isDirectory,
      "rows landed in their chunk directories")
    val pruned = spark.sql("SELECT d0 FROM graftcat.t WHERE c0 = 2")
    assert(pruned.collect().map(_.getLong(0)).toSet == (20L until 30L).toSet)
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("GraftScan") && p.contains("EqualTo(c0,2)"),
      s"catalog reads must go through the connector's pruned scan:\n$p")
    // second catalog session path: listTables sees it
    assert(spark.sql("SHOW TABLES IN graftcat").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql("DROP TABLE graftcat.t")
    assert(!new java.io.File(s"$warehouse/t").exists, "drop removes the world")
  }

  test("INSERT OVERWRITE: truncate by default, per-chunk replacement under dynamic mode") {
    spark.sql("CREATE TABLE graftcat.o (d0 BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.o SELECT id, id DIV 10 FROM range(0, 40)")
    // static mode: the whole table is replaced
    spark.sql("INSERT OVERWRITE graftcat.o VALUES (90, 9), (95, 9)")
    assert(spark.sql("SELECT d0 FROM graftcat.o").collect()
      .map(_.getLong(0)).toSet == Set(90L, 95L))
    // refill, then dynamic mode: only the chunk cells receiving rows change
    spark.sql("INSERT OVERWRITE graftcat.o SELECT id, id DIV 10 FROM range(0, 40)")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("INSERT OVERWRITE graftcat.o VALUES (7, 0)")
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    assert(spark.sql("SELECT d0 FROM graftcat.o").collect()
      .map(_.getLong(0)).toSet == Set(7L) ++ (10L until 40L),
      "dynamic overwrite replaced only cell c0=0")
    spark.sql("DROP TABLE graftcat.o")
  }

  test("a World built by the programmatic API is queryable as a catalog table") {
    import spark.implicits._
    import graft.core._
    val w = new graft.world.World(spark, s"$warehouse/events_w", Seq(
      graft.world.DimSpec("d0", DimMapping(0, 99, 10))))
    w.create(Seq((5L, 50L), (15L, 150L)).toDF("d0", "v"))
    val got = spark.sql("SELECT d0, v FROM graftcat.events_w ORDER BY d0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((5L, 50L), (15L, 150L)))
    // and the reverse: a catalog table reads through the World/parquet path
    assert(w.df.count() == 2)
    // two catalog tables sharing a grid keep the storage-partitioned join
    // property through SQL (conf-gated, proven in WorldSpec; here: results)
    val j = spark.sql(
      """SELECT a.d0, a.v, b.v AS v2 FROM graftcat.events_w a
         JOIN graftcat.events_w b ON a.c0 = b.c0 AND a.d0 = b.d0""")
    assert(j.collect().length == 2)
    spark.sql("DROP TABLE graftcat.events_w")
  }

  test("DELETE FROM by bucket is chunk-dir removal; TRUNCATE TABLE empties; row-level DELETE refused") {
    spark.sql("CREATE TABLE graftcat.del (d0 BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.del SELECT id, id DIV 10 FROM range(0, 40)")
    spark.sql("DELETE FROM graftcat.del WHERE c0 = 2")
    // manifest-only liveness: the delete is pure metadata at EVERY layer —
    // the cell's files drop out of the sealed manifest but stay on disk for
    // snapshot reads until retention reclaims them
    assert(spark.sql("SELECT count(*) FROM graftcat.del WHERE c0 = 2")
      .head.getLong(0) == 0L, "deleted bucket reads empty")
    assert(new java.io.File(s"$warehouse/del/c0=2").exists,
      "the dropped cell's bytes stay in place (zero file moves/deletes)")
    assert(spark.sql("SELECT d0 FROM graftcat.del").collect()
      .map(_.getLong(0)).toSet == ((0L until 20L) ++ (30L until 40L)).toSet)
    // a row-level condition can't be whole-chunk removal; it routes to the
    // group-based copy-on-write rewrite instead (SupportsRowLevelOperations):
    // candidate chunks are rewritten with survivors only
    spark.sql("DELETE FROM graftcat.del WHERE d0 = 5")
    assert(spark.sql("SELECT d0 FROM graftcat.del").collect()
      .map(_.getLong(0)).toSet ==
      ((0L until 20L).toSet - 5L) ++ (30L until 40L).toSet,
      "row-level delete keeps exactly the survivors")
    spark.sql("TRUNCATE TABLE graftcat.del")
    assert(spark.sql("SELECT count(*) FROM graftcat.del").head.getLong(0) == 0L)
    assert(new java.io.File(s"$warehouse/del/_graft_schema.json").isFile,
      "truncate keeps the table (sidecar) — only chunks are gone")
    spark.sql("DROP TABLE graftcat.del")
  }

  test("UPDATE: merge-on-read touches only matched rows; bucket-column updates relocate rows") {
    spark.sql("CREATE TABLE graftcat.upd (d0 BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.upd SELECT id, id DIV 10 FROM range(0, 40)")
    def filesIn(cell: String): Set[String] = {
      val d = new java.io.File(s"$warehouse/upd/$cell")
      if (!d.isDirectory) Set.empty
      else d.listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val untouched = filesIn("c0=3")
    // bucket-pruned condition + data-column predicate: only c0=1 is touched
    // (5 of its 10 rows cross the dv cutover, so the survivors rewrite
    // clean and the new images append — all within the one cell)
    spark.sql("UPDATE graftcat.upd SET d0 = d0 + 100 WHERE c0 = 1 AND d0 >= 15")
    assert(spark.sql("SELECT d0 FROM graftcat.upd").collect()
      .map(_.getLong(0)).toSet ==
      ((0L until 15L) ++ (115L until 120L) ++ (20L until 40L)).toSet)
    assert(filesIn("c0=3") == untouched,
      "chunks outside the pruned candidates must not be rewritten")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"$warehouse/upd"), new org.apache.hadoop.conf.Configuration())
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/upd")
    val live = GraftVersions.readEntries(fs, root,
      GraftVersions.latestVersion(fs, root).get)
    assert(live.filterNot(_.rel.contains("c0=1")).forall(_.dv.isEmpty),
      s"untouched cells keep their manifest lines verbatim: $live")
    // a predicate matching NOTHING must leave every cell untouched — the
    // guard against the double-planning stale-superset hazard (a dir
    // recorded by a pre-runtime-filter plan but never re-read would be
    // deleted without replacement)
    val before = spark.sql("SELECT d0 FROM graftcat.upd").collect()
      .map(_.getLong(0)).toSet
    spark.sql("UPDATE graftcat.upd SET d0 = 0 WHERE d0 = -12345")
    assert(spark.sql("SELECT d0 FROM graftcat.upd").collect()
      .map(_.getLong(0)).toSet == before,
      "empty-match update must be a no-op")
    // updating the BUCKET column relocates the row to its new cell
    spark.sql("UPDATE graftcat.upd SET c0 = 9 WHERE d0 = 20")
    assert(spark.sql("SELECT d0 FROM graftcat.upd WHERE c0 = 9").collect()
      .map(_.getLong(0)).toSet == Set(20L))
    assert(spark.sql("SELECT d0 FROM graftcat.upd WHERE c0 = 2").collect()
      .map(_.getLong(0)).toSet == (21L until 30L).toSet,
      "the moved row must leave its old cell")
    spark.sql("DROP TABLE graftcat.upd")
  }

  test("_cell metadata column: rows report their chunk cell when asked") {
    spark.sql("CREATE TABLE graftcat.mc (d0 BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.mc VALUES (1, 0), (11, 1)")
    val got = spark.sql("SELECT d0, _cell FROM graftcat.mc ORDER BY d0").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "c0=0"), (11L, "c0=1")))
    // hidden unless selected: SELECT * stays at the declared schema
    assert(spark.sql("SELECT * FROM graftcat.mc").schema.fieldNames.toSeq ==
      Seq("d0", "c0"))
    spark.sql("DROP TABLE graftcat.mc")
  }

  test("MERGE INTO: matched rows update in place, unmatched source rows insert routed") {
    spark.sql("CREATE TABLE graftcat.mrg (d0 BIGINT, c0 BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftcat.mrg SELECT id, id DIV 10, 0 FROM range(0, 20)")
    spark.sql("SELECT * FROM VALUES (5L, 0L, 50L), (15L, 1L, 150L), (25L, 2L, 250L) AS s(d0, c0, v)")
      .createOrReplaceTempView("m_src")
    spark.sql("""MERGE INTO graftcat.mrg t USING m_src s ON t.d0 = s.d0
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT (d0, c0, v) VALUES (s.d0, s.c0, s.v)""")
    val got = spark.sql("SELECT d0, v FROM graftcat.mrg").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 21 && got(5L) == 50L && got(15L) == 150L && got(25L) == 250L)
    assert(got.view.filterKeys(k => k != 5L && k != 15L && k != 25L).values.forall(_ == 0L))
    assert(new java.io.File(s"$warehouse/mrg/c0=2").isDirectory,
      "the not-matched insert landed routed in its chunk cell")
    spark.sql("DROP TABLE graftcat.mrg")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: conditional update and delete branches") {
    spark.sql("CREATE TABLE graftcat.mrg2 (d0 BIGINT, c0 BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftcat.mrg2 SELECT id, id DIV 10, id FROM range(0, 30)")
    // source covers ids 0..9 only: 10..29 are "not matched by source"
    spark.sql("SELECT id AS d0, id * 100 AS v FROM range(0, 10)")
      .createOrReplaceTempView("m2_src")
    spark.sql("""MERGE INTO graftcat.mrg2 t USING m2_src s ON t.d0 = s.d0
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED BY SOURCE AND t.c0 = 1 THEN UPDATE SET v = -1
                 WHEN NOT MATCHED BY SOURCE AND t.c0 = 2 AND t.d0 % 2 = 0
                   THEN DELETE""")
    val got = spark.sql("SELECT d0, v FROM graftcat.mrg2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L until 10L).forall(i => got(i) == i * 100), "matched branch")
    assert((10L until 20L).forall(i => got(i) == -1L),
      "source-miss UPDATE branch hit exactly cell c0=1")
    assert((20L until 30L).filter(_ % 2 == 0).forall(!got.contains(_)),
      "source-miss DELETE branch removed the matching c0=2 rows")
    assert((20L until 30L).filter(_ % 2 == 1).forall(i => got(i) == i),
      "non-matching c0=2 rows survive untouched")
    assert(got.size == 25)
    spark.sql("DROP TABLE graftcat.mrg2")
  }

  test("CREATE TABLE AS SELECT materializes a routed world in one statement") {
    spark.sql("""CREATE TABLE graftcat.ctas AS
                 SELECT id AS d0, id * 3 AS v, id DIV 10 AS c0 FROM range(0, 30)""")
    assert(new java.io.File(s"$warehouse/ctas/c0=2").isDirectory,
      "CTAS rows landed in chunk directories")
    assert(spark.sql("SELECT sum(v) FROM graftcat.ctas").head.getLong(0) ==
      (0L until 30L).map(_ * 3).sum)
    spark.sql("DROP TABLE graftcat.ctas")
  }

  test("CALL system.stats / system.compact: fragmented cells reported, then rewritten to one file") {
    spark.sql("CREATE TABLE graftcat.m (d0 BIGINT, c0 BIGINT)")
    // three separate appends into cell c0=0 -> three data files
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO graftcat.m VALUES ($i, 0)"))
    spark.sql("INSERT INTO graftcat.m VALUES (10, 1)") // second cell, 1 file
    val st = spark.sql("CALL graftcat.system.stats(table => 'm')")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(st == Map("c0=0" -> 3, "c0=1" -> 1), s"stats sees the grid, got $st")
    val n = spark.sql("CALL graftcat.system.compact(table => 'm')")
      .head.getLong(0)
    assert(n == 1L, "exactly the fragmented cell is rewritten")
    val st2 = spark.sql("CALL graftcat.system.stats(table => 'm')")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(st2 == Map("c0=0" -> 1, "c0=1" -> 1), s"one file per cell after, got $st2")
    assert(spark.sql("SELECT d0 FROM graftcat.m").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 10L), "data intact")
    assert(spark.sql("CALL graftcat.system.compact(table => 'm')")
      .head.getLong(0) == 0L, "idempotent: nothing left to compact")
    spark.sql("DROP TABLE graftcat.m")
  }

  test("ALTER TABLE ADD COLUMN: old chunks read the new column as NULL; other alters refused") {
    spark.sql("CREATE TABLE graftcat.ev (d0 BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.ev VALUES (1, 0)")
    spark.sql("ALTER TABLE graftcat.ev ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO graftcat.ev VALUES (2, 0, 0.5)")
    val got = spark.sql("SELECT d0, score FROM graftcat.ev ORDER BY d0")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got == Seq((1L, None), (2L, Some(0.5))),
      s"pre-alter chunk surfaces NULL, post-alter carries the value: $got")
    // refusal: adding a bucket column
    intercept[Exception](spark.sql("ALTER TABLE graftcat.ev ADD COLUMN c1 BIGINT"))
    spark.sql("DROP TABLE graftcat.ev")
  }

  test("RENAME COLUMN + integral widening: old files serve the new name/width") {
    spark.sql("CREATE TABLE graftcat.rn (d0 BIGINT, val INT, c0 BIGINT)")
    spark.sql("""INSERT INTO graftcat.rn
                 SELECT id, CAST(id * 7 AS INT), id DIV 10 FROM range(0, 20)""")
    // rename + widen: both pure metadata — zero file rewrites
    spark.sql("ALTER TABLE graftcat.rn RENAME COLUMN val TO score")
    spark.sql("ALTER TABLE graftcat.rn ALTER COLUMN score TYPE BIGINT")
    spark.sql("INSERT INTO graftcat.rn SELECT id, id * 7, id DIV 10 FROM range(20, 30)")
    // readback unions pre-rename INT32 'val' files with post-rename INT64
    // 'score' files under one name and width
    val got = spark.sql("SELECT d0, score FROM graftcat.rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until 30L).map(i => (i, i * 7)).toSet, s"got: $got")
    // aggregate pushdown resolves the alias in old files' footers
    val agg = spark.sql(
      "SELECT sum(score) AS s, max(score) AS m, count(score) AS n FROM graftcat.rn")
    val r0 = agg.collect().head
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) ==
      ((0 until 30).map(_ * 7L).sum, 203L, 30L))
    // row-exact filter across both generations (parquet predicate dropped
    // for the old-name/narrow files, Spark recheck keeps exactness)
    assert(spark.sql("SELECT count(*) FROM graftcat.rn WHERE score = 77")
      .collect().head.getLong(0) == 1L)
    // a snapshot pinned BEFORE the rename still reads through the new name
    val v1 = spark.sql("SELECT d0, score FROM graftcat.rn VERSION AS OF 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v1 == (0L until 20L).map(i => (i, i * 7)).toSet,
      "pre-rename snapshot serves old bytes under the new name")
    // guards: resurrection via re-ADD of the old name; bucket renames;
    // narrowing and non-integral retypes
    intercept[Exception](spark.sql("ALTER TABLE graftcat.rn ADD COLUMN val INT"))
    intercept[Exception](
      spark.sql("ALTER TABLE graftcat.rn RENAME COLUMN c0 TO c9"))
    intercept[Exception](
      spark.sql("ALTER TABLE graftcat.rn ALTER COLUMN score TYPE INT"))
    intercept[Exception](
      spark.sql("ALTER TABLE graftcat.rn ALTER COLUMN score TYPE STRING"))
    // a column referenced by a CHECK refuses rename until the check drops
    spark.sql("""CALL graftcat.system.set_check(table => 'rn',
      name => 'pos', expr => 'score >= 0')""")
    intercept[Exception](
      spark.sql("ALTER TABLE graftcat.rn RENAME COLUMN score TO points"))
    spark.sql("DROP TABLE graftcat.rn")
  }

  test("ALTER TABLE DROP COLUMN: lazy drop, no resurrection, guards") {
    spark.sql("CREATE TABLE graftcat.evd (d0 BIGINT, x BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.evd VALUES (1, 100, 0), (2, 200, 0)")
    spark.sql("ALTER TABLE graftcat.evd DROP COLUMN x")
    // the column is gone from the schema; old files' bytes are never read
    assert(!spark.table("graftcat.evd").schema.fieldNames.contains("x"))
    assert(spark.sql("SELECT d0 FROM graftcat.evd ORDER BY d0")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    intercept[Exception](
      spark.sql("SELECT x FROM graftcat.evd").collect())
    // post-drop inserts take the narrowed schema
    spark.sql("INSERT INTO graftcat.evd VALUES (3, 0)")
    assert(spark.sql("SELECT d0 FROM graftcat.evd").count() == 3L)
    // resurrection guard: re-ADDING the dropped name is refused forever
    val ex = intercept[Exception](
      spark.sql("ALTER TABLE graftcat.evd ADD COLUMN x BIGINT"))
    assert(ex.getMessage.contains("DROPPED"), ex.getMessage)
    // a fresh name is fine
    spark.sql("ALTER TABLE graftcat.evd ADD COLUMN y BIGINT")
    // guards: bucket column and last-data-column drops refuse
    intercept[Exception](spark.sql("ALTER TABLE graftcat.evd DROP COLUMN c0"))
    spark.sql("ALTER TABLE graftcat.evd DROP COLUMN y")
    intercept[Exception](spark.sql("ALTER TABLE graftcat.evd DROP COLUMN d0"))
    spark.sql("DROP TABLE graftcat.evd")
  }

  test("metadata tables: history/files/cells/tags read as SQL, live-set exact") {
    spark.sql("CREATE TABLE graftcat.meta (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.meta VALUES (1, 10, 0), (11, 110, 1)") // v1
    spark.sql("UPDATE graftcat.meta SET v = -1 WHERE id = 1")              // v2
    spark.sql("CALL graftcat.system.tag(table => 'meta', name => 'rel', version => 1)")
    val hist = spark.sql(
      "SELECT version, files, bytes FROM graftcat.meta.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 0L), (1L, 2L), (2L, 2L)), s"history: ${hist.toSeq}")
    assert(hist.drop(1).forall(_._3 > 0L),
      "manifest-carried bytes populate non-empty versions")
    // files lists the LIVE set only: the v1 copy of cell c0=0 was retired
    // in place by the UPDATE and must not appear
    val files = spark.sql("SELECT cell, file, bytes FROM graftcat.meta.files")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(files.length == 2 && files.map(_._1).toSet == Set("c0=0", "c0=1"),
      s"live files only, one per cell: ${files.toSeq}")
    assert(files.forall(_._3 > 0L))
    val cells = spark.sql("SELECT cell, files FROM graftcat.meta.cells")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cells == Set(("c0=0", 1L), ("c0=1", 1L)))
    assert(spark.sql("SELECT name, version FROM graftcat.meta.tags")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("rel", 1L)))
    // filters and joins compose — the point of the TABLE face
    assert(spark.sql(
      """SELECT h.version FROM graftcat.meta.history h
         JOIN graftcat.meta.tags g ON h.version = g.version""")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // an unknown meta name is a loud missing-table error
    val e = intercept[Exception](spark.sql("SELECT * FROM graftcat.meta.nope"))
    assert(e.getMessage.toLowerCase.contains("table"))
    spark.sql("DROP TABLE graftcat.meta")
  }

  test("CALL system.set_bloom registers the sidecar from SQL") {
    spark.sql("CREATE TABLE graftcat.evb (d0 BIGINT, doc BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.evb SELECT id, id + 100, id DIV 8 FROM range(16)")
    val got = spark.sql(
      "CALL graftcat.system.set_bloom(table => 'evb', columns => 'doc')")
      .collect().head.getString(0)
    assert(got == "doc")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(warehouse), spark.sparkContext.hadoopConfiguration)
    assert(GraftBloom.columns(fs,
      new org.apache.hadoop.fs.Path(s"$warehouse/evb")) == Seq("doc"))
    // the NEXT write blooms the column
    spark.sql("INSERT INTO graftcat.evb SELECT id + 16, id + 200, (id + 16) DIV 8 FROM range(8)")
    spark.sql("DROP TABLE graftcat.evb")
  }

  test("MERGE on a bloom-registered table narrows to matching cells, never losing rows") {
    // Two r10 defects pinned at once. (1) The rewrite scan's file recorder
    // captured planned files BEFORE the bloom skip dropped refuted ones —
    // retiring files whose rows were never re-emitted would be silent
    // deletion; the recorder must hold only actual survivors. (2) With
    // blooms registered, filterAttributes advertised bucket + bloom columns
    // together, making the row-level runtime filter an untranslatable
    // multi-column named_struct IN — NOTHING was delivered and the MERGE
    // rewrote every cell. Row-level scans now advertise a single attribute,
    // so the matched cells' bucket values arrive and prune the rewrite.
    spark.sql("CREATE TABLE graftcat.mbl (d0 BIGINT, doc BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("CALL graftcat.system.set_bloom(table => 'mbl', columns => 'doc')")
    // 40 rows over 4 cells; doc values disjoint per cell
    spark.sql(
      "INSERT INTO graftcat.mbl SELECT id, id + 10000, 0, id DIV 10 FROM range(0, 40)")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(warehouse), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/mbl")
    val before = GraftVersions.liveRels(fs, root).get.toSet
    // source hits docs living in cell c0=0 only: the runtime group filter
    // delivers the three keys, and every other cell's file is bloom-refuted
    // out of the rewrite scan — its rows are never re-emitted
    spark.sql("SELECT id + 10003 AS doc, 7 AS nv FROM range(0, 3)")
      .createOrReplaceTempView("mbl_src")
    spark.sql("""MERGE INTO graftcat.mbl t USING mbl_src s ON t.doc = s.doc
                 WHEN MATCHED THEN UPDATE SET v = s.nv""")
    val got = spark.sql("SELECT d0, v FROM graftcat.mbl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 40, s"zero lost rows through the bloom-skipped MERGE; got ${got.size}")
    assert((3L until 6L).forall(i => got(i) == 7L) && got.values.count(_ == 7L) == 3)
    // the untouched cells' files were neither rewritten nor retired: their
    // exact rels stay live (this proves the runtime group filter engaged —
    // an unpruned plan rewrites all four cells and replaces every rel)
    val after = GraftVersions.liveRels(fs, root).get.toSet
    assert(before.filterNot(_.startsWith("c0=0/")).subsetOf(after),
      s"non-matching cells must stay live and untouched:\nbefore=$before\nafter=$after")
    spark.sql("DROP TABLE graftcat.mbl")
  }

  test("column DEFAULT values: existence fill, insert fill, SET/DROP DEFAULT") {
    spark.sql("CREATE TABLE graftcat.dflt (id BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.dflt VALUES (1, 0), (2, 1)") // pre-change files
    spark.sql("ALTER TABLE graftcat.dflt ADD COLUMN tag STRING DEFAULT 'legacy'")

    def tags: Map[Long, String] = spark.sql("SELECT id, tag FROM graftcat.dflt")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // rows written BEFORE the column existed read the EXISTENCE default
    assert(tags == Map(1L -> "legacy", 2L -> "legacy"))
    // an INSERT omitting the column fills the CURRENT default
    spark.sql("INSERT INTO graftcat.dflt (id, c0) VALUES (3, 2)")
    spark.sql("INSERT INTO graftcat.dflt VALUES (4, 3, 'explicit')")
    assert(tags == Map(1L -> "legacy", 2L -> "legacy", 3L -> "legacy",
      4L -> "explicit"))
    // COUNT over the defaulted column counts EVERY row (the footer-derived
    // pushdown would see pre-change files as all-null; it must decline)
    assert(spark.sql("SELECT count(tag) FROM graftcat.dflt").collect()
      .head.getLong(0) == 4L)

    // SET DEFAULT changes FUTURE inserts only; pre-column rows keep reading
    // the ADD-time existence default
    spark.sql("ALTER TABLE graftcat.dflt ALTER COLUMN tag SET DEFAULT 'fresh'")
    spark.sql("INSERT INTO graftcat.dflt (id, c0) VALUES (5, 4)")
    assert(tags(5L) == "fresh" && tags(1L) == "legacy")
    // DROP DEFAULT: omitted column goes back to NULL for new rows
    spark.sql("ALTER TABLE graftcat.dflt ALTER COLUMN tag DROP DEFAULT")
    spark.sql("INSERT INTO graftcat.dflt (id, c0) VALUES (6, 5)")
    assert(spark.sql("SELECT tag FROM graftcat.dflt WHERE id = 6")
      .collect().head.isNullAt(0))
    assert(tags(1L) == "legacy", "existence default survives DROP DEFAULT")
    spark.sql("DROP TABLE graftcat.dflt")

    // CREATE TABLE with an inline DEFAULT
    spark.sql(
      "CREATE TABLE graftcat.dflt2 (id BIGINT, c0 BIGINT, lbl STRING DEFAULT 'x')")
    spark.sql("INSERT INTO graftcat.dflt2 (id, c0) VALUES (1, 0)")
    assert(spark.sql("SELECT lbl FROM graftcat.dflt2").collect()
      .head.getString(0) == "x")
    spark.sql("DROP TABLE graftcat.dflt2")
  }

  test("ANSI CHECK constraints: ADD enforces on writes, DROP releases, non-CHECK refused") {
    spark.sql("CREATE TABLE graftcat.ck (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.ck VALUES (1, 5, 0)")
    spark.sql("ALTER TABLE graftcat.ck ADD CONSTRAINT v_pos CHECK (v >= 0)")
    // enforced by the engine's write-path gate on every later statement
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graftcat.ck VALUES (2, -1, 0)")
    }
    assert(e.getMessage != null)
    assert(spark.sql("SELECT count(*) FROM graftcat.ck").collect()
      .head.getLong(0) == 1L, "violating statement committed nothing")
    // declaration validates EXISTING data first
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.ck ADD CONSTRAINT v_big CHECK (v > 100)")
    }
    assert(e2.getMessage.toLowerCase.contains("violat") ||
      e2.getMessage.contains("v_big"))
    // DROP releases the gate
    spark.sql("ALTER TABLE graftcat.ck DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO graftcat.ck VALUES (3, -7, 0)")
    assert(spark.sql("SELECT count(*) FROM graftcat.ck").collect()
      .head.getLong(0) == 2L)
    // unenforced kinds are refused, never silently recorded
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.ck ADD CONSTRAINT pk PRIMARY KEY (id)")
    }
    assert(e3.getMessage.contains("only CHECK") ||
      e3.getMessage.toLowerCase.contains("primary key"))
    spark.sql("DROP TABLE graftcat.ck")

    // inline CREATE TABLE ... CHECK: the constraint gates from row one
    spark.sql("""CREATE TABLE graftcat.ck2
                 (id BIGINT, v BIGINT, c0 BIGINT, CONSTRAINT v_pos CHECK (v >= 0))""")
    spark.sql("INSERT INTO graftcat.ck2 VALUES (1, 5, 0)")
    intercept[Exception] {
      spark.sql("INSERT INTO graftcat.ck2 VALUES (2, -1, 0)")
    }
    assert(spark.sql("SELECT count(*) FROM graftcat.ck2").collect()
      .head.getLong(0) == 1L)
    spark.sql("DROP TABLE graftcat.ck2")
  }

  test("time-dependent DEFAULT: existence default is FOLDED at ADD time, never re-evaluated") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE TABLE graftcat.dfltt (id BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.dfltt VALUES (1, 0)") // pre-change file
    // Spark accepts foldable-but-time-dependent defaults; the EXISTENCE
    // default must pin the ADD-time value (a raw `current_date()` stored
    // as EXISTS_DEFAULT re-evaluates at every scan — pre-change rows'
    // readback would drift day by day)
    spark.sql("ALTER TABLE graftcat.dfltt ADD COLUMN d DATE DEFAULT current_date()")
    val cat = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[TableCatalog]
    val f = cat.loadTable(Identifier.of(Array.empty[String], "dfltt"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.Table]
      .schema().apply("d")
    val exists = f.metadata.getString("EXISTS_DEFAULT")
    assert(exists.startsWith("DATE '"),
      s"EXISTS_DEFAULT must be the DDL-time folded literal, got: $exists")
    // CURRENT_DEFAULT stays the live expression (future inserts re-evaluate
    // at their own insert time — the SQL-standard behavior)
    assert(f.metadata.getString("CURRENT_DEFAULT").contains("current_date"))
    // and the pre-change row reads the pinned value back
    val got = spark.sql("SELECT d FROM graftcat.dfltt WHERE id = 1")
      .collect().head.getDate(0).toString
    assert(exists == s"DATE '$got'")
    spark.sql("DROP TABLE graftcat.dfltt")
  }

  test("column DEFAULTs compose with merge-on-read DML") {
    spark.sql("CREATE TABLE graftcat.dmor (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.dmor VALUES (1, 10, 0), (2, 20, 0), (3, 30, 1)")
    spark.sql("ALTER TABLE graftcat.dmor ADD COLUMN tag STRING DEFAULT 'legacy'")
    // the delta UPDATE's new image is read through the default-filling
    // scan, so the relocated row must carry the MATERIALIZED default
    spark.sql("UPDATE graftcat.dmor SET v = v + 1 WHERE id = 2")
    spark.sql("DELETE FROM graftcat.dmor WHERE id = 3")
    val got = spark.sql("SELECT id, v, tag FROM graftcat.dmor ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(got == List((1L, 10L, "legacy"), (2L, 21L, "legacy")), s"got $got")
    // a MERGE whose insert branch omits nothing still fills the updated
    // image's default; count over the defaulted column covers all rows
    assert(spark.sql("SELECT count(tag) FROM graftcat.dmor").collect()
      .head.getLong(0) == 2L)
    // pre-ADD snapshots replay exactly (the column fills per the current
    // schema, the ROWS are the old state)
    assert(spark.sql("SELECT count(*) FROM graftcat.dmor VERSION AS OF 1")
      .collect().head.getLong(0) == 3L)
    spark.sql("DROP TABLE graftcat.dmor")
  }

  test("ALTER COLUMN nullability and comments") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    spark.sql("CREATE TABLE graftcat.nnul (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.nnul VALUES (1, 5, 0), (2, NULL, 0)")
    // Spark's OSS analyzer refuses SQL `SET NOT NULL` against v2 tables
    // outright, so TIGHTENING is a programmatic-API face (the relax
    // direction and comments flow through SQL normally); the catalog's
    // own guard still validates existing data first
    val cat = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array.empty[String], "nnul")
    def tighten(): Unit = cat.alterTable(ident,
      TableChange.updateColumnNullability(Array("v"), false))
    val e = intercept[Exception] { tighten() }
    assert(e.getMessage.contains("NULL"))
    spark.sql("UPDATE graftcat.nnul SET v = 0 WHERE v IS NULL")
    tighten()
    assert(!spark.table("graftcat.nnul").schema("v").nullable)
    // relaxing is plain SQL and always safe
    spark.sql("ALTER TABLE graftcat.nnul ALTER COLUMN v DROP NOT NULL")
    assert(spark.table("graftcat.nnul").schema("v").nullable)
    spark.sql("INSERT INTO graftcat.nnul VALUES (3, NULL, 0)")
    assert(spark.sql("SELECT count(*) FROM graftcat.nnul").collect()
      .head.getLong(0) == 3L)
    // comments are sidecar metadata, surfaced through the schema
    spark.sql("ALTER TABLE graftcat.nnul ALTER COLUMN v COMMENT 'micro-units'")
    assert(spark.table("graftcat.nnul").schema("v")
      .getComment().contains("micro-units"))
    spark.sql("DROP TABLE graftcat.nnul")

    // a column added with DEFAULT NULL can never be declared NOT NULL
    // (pre-change files would surface NULL under the declaration)
    spark.sql("CREATE TABLE graftcat.nnul2 (id BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO graftcat.nnul2 VALUES (1, 0)")
    spark.sql("ALTER TABLE graftcat.nnul2 ADD COLUMN w BIGINT DEFAULT NULL")
    val e2 = intercept[Exception] {
      cat.alterTable(Identifier.of(Array.empty[String], "nnul2"),
        TableChange.updateColumnNullability(Array("w"), false))
    }
    // the null scan sees the filled existence default, so the generic
    // existing-NULLs guard catches it
    assert(e2.getMessage.contains("NULL"))
    spark.sql("DROP TABLE graftcat.nnul2")
  }

  test("catalog errors: missing table, duplicate create, rename") {
    intercept[Exception](spark.sql("SELECT * FROM graftcat.nope").collect())
    spark.sql("CREATE TABLE graftcat.dup (d0 BIGINT, c0 BIGINT)")
    intercept[Exception](
      spark.sql("CREATE TABLE graftcat.dup (d0 BIGINT, c0 BIGINT)"))
    spark.sql("ALTER TABLE graftcat.dup RENAME TO dup2")
    assert(!new java.io.File(s"$warehouse/dup").exists)
    assert(spark.sql("SELECT count(*) FROM graftcat.dup2").collect()
      .head.getLong(0) == 0L, "renamed empty world stays readable")
    spark.sql("DROP TABLE graftcat.dup2")
  }
}
