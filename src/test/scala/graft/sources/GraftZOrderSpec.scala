package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Declared intra-chunk Z-order: the `system.zorder` procedure, the
  * `_graft_zorder` sidecar it registers, the connector `zvalue` function it
  * sorts by (resolved through the catalog's FunctionCatalog face), and the
  * layout's persistence across later writes. */
class GraftZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-zwarehouse").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.zcat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.zcat.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Rows of one cell's LIVE chunk files in PHYSICAL order (no connector
    * reordering). Live = listed by the table's latest manifest: manifest-
    * only retirement leaves a rewrite's superseded (pre-zorder) files in
    * place, and reading those would scramble the layout assertion. */
  private def fileRows(table: String, cell: String): Seq[(Long, Long)] = {
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = org.apache.hadoop.fs.FileSystem.get(root.toUri,
      new org.apache.hadoop.conf.Configuration())
    val live = GraftVersions.liveRels(fs, root).getOrElse(
      GraftVersions.liveFiles(fs, root))
    live.filter(_.startsWith(s"$cell/")).flatMap { rel =>
      spark.read.parquet(s"$warehouse/$table/$rel").select("x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
  }

  private def zOf(x: Long, y: Long): Long =
    GraftZOrder.interleave(Array(x, y))

  test("connector zvalue function: callable via SQL, agrees with the catalyst kernel") {
    val viaSql = spark.sql("SELECT zcat.system.zvalue(5L, 9L)")
      .collect().head.getLong(0)
    val viaCatalyst = spark.range(1)
      .select(graft.functions.ZValue(lit(5L), lit(9L)))
      .collect().head.getLong(0)
    assert(viaSql == viaCatalyst && viaSql == zOf(5, 9))
    // seeded sweep: sidecar kernel == catalyst kernel on random shapes
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val a = rnd.nextLong() & Long.MaxValue
      val b = rnd.nextLong() & Long.MaxValue
      val cat = spark.range(1)
        .select(graft.functions.ZValue(lit(a), lit(b)))
        .collect().head.getLong(0)
      assert(cat == zOf(a, b), s"kernel drift at ($a, $b)")
    }
  }

  test("system.zorder: content preserved, cells physically z-sorted, later INSERTs stay sorted") {
    spark.sql("CREATE TABLE zcat.t (id BIGINT, x BIGINT, y BIGINT, c0 BIGINT)")
    // two cells; row order within the insert is id order (x,y scrambled)
    spark.sql("""INSERT INTO zcat.t
                 SELECT id, (id * 37) % 64, (id * 11) % 64, id DIV 32
                 FROM range(0, 64)""")
    val before = spark.sql("SELECT id, x, y, c0 FROM zcat.t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val out = spark.sql("CALL zcat.system.zorder(table => 't', columns => 'x,y')")
      .collect()
    assert(out.head.getLong(0) == 2L, s"two occupied cells rewritten: ${out.toSeq}")
    assert(new java.io.File(s"$warehouse/t/${GraftZOrder.SidecarName}").isFile)

    val after = spark.sql("SELECT id, x, y, c0 FROM zcat.t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(after == before, "zorder must not change table content")

    // physical order inside each cell follows the Morton curve
    Seq(0, 1).foreach { c =>
      val rows = fileRows("t", s"c0=$c")
      assert(rows.nonEmpty)
      val zs = rows.map { case (x, y) => zOf(x, y) }
      assert(zs == zs.sorted, s"cell c0=$c not z-sorted: $zs")
    }

    // a LATER catalog insert into a fresh cell keeps the declared layout
    spark.sql("""INSERT INTO zcat.t
                 SELECT id, (id * 53) % 64, (id * 29) % 64, 9
                 FROM range(100, 132)""")
    val rows9 = fileRows("t", "c0=9")
    val zs9 = rows9.map { case (x, y) => zOf(x, y) }
    assert(zs9 == zs9.sorted, s"later insert lost the z layout: $zs9")
    spark.sql("DROP TABLE zcat.t")
  }

  test("path-routed write on a z-declared world degrades to lexicographic, never fails") {
    spark.sql("CREATE TABLE zcat.p (id BIGINT, x BIGINT, y BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO zcat.p SELECT id, id % 8, id % 5, 0 FROM range(0, 16)")
    spark.sql("CALL zcat.system.zorder(table => 'p', columns => 'x,y')")
    // the path API has no function catalog: the write must still succeed
    // (lexicographic fallback on the same columns)
    spark.range(16, 32)
      .select(col("id"), (col("id") % 8).as("x"), (col("id") % 5).as("y"),
        lit(1L).as("c0"))
      .write.format("graft").mode("append").save(s"$warehouse/p")
    val rows = fileRows("p", "c0=1")
    assert(rows.map(_._1) == rows.map(_._1).sorted,
      s"fallback sorts lexicographically by (x, y): $rows")
    assert(spark.sql("SELECT COUNT(*) FROM zcat.p").collect().head.getLong(0) == 32L)
    spark.sql("DROP TABLE zcat.p")
  }

  test("guards: needs 2+ bigint data columns") {
    spark.sql("CREATE TABLE zcat.g (id BIGINT, s STRING, c0 BIGINT)")
    spark.sql("INSERT INTO zcat.g VALUES (1, 'a', 0)")
    def fails(callSql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(callSql).collect())
      assert(e.getMessage != null && e.getMessage.contains(frag),
        s"expected '$frag' in: ${e.getMessage}")
    }
    fails("CALL zcat.system.zorder(table => 'g', columns => 'id')",
      "at least 2")
    fails("CALL zcat.system.zorder(table => 'g', columns => 'id,s')",
      "bigint")
    fails("CALL zcat.system.zorder(table => 'g', columns => 'id,c0')",
      "bucket column")
    fails("CALL zcat.system.zorder(table => 'g', columns => 'id,nope')",
      "no column")
    spark.sql("DROP TABLE zcat.g")
  }
}
