package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** `system.remove_orphans`: manifest-unreferenced live files are swept, live
  * data never is, and the two refusals (unversioned, barrier-pending) hold. */
class GraftOrphansSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-owarehouse").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.ocat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.ocat.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fs: FileSystem = FileSystem.get(
    new java.net.URI(warehouse), spark.sparkContext.hadoopConfiguration)

  /** Plant an orphan: copy an existing chunk file under a new name (same
    * cell), backdate it, leave it out of every manifest. */
  private def plantOrphan(table: String, cell: String): Path = {
    val dir = new Path(s"$warehouse/$table/$cell")
    val src = GraftDataSource.chunkFiles(fs, dir).head
    val dst = new Path(dir, "orphan-" + src.getName)
    val in = fs.open(src)
    val bytes = try in.readAllBytes() finally in.close()
    val out = fs.create(dst, true)
    try out.write(bytes) finally out.close()
    fs.setTimes(dst, System.currentTimeMillis() - 3600_000L, -1)
    dst
  }

  test("sweeps manifest-unreferenced files, leaves live data, prunes emptied cells") {
    spark.sql("CREATE TABLE ocat.t (d0 BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO ocat.t SELECT id, id DIV 10 FROM range(0, 30)")
    val before = spark.sql("SELECT d0 FROM ocat.t").collect()
      .map(_.getLong(0)).toSet
    val orphan = plantOrphan("t", "c0=1")
    // an orphan cell: a directory manifests never saw, holding one orphan
    val loner = new Path(s"$warehouse/t/c0=9")
    fs.mkdirs(loner)
    val lonerFile = new Path(loner, "orphan-loner.parquet")
    val o = fs.create(lonerFile, true); o.write(Array[Byte](1, 2, 3)); o.close()
    fs.setTimes(lonerFile, System.currentTimeMillis() - 3600_000L, -1)

    val n = spark.sql(
      "CALL ocat.system.remove_orphans(table => 't', older_than_hours => 0)")
      .collect().head.getLong(0)
    assert(n == 2L, s"both planted orphans swept: $n")
    assert(!fs.exists(orphan), "orphan inside a live cell removed")
    assert(!fs.exists(loner), "cell holding only orphans pruned away")
    assert(spark.sql("SELECT d0 FROM ocat.t").collect()
      .map(_.getLong(0)).toSet == before, "live data intact")
    // idempotent: nothing left to sweep
    assert(spark.sql(
      "CALL ocat.system.remove_orphans(table => 't', older_than_hours => 0)")
      .collect().head.getLong(0) == 0L)
    spark.sql("DROP TABLE ocat.t")
  }

  test("the age bound protects fresh files (default 24h would skip a just-written orphan)") {
    spark.sql("CREATE TABLE ocat.f (d0 BIGINT, c0 BIGINT)")
    spark.sql("INSERT INTO ocat.f VALUES (1, 0), (2, 0)")
    val orphan = plantOrphan("f", "c0=0")
    fs.setTimes(orphan, System.currentTimeMillis(), -1) // fresh again
    val n = spark.sql("CALL ocat.system.remove_orphans(table => 'f')")
      .collect().head.getLong(0)
    assert(n == 0L && fs.exists(orphan),
      "a fresh unreferenced file survives the default age bound")
    spark.sql("DROP TABLE ocat.f")
  }

  test("refusals: unversioned world; pending rewrite barrier") {
    spark.sql("CREATE TABLE ocat.r (d0 BIGINT, c0 BIGINT)")
    // no INSERT yet -> no manifests
    val e1 = intercept[Exception](spark.sql(
      "CALL ocat.system.remove_orphans(table => 'r', older_than_hours => 0)")
      .collect())
    assert(e1.getMessage.contains("no version log"), e1.getMessage)
    spark.sql("INSERT INTO ocat.r VALUES (1, 0)")
    GraftVersions.noteBarrier(fs, new Path(s"$warehouse/r"))
    val e2 = intercept[Exception](spark.sql(
      "CALL ocat.system.remove_orphans(table => 'r', older_than_hours => 0)")
      .collect())
    assert(e2.getMessage.contains("barrier"), e2.getMessage)
    // the next write seals a walk-based version and heals the barrier
    spark.sql("INSERT INTO ocat.r VALUES (2, 0)")
    assert(spark.sql(
      "CALL ocat.system.remove_orphans(table => 'r', older_than_hours => 0)")
      .collect().head.getLong(0) == 0L)
    spark.sql("DROP TABLE ocat.r")
  }
}
