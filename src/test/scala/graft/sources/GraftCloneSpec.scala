package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Zero-copy read-only clones: pointer resolution through the source's
  * manifests, stability while the source advances, mutation refusal,
  * clone-of-clone dereferencing, and retention safety via the auto-tag.
  */
class GraftCloneSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("graft-clone").toString

  private def write(path: String, from: Long, until: Long): Unit = {
    import spark.implicits._
    (from until until).toDF("id")
      .withColumn("c0", expr("id DIV 16"))
      .withColumn("v", col("id") * 10L)
      .write.format("graft").mode("append").save(path)
  }

  private def ids(path: String): Set[Long] =
    spark.read.format("graft").load(path)
      .select("id").collect().map(_.getLong(0)).toSet

  test("clone reads the pinned version and stays stable as the source advances") {
    val src = tmp() + "/src"; val c = tmp() + "/clone"
    write(src, 0, 32)  // v1
    write(src, 32, 48) // v2
    val v = GraftClone.create(src, c) // latest = v2
    assert(v == 2L)
    assert(ids(c) == (0L until 48L).toSet)
    // the source advances; the clone does not move
    write(src, 48, 64) // v3
    assert(ids(src) == (0L until 64L).toSet)
    assert(ids(c) == (0L until 48L).toSet, "clone stays at its version")
    // explicit earlier version
    val c1 = tmp() + "/clone1"
    assert(GraftClone.create(src, c1, Some(1L)) == 1L)
    assert(ids(c1) == (0L until 32L).toSet)
    // bucket pruning still works through the clone (manifest-side)
    val pruned = spark.read.format("graft").load(c1)
      .where(col("c0") === 1L).select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == (16L until 32L).toSet)
  }

  test("every mutation and streaming read is refused on a clone") {
    import spark.implicits._
    val src = tmp() + "/src"; val c = tmp() + "/clone"
    write(src, 0, 16)
    GraftClone.create(src, c)
    val ex = intercept[Exception] {
      (0L until 4L).toDF("id").withColumn("c0", lit(0L))
        .withColumn("v", lit(1L))
        .write.format("graft").mode("append").save(c)
    }
    assert(ex.getMessage.contains("read-only"), ex.getMessage)
    // start() is async; the refusal surfaces when the first batch plans
    val ex2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft").load(c)
        .writeStream.format("console")
        .option("checkpointLocation", tmp() + "/cp").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(ex2.toString.toLowerCase.contains("frozen"), ex2.toString)
  }

  test("clone of a clone dereferences to the original source and version") {
    val src = tmp() + "/src"; val c1 = tmp() + "/c1"; val c2 = tmp() + "/c2"
    write(src, 0, 16) // v1
    write(src, 16, 32) // v2
    GraftClone.create(src, c1, Some(1L))
    val v = GraftClone.create(c1, c2)
    assert(v == 1L)
    val fs = FileSystem.get(new java.net.URI(c2), new Configuration())
    val ptr = GraftClone.pointer(fs, new Path(c2)).get
    assert(ptr == ((src, 1L)), s"pointer must dereference the chain, got $ptr")
    assert(ids(c2) == (0L until 16L).toSet)
  }

  test("CALL system.clone drives the same path from SQL") {
    val wh = tmp() + "/wh"; val target = tmp() + "/clone_sql"
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.clc", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.clc.warehouse", wh)
    s2.sql("CREATE TABLE clc.t (id BIGINT, c0 BIGINT)")
    s2.sql("INSERT INTO clc.t SELECT id, id DIV 8 FROM range(32)") // v1
    s2.sql("INSERT INTO clc.t SELECT id + 32, (id + 32) DIV 8 FROM range(16)") // v2
    val row = s2.sql(
      s"CALL clc.system.clone(table => 't', target => '$target', version => 1)")
      .collect().head
    assert(row.getLong(0) == 1L)
    assert(ids(target) == (0L until 32L).toSet)
    // default version = latest
    val t2 = tmp() + "/clone_sql2"
    val row2 = s2.sql(
      s"CALL clc.system.clone(table => 't', target => '$t2')").collect().head
    assert(row2.getLong(0) == 2L)
    assert(ids(t2) == (0L until 48L).toSet)
  }

  test("the auto-tag holds the cloned version past expire_versions") {
    val src = tmp() + "/src"; val c = tmp() + "/clone"
    write(src, 0, 16)  // v1
    GraftClone.create(src, c, Some(1L))
    // advance and expire aggressively
    write(src, 16, 32) // v2
    write(src, 32, 48) // v3
    val fs = FileSystem.get(new java.net.URI(src), new Configuration())
    GraftVersions.expire(fs, new Path(src), keep = 1)
    // v1 is tag-held: the clone still resolves its exact bytes
    assert(ids(c) == (0L until 16L).toSet,
      "retention on the source must not break a tagged clone")
  }
}
