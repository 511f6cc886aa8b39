package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Declared CHECK constraints: write-path enforcement (not an optimizer
  * rule — no session can forget it), existing-data validation at
  * declaration, ANSI NULL-passes semantics, and statement atomicity on
  * violation (the aborted task's files never land, no version commits). */
class GraftChecksSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-cwh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.ccat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.ccat.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(sql: String): Set[(Long, Long)] =
    spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("violating writes fail atomically; passing writes proceed") {
    spark.sql("CREATE TABLE ccat.t (id BIGINT, v BIGINT, s STRING, c0 BIGINT)")
    spark.sql("INSERT INTO ccat.t VALUES (1, 10, 'ok', 0)")
    spark.sql("""CALL ccat.system.set_check(table => 't', name => 'v_pos',
      expr => 'v > 0')""")
    spark.sql("""CALL ccat.system.set_check(table => 't', name => 's_len',
      expr => 'length(s) >= 2')""")

    // metadata-table face lists the declared checks
    val listed = spark.sql("SELECT name, expr FROM ccat.t.checks")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(listed == Set("v_pos" -> "v > 0", "s_len" -> "length(s) >= 2"))

    val vBefore = spark.sql("SELECT max(version) FROM ccat.t.history")
      .collect()(0).getLong(0)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ccat.t VALUES (2, 20, 'ok', 0), (3, -5, 'ok', 1)")
    }
    assert(e.getMessage != null)
    assert(rows("SELECT id, v FROM ccat.t") == Set((1L, 10L)),
      "failed statement admitted nothing (atomic, even across cells)")
    assert(spark.sql("SELECT max(version) FROM ccat.t.history")
      .collect()(0).getLong(0) == vBefore, "no version committed")

    // NULL condition passes (ANSI CHECK)
    spark.sql("INSERT INTO ccat.t VALUES (4, NULL, 'ok', 0)")
    // the other check still guards
    intercept[Exception] {
      spark.sql("INSERT INTO ccat.t VALUES (5, 50, 'x', 0)")
    }
    spark.sql("INSERT INTO ccat.t VALUES (6, 60, 'fine', 2)")
    assert(spark.sql("SELECT id FROM ccat.t").collect().map(_.getLong(0)).toSet
      == Set(1L, 4L, 6L))
  }

  test("COW UPDATE cannot write a violating row; drop_check lifts the gate") {
    intercept[Exception] {
      spark.sql("UPDATE ccat.t SET v = -1 WHERE id = 1")
    }
    assert(rows("SELECT id, v FROM ccat.t WHERE id = 1") == Set((1L, 10L)),
      "violating UPDATE rolled back whole")
    spark.sql("CALL ccat.system.drop_check(table => 't', name => 'v_pos')")
    spark.sql("UPDATE ccat.t SET v = -1 WHERE id = 1")
    assert(rows("SELECT id, v FROM ccat.t WHERE id = 1") == Set((1L, -1L)))
  }

  test("set_check refuses when existing rows violate, with the count") {
    val e = intercept[Exception] {
      spark.sql("""CALL ccat.system.set_check(table => 't', name => 'v_pos',
        expr => 'v > 0')""")
    }
    assert(e.getMessage.contains("1 existing row"), s"names the blocker: $e")
    // and an unresolvable expression fails at declaration, not at write
    val e2 = intercept[Exception] {
      spark.sql("""CALL ccat.system.set_check(table => 't', name => 'bad',
        expr => 'no_such_col > 0')""")
    }
    assert(spark.sql("SELECT name FROM ccat.t.checks").collect()
      .map(_.getString(0)).toSet == Set("s_len"), "nothing half-declared")
  }

  test("streaming epochs enforce the table's checks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    spark.sql("CREATE TABLE ccat.st (id BIGINT, v BIGINT, c0 BIGINT)")
    spark.sql("""CALL ccat.system.set_check(table => 'st', name => 'v_pos',
      expr => 'v > 0')""")
    val mem = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft-cck").toString
    def run(): Unit = {
      val q = mem.toDF().select(col("value").as("id"),
          (col("value") * 10 - 15).as("v"), lit(0L).as("c0"))
        .writeStream.format("graft")
        .option("path", s"$warehouse/st")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    mem.addData(2L, 3L) // v = 5, 15 — pass
    run()
    assert(rows("SELECT id, v FROM ccat.st") == Set((2L, 5L), (3L, 15L)))
    mem.addData(1L) // v = -5 — violates
    val e = intercept[Exception] { run() }
    assert(rows("SELECT id, v FROM ccat.st") == Set((2L, 5L), (3L, 15L)),
      "violating epoch admitted nothing")
  }

  test("a check declared while a stream is ACTIVE gates later epochs, no restart") {
    // the 'invariant from declaration onward' contract: resolution must be
    // per-epoch (the writer factory is rebuilt each micro-batch), not
    // cached for the stream's lifetime — a long-running ingest stream must
    // pick up a set_check issued while it runs
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    spark.sql("CREATE TABLE ccat.stlive (id BIGINT, v BIGINT, c0 BIGINT)")
    val mem = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft-cckl").toString
    val q = mem.toDF().select(col("value").as("id"),
        (col("value") * 10 - 15).as("v"), lit(0L).as("c0"))
      .writeStream.format("graft")
      .option("path", s"$warehouse/stlive")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(2L) // v = 5 — no checks declared yet
      q.processAllAvailable()
      assert(rows("SELECT id, v FROM ccat.stlive") == Set((2L, 5L)))
      // declare the check WHILE the stream is active
      spark.sql("""CALL ccat.system.set_check(table => 'stlive',
        name => 'v_pos', expr => 'v > 0')""")
      mem.addData(1L) // v = -5 — must be rejected by the NEXT epoch
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage != null)
      assert(rows("SELECT id, v FROM ccat.stlive") == Set((2L, 5L)),
        "the mid-stream check gated the violating epoch")
    } finally q.stop()
  }
}
