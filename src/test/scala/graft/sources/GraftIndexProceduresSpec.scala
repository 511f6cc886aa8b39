package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** SQL faces for the maintained indexes: build / refresh / serve through
  * `CALL`, the descriptor round-trip making (table, name) the only state
  * a caller carries. The lifecycle itself (stripe pruning, commit-feed
  * refresh, torn-intent rebuild) is pinned by InvertedIndexSpec /
  * VectorIndexSpec — here we pin the SQL surface over it. */
class GraftIndexProceduresSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val warehouse = Files.createTempDirectory("graft-iwh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.icat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.icat.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("text index: build, serve, refresh — all through CALL") {
    spark.sql("CREATE TABLE icat.docs (doc_id BIGINT, text STRING, c0 BIGINT)")
    spark.sql("""INSERT INTO icat.docs VALUES
      (1, 'spark shuffles data', 0), (2, 'ducks swim fast', 0),
      (3, 'spark spark spark', 1), (4, 'quiet morning rain', 1)""")
    val v = spark.sql(
      """CALL icat.system.index_text(table => 'docs', name => 'ti',
           pid_chunks => 2, fp_chunks => 4)""").collect()
    assert(v.head.getLong(0) >= 1L, "build returns the base commit cursor")

    val hits = spark.sql(
      """CALL icat.system.search_text(table => 'docs', name => 'ti',
           query => 'spark', k => 5)""").collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(3L, 1L),
      s"tf ranks the spark-heavy doc first: ${hits.mkString(",")}")
    assert(hits.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "score_u", "n_terms"), "serving schema preserved")

    // refresh picks up later DML with no re-stated configuration
    spark.sql("INSERT INTO icat.docs VALUES (9, 'spark again', 2)")
    spark.sql("CALL icat.system.index_refresh(table => 'docs', name => 'ti')")
    val after = spark.sql(
      """CALL icat.system.search_text(table => 'docs', name => 'ti',
           query => 'spark', k => 5)""").collect()
    assert(after.map(_.getLong(0)).contains(9L), "refreshed index serves the new doc")

    // wrong-face calls fail loudly, not wrongly
    val e = intercept[Exception] {
      spark.sql("""CALL icat.system.search_vector(table => 'docs',
        name => 'ti', q => array(1.0D), k => 1)""").collect()
    }
    assert(e.getMessage.contains("search_text"), s"face mismatch named: $e")
  }

  test("vector index: planted copy served through CALL, raw and PQ") {
    spark.sql("CREATE TABLE icat.vecs (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)")
    // 4-dim: axis-aligned organic rows + one exact copy of the query
    // (base vectors are ARRAY<FLOAT> — the north-star embedding contract)
    spark.sql("""INSERT INTO icat.vecs VALUES
      (1, CAST(array(1.0, 0.0, 0.0, 0.0) AS ARRAY<FLOAT>), 0),
      (2, CAST(array(0.0, 1.0, 0.0, 0.0) AS ARRAY<FLOAT>), 0),
      (3, CAST(array(0.0, 0.0, 1.0, 0.0) AS ARRAY<FLOAT>), 0),
      (4, CAST(array(0.5, 0.5, 0.5, 0.5) AS ARRAY<FLOAT>), 1),
      (5, CAST(array(0.0, 0.0, 0.0, 1.0) AS ARRAY<FLOAT>), 1)""")
    for ((nm, pqArgs) <- Seq("vi" -> "", "vp" -> ", pq => true, m => 2, ksub => 4")) {
      spark.sql(s"""CALL icat.system.index_vector(table => 'vecs', name => '$nm',
        nlist => 2, dim => 4, pid_chunks => 2$pqArgs)""")
      val top = spark.sql(s"""CALL icat.system.search_vector(table => 'vecs',
        name => '$nm', q => array(0.5D, 0.5D, 0.5D, 0.5D), k => 1,
        nprobe => 2)""").collect()
      assert(top.head.getLong(0) == 4L && top.head.getLong(1) == 10000L,
        s"$nm: planted copy is the exact top hit: ${top.mkString(",")}")
    }
    // descriptor survives for refresh on the PQ face too
    spark.sql("""INSERT INTO icat.vecs VALUES
      (6, CAST(array(0.5, 0.5, 0.5, 0.49) AS ARRAY<FLOAT>), 2)""")
    spark.sql("CALL icat.system.index_refresh(table => 'vecs', name => 'vp')")
    val k2 = spark.sql("""CALL icat.system.search_vector(table => 'vecs',
      name => 'vp', q => array(0.5D, 0.5D, 0.5D, 0.5D), k => 2,
      nprobe => 2)""").collect()
    assert(k2.map(_.getLong(0)).toSet == Set(4L, 6L),
      s"refresh admits the near-copy: ${k2.mkString(",")}")
  }

  test("mv procedures: create, refresh, consume as a plain catalog table") {
    spark.sql("CREATE TABLE icat.ev (id BIGINT, g BIGINT, v DOUBLE, c0 BIGINT)")
    spark.sql("""INSERT INTO icat.ev VALUES
      (1, 0, 1.5, 0), (2, 0, 2.0, 0), (3, 1, 4.0, 1)""")
    spark.sql("""CALL icat.system.mv_create(table => 'ev', name => 'byg',
      group_cols => 'g', sum_cols => 'v')""")
    spark.sql("INSERT INTO icat.ev VALUES (4, 1, 1.0, 0)")
    spark.sql("DELETE FROM icat.ev WHERE id = 1")
    spark.sql("CALL icat.system.mv_refresh(table => 'ev', name => 'byg')")
    val got = spark.sql(
      """SELECT g, n, s_v_micro FROM icat.ev__mv_byg
         WHERE gid <> 0 ORDER BY g""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 1L, 2000000L), (1L, 2L, 5000000L)),
      s"delta refresh through CALL, read through plain SQL: $got")
    // an index-face refresh on an MV name refuses (kind dispatch)
    val e = intercept[Exception] {
      spark.sql("CALL icat.system.index_refresh(table => 'ev', name => 'byg')")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("unbuilt index refuses with a descriptor hint") {
    val e = intercept[Exception] {
      spark.sql("CALL icat.system.index_refresh(table => 'docs', name => 'nope')")
        .collect()
    }
    assert(e.getMessage.contains("descriptor"), s"names the missing piece: $e")
  }
}
