package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The incrementally-maintained vector ANN index: build, stripe-pruned
  * search, commit-log refresh (insert/delete vectors), quantizer stability
  * across refreshes, replay idempotence, and torn-refresh recovery. */
class VectorIndexSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val wh = Files.createTempDirectory("graft-vix").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.vcat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.vcat.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fs: FileSystem = FileSystem.get(
    new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)

  // deterministic 8-dim corpus: 4 well-separated axis directions x jitter
  private def vecLit(id: Long): String = {
    val rnd = new scala.util.Random(id * 7919L + 13L)
    val base = Array.fill(8)(0.05f * rnd.nextGaussian().toFloat)
    base((id % 4).toInt) += 1f
    s"array(${base.map(v => s"CAST($v AS FLOAT)").mkString(",")})"
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("build, search, and commit-log refresh across insert/delete") {
    spark.sql("CREATE TABLE vcat.vecs (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)")
    val values = (0L until 40L)
      .map(i => s"($i, ${vecLit(i)}, ${i / 16})").mkString(", ")
    spark.sql(s"INSERT INTO vcat.vecs VALUES $values")
    val vix = new VectorIndex(spark, s"$wh/vecs", s"$wh/vecs__vix",
      nlist = 4, dim = 8, pidChunks = 2)
    vix.initialize()

    // a query equal to vector 6 finds it at simu 10000, rank 1
    val q6 = spark.sql(s"SELECT ${vecLit(6L)}").collect()(0)
      .getSeq[Float](0).toArray.map(_.toDouble)
    assert(ids(vix.search(q6, k = 1)) == Seq(6L))

    // INSERT an exact copy of vector 6 under a new id; DELETE vector 7
    spark.sql(s"INSERT INTO vcat.vecs VALUES (1006, ${vecLit(6L)}, 62)")
    spark.sql("""MERGE INTO vcat.vecs t USING (SELECT 7 AS vec_id) s
                 ON t.vec_id = s.vec_id WHEN MATCHED THEN DELETE""")
    vix.refresh()

    val top = vix.search(q6, k = 2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == Seq((6L, 10000L), (1006L, 10000L)),
      s"insert must register the copy, id tie-break ascending: ${top.toSeq}")
    val q7 = spark.sql(s"SELECT ${vecLit(7L)}").collect()(0)
      .getSeq[Float](0).toArray.map(_.toDouble)
    assert(!ids(vix.search(q7, k = 3)).contains(7L), "deleted vector still served")

    // replay idempotence: nothing new -> cursor unchanged, content stable
    val c = vix.cursor
    assert(vix.refresh() == c)
    assert(ids(vix.search(q6, k = 2)) == Seq(6L, 1006L))
  }

  test("search is a pruned scan: only probed cell stripes are planned") {
    val vix = new VectorIndex(spark, s"$wh/vecs", s"$wh/vecs__vix",
      nlist = 4, dim = 8, pidChunks = 2)
    val (cents, k) = vix.centroids
    val q0 = spark.sql(s"SELECT ${vecLit(0L)}").collect()(0)
      .getSeq[Float](0).toArray.map(_.toDouble)
    val cells = vix.nearestCells(q0, cents, k, 2)
    // the search plan carries the cell-stripe bucket filter...
    val plan = vix.search(q0, k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("c1") && plan.contains("PartitionFilters"),
      s"probe cells must reach partition filters:\n$plan")
    // ...and the equivalent pre-limit pruned scan reads only those stripes
    // (input_file_name is measured before the TakeOrdered boundary, which
    // would blank it on the search output itself)
    val pruned = cells.tail
      .foldLeft(vix.world.select(1, graft.core.Bounds.point(cells.head)))(
        (s, c) => s.plus(1, graft.core.Bounds.point(c)))
      .iter().where(col("pid") =!= lit(0L))
    val scanned = pruned.select(input_file_name())
      .distinct().collect().map(_.getString(0)).toSet
    assert(scanned.nonEmpty &&
      scanned.forall(f => cells.exists(c => f.contains(s"c1=$c/"))),
      s"files outside the probed stripes were read: $scanned (cells $cells)")
  }

  test("searchAll: the batch face agrees with per-vector serving lookups") {
    val vix = new VectorIndex(spark, s"$wh/vecs", s"$wh/vecs__vix",
      nlist = 4, dim = 8, pidChunks = 2)
    // vector 6 has an exact copy 1006 in the index; with self excluded the
    // batch face must rank the copy first, same as the family's *TopK ops
    val queries = spark.sql(
      s"SELECT CAST(6 AS BIGINT) AS vec_id, ${vecLit(6L)} AS embedding")
    val got = vix.searchAll(queries, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((6L, 1006L, 1L)), s"got $got")
  }

  test("quantizer persists: cells of unchanged rows never move on refresh") {
    val vix = new VectorIndex(spark, s"$wh/vecs", s"$wh/vecs__vix",
      nlist = 4, dim = 8, pidChunks = 2)
    val before = vix.df.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql(s"INSERT INTO vcat.vecs VALUES (2000, ${vecLit(9L)}, 125)")
    vix.refresh()
    val after = vix.df.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((after - 2000L) == before, "existing assignments moved")
    assert(after.contains(2000L))
  }

  test("streaming face: the base's commit stream drives refresh, restart converges") {
    val base = Files.createTempDirectory("graft-vix-s").toString + "/base"
    val idx = base + "__vix"
    val cp = base + "__cp"
    def write(idRange: Seq[Long]): Unit = {
      val values = idRange.map(i => s"($i, ${vecLit(i)}, ${i / 16})").mkString(", ")
      spark.sql(s"""SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
                      CAST(c0 AS BIGINT) AS c0
                    FROM VALUES $values AS t(vec_id, embedding, c0)""")
        .write.format("graft").mode("append").save(base)
    }
    write(0L until 20L)
    val vix = new VectorIndex(spark, base, idx, nlist = 4, dim = 8, pidChunks = 2)
    def runOnce(): Unit = {
      val q = graft.streaming.Daemon.vectorIndexRefreshStream(vix, cp, interval = "1 second")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    runOnce() // virgin index self-initializes (trains + persists quantizer)
    val q3 = spark.sql(s"SELECT ${vecLit(3L)}").collect()(0)
      .getSeq[Float](0).toArray.map(_.toDouble)
    assert(ids(vix.search(q3, k = 1)) == Seq(3L))
    write(Seq(503L)) // new commit: another vector
    runOnce() // restart from the same checkpoint picks up the commit
    assert(vix.df.where(col("vec_id") === 503L).count() == 1L)
    val c = vix.cursor
    runOnce() // no new commits -> no-op
    assert(vix.cursor == c)
  }

  test("PQ index: coded storage, ADC search with base re-rank, delete applied in-index") {
    spark.sql("CREATE TABLE vcat.pvecs (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)")
    val values = (0L until 40L)
      .map(i => s"($i, ${vecLit(i)}, ${i / 16})").mkString(", ")
    spark.sql(s"INSERT INTO vcat.pvecs VALUES $values")
    val vix = new PqVectorIndex(spark, s"$wh/pvecs", s"$wh/pvecs__pvix",
      nlist = 4, dim = 8, m = 4, ksub = 8, pidChunks = 2)
    vix.initialize()
    // the index stores CODES, not embeddings: m ints per row
    val row = vix.df.select("codes").head.getSeq[Long](0)
    assert(row.size == 4, s"expected 4 codeword indices, got $row")
    // exact query hits itself at simu 10000 (ADC floor -> shortlist ->
    // exact re-rank from the base)
    val q6 = spark.sql(s"SELECT ${vecLit(6L)}").collect()(0)
      .getSeq[Float](0).toArray.map(_.toDouble)
    val top = vix.search(q6, k = 1).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == Seq((6L, 10000L)), s"got ${top.toSeq}")
    // refresh consumes the feed: insert a copy, delete a vector — and the
    // delete must land in the INDEX STATE (the base re-rank would mask a
    // stale row in search output, so pin df directly)
    spark.sql(s"INSERT INTO vcat.pvecs VALUES (1006, ${vecLit(6L)}, 62)")
    spark.sql("""MERGE INTO vcat.pvecs t USING (SELECT 7 AS vec_id) s
                 ON t.vec_id = s.vec_id WHEN MATCHED THEN DELETE""")
    vix.refresh()
    assert(ids(vix.search(q6, k = 2)) == Seq(6L, 1006L),
      "the planted copy registers through the coded refresh")
    assert(vix.df.where(col("vec_id") === 7L).isEmpty,
      "deleted vector's code row destroyed in the index world")
    assert(vix.df.where(col("vec_id") === 1006L).count() == 1L)
    // codebooks persisted: a fresh handle searches identically
    val again = new PqVectorIndex(spark, s"$wh/pvecs", s"$wh/pvecs__pvix",
      nlist = 4, dim = 8, m = 4, ksub = 8, pidChunks = 2)
    assert(ids(again.search(q6, k = 2)) == Seq(6L, 1006L))
  }

  test("index_vector registers a default id bloom; PQ re-rank file-skips the base") {
    // the serving-time exact re-rank is a k-bounded semi-join against the
    // base on the id column — without a registered skip column it scans
    // every base file; index_vector therefore registers vec_id by default
    // (opt-out: bloom_id => false), and the runtime join filter must reach
    // the base scan as a bloom/stats file skip
    spark.sql("CREATE TABLE vcat.pv2 (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)")
    val values = (0L until 48L)
      .map(i => s"($i, ${vecLit(i)}, ${i / 16})").mkString(", ")
    spark.sql(s"INSERT INTO vcat.pv2 VALUES $values")
    spark.sql("""CALL vcat.system.index_vector(table => 'pv2', name => 'pvix2',
      nlist => 4, dim => 8, pq => true, pid_chunks => 2, m => 4, ksub => 8)""")
    assert(graft.sources.GraftBloom.columns(fs, new Path(s"$wh/pv2"))
      == Seq("vec_id"), "build registered the base's id column for skipping")
    val vix = new PqVectorIndex(spark, s"$wh/pv2", s"$wh/pv2__idx_pvix2",
      nlist = 4, dim = 8, m = 4, ksub = 8, pidChunks = 2)
    val q6 = spark.sql(s"SELECT ${vecLit(6L)}").collect()(0)
      .getSeq[Float](0).toArray.map(_.toDouble)
    val res = vix.search(q6, k = 1)
    assert(ids(res) == Seq(6L))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeBloomSkipCols: [vec_id]"),
      s"the re-rank's base scan must plan only bloom-surviving files:\n$plan")
    // a base with an existing declaration is the user's: not overwritten
    spark.sql("""CALL vcat.system.index_vector(table => 'pv2', name => 'pvix3',
      nlist => 4, dim => 8, pq => true, pid_chunks => 2, m => 4, ksub => 8)""")
    assert(graft.sources.GraftBloom.columns(fs, new Path(s"$wh/pv2"))
      == Seq("vec_id"))
  }

  test("torn refresh: a leftover intent marker forces an exact rebuild") {
    val vix = new VectorIndex(spark, s"$wh/vecs", s"$wh/vecs__vix",
      nlist = 4, dim = 8, pidChunks = 2)
    val want = vix.df.select("vec_id").collect().map(_.getLong(0)).toSet
    fs.create(new Path(s"$wh/vecs__vix", "_graft_vix_refresh_intent"), true).close()
    vix.refresh()
    val got = vix.df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want, "rebuild must restate the exact live index")
    assert(!fs.exists(new Path(s"$wh/vecs__vix", "_graft_vix_refresh_intent")))
  }
}
