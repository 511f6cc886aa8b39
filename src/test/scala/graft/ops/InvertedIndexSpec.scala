package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The incrementally-maintained inverted index: build, pruned lookups,
  * commit-log refresh (insert/delete/update docs), replay idempotence, and
  * torn-refresh recovery. */
class InvertedIndexSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val wh = Files.createTempDirectory("graft-idx").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.icat", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.icat.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fs: FileSystem = FileSystem.get(
    new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)

  private def lookupMap(ix: InvertedIndex, term: String): Map[Long, Long] =
    ix.docsFor(term).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("build, lookup, and commit-log refresh across insert/update/delete") {
    spark.sql("CREATE TABLE icat.docs (doc_id BIGINT, text STRING, c0 BIGINT)")
    spark.sql("""INSERT INTO icat.docs VALUES
      (1, 'spark makes big data small', 0),
      (2, 'small data stays small', 0),
      (3, 'the cat sat', 0)""")
    val ix = new InvertedIndex(spark, s"$wh/docs", s"$wh/docs__idx")
    ix.initialize()

    assert(lookupMap(ix, "small") == Map(1L -> 1L, 2L -> 2L))
    assert(lookupMap(ix, "spark") == Map(1L -> 1L))
    assert(lookupMap(ix, "absent") == Map.empty[Long, Long])

    // INSERT a doc; UPDATE another (delete+insert in the feed); DELETE one
    spark.sql("INSERT INTO icat.docs VALUES (4, 'spark again spark', 0)")
    spark.sql("UPDATE icat.docs SET text = 'big cat energy' WHERE doc_id = 1")
    spark.sql("""MERGE INTO icat.docs t USING (SELECT 3 AS doc_id) s
                 ON t.doc_id = s.doc_id WHEN MATCHED THEN DELETE""")
    ix.refresh()

    assert(lookupMap(ix, "spark") == Map(4L -> 2L), "insert + update applied")
    assert(lookupMap(ix, "small") == Map(2L -> 2L), "doc 1's old postings destroyed")
    assert(lookupMap(ix, "cat") == Map(1L -> 1L), "updated doc re-indexed")
    assert(lookupMap(ix, "sat") == Map.empty[Long, Long], "deleted doc gone")

    // replay idempotence: nothing new -> cursor unchanged, content stable
    val c = ix.cursor
    assert(ix.refresh() == c)
    assert(lookupMap(ix, "spark") == Map(4L -> 2L))
  }

  test("lookup is a pruned scan: only the term's chunk stripe is planned") {
    val ix = new InvertedIndex(spark, s"$wh/docs", s"$wh/docs__idx")
    val plan = ix.docsFor("small").queryExecution.executedPlan.toString
    // the fp dim (c1) carries a point-chunk bound from the selection
    assert(plan.contains("c1"), s"expected a bucket filter on the fp dim:\n$plan")
    assert(plan.contains("PartitionFilters"),
      s"fp bound must hit partition filters:\n$plan")
    val (lo, hi) = ix.world.dims(1).mapping
      .chunksOf(graft.core.Bounds.point(ix.termFp("small"))).get
    assert(lo == hi, "a point fp maps to one chunk stripe")
    // files actually READ must all lie in the term's c1 stripe
    val scanned = ix.docsFor("small").select(input_file_name())
      .distinct().collect().map(_.getString(0)).toSet
    assert(scanned.nonEmpty && scanned.forall(_.contains(s"c1=$lo/")),
      s"files outside the fp stripe were read: $scanned")
  }

  test("BM25 serving: the length stripe is probed by broadcast joins, never shuffled") {
    val ix = new InvertedIndex(spark, s"$wh/docs", s"$wh/docs__idx")
    val q = ix.searchBm25(Seq("small", "word"), k = 5)
    val plan = q.queryExecution.executedPlan.toString
    // the tf side is explicitly broadcast: every join the length stripe
    // participates in must be a BroadcastHashJoin (lens on the streamed
    // side), and no sort-merge join may appear anywhere in the serve plan
    assert(!plan.contains("SortMergeJoin"),
      s"BM25 serving must not shuffle-join the length stripe:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"tf/df joins must broadcast against the stripes:\n$plan")
    assert(q.collect().nonEmpty, "serving query returns ranked docs")
  }

  test("pure-delete refresh window: postings vanish, cursor still advances") {
    val base = Files.createTempDirectory("graft-idx-d").toString + "/base"
    import spark.implicits._
    Seq((1L, "solo words here"), (2L, "other words"))
      .toDF("doc_id", "text").withColumn("c0", expr("doc_id DIV 16"))
      .write.format("graft").mode("append").save(base)
    val ix = new InvertedIndex(spark, base, base + "__idx")
    ix.initialize()
    assert(lookupMap(ix, "solo") == Map(1L -> 1L))
    // a delete-only commit (bucket-metadata DELETE path still seals)
    val s2 = spark
    val del = s2.read.format("graft").load(base).where(col("doc_id") =!= 1)
      .select("doc_id", "text", "c0")
    // row-exact delete via overwrite of the world with the survivor set
    del.write.format("graft").mode("overwrite").save(base)
    val c0 = ix.cursor
    ix.refresh()
    assert(ix.cursor > c0, "cursor advances across a delete-only window")
    assert(lookupMap(ix, "solo") == Map.empty[Long, Long], "deleted doc's postings gone")
    assert(lookupMap(ix, "words") == Map(2L -> 1L))
  }

  test("streaming face: the base's commit stream drives refresh, restart converges") {
    val base = Files.createTempDirectory("graft-idx-s").toString + "/base"
    val idx = base + "__idx"
    val cp = base + "__cp"
    import spark.implicits._
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").withColumn("c0", expr("doc_id DIV 16"))
        .write.format("graft").mode("append").save(base)
    write(Seq((1L, "alpha beta"), (2L, "beta gamma beta")))
    val ix = new InvertedIndex(spark, base, idx)
    def runOnce(): Unit = {
      val q = graft.streaming.Daemon.indexRefreshStream(ix, cp, interval = "1 second")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    runOnce() // virgin index self-initializes
    assert(lookupMap(ix, "beta") == Map(1L -> 1L, 2L -> 2L))
    write(Seq((3L, "gamma beta")))
    runOnce() // restart from the same checkpoint picks up the commit
    assert(lookupMap(ix, "beta") == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    val c = ix.cursor
    runOnce() // no new commits -> no-op
    assert(ix.cursor == c)
  }

  test("torn refresh (leftover intent marker) rebuilds instead of half-applying") {
    val idxPath = s"$wh/docs__idx"
    val ix = new InvertedIndex(spark, s"$wh/docs", idxPath)
    fs.create(new Path(idxPath, "_graft_idx_refresh_intent"), true).close()
    spark.sql("INSERT INTO icat.docs VALUES (9, 'sphinx of black quartz', 0)")
    ix.refresh() // must take the rebuild path
    assert(!fs.exists(new Path(idxPath, "_graft_idx_refresh_intent")))
    assert(lookupMap(ix, "sphinx") == Map(9L -> 1L))
    assert(lookupMap(ix, "spark") == Map(4L -> 2L), "rebuild is exact")
  }
}
