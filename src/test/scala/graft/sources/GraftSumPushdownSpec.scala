package graft.sources

import graft.core.DimMapping
import graft.world.{DimSpec, World}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** SUM aggregate pushdown from write-time footer sums: the connector's
  * writer records exact integral column sums (+ non-null counts) in each
  * file's key-value metadata; GraftAggScan answers SUM from them with one
  * footer read per file, falling back to a single-file scan for files that
  * lack the key (Spark-parquet-written worlds).
  */
class GraftSumPushdownSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("graft-sum").toString

  /** 64 rows over 4 chunks; v long (nulls at id%5==0), i int, f double. */
  private def rows = {
    import spark.implicits._
    (0L until 64L).toDF("id")
      .withColumn("c0", expr("id DIV 16"))
      .withColumn("v", when(col("id") % 5 =!= 0, col("id") * 3L))
      .withColumn("i", (col("id") % 7).cast("int"))
      .withColumn("f", col("id").cast("double") / 4.0)
  }

  private def expected = {
    val by = (0L until 64L).groupBy(_ / 16)
    by.map { case (c0, ids) =>
      (c0,
        ids.filter(_ % 5 != 0).map(_ * 3L).sum,
        ids.map(_ % 7).sum,
        ids.size.toLong)
    }.toSet
  }

  test("connector-written files carry footer sums; SUM answers from metadata") {
    val path = tmp()
    rows.write.format("graft").mode("append").save(path)
    // the metadata is physically present
    val f = {
      def walk(x: java.io.File): Seq[java.io.File] =
        if (x.isDirectory) x.listFiles.toSeq.flatMap(walk)
        else if (x.getName.endsWith(".parquet")) Seq(x) else Nil
      walk(new java.io.File(path)).head
    }
    val pfr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString),
        new org.apache.hadoop.conf.Configuration()))
    val (kv, codec) = try {
      (pfr.getFooter.getFileMetaData.getKeyValueMetaData,
        pfr.getRowGroups.get(0).getColumns.get(0).getCodec)
    } finally pfr.close()
    assert(kv.containsKey("graft.sums"), s"footer lacks sums key: $kv")
    // parquet-mr's builder default is UNCOMPRESSED; the connector must not
    // ship that at scale
    assert(codec == org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY,
      s"connector chunk files must be snappy-compressed, got $codec")
    assert(kv.get("graft.sums").contains("v=") && kv.get("graft.sums").contains("i="))

    val df = spark.read.format("graft").load(path)
    val q = df.groupBy("c0")
      .agg(sum("v").as("sv"), sum("i").as("si"), count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("GraftAggScan") && p.contains("SUM(v)") && p.contains("SUM(i)"),
      s"grouped sums must push to the footer scan:\n$p")
    val got = q.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // ungrouped global sum pushes too
    val g = df.agg(sum("v"))
    assert(g.queryExecution.executedPlan.toString.contains("SUM(v)"))
    assert(g.collect().head.getLong(0) == expected.toSeq.map(_._2).sum)
    // bucket-column sum = directory value × row count, pure metadata
    val b = df.groupBy("c0").agg(sum("c0").as("sc"))
    assert(b.queryExecution.executedPlan.toString.contains("SUM(c0)"))
    assert(b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (0L until 4L).map(c => (c, c * 16L)).toSet)
  }

  test("double column is NOT pushed; result still exact via row scan") {
    val path = tmp()
    rows.write.format("graft").mode("append").save(path)
    val q = spark.read.format("graft").load(path).groupBy("c0").agg(sum("f"))
    assert(!q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "a double SUM must not take the metadata path")
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(got(0L) - (0 until 16).map(_ / 4.0).sum) < 1e-9)
  }

  test("Spark-parquet-written world (no sums metadata) falls back per file, stays exact") {
    val w = new World(spark, tmp(),
      Seq(DimSpec("id", DimMapping(0, 63, 16))))
    w.create(rows.drop("c0"))
    val df = spark.read.format("graft").load(w.path)
    val q = df.groupBy("c0").agg(sum("v").as("sv"), sum("i").as("si"),
      count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("GraftAggScan") && p.contains("SUM(v)"),
      s"pushdown is declared even when files answer by scan fallback:\n$p")
    val got = q.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("SumTracker: overflow poisons the column instead of wrapping") {
    val tr = new SumTracker(Seq("a", "b"))
    tr.add("a", Long.MaxValue); tr.add("a", 1L) // overflow -> poisoned
    tr.add("b", 5L); tr.add("b", 7L)
    assert(tr.encode == "b=12,2",
      s"poisoned column must be OMITTED (reader falls back to scan), got '${tr.encode}'")
    // a wrapped metadata sum would disagree with the row scan; omission
    // makes the reader recompute with the engine's own overflow semantics
  }

  test("all-null and absent columns sum to NULL") {
    import spark.implicits._
    val path = tmp()
    (0L until 8L).toDF("id")
      .withColumn("c0", lit(0L))
      .withColumn("v", when(lit(false), 1L)) // all null
      .write.format("graft").mode("append").save(path)
    val r = spark.read.format("graft").load(path).agg(sum("v")).collect().head
    assert(r.isNullAt(0), "SUM of an all-null column is NULL")
  }
}
