package graft.functions

import graft.ops.ZOrder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Reference interleave, written independently of the expression. */
  private def refZ(dims: Seq[Long]): Long = {
    val n = dims.size
    val bits = 63 / n
    var z = 0L
    for (i <- 0 until n; b <- 0 until bits) {
      z |= (((dims(i) & ((1L << bits) - 1)) >>> b) & 1L) << (b * n + i)
    }
    z
  }

  test("codegen and interpreted paths agree and match the reference interleave") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200)(_ =>
      (rnd.nextLong().abs % (1L << 40), rnd.nextLong().abs % (1L << 40), rnd.nextLong().abs % 1024))
    val df = rows.toDF("x", "y", "w")
    def run(codegen: String): Seq[(Long, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(
          ZValue(col("x"), col("y")).as("z2"),
          ZValue(col("x"), col("y"), col("w")).as("z3"))
        .as[(Long, Long)].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, "doGenCode must match eval")
    val want = rows.map { case (x, y, w) => (refZ(Seq(x, y)), refZ(Seq(x, y, w))) }
    assert(gen == want)
    // every interleaved value non-negative (sign bit never set), so the
    // long sort order IS the curve order
    assert(gen.forall { case (a, b) => a >= 0 && b >= 0 })
  }

  test("ChunkOffset: codegen and interpreted agree; wrap-safe on the full u64 domain") {
    import spark.implicits._
    // a wrapping-domain world dim: start 2^63 (negative as signed), ipc 2^59
    val df = Seq(Long.MinValue, Long.MinValue + 3, -1L, 42L).toDF("v")
    def run(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(ChunkOffset(col("v"), Long.MinValue, 1L << 59)).as[Long]
        .collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    assert(gen == run("NO_CODEGEN"))
    val want = Seq(Long.MinValue, Long.MinValue + 3, -1L, 42L).map(v =>
      java.lang.Long.remainderUnsigned(v - Long.MinValue, 1L << 59))
    assert(gen == want)
    assert(gen.forall(o => o >= 0 && o < (1L << 59)), "offsets stay in [0, ipc)")
  }

  test("null dims propagate to a null key") {
    import spark.implicits._
    val df = Seq((Some(3L), Some(5L)), (None, Some(5L)), (Some(3L), None))
      .toDF("x", "y")
    val got = df.select(ZValue(col("x"), col("y"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(refZ(Seq(3L, 5L))), None, None))
  }

  test("z-curve locality: 2-dim box predicate walks the expected key range") {
    // an axis-aligned power-of-two box is one contiguous z interval; a box
    // query over z-sorted data therefore reads one contiguous slice
    val box = for (x <- 16L until 32L; y <- 16L until 32L) yield refZ(Seq(x, y))
    assert(box.max - box.min + 1 == 16 * 16, "aligned box is z-contiguous")
    // and points outside the box never land inside the interval
    val outside = for (x <- 0L until 64L; y <- 0L until 64L
      if x < 16 || x >= 32 || y < 16 || y >= 32) yield refZ(Seq(x, y))
    assert(outside.forall(z => z < box.min || z > box.max))
  }

  test("z-clustered layout touches fewer files than single-dim layout for a box query") {
    import spark.implicits._
    val grid = for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y)
    val df = grid.toDF("x", "y")
    val boxFilter = col("x").between(32, 47) && col("y").between(32, 47)

    def filesTouched(layout: org.apache.spark.sql.DataFrame): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      layout.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).where(boxFilter)
        .select(input_file_name()).distinct().count()
    }

    // single-dim range layout: a slab of x per file, every file spans all y
    val rowMajor = filesTouched(df.repartitionByRange(32, col("x"))
      .sortWithinPartitions("x", "y"))
    val z = filesTouched(ZOrder.cluster(df, 32, col("x"), col("y")))
    // 16k rows / 32 files = 512 rows per file; the 16x16 box is ~256 rows:
    // z-layout confines it to a couple of files, the x-slab layout smears
    // it across every file whose x range intersects [32,47]
    assert(z < rowMajor, s"z-ordered layout touched $z files vs $rowMajor single-dim")
    assert(z <= 3, s"aligned box should stay within a few z-range files, got $z")
  }
}
