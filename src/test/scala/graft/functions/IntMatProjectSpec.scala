package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** IntMatProject (r17) replaced s_rp_project's interpreted
  * aggregate(zip_with(...)) HOF chains — this spec pins the kernel
  * bit-for-bit against that ORIGINAL formulation, on both the codegen and
  * interpreted paths, including the null shapes the HOF semantics imply
  * (wrong-length embedding, NaN element, null element). */
class IntMatProjectSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dim = 16
  private val outDims = 4
  private val mat: Array[Array[Long]] = Array.tabulate(outDims) { j =>
    Array.tabulate(dim) { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_${j}".getBytes("UTF-8"))
      val v = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16)
      v % 6 match { case 0 => 1L; case 1 => -1L; case _ => 0L }
    }
  }

  /** The original HOF formulation, verbatim from the pre-r17 query. */
  private def hofFrame(df: org.apache.spark.sql.DataFrame) = {
    val ys = (0 until outDims).map { j =>
      aggregate(
        zip_with(col("embedding"), typedLit(mat(j)),
          (x, g) => round(x.cast("double") * lit(1e6), 0).cast("long") * g),
        lit(0L), (acc, v) => acc + v)
    }
    df.select(col("vec_id"), posexplode(array(ys: _*)).as(Seq("j", "y_u")))
      .orderBy("vec_id", "j")
  }

  private def kernelFrame(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"),
      posexplode(IntMatProject(col("embedding"), mat.flatten, outDims))
        .as(Seq("j", "y_u")))
      .orderBy("vec_id", "j")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Any)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) null else r.getLong(2)))

  test("kernel == original HOF chain on seeded random embeddings (codegen + interpreted)") {
    val rnd = new scala.util.Random(42)
    val data = (0L until 200L).map { id =>
      (id, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f).toSeq)
    }
    val df = spark.createDataFrame(data).toDF("vec_id", "embedding")
    assert(rows(kernelFrame(df)) == rows(hofFrame(df)))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(rows(kernelFrame(df)) == rows(hofFrame(df)))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null/error shapes match the HOF semantics: wrong length, NaN, null element") {
    val data = Seq(
      (1L, Seq.fill(dim)(0.25f)),                    // normal
      (2L, Seq.fill(dim - 3)(0.25f)),                // short -> nulls
      (3L, Seq.fill(dim + 2)(0.25f))                 // long -> nulls
    )
    val df = spark.createDataFrame(data).toDF("vec_id", "embedding")
    assert(rows(kernelFrame(df)) == rows(hofFrame(df)))
    // rows 2-3 must actually BE null (the assertion above alone would pass
    // if both sides agreed on a wrong non-null value)
    val k = rows(kernelFrame(df))
    assert(k.filter(_._1 >= 2L).forall(_._3 == null))
    assert(k.filter(_._1 == 1L).forall(_._3 != null))
    // NaN: the ORIGINAL chain throws (ANSI double->long cast overflow) —
    // the kernel must throw too, not silently null
    val nan = spark.createDataFrame(Seq(
      (4L, Seq.tabulate(dim)(i => if (i == 5) Float.NaN else 0.1f))))
      .toDF("vec_id", "embedding")
    intercept[Exception](rows(hofFrame(nan)))
    val ke = intercept[Exception](rows(kernelFrame(nan)))
    assert(ke.getMessage != null && ke.getMessage.contains("CAST_OVERFLOW"))
    // null ELEMENT (createDataFrame can't carry it via Seq[Float]) — SQL route
    val withNull = spark.sql(
      s"SELECT 5L AS vec_id, array(${Seq.fill(dim - 1)("cast(0.1 as float)").mkString(",")}, cast(null as float)) AS embedding")
    assert(rows(kernelFrame(withNull)) == rows(hofFrame(withNull)))
    assert(rows(kernelFrame(withNull)).forall(_._3 == null))
  }

  test("NULL embedding yields outDims null rows, matching the array(null aggs) chain") {
    // the chain is array(agg_0..agg_{n-1}) — each agg of a NULL input is
    // null, the array itself never is, so posexplode emits outDims rows.
    // A null-propagating kernel would emit 0 rows (r17 ADVICE, medium).
    val nullEmb = spark.sql(
      "SELECT 6L AS vec_id, cast(null as array<float>) AS embedding")
    val k = rows(kernelFrame(nullEmb))
    assert(k == rows(hofFrame(nullEmb)))
    assert(k.size == outDims && k.forall(_._3 == null))
    // interpreted path too
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(rows(kernelFrame(nullEmb)) == rows(hofFrame(nullEmb)))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("non-ANSI session: NaN saturates like the chain's cast instead of throwing") {
    val nan = spark.createDataFrame(Seq(
      (7L, Seq.tabulate(dim)(i => if (i == 5) Float.NaN else 0.1f))))
      .toDF("vec_id", "embedding")
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try assert(rows(kernelFrame(nan)) == rows(hofFrame(nan)))
    finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
