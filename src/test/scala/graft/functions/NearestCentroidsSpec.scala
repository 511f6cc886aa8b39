package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class NearestCentroidsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // 3 centroids on the axes of R^3
  private val cents = Array[Double](1, 0, 0, 0, 1, 0, 0, 0, 1)

  test("codegen and interpreted paths agree; order is nearest-first with index tie-break") {
    import spark.implicits._
    val df = Seq(
      Seq(0.9f, 0.1f, 0f),  // nearest 0, then 1, then 2
      Seq(0f, 0f, 2f),      // nearest 2
      Seq(0.5f, 0.5f, 0f)   // equidistant to 0 and 1 -> lower index first
    ).toDF("embedding")
    def run(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(NearestCentroids(col("embedding"), cents, nlist = 3, nprobe = 3).as("c"))
        .as[Seq[Long]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, "doGenCode must match nullSafeEval")
    assert(gen(0) == Seq(0L, 1L, 2L))
    assert(gen(1).head == 2L)
    assert(gen(2).take(2) == Seq(0L, 1L), "equal distances break ties by index")
  }

  test("nprobe truncates to the nearest lists") {
    import spark.implicits._
    val df = Seq(Seq(0.9f, 0.1f, 0f)).toDF("embedding")
    val got = df.select(NearestCentroids(col("embedding"), cents, nlist = 3, nprobe = 1))
      .as[Seq[Long]].head()
    assert(got == Seq(0L))
  }
}
