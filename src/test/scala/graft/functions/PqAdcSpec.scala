package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native ADC kernel against (a) a plain-Scala reference computation,
  * (b) the aggregate/zip_with HOF formulation it replaced in
  * `Similarity.pqTopK` — byte-identical accumulation order is the swap's
  * contract — and (c) its own interpreted path (codegen parity). */
class PqAdcSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val m = 4
  private val ksub = 3
  private val subDim = 2 // dim = 8
  private val rnd = new scala.util.Random(99L)
  private val cb: Array[Double] = Array.fill(m * ksub * subDim)(rnd.nextGaussian())

  private def fixture = {
    import spark.implicits._
    val rows = (0 until 50).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat),
        Seq.fill(m)(rnd.nextInt(ksub).toLong))
    }
    rows.toDF("id", "q", "codes")
  }

  private def scalaRef(q: Seq[Float], codes: Seq[Long]): Double = {
    var acc = 0.0
    for (s <- 0 until m) {
      var inner = 0.0
      for (i <- 0 until subDim) {
        val d = q(s * subDim + i).toDouble - cb((s * ksub + codes(s).toInt) * subDim + i)
        inner += d * d
      }
      acc += inner
    }
    acc
  }

  test("matches the plain-Scala reference bit-for-bit") {
    val df = fixture
    val got = df.select(col("id"), PqAdc(col("q"), col("codes"), cb, m, ksub).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val exp = df.select("id", "q", "codes").collect().map { r =>
      (r.getLong(0), scalaRef(r.getSeq[Float](1), r.getSeq[Long](2)))
    }.toMap
    assert(got == exp) // == on Double: bit-identical, no tolerance
  }

  test("matches the HOF formulation it replaced, bit-for-bit") {
    val cbLit = typedLit(cb)
    val hof = aggregate(
      sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, sIdx) => {
        val code = element_at(col("codes"), (sIdx + 1).cast("int"))
        val base = (sIdx.cast("long") * ksub + code) * subDim
        acc + aggregate(
          zip_with(
            slice(col("q"), sIdx * subDim + 1, lit(subDim)),
            slice(cbLit, (base + 1).cast("int"), lit(subDim)),
            (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (x, y) => x + y)
      })
    val rows = fixture
      .select(col("id"), PqAdc(col("q"), col("codes"), cb, m, ksub).as("k"),
        hof.as("h"))
      .collect()
    rows.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"id ${r.getLong(0)}: kernel ${r.getDouble(1)} != hof ${r.getDouble(2)}"))
  }

  test("codegen and interpreted paths agree") {
    val df = fixture
    val withCodegen = df
      .select(col("id"), PqAdc(col("q"), col("codes"), cb, m, ksub).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val saved = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df
        .select(col("id"), PqAdc(col("q"), col("codes"), cb, m, ksub).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", saved)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
