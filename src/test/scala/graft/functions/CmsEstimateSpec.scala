package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The cms_estimate probe kernel against Spark's own count_min_sketch
  * aggregate: CMS never under-counts, the eps·N over-count bound holds on
  * the seeded fixture, and codegen/interpreted paths agree. */
class CmsEstimateSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixture = {
    import spark.implicits._
    // zipf-ish skew: key k appears ~ (200 - k) times, keys 0..199
    (0 until 200).flatMap(k => Seq.fill(200 - k)(k.toLong)).toDF("k")
  }

  test("estimates never under-count and respect the eps*N bound (sketch merged across 4 partitions)") {
    val df = fixture.repartition(4)
    val n = df.count()
    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.999d, 42)").as("sk"))
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val rows = exact.crossJoin(broadcast(sk))
      .select(col("k"), col("exact"),
        CmsEstimate(col("sk"), col("k")).as("est"))
      .collect()
    assert(rows.length == 200)
    val bound = math.ceil(n * 0.001).toLong
    rows.foreach { r =>
      val (k, ex, est) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(est >= ex, s"CMS under-counted key $k: $est < $ex")
      assert(est <= ex + bound, s"key $k over-counted past eps*N: $est > $ex + $bound")
    }
  }

  test("absent keys estimate within eps*N of zero") {
    val sk = fixture.agg(expr("count_min_sketch(k, 0.001d, 0.999d, 42)").as("sk"))
    val probes = spark.range(1000, 1010).select(col("id").as("k"))
    val rows = probes.crossJoin(broadcast(sk))
      .select(CmsEstimate(col("sk"), col("k")).as("est")).collect()
    val n = fixture.count()
    rows.foreach(r => assert(r.getLong(0) <= math.ceil(n * 0.001).toLong))
  }

  test("codegen and interpreted paths agree") {
    val sk = fixture.agg(expr("count_min_sketch(k, 0.01d, 0.99d, 7)").as("sk"))
    val probes = fixture.distinct().crossJoin(broadcast(sk))
    val withCodegen = probes
      .select(col("k"), CmsEstimate(col("sk"), col("k")).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val saved = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = probes
        .select(col("k"), CmsEstimate(col("sk"), col("k")).as("est"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", saved)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("SQL registration via extensions name") {
    // the expression builds through the same constructor the extension
    // injects; a direct expr() path needs the extension-loaded session, so
    // here we pin the Column-API face and the type guard
    val e = intercept[Exception] {
      fixture.select(CmsEstimate(col("k"), col("k"))).collect()
    }
    assert(e.getMessage.contains("cms_estimate") ||
      e.getMessage.toLowerCase.contains("binary"))
  }
}
