package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SignRandomProjectionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("codegen and interpreted paths agree; keys are deterministic in the seed") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 20).map(_ => Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)
    val df = vecs.toDF("embedding")
    def run(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(SignRandomProjection(col("embedding"), tables = 4, bits = 8,
        dim = 16, seed = 42L).as("k")).as[Seq[Long]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, "doGenCode must match nullSafeEval")
    assert(gen.forall(_.length == 4), "one key per table")
    assert(gen.forall(_.forall(k => k >= 0 && k < (1L << 8))), "keys fit in `bits` bits")
    // same seed -> same keys on a second evaluation
    assert(run("CODEGEN_ONLY") == gen)
  }

  test("sign-LSH properties: identical vectors collide everywhere, opposite vectors nowhere") {
    import spark.implicits._
    val v = Seq.tabulate(16)(i => (i + 1).toFloat)
    val df = Seq(v, v, v.map(-_)).toDF("embedding")
    val keys = df.select(SignRandomProjection(col("embedding"), tables = 6, bits = 6,
      dim = 16, seed = 1L)).as[Seq[Long]].collect()
    assert(keys(0) == keys(1), "identical vectors share every table key")
    assert(keys(0).zip(keys(2)).forall { case (a, b) => a != b },
      "antipodal vectors flip every hyperplane sign -> bitwise-complement keys")
  }

  test("nearby vectors collide in at least one table (the ANN operating point)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val near = base.clone(); near(0) += 0.01f
    val df = Seq(base.toSeq, near.toSeq).toDF("embedding")
    val keys = df.select(SignRandomProjection(col("embedding"), tables = 6, bits = 6,
      dim = 64, seed = 42L)).as[Seq[Long]].collect()
    assert(keys(0).zip(keys(1)).exists { case (a, b) => a == b })
  }
}
