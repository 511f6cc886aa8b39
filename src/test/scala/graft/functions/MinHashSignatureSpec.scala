package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MinHashSignatureSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("codegen and interpreted paths agree; signature has minhash semantics") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"), Seq("c", "b", "a"), // same set, different order
      Seq("a"), Seq("z", "q")
    ).toDF("sh")
    def run(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(MinHashSignature(col("sh"), 16).as("sig"))
        .as[Seq[Long]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, "doGenCode must match nullSafeEval")
    assert(gen(0) == gen(1), "minhash is set-semantics: order-independent")
    assert(gen.forall(_.length == 16))
    // single-element array: signature j = hash of that element with seed j
    assert(gen(2).distinct.length > 1, "different seeds give different hashes")
  }

  test("band keys: codegen==interpreted, set-semantics, chained from signature minima") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"), Seq("c", "b", "a"), // same set -> same band keys
      Seq("x", "y", "z")
    ).toDF("sh")
    def run(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(MinHashBandKeys(col("sh"), 64, 8).as("bk"))
        .as[Seq[Long]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    assert(gen == run("NO_CODEGEN"), "doGenCode must match nullSafeEval")
    assert(gen.forall(_.length == 8), "one key per band")
    assert(gen(0) == gen(1), "band keys are set-semantics")
    assert(gen(0) != gen(2), "disjoint sets should (overwhelmingly) differ in every band")
  }

  test("subset property: min over superset <= min over subset, per seed") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq("a", "b", "c"))).toDF("small", "big")
    val r = df.select(MinHashSignature(col("small"), 32).as("s"),
      MinHashSignature(col("big"), 32).as("b"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(r._1.zip(r._2).forall { case (s, b) => b <= s })
  }
}
