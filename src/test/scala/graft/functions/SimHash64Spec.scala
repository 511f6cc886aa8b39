package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SimHash64Spec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The interpreted HOF formulation SimHash64 replaced — kept here as the
    * semantic pin: the native expression must stay bit-identical to it. */
  private def hofSimhash(words: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val votes = aggregate(
      words,
      array_repeat(lit(0L), 64),
      (acc, w) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", xxhash64(w), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)),
        (x, y) => x + y))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  test("codegen and interpreted paths agree, and match the HOF formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("fox", "quick", "the", "brown"), // multiset-equal -> same hash
      Seq("completely", "different", "words", "here"),
      Seq("a"),
      Seq.empty[String]
    ).toDF("words")
    def run(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(SimHash64(col("words")).as("h")).as[Long].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, "doGenCode must match nullSafeEval")
    val hof = df.select(hofSimhash(col("words")).as("h")).as[Long].collect().toSeq
    assert(gen == hof, "native simhash must be bit-identical to the HOF pin")
    assert(gen(0) == gen(1), "simhash is order-independent over the word multiset")
    assert(gen(0) != gen(2), "different texts should (overwhelmingly) differ")
    assert(gen(4) == 0L, "empty input hashes to 0 (all votes non-positive)")
  }

  test("similar word lists land at small hamming distance, dissimilar at large") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i")
    val near = base.updated(3, "CHANGED")
    val far = (1 to 40).map(i => s"v$i")
    val df = Seq(base, near, far).toDF("words")
    val hs = df.select(SimHash64(col("words"))).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) < ham(hs(0), hs(2)),
      "one-word edit must be closer than a disjoint vocabulary")
  }
}
