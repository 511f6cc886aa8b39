package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class FeatureHashSpec extends AnyFunSuite {
  private def fh(text: String, n: Int, k: Int): Array[Long] =
    FeatureHash.compute(UTF8String.fromString(text), n, k)
      .toLongArray()

  test("bucket counts sum to the WordNgrams gram count (hash-invariant total)") {
    val texts = Seq("the fast key order sort", "a", "  one   two  ", "x y z w")
    for (t <- texts; n <- Seq(1, 2, 3); k <- Seq(8, 64)) {
      val grams = WordNgrams.compute(UTF8String.fromString(t), n).numElements()
      assert(fh(t, n, k).sum == grams.toLong,
        s"total for '$t' n=$n k=$k must equal gram count $grams")
    }
  }

  test("deterministic and case/whitespace-normalized like WordNgrams") {
    assert(fh("The  Fast KEY", 2, 32).toSeq == fh("the fast key", 2, 32).toSeq)
    assert(fh("same text here", 2, 32).toSeq == fh("same text here", 2, 32).toSeq)
  }

  test("different grams land in different buckets (k large enough)") {
    val a = fh("alpha beta", 2, 1024)
    val b = fh("gamma delta", 2, 1024)
    assert(a.sum == 1 && b.sum == 1)
    assert(a.indexWhere(_ > 0) != b.indexWhere(_ > 0),
      "two distinct bigrams should not collide in 1024 buckets")
  }

  test("codegen and interpreted paths agree in a real plan") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = Seq("the fast key order", "spark join scan").toDF("t")
    val viaPlan = df.select(FeatureHash(org.apache.spark.sql.functions.col("t"), 2, 16))
      .collect().map(_.getSeq[Long](0))
    val direct = Seq("the fast key order", "spark join scan")
      .map(s => fh(s, 2, 16).toSeq)
    assert(viaPlan.map(_.toSeq).toSeq == direct)
  }
}
