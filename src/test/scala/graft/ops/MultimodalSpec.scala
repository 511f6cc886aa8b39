package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("frame sampling: strided fixed-size frames with per-frame features") {
    import spark.implicits._
    // 10-byte payload, 4-byte frames, stride 2 -> frames 0 and 2 sampled
    // (frame 2 is the 2-byte tail)
    val payload = "aaaabbbbcc"
    val media = Seq(Multimodal.MediaRow(7L, payload.getBytes("UTF-8"), "text/plain")).toDS()
    val got = Multimodal.fakeFrameSample(spark, media, frameBytes = 4, stride = 2)
      .collect().map(f => (f.frame_idx, f.n_bytes)).toList.sorted
    assert(got == List((0L, 4L), (2L, 2L)))
  }

  test("poolFeatures: average-pooled buckets match hand computation") {
    import spark.implicits._
    val v = (1 to 8).map(_.toFloat) // pool 8 -> 2: (1+2+3+4)/4=2.5, (5+6+7+8)/4=6.5
    val got = Seq(Tuple1(v)).toDF("f")
      .select(Multimodal.poolFeatures(col("f"), 8, 2).as("p"))
      .as[Seq[Double]].head()
    assert(got == Seq(2.5, 6.5))
  }
}
