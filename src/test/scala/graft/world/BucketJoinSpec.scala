package graft.world

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Co-located joins via bucketed tables: the big fact-fact join
  * (orders x lineitem on orderkey) pre-bucketed on the join key joins with
  * NO shuffle exchange on either side — at 100 TB this is the difference
  * between a network-bound job and a local merge.
  */
class BucketJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val warehouse = Files.createTempDirectory("graft-warehouse").toString
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed fact-fact join plans without shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side: no Exchange below the SMJ
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected sort-merge join:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // correctness: same counts as the unbucketed join
    val direct = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").count().count()
    assert(joined.count() == direct)
  }
}
