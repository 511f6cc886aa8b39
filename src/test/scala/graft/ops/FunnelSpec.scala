package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Edge semantics for [[Funnel.earliestChain]] — the oracle query (e_funnel)
  * proves the chain against an independent multi-join derivation at corpus
  * scale; these fixtures pin the strictness rules on hand-built logs.
  */
class FunnelSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def log(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.earliestChain(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toSeq

  test("funnel: earliest chain, out-of-arrival-order input, non-step events ignored") {
    // user 1 completes; the later view (50) must NOT displace the first (10),
    // and the click at 5 (before any view) must not count; 'error' is noise
    val got = run(log(
      (1L, 40L, "purchase"), (1L, 5L, "click"), (1L, 10L, "view"),
      (1L, 20L, "click"), (1L, 50L, "view"), (1L, 15L, "error"),
      (2L, 10L, "click"), (2L, 20L, "purchase")))
    assert(got == Seq(
      (1L, 3L, Some(10L), Some(20L), Some(40L)),
      (2L, 0L, None, None, None)))
  }

  test("funnel: equal timestamps do not satisfy the strictly-after rule") {
    val got = run(log(
      (1L, 10L, "view"), (1L, 10L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 11L, "click"), (2L, 11L, "purchase")))
    // user 1: click at the view's exact micro -> step 2 unfilled, and the
    // purchase cannot fill step 3 past an unfilled step 2
    // user 2: purchase at the click's exact micro -> stops at 2
    assert(got == Seq(
      (1L, 1L, Some(10L), None, None),
      (2L, 2L, Some(10L), Some(11L), None)))
  }

  test("funnel: a completed slot is never overwritten by a later cheaper chain") {
    // after completing at (10,20,30), a second full pass (40,50,60) arrives;
    // the reported chain stays the earliest
    val got = run(log(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (1L, 40L, "view"), (1L, 50L, "click"), (1L, 60L, "purchase")))
    assert(got == Seq((1L, 3L, Some(10L), Some(20L), Some(30L))))
  }
}
