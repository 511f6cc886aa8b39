package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Every declared query must at least ANALYZE against the real tables —
  * catches unresolved columns, type mismatches and broken oracle plumbing in
  * `sbt test`, minutes before the driver's full execution gate would. Plan
  * analysis only (no jobs), so the whole registry checks in seconds; the
  * flagship entry() additionally executes (the driver's rows>0 smoke).
  */
class RegistrySmokeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("every declared query analyzes; oracles exist for the hash-checked set") {
    val failures = Registry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        q.fn(spark, sf).queryExecution.analyzed // force analysis, run nothing
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
      // "no jobs" has one exception: ScalableWindow queries pin their slice
      // assignment EAGERLY at plan-construction time — free those here
      finally graft.ops.Pins.releaseAll()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // 6 hash-specific ops are rows-only by design; everything else carries
    // SQL (s_embed_neardup graduated to a planted full oracle in round 8,
    // as did the jaccard=1 twin d_minhash_exact; d_minhash_lsh/d_simhash's
    // probabilistic operating points remain spec-pinned instead; s_ann_pq
    // joined in round 9 with its ADC-floor planted twin s_ann_pq_planted)
    val noOracle = Registry.all.collect { case (n, q) if q.oracle.isEmpty => n }.toSeq.sorted
    assert(noOracle == Seq("d_minhash_lsh", "d_simhash", "q_approx_distinct",
      "s_ann_ivf", "s_ann_lsh", "s_ann_pq"),
      s"rows-only set changed — intentional? $noOracle")
  }

  test("flagship entry() executes and returns rows (the driver's smoke check)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
