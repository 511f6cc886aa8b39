package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Window}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Registry-wide scale discipline, checked STATICALLY on every declared
  * query's optimized plan (no execution): the three classic ways a
  * correct-at-sf0.01 plan dies at 100 TB are a cartesian product, a
  * no-PARTITION-BY window (every row through one task), and an interpreted
  * UDF in the scan path. Each rule admits the one shape that is legitimately
  * bounded:
  *   - a condition-less join is fine iff one side is a GLOBAL aggregate
  *     (<= 1 row: the broadcast-scalar pattern t_tfidf / ntile use) — plus
  *     the deliberate tiny-dims `q_cross_join`;
  *   - a global window is fine iff its input subtree was already reduced by
  *     an aggregate (ScalableWindow's per-slice offsets table: one row per
  *     slice, bounded by the partition count, not the data);
  *   - ScalaUDF is never fine (typed Aggregators don't appear as ScalaUDF;
  *     every kernel here is a native expression).
  * RegistrySmokeSpec proves the plans analyze; this proves they scale.
  */
class RegistryScaleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def isScalarAgg(p: LogicalPlan): Boolean = p.collectFirst {
    case a: Aggregate if a.groupingExpressions.isEmpty => a
  }.isDefined

  private def hasReducingAgg(p: LogicalPlan): Boolean = p.collectFirst {
    case a: Aggregate => a
  }.isDefined

  test("every declared query plan is cartesian-free, single-reducer-window-free, UDF-free") {
    val allowCartesian = Set("q_cross_join") // deliberate tiny-dims demo
    val violations = Registry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan = q.fn(spark, sf).queryExecution.optimizedPlan
      val bad = scala.collection.mutable.Buffer.empty[String]
      plan.foreach {
        case j: Join if j.condition.isEmpty &&
            !allowCartesian(name) &&
            !j.children.exists(isScalarAgg) =>
          bad += s"$name: condition-less join with no scalar-aggregate side"
        case w: Window if w.partitionSpec.isEmpty &&
            !hasReducingAgg(w.child) =>
          bad += s"$name: global window over unreduced data (single-reducer WindowExec)"
        case _ => ()
      }
      val udfs = plan.collect { case p =>
        p.expressions.filter(_.exists { case _: ScalaUDF => true; case _ => false })
      }.flatten
      if (udfs.nonEmpty) bad += s"$name: ScalaUDF in plan"
      bad
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
