package graft.queries

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{
  GlobalLimit, LocalLimit, LogicalPlan, Sort, Window}
import org.apache.spark.sql.functions.{col, countDistinct, struct}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Registry-wide ORDER-KEY TOTALITY lint — the class of bug behind round
  * 14's one sf0.1 failure (`q_window_running`): a running aggregate whose
  * window ORDER BY admitted a tie between rows with DIFFERENT aggregated
  * values, so the output multiset depended on which tied row an engine
  * happened to order first. The sf0.01 gate was green only because that
  * scale contained no tie; 10x the data did.
  *
  * The lint executes, for every declared query, every ORDER-sensitive
  * subtree on the fixture and asserts the order is total-ENOUGH: the
  * (partition + order) key must FUNCTIONALLY DETERMINE the full input row
  * (ties allowed only between bit-identical rows, which no ordering can
  * distinguish). Checked shapes:
  *
  *   - Window nodes whose functions are tie-SENSITIVE: row_number / ntile /
  *     lead / lag / nth_value, and any aggregate over a ROWS frame (a
  *     running sum reads precisely "which rows precede me"). rank /
  *     dense_rank / percent_rank / cume_dist and RANGE-frame aggregates are
  *     peer-inclusive — ties cannot change their output — and are exempt.
  *   - ORDER BY ... LIMIT k boundaries (GlobalLimit over Sort): a tie
  *     spanning the cut keeps a nondeterministic subset.
  *
  * A uniqueness property proven on a small fixture does not prove it at
  * 10x, so the lint is deliberately stronger than "no ties at sf0.001": it
  * runs on the LARGEST fixture present on the machine (sf0.1 when
  * available, the same scale that exposed the r14 bug).
  */
class RegistryOrderTotalitySpec extends AnyFunSuite with BeforeAndAfterAll {
  // largest available fixture: the r14 tie existed at sf0.1 but not below
  private val sf = Seq("/root/testdata/sf0.1", "/root/testdata/sf0.01",
      "/root/testdata/sf0.001")
    .find(d => new java.io.File(d).isDirectory)
    .getOrElse("/root/testdata/sf0.001")

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tieSensitive(w: Window): Boolean = {
    if (w.orderSpec.isEmpty) false
    else w.windowExpressions.exists(_.exists {
      case we: WindowExpression =>
        we.windowFunction match {
          case _: Rank | _: DenseRank | _: PercentRank | _: CumeDist => false
          case _: AggregateExpression =>
            we.windowSpec.frameSpecification match {
              case SpecifiedWindowFrame(RowFrame, _, _) => true
              case _ => false // RANGE frames are peer-inclusive
            }
          case _ => true // row_number / ntile / lead / lag / nth_value / unknown
        }
      case _ => false
    })
  }

  /** keys functionally determine the full row: every key-group holds exactly
    * one DISTINCT row image (bit-identical duplicates are fine — no order
    * can tell them apart). Non-orderable columns (maps) are excluded from
    * the row image; they cannot participate in an ORDER BY either. */
  private def keyDeterminesRow(keys: Seq[Expression], child: LogicalPlan): Option[String] = {
    val cdf = GraftColumnBridge.ofRows(spark, child)
    val rowCols = child.output
      .filter(a => RowOrdering.isOrderable(a.dataType))
      .map(a => GraftColumnBridge.column(a))
    val keyCols = keys.map(GraftColumnBridge.column)
    val bad = cdf.groupBy(keyCols: _*)
      .agg(countDistinct(struct(rowCols: _*)).as("nd"))
      .filter(col("nd") > 1)
      .limit(1)
      .count()
    if (bad == 0) None
    else Some(s"order key ${keys.map(_.sql).mkString("(", ", ", ")")} admits a " +
      "tie between NON-identical rows — the output depends on engine order")
  }

  test(s"every tie-sensitive window / limited sort has a total order key ($sf)") {
    val violations = Registry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        // the OPTIMIZED plan: column pruning has already narrowed every
        // window/sort child to the columns actually CONSUMED above it, so
        // "key determines the child row" is exactly "ties are invisible to
        // the output" — e.g. w_topn_scan projects only its sort keys, and
        // the top-N multiset of key values is deterministic despite ties;
        // on the analyzed plan the unpruned payload columns would flag it
        val plan = q.fn(spark, sf).queryExecution.optimizedPlan
        // dedupe identical subtrees (the same window often appears twice
        // through self-joins); canonicalized form is the cache key
        val seen = scala.collection.mutable.Set.empty[LogicalPlan]
        val checks = scala.collection.mutable.Buffer.empty[(String, Seq[Expression], LogicalPlan)]
        plan.foreach {
          case w: Window if tieSensitive(w) && seen.add(w.canonicalized) =>
            checks += (("window", w.partitionSpec ++ w.orderSpec.map(_.child), w.child))
          case GlobalLimit(_, LocalLimit(_, s @ Sort(order, true, child, _)))
              if seen.add(s.canonicalized) =>
            checks += (("limit-boundary", order.map(_.child), child))
          case _ => ()
        }
        checks.flatMap { case (kind, keys, child) =>
          keyDeterminesRow(keys, child).map(msg => s"$name [$kind]: $msg")
        }
      } catch {
        case e: Throwable => Seq(s"$name: lint errored — ${e.getMessage.take(200)}")
      } finally graft.ops.Pins.releaseAll()
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
