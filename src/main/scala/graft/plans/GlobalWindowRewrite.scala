package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import org.apache.spark.sql.types.DoubleType

/** Rewrites a GLOBAL rank-family / distribution / running-aggregate
  * window — `row_number()/rank()/dense_rank()/ntile()/percent_rank()/
  * cume_dist()/sum()/count()/min()/max()/avg() OVER (ORDER BY …)` with
  * no PARTITION BY — onto [[ScalableWindowPlan]], applied automatically to
  * ad-hoc SQL/DataFrame queries in a [[GraftExtensions]] session. The
  * vanilla plan funnels every row through ONE task (WindowExec requires
  * SinglePartition when the partition spec is empty) — the serialization
  * point that turns a 1000-executor cluster into one core; the library's
  * registry avoids it by calling [[graft.ops.ScalableWindow]] explicitly,
  * and this rule extends the same discipline to queries the library never
  * sees ahead of time.
  *
  * The replacement is a single custom operator ([[ScalableWindowExec]])
  * that owns its shuffle: boundaries sampled once, shuffle written once,
  * per-slice totals and output computed from the same shuffle files. An
  * earlier design expressed the two phases as a logical self-join of a
  * range-repartition subtree and leaned on exchange reuse for branch
  * consistency — unsound in practice, because per-branch column pruning
  * reaches the physical scans and diverges the exchanges, leaving two
  * independently-sampled partitionings (verified empirically). A physical
  * operator has no second branch to diverge.
  */
case class GlobalWindowRewrite() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case Window(exprs, Seq(), order, child, _)
          if exprs.nonEmpty && order.nonEmpty && exprs.forall(supported) &&
            !(exprs.exists(isOffsetFn) && exprs.exists(peerBuffered)) =>
        // exprs.nonEmpty: an empty Window is RemoveNoopOperators' to delete,
        // not ours to shuffle (forall is vacuously true on Nil).
        // The offset/peer-buffer exclusion keeps LEAD's bounded lookahead
        // confined to the exec's streaming path (mixing LAG/LEAD with
        // CUME_DIST or a RANGE-framed aggregate in ONE window is left
        // vanilla — under the verified total order RANGE peers are single
        // rows anyway, so nothing of value is lost).
        // The custom node stores (attribute, bare function tree) pairs —
        // top-level aliases would be stripped by CleanupAliases' default
        // case for unknown node types (see ScalableWindowPlan's scaladoc)
        ScalableWindowPlan(exprs.map(_.toAttribute),
          exprs.map(_.asInstanceOf[Alias].child), order, child)
    }

  private def isOffsetFn(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: Lag | _: Lead, _), _) => true
    case _ => false
  }

  private def peerBuffered(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: CumeDist, _), _) => true
    case Alias(WindowExpression(fn, WindowSpecDefinition(_, _,
        SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow))), _) =>
      fn.isInstanceOf[AggregateExpression]
    case _ => false
  }

  /** Supported: the rank family (frame ignored), and running
    * SUM/COUNT/MIN/MAX/AVG — an unbounded-preceding..current frame, ROWS
    * or RANGE (RANGE is the
    * analyzer's default for aggregates with ORDER BY; its peer groups
    * never span slices under range partitioning and the exec buffers one
    * tie group at a time). DISTINCT and FILTER forms don't decompose into
    * prefix aggregates — left on the vanilla plan. SUM is restricted to
    * long/double/decimal results in LEGACY or ANSI mode: Spark 4's Sum
    * also produces ANSI intervals (the exec's typed adder doesn't), and
    * try_sum's on-overflow-null doesn't decompose into prefix sums.
    *
    * Floating-point caveat (SUM and AVG over DoubleType): the exec merges
    * slice-local prefixes with per-slice totals, a different addition
    * GROUPING than vanilla's strict left fold — the same values in the
    * same order, reassociated. Long and decimal sums are exact either
    * way; double results can differ from vanilla in the last ulps, the
    * inherent price of ANY distributed prefix sum (Spark's own groupBy
    * SUM reassociates identically across partial aggregates).
    *
    * LAG/LEAD are routed only under the OPT-IN session conf
    * `spark.graft.window.assumeTotalOrder=true`: their cross-slice donor
    * handoff is only sound when the order is TOTAL — with ties, the donor
    * values collected in one read of the shuffle can correspond to a
    * different tie permutation than the emission read, yielding results
    * consistent with NO single order (a worse failure mode than vanilla's
    * run-to-run nondeterminism). A rewrite cannot verify uniqueness
    * statically, so the contract is assert-then-CHECK: the caller asserts
    * via the conf, and [[ScalableWindowExec]] verifies it at runtime from
    * the totals job's distinct-key counts (free — it already computes
    * them) and fails loudly on ties instead of emitting corrupt results.
    * Offsets above [[ScalableWindowExec.MaxRoutedOffset]], ignoreNulls,
    * and non-literal offsets/defaults stay vanilla. The explicit
    * [[graft.ops.ScalableWindow.lag]]/[[graft.ops.ScalableWindow.lead]]
    * API remains the conf-free face with the documented
    * include-a-unique-tie-break contract. */
  private def supported(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(fn, WindowSpecDefinition(Seq(), _, frame)), _) =>
      def frameOk = frame match {
        case SpecifiedWindowFrame(RowFrame | RangeFrame,
          UnboundedPreceding, CurrentRow) => true
        case _ => false
      }
      fn match {
        case _: RowNumber | _: Rank | _: DenseRank => true
        // closed forms over the global row number / rank and the total row
        // count N (the exec's totals job already produces all three)
        case _: PercentRank | _: CumeDist => true
        case nt: NTile => nt.buckets match {
          case Literal(k: Int, _) => k > 0
          case _ => false
        }
        case AggregateExpression(s: Sum, Complete, false, None, _) =>
          val typeOk = s.dataType match {
            case org.apache.spark.sql.types.LongType |
                 org.apache.spark.sql.types.DoubleType |
                 (_: org.apache.spark.sql.types.DecimalType) => true
            case _ => false
          }
          typeOk && s.evalContext.evalMode != EvalMode.TRY && frameOk
        case AggregateExpression(_: Count, Complete, false, None, _) => frameOk
        // MIN/MAX are order-insensitive prefix aggregates over any orderable
        // type — the same slice-totals shape SUM rides
        case AggregateExpression(m: Min, Complete, false, None, _) =>
          RowOrdering.isOrderable(m.child.dataType) && frameOk
        case AggregateExpression(m: Max, Complete, false, None, _) =>
          RowOrdering.isOrderable(m.child.dataType) && frameOk
        // AVG = SUM/COUNT the exec already computes; DoubleType results only
        // (decimal AVG's precision/scale propagation and try_avg's
        // on-overflow-null stay on the vanilla plan)
        case AggregateExpression(a: Average, Complete, false, None, _) =>
          a.dataType == DoubleType && a.evalMode != EvalMode.TRY && frameOk
        case Lag(_, Literal(k: Int, _), _: Literal, false) =>
          assumeTotalOrder && k >= 1 && k <= ScalableWindowExec.MaxRoutedOffset
        case Lead(_, Literal(k: Int, _), _: Literal, false) =>
          assumeTotalOrder && k >= 1 && k <= ScalableWindowExec.MaxRoutedOffset
        case _ => false
      }
    case _ => false
  }

  private def assumeTotalOrder: Boolean =
    conf.getConfString("spark.graft.window.assumeTotalOrder", "false")
      .equalsIgnoreCase("true")
}
