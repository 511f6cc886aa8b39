package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Rewrites a GLOBAL rank-family window — `row_number()/rank()/dense_rank()
  * OVER (ORDER BY … )` with no PARTITION BY — into the two-phase
  * range-partitioned plan of [[graft.ops.ScalableWindow]], applied
  * automatically to ad-hoc SQL/DataFrame queries in a
  * [[GraftExtensions]] session. The vanilla plan funnels every row through
  * ONE task (WindowExec requires SinglePartition when the partition spec is
  * empty) — the per-query serialization point that turns a 1000-executor
  * cluster into one core; the registry avoids it by calling ScalableWindow
  * explicitly, and this rule extends the same discipline to queries the
  * library never sees ahead of time.
  *
  * Shape: range-partition by the order keys and tag rows with
  * `spark_partition_id()`; run the window WITHIN each slice (full
  * parallelism); compute each slice's contribution (row count; for
  * dense_rank the max local dense rank = its distinct-key count) in a
  * second branch over the SAME range-partition subtree; prefix-sum that
  * partition-count-sized table with a window ORDER BY slice id (bounded by
  * the partition count, not the data); broadcast-join the offsets back and
  * add. Ties never span slices (the range partitioner routes equal keys
  * together), so rank/dense_rank are exact for non-total orders too;
  * row_number tie-breaking is partitioning-dependent exactly as the
  * single-reducer plan's is task-order-dependent.
  *
  * Branch consistency without a checkpoint: the two branches' range
  * exchanges are built structurally identical (the offsets branch is a
  * fresh-exprId copy), so they CANONICALIZE equal and Spark's exchange
  * reuse — a deterministic canonical-plan map lookup, in both the AQE
  * stage cache and the non-AQE ReuseExchange rule — executes ONE shuffle
  * that both branches read. Slice ids and range boundaries are therefore
  * facts shared by both branches, the property
  * [[graft.ops.ScalableWindow]] gets from its pinned materialization. The
  * rule only fires when `spark.sql.exchangeReuseEnabled` is on (it is by
  * default); with reuse off the rewrite would sample range boundaries
  * twice, so the plan is left alone instead.
  */
case class GlobalWindowRewrite() extends Rule[LogicalPlan] {

  private val PID = "__graft_pid"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.exchangeReuseEnabled) return plan
    val np = SQLConf.get.numShufflePartitions
    if (np <= 1) return plan
    plan.transformUp {
      case w @ Window(exprs, Seq(), order, child, _)
          if order.nonEmpty && !referencesPid(order) &&
            exprs.forall(supported) && freshenable(child) =>
        rewrite(w, exprs, order, child, np)
    }
  }

  private def referencesPid(order: Seq[SortOrder]): Boolean =
    order.exists(_.references.exists(_.name == PID))

  /** Supported: the rank family (frame ignored), and running SUM/COUNT —
    * an unbounded-preceding..current frame, ROWS or RANGE (RANGE is the
    * analyzer's default for aggregates with ORDER BY; its peer groups
    * never span slices under range partitioning, so slice-local RANGE +
    * earlier-slice totals reproduces it exactly). DISTINCT and FILTER
    * forms don't decompose into prefix sums — left alone. */
  private def supported(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(fn, WindowSpecDefinition(Seq(), _, frame)), _) =>
      fn match {
        case _: RowNumber | _: Rank | _: DenseRank => true
        case AggregateExpression(_: Sum | _: Count, Complete, false, None, _) =>
          frame match {
            case SpecifiedWindowFrame(RowFrame | RangeFrame,
              UnboundedPreceding, CurrentRow) => true
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  /** The offsets branch is a fresh-exprId COPY of the data subtree (two
    * branches of a join cannot share output attributes post-analysis).
    * Only plans whose every attribute-producing node we know how to re-id
    * are rewritten: leaves that are [[MultiInstanceRelation]] and the
    * alias-carrying Project/Aggregate/Window. Anything else (Generate,
    * Expand, subquery expressions, …) bails the rule — the query keeps its
    * vanilla plan rather than risk a broken copy. */
  private def freshenable(plan: LogicalPlan): Boolean = {
    val nodesOk = plan.collect {
      case p if !okNode(p) => p
    }.isEmpty
    nodesOk && !plan.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[PlanExpression[_]])))
  }

  private def okNode(p: LogicalPlan): Boolean = p match {
    case _: MultiInstanceRelation => true
    case _: Project | _: Aggregate | _: Window | _: Filter | _: Sort |
         _: Join | _: SubqueryAlias | _: RepartitionByExpression |
         _: Repartition | _: GlobalLimit | _: LocalLimit | _: Distinct |
         _: Union => true
    case _ => false
  }

  private def freshen(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithNewOutput {
      case m: MultiInstanceRelation =>
        val fresh = m.newInstance()
        fresh -> m.asInstanceOf[LogicalPlan].output.zip(fresh.output)
      case p: Project if p.projectList.exists(_.isInstanceOf[Alias]) =>
        val fresh = Project(p.projectList.map(reAlias), p.child)
        fresh -> changedPairs(p.output, fresh.output)
      case a: Aggregate if a.aggregateExpressions.exists(_.isInstanceOf[Alias]) =>
        val fresh = a.copy(aggregateExpressions = a.aggregateExpressions.map(reAlias))
        fresh -> changedPairs(a.output, fresh.output)
      case w: Window if w.windowExpressions.exists(_.isInstanceOf[Alias]) =>
        val fresh = w.copy(windowExpressions = w.windowExpressions.map(reAlias))
        fresh -> changedPairs(w.output, fresh.output)
    }

  private def reAlias(e: NamedExpression): NamedExpression = e match {
    case a: Alias =>
      Alias(a.child, a.name)(qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    case other => other
  }

  private def changedPairs(old: Seq[Attribute], fresh: Seq[Attribute]) =
    old.zip(fresh).filter { case (o, n) => o.exprId != n.exprId }

  private def runningFrame: SpecifiedWindowFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1))

  private def rewrite(w: Window, exprs: Seq[NamedExpression],
      order: Seq[SortOrder], child: LogicalPlan, np: Int): LogicalPlan = {
    val needDense = exprs.exists {
      case Alias(WindowExpression(_: DenseRank, _), _) => true; case _ => false
    }
    val needCount = exprs.exists {
      case Alias(WindowExpression(_: RowNumber | _: Rank, _), _) => true
      case _ => false
    }

    // ---- shared shape: range partition + slice id (built twice, with
    // fresh ids on the offsets branch; exchange reuse runs it once)
    def sliced(c: LogicalPlan, os: Seq[SortOrder]): (LogicalPlan, Attribute) = {
      val repart = RepartitionByExpression(os, c, Some(np), None)
      val pidAlias = Alias(SparkPartitionID(), PID)()
      val proj = Project(c.output :+ pidAlias, repart)
      (proj, pidAlias.toAttribute)
    }

    // ---- left branch: slice-local window, one expr per original function,
    // keeping each aggregate's ORIGINAL frame (its RANGE peer groups never
    // span slices under range partitioning)
    val (base, pid) = sliced(child, order)
    val localAliases = exprs.zipWithIndex.map { case (e, i) =>
      val we = e.asInstanceOf[Alias].child.asInstanceOf[WindowExpression]
      val frame = we.windowFunction match {
        case _: AggregateExpression =>
          we.windowSpec.frameSpecification
        case _ => SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
      }
      Alias(WindowExpression(we.windowFunction,
        WindowSpecDefinition(Seq(pid), order, frame)), s"__graft_loc_$i")()
    }
    val localWin = Window(localAliases, Seq(pid), order, base)

    // ---- right branch: per-slice totals (count / max local dense rank /
    // the slice total of each running aggregate), then the prefix-sum
    // offsets over the partition-count-sized table
    val childR = freshen(child)
    def remap(expr: Expression): Expression = expr.transform {
      case a: Attribute =>
        val i = child.output.indexWhere(_.exprId == a.exprId)
        if (i >= 0) childR.output(i) else a
    }
    val orderR = order.map(o => remap(o).asInstanceOf[SortOrder])
    val (baseR, pidR) = sliced(childR, orderR)
    val (aggInput, denseLocAttr) =
      if (!needDense) (baseR, None)
      else {
        val dl = Alias(WindowExpression(DenseRank(orderR.map(_.child)),
          WindowSpecDefinition(Seq(pidR), orderR,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          "__graft_locd")()
        (Window(Seq(dl), Seq(pidR), orderR, baseR), Some(dl.toAttribute))
      }
    val nAlias =
      if (!needCount) None
      else Some(Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
        isDistinct = false), "__graft_n")())
    val dAlias = denseLocAttr.map(dl => Alias(AggregateExpression(
      Max(dl), Complete, isDistinct = false), "__graft_d")())
    // one slice-total column per running aggregate: the SAME Sum/Count over
    // the slice's rows (remapped to the copy's attributes)
    val tAliases: Seq[Option[Alias]] = exprs.zipWithIndex.map {
      case (e, i) => e.asInstanceOf[Alias].child
          .asInstanceOf[WindowExpression].windowFunction match {
        case AggregateExpression(f, _, _, _, _) =>
          Some(Alias(AggregateExpression(
            remap(f).asInstanceOf[aggregate.AggregateFunction],
            Complete, isDistinct = false), s"__graft_t$i")())
        case _ => None
      }
    }
    val perSlice = Aggregate(Seq(pidR),
      Seq(pidR) ++ nAlias ++ dAlias ++ tAliases.flatten, aggInput, None)

    def prefix(src: Attribute, name: String): Alias =
      Alias(WindowExpression(
        AggregateExpression(Sum(src), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(), Seq(SortOrder(pidR, Ascending)), runningFrame)),
        name)()
    val offN = nAlias.map(n => prefix(n.toAttribute, "__graft_offn"))
    val offD = dAlias.map(d => prefix(d.toAttribute, "__graft_offd"))
    val offT = tAliases.zipWithIndex.map {
      case (Some(t), i) => Some(prefix(t.toAttribute, s"__graft_offt$i"))
      case (None, _) => None
    }
    // this window ORDERS BY the slice id over one row per slice — bounded
    // by the partition count, not the data — and its PID order key is what
    // exempts it from this very rule
    val offAliases = offN.toSeq ++ offD ++ offT.flatten
    val offWin = Window(offAliases, Seq(), Seq(SortOrder(pidR, Ascending)), perSlice)
    val offsets = Project(pidR +: offAliases.map(_.toAttribute), offWin)

    // ---- broadcast the offsets back; add, preserving original output ids
    val joined = Join(localWin, offsets, Inner,
      Some(EqualTo(pid, pidR)),
      JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
    val finals = exprs.zipWithIndex.map { case (e, i) =>
      val a = e.asInstanceOf[Alias]
      val loc = localAliases(i).toAttribute
      val combined = a.child.asInstanceOf[WindowExpression].windowFunction match {
        case _: DenseRank =>
          Cast(Add(Cast(loc, LongType),
            Coalesce(Seq(offD.get.toAttribute, Literal(0L)))), IntegerType)
        case _: RowNumber | _: Rank =>
          Cast(Add(Cast(loc, LongType),
            Coalesce(Seq(offN.get.toAttribute, Literal(0L)))), IntegerType)
        case AggregateExpression(_: Count, _, _, _, _) =>
          Add(loc, Coalesce(Seq(offT(i).get.toAttribute, Literal(0L))))
        case AggregateExpression(_: Sum, _, _, _, _) =>
          // SUM is null only when every value so far is null — a row whose
          // slice-local prefix is all-null still inherits earlier slices'
          // total (see ScalableWindow.runningSum)
          val off = offT(i).get.toAttribute
          If(And(IsNull(loc), IsNull(off)), Literal(null, a.dataType),
            Cast(Add(Coalesce(Seq(loc, Literal.default(loc.dataType))),
              Coalesce(Seq(off, Literal.default(off.dataType)))), a.dataType))
      }
      Alias(combined, a.name)(exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    }
    Project(child.output ++ finals, joined)
  }
}
