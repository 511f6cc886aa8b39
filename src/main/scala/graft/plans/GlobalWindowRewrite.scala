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
            exprs.forall(isRankFamily) && freshenable(child) =>
        rewrite(w, exprs, order, child, np)
    }
  }

  private def referencesPid(order: Seq[SortOrder]): Boolean =
    order.exists(_.references.exists(_.name == PID))

  private def isRankFamily(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(fn, WindowSpecDefinition(Seq(), _, _)), _) =>
      fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank] || fn.isInstanceOf[DenseRank]
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

    // ---- shared shape: range partition + slice id (built twice, with
    // fresh ids on the offsets branch; exchange reuse runs it once)
    def sliced(c: LogicalPlan, os: Seq[SortOrder]): (LogicalPlan, Attribute) = {
      val repart = RepartitionByExpression(os, c, Some(np), None)
      val pidAlias = Alias(SparkPartitionID(), PID)()
      val proj = Project(c.output :+ pidAlias, repart)
      (proj, pidAlias.toAttribute)
    }

    // ---- left branch: slice-local window, one expr per original function
    val (base, pid) = sliced(child, order)
    val localAliases = exprs.zipWithIndex.map { case (e, i) =>
      val fn = e.asInstanceOf[Alias].child.asInstanceOf[WindowExpression].windowFunction
      Alias(WindowExpression(fn,
        WindowSpecDefinition(Seq(pid), order,
          fn.asInstanceOf[WindowFunction] match {
            case f: FrameLessOffsetWindowFunction => f.frame
            case _ => SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
          })), s"__graft_loc_$i")()
    }
    val localWin = Window(localAliases, Seq(pid), order, base)

    // ---- right branch: per-slice counts (and max local dense rank), then
    // the prefix-sum offsets over the partition-count-sized table
    val childR = freshen(child)
    val orderR = order.map(_.transform {
      case a: Attribute =>
        val i = child.output.indexWhere(_.exprId == a.exprId)
        if (i >= 0) childR.output(i) else a
    }.asInstanceOf[SortOrder])
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
    val nAlias = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "__graft_n")()
    val dAlias = denseLocAttr.map(dl => Alias(AggregateExpression(
      Max(dl), Complete, isDistinct = false), "__graft_d")())
    val perSlice = Aggregate(Seq(pidR), Seq(pidR, nAlias) ++ dAlias, aggInput, None)

    def prefix(src: Attribute, name: String): Alias =
      Alias(WindowExpression(
        AggregateExpression(Sum(Cast(src, LongType)), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(), Seq(SortOrder(pidR, Ascending)), runningFrame)),
        name)()
    val offN = prefix(nAlias.toAttribute, "__graft_offn")
    val offD = dAlias.map(d => prefix(d.toAttribute, "__graft_offd"))
    // this window ORDERS BY the slice id over one row per slice — bounded
    // by the partition count, not the data — and its PID order key is what
    // exempts it from this very rule
    val offWin = Window(Seq(offN) ++ offD, Seq(),
      Seq(SortOrder(pidR, Ascending)), perSlice)
    val offsets = Project(Seq(pidR, offN.toAttribute) ++ offD.map(_.toAttribute), offWin)

    // ---- broadcast the offsets back; add, preserving original output ids
    val joined = Join(localWin, offsets, Inner,
      Some(EqualTo(pid, pidR)),
      JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
    val finals = exprs.zipWithIndex.map { case (e, i) =>
      val a = e.asInstanceOf[Alias]
      val isDense = a.child.asInstanceOf[WindowExpression]
        .windowFunction.isInstanceOf[DenseRank]
      val off = if (isDense) offD.get.toAttribute else offN.toAttribute
      Alias(Cast(Add(Cast(localAliases(i).toAttribute, LongType),
        Coalesce(Seq(off, Literal(0L)))), IntegerType), a.name)(
        exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    }
    Project(child.output ++ finals, joined)
  }
}
