package graft.plans

import org.apache.spark.RangePartitioner
import org.apache.spark.rdd.{RDD, ShuffledRDD}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graft.GraftSparkErrors
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.SparkStrategy

/** Logical carrier for a GLOBAL rank-family / running-aggregate window that
  * [[GlobalWindowRewrite]] lifted off the single-reducer plan. The original
  * aliases are NOT stored as aliases: the optimizer's CleanupAliases
  * default case strips top-level aliases from any node type it doesn't
  * special-case, which would corrupt the expression list. Instead the node
  * carries the original output ATTRIBUTES (alias-trim is a no-op on an
  * attribute, while attribute-rewriting rules still remap them
  * consistently) alongside the bare [[WindowExpression]] trees, paired by
  * position. Downstream references resolve unchanged because the
  * attributes keep the original exprIds. */
case class ScalableWindowPlan(
    windowOutput: Seq[Attribute],
    windowFunctions: Seq[Expression],
    orderSpec: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(windowOutput.length == windowFunctions.length)
  override def output: Seq[Attribute] = child.output ++ windowOutput
  override def producedAttributes: AttributeSet = AttributeSet(windowOutput)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): ScalableWindowPlan =
    copy(child = c)
}

object ScalableWindowStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ScalableWindowPlan(outAttrs, fns, order, child) =>
      ScalableWindowExec(outAttrs, fns, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

private[plans] object ScalableWindowExec {

  /** One tag per window expression; expressions inside are BOUND to the
    * child's output ordinals. Top-level (not inner) classes so shipping
    * them to executors doesn't drag the whole SparkPlan along. */
  sealed trait WinKind extends Serializable
  case object RowNum extends WinKind
  case object RankK extends WinKind
  case object DenseK extends WinKind
  /** Closed forms over the global position and total row count N. */
  case object PctRankK extends WinKind
  case object CumeDistK extends WinKind
  final case class NTileK(buckets: Int) extends WinKind
  final case class SumK(value: Expression, resultType: DataType,
      rangeFrame: Boolean, ansi: Boolean) extends WinKind
  final case class CountK(values: Seq[Expression],
      rangeFrame: Boolean) extends WinKind
  /** MIN/MAX are order-insensitive prefix aggregates over any orderable
    * type — the slice-totals shape SUM already rides. */
  final case class MinK(value: Expression, dt: DataType,
      rangeFrame: Boolean) extends WinKind
  final case class MaxK(value: Expression, dt: DataType,
      rangeFrame: Boolean) extends WinKind
  /** AVG decomposes into the SUM/COUNT pair the exec already computes;
    * restricted by the rewrite to DoubleType results (decimal AVG's
    * precision/scale propagation is vanilla's). State = (sum, n). */
  final case class AvgK(value: Expression, rangeFrame: Boolean) extends WinKind
  /** LAG/LEAD under the caller-asserted (and runtime-VERIFIED) total
    * order: the totals job collects each slice's first/last k values, the
    * driver assembles per-slice boundary donors, and emission reads k rows
    * back (a bounded deque) or k rows ahead (a bounded lookahead).
    * `default` is the Literal's internal-format value. Only routed when
    * [[GlobalWindowRewrite]] saw `spark.graft.window.assumeTotalOrder`;
    * the exec still CHECKS the assertion — per-slice distinct-key counts
    * fall out of the totals job, and RangePartitioner never splits equal
    * keys across slices, so ties anywhere make sum(keys) < sum(rows) and
    * the query fails loudly instead of emitting values consistent with no
    * single tie permutation. */
  final case class LagK(value: Expression, k: Int, default: Any) extends WinKind
  final case class LeadK(value: Expression, k: Int, default: Any) extends WinKind

  /** Offsets past this stay on the vanilla plan: donor state is
    * slices x k values on the driver, and a screen-sized offset is the
    * realistic ceiling for boundary handoff (vanilla buffers the same k
    * rows but in its one global task). */
  val MaxRoutedOffset: Int = 1024

  /** Typed, null-aware addition in the Sum's RESULT type (null = no value
    * yet; SUM of nothing is null). ANSI long addition overflows loudly via
    * addExact, matching the vanilla window's error; decimal accumulates
    * exactly (unbounded) and is precision-checked at EMISSION by
    * [[emitSum]], matching vanilla's per-row CheckOverflow placement. */
  def plus(resultType: DataType, ansi: Boolean, a: Any, b: Any): Any =
    if (a == null) b
    else if (b == null) a
    else resultType match {
      case LongType =>
        if (ansi) {
          // error-classed ARITHMETIC_OVERFLOW with the try/config hint,
          // matching the error shape vanilla WindowExec's Sum raises (a bare
          // ArithmeticException here was a user-visible divergence)
          try Math.addExact(a.asInstanceOf[Long], b.asInstanceOf[Long])
          catch { case _: ArithmeticException =>
            throw GraftSparkErrors.arithmeticOverflow("long overflow", "try_sum")
          }
        } else a.asInstanceOf[Long] + b.asInstanceOf[Long]
      case DoubleType => a.asInstanceOf[Double] + b.asInstanceOf[Double]
      case _: DecimalType => a.asInstanceOf[Decimal] + b.asInstanceOf[Decimal]
      case other => throw new IllegalStateException(s"unsupported sum type $other")
    }

  /** The per-row output form of a running sum: decimals are checked
    * against the declared result precision here — null on overflow in
    * legacy mode, an arithmetic error in ANSI — exactly where the vanilla
    * plan places CheckOverflow. */
  def emitSum(resultType: DataType, ansi: Boolean, v: Any): Any =
    resultType match {
      case dt: DecimalType if v != null =>
        // fits iff |value| < 10^(p-s); accumulation preserved the result
        // scale (all inputs carry it), so only the integral width can grow
        val d = v.asInstanceOf[Decimal]
        if (d.toBigDecimal.abs < BigDecimal(10).pow(dt.precision - dt.scale)) d
        // vanilla CheckOverflow's error class (NUMERIC_VALUE_OUT_OF_RANGE)
        else if (ansi) throw GraftSparkErrors.decimalPrecisionOverflow(
          d, dt.precision, dt.scale)
        else null
      case _ => v
    }

  /** The evaluated Sum input widened to the Sum's result type. */
  def widen(resultType: DataType, v: Any): Any =
    if (v == null) null
    else resultType match {
      case LongType => v match {
        case x: Long => x; case x: Int => x.toLong
        case x: Short => x.toLong; case x: Byte => x.toLong
      }
      case DoubleType => v match {
        case x: Double => x; case x: Float => x.toDouble
      }
      case _: DecimalType => v.asInstanceOf[Decimal]
      case other => throw new IllegalStateException(s"unsupported sum type $other")
    }

  /** Per-expression prefix-aggregate plumbing: evaluate one row to a unit
    * state, merge two partial states (null = empty — SUM/MIN/MAX/AVG of
    * nothing is null, COUNT's finish maps it to 0), and finish a prefix
    * state into the output cell. Null for the rank family, which isn't an
    * aggregate. Built FRESH per task from the serializable [[WinKind]] spec
    * — the MIN/MAX interpreted orderings never cross the wire. */
  final class PrefixAgg(val unit: InternalRow => Any,
      val merge: (Any, Any) => Any,
      val finish: Any => Any)

  def prefixAggs(ks: Array[WinKind]): Array[PrefixAgg] = ks.map {
    case SumK(v, rt, _, ansi) => new PrefixAgg(
      r => widen(rt, v.eval(r)),
      (a, b) => plus(rt, ansi, a, b),
      x => emitSum(rt, ansi, x))
    case CountK(vs, _) => new PrefixAgg(
      r => if (vs.forall(_.eval(r) != null)) 1L else null,
      (a, b) => if (a == null) b else if (b == null) a
                else a.asInstanceOf[Long] + b.asInstanceOf[Long],
      x => if (x == null) 0L else x)
    case MinK(v, dt, _) =>
      val ord = TypeUtils.getInterpretedOrdering(dt)
      new PrefixAgg(r => copyVal(v.eval(r)),
        (a, b) => if (a == null) b else if (b == null) a
                  else if (ord.lteq(a, b)) a else b,
        x => x)
    case MaxK(v, dt, _) =>
      val ord = TypeUtils.getInterpretedOrdering(dt)
      new PrefixAgg(r => copyVal(v.eval(r)),
        (a, b) => if (a == null) b else if (b == null) a
                  else if (ord.gteq(a, b)) a else b,
        x => x)
    case AvgK(v, _) => new PrefixAgg(
      r => v.eval(r) match {
        case null => null
        case x: Double => (x, 1L)
        case x: Float => (x.toDouble, 1L)
        case x: Long => (x.toDouble, 1L)
        case x: Int => (x.toDouble, 1L)
        case x: Short => (x.toDouble, 1L)
        case x: Byte => (x.toDouble, 1L)
      },
      (a, b) => if (a == null) b else if (b == null) a else {
        val (s1, n1) = a.asInstanceOf[(Double, Long)]
        val (s2, n2) = b.asInstanceOf[(Double, Long)]
        (s1 + s2, n1 + n2)
      },
      x => if (x == null) null
           else { val (s, n) = x.asInstanceOf[(Double, Long)]; s / n })
    case _ => null
  }

  /** MIN/MAX states can outlive the row they were evaluated on, and on the
    * tie-group-buffered path that row is a REUSED spill-reader buffer —
    * buffer-backed values must be detached before they enter the state.
    * Primitives (and Decimal, which materializes on read) pass through. */
  private def copyVal(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case r: InternalRow => r.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case x => x
  }

  /** Peer-inclusive (RANGE-framed) aggregate kinds force the tie-group
    * buffer; ROWS-framed ones stream. */
  def isRangeAgg(k: WinKind): Boolean = k match {
    case SumK(_, _, r, _) => r
    case CountK(_, r) => r
    case MinK(_, _, r) => r
    case MaxK(_, _, r) => r
    case AvgK(_, r) => r
    case _ => false
  }

  /** Per-slice totals: (rowCount, distinctKeys, per-expr slot: the slice's
    * merged prefix-aggregate state — or, for LAG/LEAD kinds, the slice's
    * boundary values: last k for LAG, first k for LEAD, in slice order, as
    * `Array[Any]`). Order-insensitive except distinctKeys, which only needs
    * SORTED input (the shuffle read provides it) — tie permutations cannot
    * change it; the LAG/LEAD slots additionally need a TOTAL order, which
    * the driver verifies from these very counts before using them. */
  def sliceTotals(ks: Array[WinKind], aggs: Array[PrefixAgg],
      ordering: Ordering[InternalRow],
      it: Iterator[(InternalRow, Null)]): (Long, Long, Array[Any]) = {
    var nRows = 0L
    var nKeys = 0L
    var prev: InternalRow = null
    val slots = new Array[Any](aggs.length)
    it.foreach { kv =>
      val row = kv._1
      nRows += 1L
      if (prev == null || ordering.compare(prev, row) != 0) nKeys += 1L
      prev = row
      var i = 0
      while (i < aggs.length) {
        if (aggs(i) != null) slots(i) = aggs(i).merge(slots(i), aggs(i).unit(row))
        else ks(i) match {
          case LagK(v, k, _) =>
            // ring of the slice's LAST k values (donors for the next slice)
            val dq = { if (slots(i) == null)
                         slots(i) = new scala.collection.mutable.ArrayDeque[Any](k)
                       slots(i).asInstanceOf[scala.collection.mutable.ArrayDeque[Any]] }
            if (dq.size == k) dq.removeHead()
            dq.append(v.eval(row))
          case LeadK(v, k, _) =>
            // the slice's FIRST k values (donors for the previous slice)
            val dq = { if (slots(i) == null)
                         slots(i) = new scala.collection.mutable.ArrayDeque[Any](k)
                       slots(i).asInstanceOf[scala.collection.mutable.ArrayDeque[Any]] }
            if (dq.size < k) dq.append(v.eval(row))
          case _ => ()
        }
        i += 1
      }
    }
    // deques -> plain arrays for the collect back to the driver
    var i = 0
    while (i < ks.length) {
      ks(i) match {
        case _: LagK | _: LeadK if slots(i) != null =>
          slots(i) = slots(i)
            .asInstanceOf[scala.collection.mutable.ArrayDeque[Any]].toArray
        case _ => ()
      }
      i += 1
    }
    (nRows, nKeys, slots)
  }
}

/** Global window WITHOUT the single-reducer WindowExec, as ONE physical
  * operator that owns its shuffle — which is what makes it sound where a
  * pure logical two-branch rewrite is not:
  *
  *   - range boundaries are sampled ONCE (one RangePartitioner instance),
  *     so there is exactly one row→slice assignment;
  *   - the shuffle is written ONCE (one ShuffledRDD / ShuffleDependency);
  *     the per-slice totals job and the output job both read those same
  *     shuffle files (the scheduler skips the completed map stage on the
  *     second job — standard RDD shuffle reuse);
  *   - the totals job computes only ORDER-INSENSITIVE per-slice facts (row
  *     count, distinct-key count, sums, non-null counts), so shuffle-fetch
  *     order differences between the two reads cannot change anything; the
  *     output job's within-tie ordering is exactly as arbitrary as the
  *     vanilla single-reducer plan's.
  *
  * Supported functions (enforced by [[GlobalWindowRewrite]]'s eligibility):
  * ROW_NUMBER / RANK / DENSE_RANK; NTILE / PERCENT_RANK / CUME_DIST as
  * closed forms over the global position and total row count N (N falls
  * out of the totals job); and SUM / COUNT / MIN / MAX / AVG over an
  * unbounded-preceding..current-row frame — ROWS, or RANGE whose
  * peer-inclusive semantics are honored by buffering one tie group at a
  * time; and LAG/LEAD under the opt-in, runtime-verified total order (see
  * [[GlobalWindowRewrite]]). Most kinds stream one-in-one-out (no
  * buffering at all; LEAD keeps a k-row lookahead, LAG a k-value deque);
  * only CUME_DIST and RANGE-framed aggregates buffer, bounded by the
  * largest tie group, in the SAME spill-capable row array and under the
  * same thresholds as vanilla WindowExec — an ORDER BY over a
  * near-constant key degrades to vanilla's disk-backed behavior.
  *
  * Each output partition is one contiguous slice of the global order and
  * is sorted (spill-safe: sorting happens in the shuffle read's merge).
  * The node declares only the ORDERING, not a range partitioning — the
  * RangePartitioner may legitimately produce fewer partitions than
  * configured (few distinct sample keys), and a partitioning claim whose
  * partition count can disagree with the RDD's would be unsound.
  */
case class ScalableWindowExec(
    windowOutput: Seq[Attribute],
    windowFunctions: Seq[Expression],
    orderSpec: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {
  import ScalableWindowExec._

  override def output: Seq[Attribute] = child.output ++ windowOutput
  override def producedAttributes: AttributeSet = AttributeSet(windowOutput)

  override def outputPartitioning: Partitioning = UnknownPartitioning(0)
  override def outputOrdering: Seq[SortOrder] = orderSpec

  private def kinds: Array[WinKind] = windowFunctions.map { e =>
    val we = e.asInstanceOf[WindowExpression]
    val range = we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(RangeFrame, _, _) => true
      case _ => false
    }
    we.windowFunction match {
      case _: RowNumber => RowNum
      case _: Rank => RankK
      case _: DenseRank => DenseK
      case _: PercentRank => PctRankK
      case _: CumeDist => CumeDistK
      case nt: NTile => NTileK(nt.buckets.asInstanceOf[Literal].value.asInstanceOf[Int])
      case ae @ AggregateExpression(s: Sum, _, _, _, _) =>
        SumK(BindReferences.bindReference(s.child, child.output), ae.dataType,
          range, s.evalContext.evalMode == EvalMode.ANSI)
      case AggregateExpression(c: Count, _, _, _, _) =>
        CountK(c.children.map(BindReferences.bindReference(_, child.output)), range)
      case AggregateExpression(m: Min, _, _, _, _) =>
        MinK(BindReferences.bindReference(m.child, child.output),
          m.child.dataType, range)
      case AggregateExpression(m: Max, _, _, _, _) =>
        MaxK(BindReferences.bindReference(m.child, child.output),
          m.child.dataType, range)
      case AggregateExpression(a: Average, _, _, _, _) =>
        AvgK(BindReferences.bindReference(a.child, child.output), range)
      case lg: Lag =>
        LagK(BindReferences.bindReference(lg.input, child.output),
          lg.inputOffset.asInstanceOf[Literal].value.asInstanceOf[Int],
          lg.default.asInstanceOf[Literal].value)
      case ld: Lead =>
        LeadK(BindReferences.bindReference(ld.input, child.output),
          ld.offset.asInstanceOf[Literal].value.asInstanceOf[Int],
          ld.default.asInstanceOf[Literal].value)
      case other => throw new IllegalStateException(
        s"ScalableWindowExec: unsupported window function $other")
    }
  }.toArray

  override protected def doExecute(): RDD[InternalRow] = {
    val np = conf.numShufflePartitions
    val ks = kinds
    val hasOffsetKind = ks.exists {
      case _: LagK | _: LeadK => true; case _ => false
    }
    // the rewrite never mixes offset functions with peer-buffer kinds
    // (under the verified total order RANGE peers are single rows anyway);
    // the invariant keeps LEAD's lookahead confined to the streaming path
    require(!hasOffsetKind ||
      !(ks.exists(isRangeAgg) || ks.contains(CumeDistK)),
      "offset window functions cannot mix with peer-buffered kinds")
    val ordering = new LazilyGeneratedOrdering(orderSpec, child.output)
    implicit val ord: Ordering[InternalRow] = ordering

    // the full row is the shuffle key (the ordering reads its order
    // columns); rows must be copied out of the operator's reused buffers.
    // Serialization cost vs the vanilla exchange's UnsafeRowSerializer:
    // that serializer assumes dummy int keys with sorting done by the
    // exchange machinery, while this design needs real row keys for
    // setKeyOrdering's sorted merge (which is also what makes the two-job
    // shuffle reuse sound). The cost is bounded because child.execute()
    // emits UnsafeRows, whose Externalizable path writes the backing bytes
    // directly — per-row overhead is the object header, not field-by-field
    // reflection. The RangePartitioner's sample pass over the child is the
    // other real cost and is inherent to ANY range partitioning (vanilla's
    // range exchange pays it too).
    //
    // CONSIDERED AND REJECTED — projecting the shuffle key down to the
    // order columns: the full row must still travel (both jobs emit and
    // aggregate over it), so a projected key means (key + full-row value)
    // pairs — the order columns serialized TWICE, strictly MORE wire bytes
    // than the full-row-key form (orders-shaped rows: ~32-byte projected
    // key + header on top of the ~100-byte row, ≈ +30%). And the sorted
    // merge's comparator wins nothing: LazilyGeneratedOrdering compiles to
    // bound-reference field reads against whichever row it is given, so
    // comparing on a narrow key reads the same two fields the full-row
    // compare reads (a win could only exist for computed order EXPRESSIONS,
    // which the rewrite's eligibility never produces — it orders by
    // columns). Measured window-family bench (8 global-window queries,
    // sf0.1, local[32], 3 runs): 8.16 / 8.70 / 7.96 s — run-to-run noise
    // ±5% already exceeds any plausible gain from a change whose wire
    // effect is negative. Keeping the full-row key.
    val pairs: RDD[(InternalRow, Null)] =
      child.execute().mapPartitions(_.map(r => (r.copy(), null)))
    val partitioner = new RangePartitioner(np, pairs, ascending = true,
      samplePointsPerPartitionHint = SQLConf.get.rangeExchangeSampleSizePerPartition)
    val shuffled = new ShuffledRDD[InternalRow, Null, Null](pairs, partitioner)
      .setKeyOrdering(ordering)

    // ---- job 1: per-slice totals (tiny result, one row per slice; for
    // LAG/LEAD kinds also the slice's k boundary values)
    val totals = shuffled.mapPartitionsWithIndex { (pid, it) =>
      Iterator((pid, sliceTotals(ks, prefixAggs(ks), ordering, it)))
    }.collect().toMap

    // driver-side prefix: offsets(pid) = totals of all slices before pid
    val driverAggs = prefixAggs(ks)
    val actualParts = partitioner.numPartitions
    val offRows = new Array[Long](actualParts)
    val offKeys = new Array[Long](actualParts)
    val offSlots = new Array[Array[Any]](actualParts)
    var accRows = 0L; var accKeys = 0L
    var accSlots = new Array[Any](ks.length)
    for (pid <- 0 until actualParts) {
      offRows(pid) = accRows
      offKeys(pid) = accKeys
      offSlots(pid) = accSlots
      totals.get(pid).foreach { case (nr, nk, slots) =>
        accRows += nr; accKeys += nk
        val next = accSlots.clone()
        var i = 0
        while (i < ks.length) {
          if (driverAggs(i) != null) next(i) = driverAggs(i).merge(next(i), slots(i))
          i += 1
        }
        accSlots = next
      }
    }

    // ---- verify the asserted total order before trusting any donor: the
    // totals job counted distinct adjacent keys per slice, and equal keys
    // never span slices under range partitioning, so ties ANYWHERE make
    // keys < rows. Failing loudly here is the whole point of the opt-in:
    // with ties, donor values collected in one shuffle read could belong to
    // a different tie permutation than the emission read — results
    // consistent with NO single order, strictly worse than vanilla's
    // run-to-run nondeterminism.
    if (hasOffsetKind && accKeys != accRows) throw new IllegalStateException(
      s"spark.graft.window.assumeTotalOrder was asserted, but the window " +
        s"ORDER BY has ties ($accRows rows, $accKeys distinct keys). " +
        "Add a unique tie-break column to the ORDER BY, or unset the conf " +
        "to fall back to the single-partition plan.")

    // ---- per-slice boundary donors, assembled on the driver from the
    // collected slice heads/tails (bounded by slices x k values):
    // for LagK(i), donors(pid)(i) = the values at the k global rows just
    // BEFORE slice pid (oldest first) — a slice shorter than k simply
    // contributes all its rows and the walk keeps drawing from earlier
    // slices; for LeadK(i), the k global rows just AFTER the slice.
    val donors: Array[Array[Array[Any]]] = if (!hasOffsetKind) null else {
      val out = Array.fill(actualParts)(new Array[Array[Any]](ks.length))
      var i = 0
      while (i < ks.length) {
        ks(i) match {
          case LagK(_, k, _) =>
            val run = new scala.collection.mutable.ArrayDeque[Any](k)
            for (pid <- 0 until actualParts) {
              out(pid)(i) = run.toArray
              totals.get(pid).foreach { case (_, _, slots) =>
                val tail = if (slots(i) == null) Array.empty[Any]
                           else slots(i).asInstanceOf[Array[Any]]
                tail.foreach { v =>
                  if (run.size == k) run.removeHead()
                  run.append(v)
                }
              }
            }
          case LeadK(_, k, _) =>
            val run = new scala.collection.mutable.ArrayDeque[Any](k)
            for (pid <- (actualParts - 1) to 0 by -1) {
              out(pid)(i) = run.toArray
              totals.get(pid).foreach { case (_, _, slots) =>
                val head = if (slots(i) == null) Array.empty[Any]
                           else slots(i).asInstanceOf[Array[Any]]
                head.reverseIterator.foreach(run.prepend(_))
                while (run.size > k) run.removeLast()
              }
            }
          case _ => ()
        }
        i += 1
      }
      out
    }
    // donors are slices x k values — broadcast once instead of shipping
    // them inside every task's closure
    val donorsBc = if (hasOffsetKind) sparkContext.broadcast(donors) else null

    // ---- job 2 (map stage skipped — same shuffle files): slice-local
    // pass over the sorted slice, one tie group at a time, plus offsets
    val totalRows = accRows
    val outputAttrs = output
    val childAttrs = child.output
    val winAttrs = windowOutput
    // vanilla WindowExec's buffer thresholds, applied to the one buffer
    // this exec keeps (the current tie group)
    val bufInMem = conf.windowExecBufferInMemoryThreshold
    val bufSpill = conf.windowExecBufferSpillThreshold
    val bufSpillSize = conf.windowExecBufferSpillSizeThreshold
    shuffled.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outputAttrs, childAttrs ++ winAttrs)
      val joined = new JoinedRow
      val winRow = new GenericInternalRow(ks.length)
      val aggs = prefixAggs(ks)
      // partition-constant NTILE split parameters, hoisted off the row loop
      val ntQ = ks.map { case NTileK(k) => totalRows / k; case _ => 0L }
      val ntR = ks.map { case NTileK(k) => totalRows % k; case _ => 0L }
      val ntCut = ks.indices.map(i => ntR(i) * (ntQ(i) + 1L)).toArray

      var rowIdx = 0L     // rows emitted so far in this slice
      var denseIdx = 0L   // tie groups seen so far in this slice
      var rankVal = 0L    // 1-based slice-local rank of the current group
      val runStates = new Array[Any](ks.length) // ROWS-framed running state
      // LEAD's bounded lookahead over the slice (streaming path only; the
      // rewrite never mixes offset functions with peer-buffered kinds).
      // Invariant at emission: size >= maxLead unless the input is drained,
      // so size < k certifies the slice ends within k rows.
      val maxLead = ks.foldLeft(0) {
        case (m, LeadK(_, k, _)) => math.max(m, k); case (m, _) => m
      }
      var lookahead: scala.collection.mutable.ArrayDeque[InternalRow] = null

      // one row's output; the peer-group arguments are only read by the
      // kinds that forced buffering (null on the streaming path)
      def emitRow(row: InternalRow, groupLen: Long, baseStates: Array[Any],
          gStates: Array[Any]): InternalRow = {
        rowIdx += 1L
        var i = 0
        while (i < ks.length) {
          ks(i) match {
            case LagK(v, k, dflt) =>
              // deque of the previous (up to) k values in this slice; full
              // deque -> the value k rows back is local, else the global
              // target sits in this slice's driver-assembled donor window
              val dq = { if (runStates(i) == null) runStates(i) =
                           new scala.collection.mutable.ArrayDeque[Any](k)
                         runStates(i)
                           .asInstanceOf[scala.collection.mutable.ArrayDeque[Any]] }
              val value = if (dq.size >= k) dq(dq.size - k)
                else {
                  val arr = donorsBc.value(pid)(i)
                  val idx = dq.size + arr.length - k
                  if (idx >= 0) arr(idx) else dflt
                }
              winRow.update(i, value)
              dq.append(v.eval(row))
              if (dq.size > k) dq.removeHead()
            case LeadK(v, k, dflt) =>
              val ahead = if (lookahead == null) 0 else lookahead.size
              val value = if (ahead >= k) v.eval(lookahead(k - 1))
                else {
                  // slice ends within k rows: the target is the
                  // (k - ahead)'th global row after the slice
                  val arr = donorsBc.value(pid)(i)
                  val idx = k - ahead - 1
                  if (idx < arr.length) arr(idx) else dflt
                }
              winRow.update(i, value)
            case k if aggs(i) != null =>
              // RANGE = peer-inclusive: pre-group running state + whole tie
              // group; ROWS advances the running state one row at a time
              val local =
                if (isRangeAgg(k)) aggs(i).merge(baseStates(i), gStates(i))
                else {
                  runStates(i) = aggs(i).merge(runStates(i), aggs(i).unit(row))
                  runStates(i)
                }
              winRow.update(i,
                aggs(i).finish(aggs(i).merge(local, offSlots(pid)(i))))
            case RowNum => winRow.update(i, (rowIdx + offRows(pid)).toInt)
            case RankK => winRow.update(i, (rankVal + offRows(pid)).toInt)
            case DenseK => winRow.update(i, (denseIdx + offKeys(pid)).toInt)
            case PctRankK =>
              // tie-aware global rank against N-1, 0.0 for N <= 1
              val gr = rankVal + offRows(pid)
              winRow.update(i, if (totalRows > 1L)
                (gr - 1L).toDouble / (totalRows - 1L).toDouble else 0.0)
            case CumeDistK =>
              // peer-INCLUSIVE count / N: rows before this tie group
              // (global) plus the whole group
              val peers = offRows(pid) + (rankVal - 1L) + groupLen
              winRow.update(i, peers.toDouble / totalRows.toDouble)
            case NTileK(_) =>
              // SQL NTILE in closed form from the global row number: the
              // first N mod k tiles carry floor(N/k)+1 rows (the q == 0
              // divisor is unreachable: N < k puts every row in the cut)
              val grn = rowIdx + offRows(pid)
              val tile = if (grn <= ntCut(i)) (grn - 1L) / (ntQ(i) + 1L) + 1L
                         else ntR(i) + (grn - ntCut(i) - 1L) / ntQ(i) + 1L
              winRow.update(i, tile.toInt)
          }
          i += 1
        }
        proj(joined(row, winRow))
      }

      // only CUME_DIST and RANGE-framed aggregates need the whole tie
      // group BEFORE its first row (its size / its total); everything
      // else streams one-in-one-out, buffering nothing — and if no kind
      // even reads tie boundaries (row_number / NTILE / ROWS aggregates),
      // the per-row ordering.compare is skipped too
      val hasRangeAgg = ks.exists(isRangeAgg)
      val needsPeerBuffer = hasRangeAgg || ks.contains(CumeDistK)
      val needsBoundary = ks.exists {
        case RankK | DenseK | PctRankK => true
        case _ => false
      }

      if (!needsPeerBuffer) {
        var prev: InternalRow = null
        def stepBoundary(row: InternalRow): Unit = {
          if (needsBoundary &&
              (prev == null || ordering.compare(prev, row) != 0)) {
            denseIdx += 1L
            rankVal = rowIdx + 1L
          }
          prev = row
        }
        if (maxLead == 0) it.map { kv =>
          val row = kv._1
          stepBoundary(row)
          emitRow(row, 0L, null, null)
        } else {
          // LEAD present: keep maxLead rows of lookahead (shuffle-read rows
          // are freshly deserialized objects, safe to hold without copies)
          lookahead = new scala.collection.mutable.ArrayDeque[InternalRow](maxLead + 1)
          new Iterator[InternalRow] {
            private var drained = false
            private def fill(): Unit =
              while (!drained && lookahead.size <= maxLead) {
                if (it.hasNext) lookahead.append(it.next()._1) else drained = true
              }
            override def hasNext: Boolean = { fill(); lookahead.nonEmpty }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              val row = lookahead.removeHead()
              stepBoundary(row)
              emitRow(row, 0L, null, null)
            }
          }
        }
      } else new Iterator[InternalRow] {
        // group-buffered path: the buffer is bounded by the largest tie
        // group and is SPILL-CAPABLE — the same ExternalAppendOnlyUnsafeRowArray
        // (via the graft facade) and the same thresholds vanilla WindowExec
        // uses, so the former adversarial shape (an ORDER BY over a
        // near-constant key with CUME_DIST or a RANGE aggregate, where the
        // slice IS one tie group) now degrades to vanilla's disk-backed
        // behavior instead of heap pressure. add() copies rows in; the
        // iterator's rows reuse a read buffer, which is why MIN/MAX detach
        // buffer-backed values (copyVal) before keeping them.
        private var pendingRows: Iterator[InternalRow] = Iterator.empty
        private var pushback: InternalRow = null
        private val group = new org.apache.spark.sql.graft.SpillableRowBuffer(
          bufInMem, bufSpill, bufSpillSize)
        private val toUnsafe =
          UnsafeProjection.create(childAttrs.map(_.dataType).toArray)
        private def asUnsafe(r: InternalRow): UnsafeRow = r match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }

        private def readGroup(): Unit = {
          group.clear()
          val first = if (pushback != null) { val f = pushback; pushback = null; f }
                      else it.next()._1
          group.add(asUnsafe(first))
          var done = false
          while (!done && it.hasNext) {
            val nxt = it.next()._1
            if (ordering.compare(first, nxt) == 0) group.add(asUnsafe(nxt))
            else { pushback = nxt; done = true }
          }
        }

        private def processGroup(): Unit = {
          readGroup()
          denseIdx += 1L
          rankVal = rowIdx + 1L
          val gStates = new Array[Any](ks.length)
          if (hasRangeAgg) {
            val git = group.iterator
            while (git.hasNext) {
              val row = git.next()
              var i = 0
              while (i < ks.length) {
                if (aggs(i) != null && isRangeAgg(ks(i)))
                  gStates(i) = aggs(i).merge(gStates(i), aggs(i).unit(row))
                i += 1
              }
            }
          }
          // snapshot the pre-group running state for peer-inclusive
          // emission, then fold the group totals in EAGERLY so the next
          // group's base is correct even though emission below is lazy
          // (ROWS-framed state advances per emitted row and touches
          // disjoint slots)
          val baseStates = runStates.clone()
          var j = 0
          while (j < ks.length) {
            if (aggs(j) != null && isRangeAgg(ks(j)))
              runStates(j) = aggs(j).merge(runStates(j), gStates(j))
            j += 1
          }
          val groupLen = group.length.toLong
          pendingRows = group.iterator.map(row =>
            emitRow(row, groupLen, baseStates, gStates))
        }

        override def hasNext: Boolean = {
          while (!pendingRows.hasNext && (pushback != null || it.hasNext))
            processGroup()
          pendingRows.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          pendingRows.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): ScalableWindowExec =
    copy(child = c)
}
