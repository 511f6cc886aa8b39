package graft.plans

import graft.core.Bounds
import graft.world.DimSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Raw-predicate partition pruning (SURVEY §7 stretch; VERDICT r1 gap #1).
  *
  * The reference has ONE query path, so its chunk pruning
  * (/root/reference/src/world.rs:301-329, src/range.rs:49-59) applies to
  * every query. Our `Select` DSL reproduces that pruning, but a user who
  * writes plain `df.where($"user_id".between(100, 119))` bypasses it and
  * full-scans. This rule closes the second path: a range/equality predicate
  * on a registered world's dim column is *augmented* with the implied bucket
  * predicate (`c_i BETWEEN chunkOf(lo) AND chunkOf(hi)`), which Spark's file
  * index evaluates per-directory — the scan then lists only the covered
  * chunks, exactly like the DSL path. The original row-exact predicate is
  * kept, so results are unchanged (the added conjunct is implied by it).
  */
object DimPruningRegistry {
  private val worlds =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DimSpec]]()

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  def register(path: String, dims: Seq[DimSpec]): Unit =
    worlds.put(normalize(path), dims)

  def lookup(path: String): Option[Seq[DimSpec]] =
    Option(worlds.get(normalize(path)))

  /** Install the rule into a session's extra optimizer rules (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[DimBucketPruning]))
      spark.experimental.extraOptimizations = existing :+ DimBucketPruning()
  }
}

case class DimBucketPruning() extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType)   => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _                            => None
  }

  /** (lo, hi) SIGNED constraint a single conjunct puts on `name`, if any
    * (Spark compares LongType with signed semantics, so the raw predicate
    * denotes a signed interval). Strict comparisons at the signed extremes
    * are unsatisfiable; they yield the canonical empty range (1, 0) rather
    * than overflowing. */
  private def rangeOf(c: Expression, name: String): Option[(Option[Long], Option[Long])] = {
    def is(a: Expression) = a match {
      case ar: AttributeReference => ar.name == name
      case _                      => false
    }
    val unsat = (Some(1L), Some(0L))
    c match {
      case GreaterThanOrEqual(a, l) if is(a) => litLong(l).map(v => (Some(v), None))
      case GreaterThan(a, l) if is(a)        => litLong(l).map(v =>
        if (v == Long.MaxValue) unsat else (Some(v + 1), None))
      case LessThanOrEqual(a, l) if is(a)    => litLong(l).map(v => (None, Some(v)))
      case LessThan(a, l) if is(a)           => litLong(l).map(v =>
        if (v == Long.MinValue) unsat else (None, Some(v - 1)))
      case EqualTo(a, l) if is(a)            => litLong(l).map(v => (Some(v), Some(v)))
      case GreaterThanOrEqual(l, a) if is(a) => litLong(l).map(v => (None, Some(v)))
      case GreaterThan(l, a) if is(a)        => litLong(l).map(v =>
        if (v == Long.MinValue) unsat else (None, Some(v - 1)))
      case LessThanOrEqual(l, a) if is(a)    => litLong(l).map(v => (Some(v), None))
      case LessThan(l, a) if is(a)           => litLong(l).map(v =>
        if (v == Long.MaxValue) unsat else (Some(v + 1), None))
      case EqualTo(l, a) if is(a)            => litLong(l).map(v => (Some(v), Some(v)))
      case _                                 => None
    }
  }

  /** Chunk-set predicate implied by one `IN`-shaped conjunct on a dim
    * column, if any. Values outside the dim's domain are dropped (such rows
    * are never stored); an all-out-of-domain list is unsatisfiable. The
    * list is sorted so reconstruction is deterministic (idempotence guard
    * compares by semanticEquals). Both `In` and `InSet` shapes appear here:
    * the main optimizer batches (which convert large Ins) run before this
    * user-provided rule. */
  private def inChunks(c: Expression, spec: DimSpec): Option[Seq[Long]] = {
    def is(a: Expression) = a match {
      case ar: AttributeReference => ar.name == spec.column
      case _                      => false
    }
    val vals: Option[Seq[Long]] = c match {
      case In(a, list) if is(a) =>
        val ls = list.map(litLong)
        if (ls.exists(_.isEmpty)) None else Some(ls.flatten)
      case InSet(a, hset) if is(a) =>
        val ls = hset.toSeq.map {
          case l: Long              => Some(l)
          case i: Int               => Some(i.toLong)
          case l: java.lang.Long    => Some(l.longValue())
          case i: java.lang.Integer => Some(i.longValue())
          case _                    => None
        }
        if (ls.exists(_.isEmpty)) None else Some(ls.flatten)
      case _ => None
    }
    vals.map(_.filter(spec.mapping.contains).map(spec.mapping.chunkOf).distinct.sorted)
  }

  private def bucketPred(dims: Seq[DimSpec], output: Seq[Attribute],
      cond: Expression): Option[Expression] = {
    val conjs = conjuncts(cond)
    val inPreds = dims.zipWithIndex.flatMap { case (spec, i) =>
      output.find(_.name == s"c$i").toSeq.flatMap { cAttr =>
        def cLit(v: Long): Literal = cAttr.dataType match {
          case IntegerType => Literal(v.toInt)
          case _           => Literal(v)
        }
        conjs.flatMap(inChunks(_, spec)).map { chunks =>
          if (chunks.isEmpty) Literal.FalseLiteral
          else In(cAttr, chunks.map(cLit)): Expression
        }
      }
    }
    val preds = inPreds ++ dims.zipWithIndex.flatMap { case (spec, i) =>
      val ranges = conjs.flatMap(rangeOf(_, spec.column))
      if (ranges.isEmpty) Seq.empty[Expression]
      else {
        // intersect all constraints in SIGNED space (that is the predicate's
        // semantics), without touching the domain yet — the domain is u64
        // and may wrap the signed boundary (endIncl = -1L means 2^64-1), so
        // signed clamping against it would turn valid predicates into
        // FalseLiteral (silently-empty results)
        val pl = ranges.flatMap(_._1).foldLeft(Long.MinValue)(math.max)
        val ph = ranges.flatMap(_._2).foldLeft(Long.MaxValue)(math.min)
        output.find(_.name == s"c$i").toSeq.flatMap { cAttr =>
          def cLit(v: Long): Literal = cAttr.dataType match {
            case IntegerType => Literal(v.toInt)
            case _           => Literal(v)
          }
          if (pl > ph) Seq(Literal.FalseLiteral) // predicate itself unsatisfiable
          else {
            // a signed interval maps to one unsigned interval when both ends
            // share a sign, else splits at the sign boundary into
            // [0, ph] ∪ [pl as u64, 2^64-1]; each piece is then clamped to
            // the dim domain with UNSIGNED min/max, mirroring DimMapping
            val pieces: Seq[(Long, Long)] =
              if (pl >= 0 || ph < 0) Seq((pl, ph))
              else Seq((0L, ph), (pl, graft.core.UInt64.MaxValue))
            val chunkRanges = pieces.flatMap { case (l, h) =>
              val cl = graft.core.UInt64.max(l, spec.mapping.start)
              val ch = graft.core.UInt64.min(h, spec.mapping.endIncl)
              if (graft.core.UInt64.gt(cl, ch)) None
              else spec.mapping.chunksOf(Bounds.to(cl, ch))
            }
            chunkRanges match {
              case Nil => Seq(Literal.FalseLiteral)
              case Seq((clo, chi)) =>
                // ATOMIC conjuncts, one comparison each: the idempotence
                // guard below compares against the filter's split conjunct
                // list, so a composite And() here would never match and the
                // fixed-point batch would re-add it every iteration
                Seq(GreaterThanOrEqual(cAttr, cLit(clo)), LessThanOrEqual(cAttr, cLit(chi)))
              case rs =>
                // predicate straddles the sign boundary of a wrapping
                // domain: two disjoint chunk ranges, one Or conjunct
                // (deterministic construction keeps it idempotent)
                Seq(rs.map { case (clo, chi) =>
                  And(GreaterThanOrEqual(cAttr, cLit(clo)),
                    LessThanOrEqual(cAttr, cLit(chi))): Expression
                }.reduce(Or))
            }
          }
        }
      }
    }
    // only add conjuncts not already present (keeps the rule idempotent
    // under the optimizer's fixed-point batches)
    val fresh = preds.filterNot(p => conjs.exists(_.semanticEquals(p)))
    fresh.reduceOption(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      rel.relation match {
        case fs: HadoopFsRelation =>
          val dims = fs.location.rootPaths.headOption
            .flatMap(p => DimPruningRegistry.lookup(p.toString))
          dims.flatMap(bucketPred(_, rel.output, cond)) match {
            case Some(extra) => Filter(And(cond, extra), rel)
            case None        => f
          }
        case _ => f
      }
  }
}
