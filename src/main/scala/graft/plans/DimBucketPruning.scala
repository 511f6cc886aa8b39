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

  /** (lo, hi) constraint a single conjunct puts on `name`, if any. */
  private def rangeOf(c: Expression, name: String): Option[(Option[Long], Option[Long])] = {
    def is(a: Expression) = a match {
      case ar: AttributeReference => ar.name == name
      case _                      => false
    }
    c match {
      case GreaterThanOrEqual(a, l) if is(a) => litLong(l).map(v => (Some(v), None))
      case GreaterThan(a, l) if is(a)        => litLong(l).map(v => (Some(v + 1), None))
      case LessThanOrEqual(a, l) if is(a)    => litLong(l).map(v => (None, Some(v)))
      case LessThan(a, l) if is(a)           => litLong(l).map(v => (None, Some(v - 1)))
      case EqualTo(a, l) if is(a)            => litLong(l).map(v => (Some(v), Some(v)))
      case GreaterThanOrEqual(l, a) if is(a) => litLong(l).map(v => (None, Some(v)))
      case GreaterThan(l, a) if is(a)        => litLong(l).map(v => (None, Some(v - 1)))
      case LessThanOrEqual(l, a) if is(a)    => litLong(l).map(v => (Some(v), None))
      case LessThan(l, a) if is(a)           => litLong(l).map(v => (Some(v + 1), None))
      case EqualTo(l, a) if is(a)            => litLong(l).map(v => (Some(v), Some(v)))
      case _                                 => None
    }
  }

  private def bucketPred(dims: Seq[DimSpec], output: Seq[Attribute],
      cond: Expression): Option[Expression] = {
    val conjs = conjuncts(cond)
    val preds = dims.zipWithIndex.flatMap { case (spec, i) =>
      val ranges = conjs.flatMap(rangeOf(_, spec.column))
      if (ranges.isEmpty) Seq.empty[Expression]
      else {
        // intersect all constraints, clamp to the dim domain (rows outside
        // the domain cannot exist in a world by construction)
        val lo = math.max(ranges.flatMap(_._1) match {
          case Nil => spec.mapping.start; case ls => ls.max
        }, spec.mapping.start)
        val hi = math.min(ranges.flatMap(_._2) match {
          case Nil => spec.mapping.endIncl; case hs => hs.min
        }, spec.mapping.endIncl)
        output.find(_.name == s"c$i").toSeq.flatMap { cAttr =>
          def cLit(v: Long): Literal = cAttr.dataType match {
            case IntegerType => Literal(v.toInt)
            case _           => Literal(v)
          }
          if (lo > hi) Seq(Literal.FalseLiteral)
          else spec.mapping.chunksOf(Bounds.to(lo, hi)) match {
            case Some((clo, chi)) =>
              // ATOMIC conjuncts, one comparison each: the idempotence guard
              // below compares against the filter's split conjunct list, so a
              // composite And() here would never match and the fixed-point
              // batch would re-add it every iteration
              Seq(GreaterThanOrEqual(cAttr, cLit(clo)), LessThanOrEqual(cAttr, cLit(chi)))
            case None => Seq(Literal.FalseLiteral)
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
