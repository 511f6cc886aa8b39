package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key: interleaves the low `bitsPerDim` bits of n long
  * columns — dim i's bit b lands at output bit `b*n + i`, so sorting by the
  * result walks the n-dimensional grid in Z-curve order. `bitsPerDim` is
  * fixed at `63 / n` (the most that fits a signed long with every
  * interleaved value non-negative, keeping the sort order right); inputs
  * are masked to that width, so callers quantize coordinates first —
  * [[graft.core.DimMapping.chunkOf]]/[[ChunkOf]] bucket indices are the
  * natural inputs for world dims.
  *
  * Why this exists (the layout argument, not a query trick): range- or
  * hash-clustering by ONE dimension gives that dimension tight per-file
  * min/max envelopes and leaves every other dimension spanning the whole
  * domain in every file. Z-clustering makes each file cover a small
  * n-dimensional box, so per-file min/max stats stay tight on ALL the
  * interleaved dimensions at once and a multi-dimensional box predicate
  * prunes files/row-groups no matter which dims it constrains — at 100 TB
  * the difference between scanning a slice and scanning everything.
  * ZOrderSpec measures exactly that (files touched by a box query, Z vs
  * single-dim layout).
  *
  * Why native: the declarative twin is a 2·bits·n-term shift/or chain
  * (interpreted, boxed per term); this is one tight loop per row, codegen
  * and interpreted paths pinned bit-identical by ZOrderSpec.
  */
case class ZValue(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  private val n = children.size
  private[functions] val bitsPerDim = 63 / math.max(n, 1)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.isEmpty || children.size > 16)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zvalue takes 1..16 dims, got ${children.size}")
    else children.map(_.dataType).find(_ != LongType) match {
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case Some(other) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"zvalue requires bigint dims, got $other")
    }

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      val masked = v.asInstanceOf[Long] & ((1L << bitsPerDim) - 1)
      var b = 0
      while (b < bitsPerDim) {
        z |= ((masked >>> b) & 1L) << (b * n + i)
        b += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val z = ctx.freshName("z")
    val b = ctx.freshName("b")
    val m = ctx.freshName("m")
    val mask = (1L << bitsPerDim) - 1
    val evals = children.map(_.genCode(ctx))
    val dimCode = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; } else {
         |  long $m = ${e.value} & ${mask}L;
         |  for (int $b = 0; $b < $bitsPerDim; $b++) {
         |    $z |= (($m >>> $b) & 1L) << ($b * $n + $i);
         |  }
         |}""".stripMargin
    }
    // dims evaluate in order; a null short-circuits the remaining ORs but
    // each dim's own eval is cheap enough that we simply guard per-dim
    val body = dimCode.mkString("\n")
    val code =
      code"""boolean ${ev.isNull} = false;
            |long $z = 0L;
            |$body
            |long ${ev.value} = $z;""".stripMargin
    ev.copy(code = code, isNull =
      if (nullable) ev.isNull else FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(children = newChildren)

  override def prettyName: String = "zvalue"
}

object ZValue {
  /** Column API: `ZValue(col("x"), col("y"), ...)`. */
  def apply(first: Column, rest: Column*): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ZValue((first +: rest).map(org.apache.spark.sql.GraftColumnBridge.expression)))
}
