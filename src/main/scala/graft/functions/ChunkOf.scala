package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native u64 value→chunk bucketing: `divideUnsigned(value - start, itemsPerChunk)`
  * with wrapping subtraction — the row-expression twin of
  * `DimMapping.chunkOf` (the Catalyst analog of the reference's
  * `DimMapping::chunk_of`, /root/reference/src/range.rs:40-46).
  *
  * Why native rather than SQL arithmetic: dim values are u64 carried in
  * signed longs, so for domains longer than 2^63 (e.g. the full u64 domain)
  * the offset exceeds Long.MaxValue and the division must be UNSIGNED —
  * Spark's `div` is signed, and under ANSI mode (the Spark 4 default) the
  * wrapping sub/mul identities that emulate unsigned division throw
  * ARITHMETIC_OVERFLOW. Java's arithmetic wraps naturally and
  * `Long.divideUnsigned` is exact and branch-cheap, in both the interpreted
  * and codegen paths.
  */
case class ChunkOf(child: Expression, start: Long, itemsPerChunk: Long)
    extends UnaryExpression {

  require(itemsPerChunk != 0, "chunk_of: itemsPerChunk must be non-zero")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chunk_of requires bigint, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.divideUnsigned(input.asInstanceOf[Long] - start, itemsPerChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // parenthesized literals: Long.MinValue's Java form is only legal as a
      // direct unary-minus literal
      s"${ev.value} = java.lang.Long.divideUnsigned($c - (${start}L), (${itemsPerChunk}L));")

  override protected def withNewChildInternal(newChild: Expression): ChunkOf =
    copy(child = newChild)

  override def prettyName: String = "chunk_of"
}

object ChunkOf {
  /** Column API for the native bucketing expression. */
  def apply(value: Column, start: Long, itemsPerChunk: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ChunkOf(org.apache.spark.sql.GraftColumnBridge.expression(value), start, itemsPerChunk))
}

/** [[ChunkOf]]'s remainder twin: the CHUNK-LOCAL offset
  * `remainderUnsigned(value - start, itemsPerChunk)` — always in
  * [0, itemsPerChunk), wrap-safe for the same u64/ANSI reasons as ChunkOf
  * (see its scaladoc). The quantizer World's intra-chunk z-ordering feeds
  * into [[ZValue]]. */
case class ChunkOffset(child: Expression, start: Long, itemsPerChunk: Long)
    extends UnaryExpression {

  require(itemsPerChunk != 0, "chunk_offset: itemsPerChunk must be non-zero")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chunk_offset requires bigint, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.remainderUnsigned(input.asInstanceOf[Long] - start, itemsPerChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.lang.Long.remainderUnsigned($c - (${start}L), (${itemsPerChunk}L));")

  override protected def withNewChildInternal(newChild: Expression): ChunkOffset =
    copy(child = newChild)

  override def prettyName: String = "chunk_offset"
}

object ChunkOffset {
  /** Column API for the native chunk-local offset. */
  def apply(value: Column, start: Long, itemsPerChunk: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ChunkOffset(org.apache.spark.sql.GraftColumnBridge.expression(value), start, itemsPerChunk))
}
