package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray

/** Facade over Spark's `private[sql]` [[ExternalAppendOnlyUnsafeRowArray]] —
  * the SAME spill-capable row buffer vanilla WindowExec keeps its partition
  * rows in (in-memory up to a row threshold, then an UnsafeExternalSorter
  * spill file). [[graft.plans.ScalableWindowExec]] uses it for the one
  * buffer it has — the current tie group on the peer-inclusive path — so an
  * adversarial ORDER BY over a near-constant key now spills exactly like
  * vanilla instead of growing the heap. Same access-bridge rationale as
  * [[GraftSparkErrors]]; `add` copies the row into the buffer, and the
  * iterator's rows follow the standard reused-buffer operator contract
  * (valid until the next `next()`).
  */
final class SpillableRowBuffer(inMemoryThreshold: Int, spillThreshold: Int,
    spillSizeThreshold: Long) {
  // vanilla's argument order (WindowEvaluatorFactory): the size threshold
  // serves both the in-memory and spill size limits
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    inMemoryThreshold, spillSizeThreshold, spillThreshold, spillSizeThreshold)
  def add(row: UnsafeRow): Unit = arr.add(row)
  def length: Int = arr.length
  def clear(): Unit = arr.clear()
  def iterator: Iterator[InternalRow] = arr.generateIterator()
}
