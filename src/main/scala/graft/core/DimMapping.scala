package graft.core

import UInt64._

/** Error type mirroring the reference's `Error` enum
  * (/root/reference/src/lib.rs:120-143). `ValueOutOfRange` is the only variant
  * the pure core can raise; IO/NotFound/Moved variants have no analog under
  * Spark's immutable-snapshot execution.
  */
final case class ValueOutOfRange(start: Long, endIncl: Long, value: Long)
    extends RuntimeException(
      s"value ${toStringU(value)} out of dimension range [${toStringU(start)}, ${toStringU(endIncl)}]"
    )

/** Range bounds over u64 values, mirroring `SelectBounds`
  * (/root/reference/src/world.rs:372-414): a scalar means `v..=v`; any
  * combination of inclusive/exclusive/unbounded endpoints is accepted and
  * normalized to an inclusive range (`Excluded(v)` start → `v+1`, end → `v-1`;
  * /root/reference/src/range.rs:49-59, 112-132).
  */
sealed trait Bound
object Bound {
  case class Incl(v: Long) extends Bound
  case class Excl(v: Long) extends Bound
  case object Unbounded extends Bound
}

final case class Bounds(lo: Bound, hi: Bound)
object Bounds {
  import Bound._
  /** `v` → `v..=v` */
  def point(v: Long): Bounds = Bounds(Incl(v), Incl(v))
  /** `a..b` (end-exclusive) */
  def until(a: Long, b: Long): Bounds = Bounds(Incl(a), Excl(b))
  /** `a..=b` */
  def to(a: Long, b: Long): Bounds = Bounds(Incl(a), Incl(b))
  /** `a..` */
  def from(a: Long): Bounds = Bounds(Incl(a), Unbounded)
  /** `..b` (end-exclusive) */
  def upTo(b: Long): Bounds = Bounds(Unbounded, Excl(b))
  /** `..=b` */
  def upToIncl(b: Long): Bounds = Bounds(Unbounded, Incl(b))
  /** `..` */
  val all: Bounds = Bounds(Unbounded, Unbounded)
}

/** One dimension's value→chunk bucketing, the semantic port of `DimMapping`
  * (/root/reference/src/range.rs:5-77) with `Dim`'s validation
  * (/root/reference/src/world.rs:271-292, src/range.rs:24-30):
  *
  *   - the value range `[start, endIncl]` (u64, inclusive) is split into
  *     fixed-width buckets of `itemsPerChunk` values;
  *   - the range length must divide evenly by `itemsPerChunk`;
  *   - `chunkOf(v) = (v - start) / itemsPerChunk`, erroring outside the range
  *     (/root/reference/src/range.rs:40-46, 62-71);
  *   - `chunksOf(bounds)` rounds a value range *out* to a chunk range
  *     (/root/reference/src/range.rs:49-59) — this chunk-granular rounding is
  *     the load-bearing selection semantic (SURVEY §2.2).
  *
  * Chunk indices are non-negative Longs (reference: usize).
  */
final case class DimMapping(start: Long, endIncl: Long, itemsPerChunk: Long) {
  require(itemsPerChunk != 0L, "items_per_chunk must be non-zero")
  require(ge(endIncl, start), "range end must be >= start")
  // Wrapping length: the full u64 domain has length 2^64 which wraps to 0;
  // rem(0, ipc) == 0 keeps the full domain valid for any power-of-two ipc,
  // matching the reference's wrapping arithmetic.
  private val len: Long = endIncl - start + 1L
  require(
    rem(len, itemsPerChunk) == 0L,
    s"range length ${toStringU(len)} must divide evenly by items_per_chunk ${toStringU(itemsPerChunk)}"
  )

  def contains(v: Long): Boolean = ge(v, start) && le(v, endIncl)

  /** value → chunk index; throws [[ValueOutOfRange]] outside the range. */
  def chunkOf(v: Long): Long = {
    if (!contains(v)) throw ValueOutOfRange(start, endIncl, v)
    div(v - start, itemsPerChunk)
  }

  /** Highest chunk index (inclusive). */
  def maxChunk: Long = div(endIncl - start, itemsPerChunk)

  /** Full chunk range `0..=maxChunk`. */
  def chunkRange: (Long, Long) = (0L, maxChunk)

  /** Value-bounds → inclusive chunk range, rounding out to chunk boundaries.
    * Out-of-range bounds (including an empty normalized range) → `None`,
    * which the caller maps to an empty selection (Shape::None;
    * /root/reference/src/world.rs:301-329).
    */
  def chunksOf(b: Bounds): Option[(Long, Long)] = {
    import Bound._
    val loV = b.lo match {
      case Incl(v)   => v
      case Excl(v)   => v + 1L // wraps at u64::MAX, matching reference
      case Unbounded => start
    }
    val hiV = b.hi match {
      case Incl(v)   => v
      case Excl(v)   => v - 1L
      case Unbounded => endIncl
    }
    if (!contains(loV) || !contains(hiV) || gt(loV, hiV)) None
    else Some((chunkOf(loV), chunkOf(hiV)))
  }
}
