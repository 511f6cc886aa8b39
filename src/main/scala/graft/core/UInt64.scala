package graft.core

/** Unsigned-64 helpers. The reference engine's dimension values are `u64`
  * (/root/reference/src/lib.rs:33-37); on the JVM we carry the same 64 bits in
  * a `Long` and confine the unsigned reinterpretation to this object plus
  * [[DimMapping]]. Everything above (Spark bucket columns, predicates) works on
  * the resulting chunk indices, which are ordinary non-negative longs for any
  * practical dimension domain.
  */
object UInt64 {
  final val MaxValue: Long = -1L // 0xFFFF_FFFF_FFFF_FFFF

  @inline def lt(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0
  @inline def le(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) <= 0
  @inline def gt(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) > 0
  @inline def ge(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) >= 0
  @inline def min(a: Long, b: Long): Long = if (le(a, b)) a else b
  @inline def max(a: Long, b: Long): Long = if (ge(a, b)) a else b
  @inline def div(a: Long, b: Long): Long = java.lang.Long.divideUnsigned(a, b)
  @inline def rem(a: Long, b: Long): Long = java.lang.Long.remainderUnsigned(a, b)
  def toStringU(v: Long): String = java.lang.Long.toUnsignedString(v)
}
