package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of `single_dim_map_tests` (/root/reference/src/range.rs:79-110) plus
  * seeded property-style checks vs a brute-force model (SURVEY §5, FIXTURES §A
  * `dimmap_1_9_3`).
  */
class DimMappingSpec extends AnyFunSuite {
  // dim: range 1..=9, items_per_chunk 3  (src/range.rs:83)
  private val m = DimMapping(1, 9, 3)

  test("chunkOf positions (src/range.rs:84-90)") {
    assert(m.chunkOf(1) == 0)
    assert(m.chunkOf(2) == 0)
    assert(m.chunkOf(5) == 1)
    assert(m.chunkOf(9) == 2)
  }

  test("chunkOf out of range errors (src/range.rs:91)") {
    assertThrows[ValueOutOfRange](m.chunkOf(114))
    assertThrows[ValueOutOfRange](m.chunkOf(0))
  }

  test("divisibility require-fail for ipc=4 (src/range.rs:24-30)") {
    assertThrows[IllegalArgumentException](DimMapping(1, 9, 4))
  }

  test("chunksOf inclusive/exclusive/unbounded rounding (src/range.rs:101-109)") {
    assert(m.chunksOf(Bounds.until(2, 7)) == Some((0L, 1L)))   // 2..7  -> 0..=1
    assert(m.chunksOf(Bounds.to(2, 7)) == Some((0L, 2L)))      // 2..=7 -> 0..=2
    assert(m.chunksOf(Bounds.upTo(7)) == Some((0L, 1L)))       // ..7   -> 0..=1
    assert(m.chunksOf(Bounds.from(5)) == Some((1L, 2L)))       // 5..   -> 1..=2
    assert(m.chunksOf(Bounds.all) == Some((0L, 2L)))
    assert(m.chunksOf(Bounds.point(5)) == Some((1L, 1L)))
  }

  test("out-of-range bounds -> None (World::select maps to Shape::None)") {
    assert(m.chunksOf(Bounds.to(0, 5)) == None)
    assert(m.chunksOf(Bounds.to(5, 100)) == None)
    assert(m.chunksOf(Bounds.to(7, 2)) == None) // empty range
  }

  test("full u64 domain with power-of-two ipc is valid") {
    val full = DimMapping(0L, UInt64.MaxValue, 1L << 32)
    assert(full.chunkOf(0) == 0)
    assert(full.chunkOf(UInt64.MaxValue) == UInt64.MaxValue >>> 32)
  }

  test("chunkRange covers maxChunk") {
    assert(m.chunkRange == ((0L, 2L)))
  }

  test("property: chunkOf/chunksOf match brute-force model (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val start = rnd.nextInt(1000).toLong
      val ipc = 1L + rnd.nextInt(64)
      val nChunks = 1L + rnd.nextInt(50)
      val dm = DimMapping(start, start + nChunks * ipc - 1, ipc)
      val len = dm.endIncl - dm.start + 1
      val v = dm.start + rnd.nextLong(len)
      assert(dm.chunkOf(v) == (v - dm.start) / ipc)
      assert(dm.chunkOf(v) < nChunks)
      val a = dm.start + rnd.nextLong(len)
      val b = dm.start + rnd.nextLong(len)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      assert(dm.chunksOf(Bounds.to(lo, hi)) == Some((dm.chunkOf(lo), dm.chunkOf(hi))))
    }
  }
}
