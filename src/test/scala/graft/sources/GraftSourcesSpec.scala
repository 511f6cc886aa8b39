package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for connector pieces that only execute on paths the
  * integration tests don't take: offset deserialization happens on STREAM
  * RESTART (StreamingSpec runs a single uninterrupted query), and the INT96
  * decode runs only against files from writers configured for the legacy
  * timestamp layout.
  */
class GraftSourcesSpec extends AnyFunSuite {

  test("partial-binding filter evaluation prunes subtrees only when decidable") {
    import org.apache.spark.sql.sources._
    val c0only = Map("c0" -> 5L) // c1 not yet bound (outer directory level)
    // decidable from c0 alone
    assert(!GraftDataSource.mayMatch(EqualTo("c0", 3L), c0only), "c0=3 vs c0=5 prunes")
    assert(GraftDataSource.mayMatch(EqualTo("c0", 5L), c0only))
    assert(!GraftDataSource.mayMatch(In("c0", Array(1L, 2L)), c0only))
    assert(!GraftDataSource.mayMatch(LessThan("c0", 5L), c0only))
    // undecidable: references the unbound c1 -> must keep the subtree
    assert(GraftDataSource.mayMatch(EqualTo("c1", 3L), c0only))
    assert(GraftDataSource.mayMatch(And(EqualTo("c0", 5L), EqualTo("c1", 3L)), c0only))
    // And with a decidably-false leg prunes even though the other is unbound
    assert(!GraftDataSource.mayMatch(And(EqualTo("c0", 3L), EqualTo("c1", 3L)), c0only))
    // Or needs BOTH legs decidably false to prune
    assert(GraftDataSource.mayMatch(Or(EqualTo("c0", 3L), EqualTo("c1", 3L)), c0only))
    assert(!GraftDataSource.mayMatch(Or(EqualTo("c0", 3L), In("c0", Array(9L))), c0only))
    // Not flips decidable values and stays undecidable otherwise
    assert(!GraftDataSource.mayMatch(Not(EqualTo("c0", 5L)), c0only))
    assert(GraftDataSource.mayMatch(Not(EqualTo("c1", 5L)), c0only))
    // full binding degenerates to the exact leaf evaluation
    val full = Map("c0" -> 5L, "c1" -> 3L)
    assert(GraftDataSource.mayMatch(And(EqualTo("c0", 5L), EqualTo("c1", 3L)), full))
    assert(!GraftDataSource.mayMatch(And(EqualTo("c0", 5L), EqualTo("c1", 4L)), full))
  }

  test("stream offset JSON round-trips, including escaped quotes and backslashes") {
    val files = Seq(
      "/data/w/c0=1/part-0-1-0.parquet",
      "/odd path/with \"quotes\".parquet",
      "c:\\windows\\style\\path.parquet").sorted
    val json = GraftStreamOffset(files).json()
    assert(GraftStreamOffset.parse(json) == files, json)
    // empty offset (initialOffset) round-trips too
    assert(GraftStreamOffset.parse(GraftStreamOffset(Seq.empty).json()) == Seq.empty)
  }

  test("INT96 timestamps decode to epoch micros (Julian day + nanos-of-day, little-endian)") {
    def int96(julianDay: Int, nanosOfDay: Long): org.apache.parquet.io.api.Binary = {
      val buf = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putLong(nanosOfDay).putInt(julianDay)
      org.apache.parquet.io.api.Binary.fromConstantByteArray(buf.array())
    }
    // 2440588 = Julian day of 1970-01-01
    assert(GraftPartitionReader.int96Micros(int96(2440588, 0L)) == 0L)
    // one day + 1.5 ms later
    assert(GraftPartitionReader.int96Micros(int96(2440589, 1500000L)) ==
      86400000000L + 1500L)
    // pre-epoch: one day before, noon
    assert(GraftPartitionReader.int96Micros(int96(2440587, 43200L * 1000000000L)) ==
      -86400000000L + 43200000000L)
  }
}
