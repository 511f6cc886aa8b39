package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for connector pieces that only execute on paths the
  * integration tests don't take: offset deserialization happens on STREAM
  * RESTART (StreamingSpec runs a single uninterrupted query), and the INT96
  * decode runs only against files from writers configured for the legacy
  * timestamp layout.
  */
class GraftSourcesSpec extends AnyFunSuite {

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
