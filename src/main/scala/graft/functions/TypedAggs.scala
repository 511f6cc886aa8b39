package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator surface (SURVEY §2.9 UDAF row): custom aggregations with
  * a mergeable buffer — partial aggregation (map-side combine) falls out of
  * `merge`, so these scale like built-in aggregates.
  */
object TypedAggs {

  /** Exact decimal-cents sum of a double column: each value is rounded to
    * cents as a Long, summed exactly — the order-independent way to aggregate
    * money-like doubles. */
  object CentsSum extends Aggregator[Double, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, v: Double): Long = b + math.round(v * 100)
    def merge(a: Long, b: Long): Long = a + b
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Bounded top-k (largest values) with deterministic ordering — the heap
    * buffer stays k elements regardless of group size. */
  final case class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    def zero: Seq[Double] = Vector.empty
    def reduce(b: Seq[Double], v: Double): Seq[Double] =
      (b :+ v).sorted(Ordering[Double].reverse).take(k)
    def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      (a ++ b).sorted(Ordering[Double].reverse).take(k)
    def finish(b: Seq[Double]): Seq[Double] = b
    def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
  }

  /** Bounded k-SMALLEST (key, id) pairs, lexicographic — the scale-correct
    * top-k-per-group shape when groups are FEW and HUGE: a partitioned
    * window sorts each group in full (one task per group at any size),
    * while this buffer holds at most k pairs per partition per group and
    * map-side combines. Used by the weighted sampler (k winners per
    * source). */
  final case class MinKPairs(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    def zero: Seq[(Long, Long)] = Vector.empty
    def reduce(b: Seq[(Long, Long)], v: (Long, Long)): Seq[(Long, Long)] =
      ((b :+ v): Seq[(Long, Long)]).sorted.take(k)
    def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      ((a ++ b): Seq[(Long, Long)]).sorted.take(k)
    def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b
    def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
  }
}
