package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native probe into a serialized Count-Min sketch: `cms_estimate(sketch,
  * key)` returns the sketch's (never-under) frequency estimate for `key` —
  * the read half Spark's built-in `count_min_sketch` aggregate lacks (it
  * produces the binary sketch, then offers no SQL way to query it; the only
  * alternative is a driver-side deserialize, which un-distributes every
  * pipeline that wants per-row frequency lookups against a broadcast
  * sketch).
  *
  * The expected shape is probe-rows × one broadcast sketch (a scalar
  * aggregate cross-joined in, the q_share_of_total discipline), so the
  * deserialized sketch is memoized per task keyed on the byte array — each
  * row pays an O(depth) counter walk, not a 76 KB deserialization.
  * Codegen delegates to the same static kernel (one virtual call per row;
  * the cost is the probe, not boxing).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate requires (binary sketch, bigint key), got $other")
    }

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CmsEstimate.estimate(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, k) =>
      s"graft.functions.CmsEstimate.estimate($sk, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {
  // per-thread memo of the last-seen sketch: the sketch is a broadcast
  // scalar, so within a task every row carries the same serialized bytes.
  // UnsafeRow.getBinary returns a FRESH COPY per row, so reference
  // equality rarely hits; the per-row identity check is therefore a
  // length + sampled-bytes + cached-hash comparison (O(1) in sketch
  // size), falling back to a full Arrays.equals only on a hash match —
  // DESERIALIZATION (the expensive part) still happens once per task,
  // and the per-row cost is a handful of probes, not an O(sketch bytes)
  // scan of the ~76 KB array.
  private final case class Memo(bytes: Array[Byte], hash: Int,
      cms: CountMinSketch)
  private val lastSketch = new ThreadLocal[Memo]

  private def quickHash(b: Array[Byte]): Int = {
    // length + 8 sampled positions + both ends: two sketches of one
    // query differing anywhere near-certainly differ in depth/width
    // headers or the sampled counters; full equals confirms on match
    var h = b.length
    var i = 0
    val step = math.max(1, b.length / 8)
    while (i < b.length) { h = h * 31 + b(i); i += step }
    if (b.length > 0) h = h * 31 + b(b.length - 1)
    h
  }

  def estimate(bytes: Array[Byte], key: Long): Long = {
    var e = lastSketch.get()
    if (e == null || !((e.bytes eq bytes) ||
        (e.hash == quickHash(bytes) && java.util.Arrays.equals(e.bytes, bytes)))) {
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      e = Memo(bytes, quickHash(bytes), cms)
      lastSketch.set(e)
    }
    e.cms.estimateCount(java.lang.Long.valueOf(key))
  }

  def apply(sketch: Column, key: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CmsEstimate(org.apache.spark.sql.GraftColumnBridge.expression(sketch),
        org.apache.spark.sql.GraftColumnBridge.expression(key)))
}
