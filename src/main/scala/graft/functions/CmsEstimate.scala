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
  // scalar, so within a task every row carries the same byte array
  // (usually the same REFERENCE — the eq fast path) and the sketch
  // deserializes once per task instead of once per row
  private val lastSketch =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimate(bytes: Array[Byte], key: Long): Long = {
    var e = lastSketch.get()
    if (e == null ||
        !((e._1 eq bytes) || java.util.Arrays.equals(e._1, bytes))) {
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      e = (bytes, cms)
      lastSketch.set(e)
    }
    e._2.estimateCount(java.lang.Long.valueOf(key))
  }

  def apply(sketch: Column, key: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CmsEstimate(org.apache.spark.sql.GraftColumnBridge.expression(sketch),
        org.apache.spark.sql.GraftColumnBridge.expression(key)))
}
