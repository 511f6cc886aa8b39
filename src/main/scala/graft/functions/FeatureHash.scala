package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fastText-shape FEATURE HASHING (r14): word n-grams of
  * `lower(trim(text))` (the [[WordNgrams]] kernel semantics — `\s+` split,
  * clamped last gram, empties dropped) hashed into a fixed `k`-dim COUNT
  * vector (`array<long>`), one pass, no intermediate gram array
  * materialized. This is the feature extractor of a hashed linear text
  * classifier (fastText / DCLM quality gates): the corpus-side cost is one
  * codegen'd projection per row, the model side is k doubles — no
  * vocabulary object, no UDF, nothing driver-resident near the 100 TB scan
  * ([[graft.ops.QualityModel]] fits LR on these and scores with a Column
  * fold over the k dims).
  *
  * Hash = FNV-1a 64 over the gram's UTF-8 bytes (word bytes joined by a
  * single space, exactly the [[WordNgrams]] gram string) — deterministic
  * across JVMs/partitions/sessions, so feature vectors are reproducible
  * and a trained model stays valid across runs.
  */
case class FeatureHash(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n > 0, "n-gram width must be positive")
  require(k > 0, "feature dimension must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"feature_hash requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    FeatureHash.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = FeatureHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $n, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): FeatureHash =
    copy(child = newChild)

  override def prettyName: String = "feature_hash"
}

object FeatureHash {
  private val WS: UTF8String = UTF8String.fromString("\\s+")

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, n: Int, k: Int): GenericArrayData = {
    val words: Array[UTF8String] = text.trim().toLowerCase().split(WS, -1)
    val len = words.length
    val counts = new Array[Long](k)
    val hi = math.max(len - n, 0) // same gram positions as WordNgrams
    var i = 0
    while (i <= hi) {
      val end = math.min(i + n, len)
      // FNV-1a over the gram bytes: word bytes joined by ' ' — identical
      // to hashing WordNgrams' concatWs gram string, without building it
      var h = FnvOffset
      var nonEmpty = false
      var j = i
      while (j < end) {
        val wb = words(j).getBytes
        if (wb.length > 0) {
          if (nonEmpty) { h = (h ^ (' '.toInt & 0xff)) * FnvPrime }
          var b = 0
          while (b < wb.length) { h = (h ^ (wb(b) & 0xff)) * FnvPrime; b += 1 }
          nonEmpty = true
        }
        j += 1
      }
      if (nonEmpty) {
        val bucket = ((h % k) + k) % k
        counts(bucket.toInt) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Column API. */
  def apply(text: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      FeatureHash(org.apache.spark.sql.GraftColumnBridge.expression(text), n, k))
}
