package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal (r17): DEFLATE the text's UTF-8 bytes
  * and report `compressed_bytes * 1000 / raw_bytes` (per-mille, floor).
  * Highly repetitive machine-generated boilerplate — SEO spam, templated
  * pages, keyword stuffing — compresses far below natural prose, so the
  * ratio is a standard one-number quality gate in production corpus
  * pipelines (the CCNet/RedPajama family filters on exactly this signal):
  * natural English sits ~500-700 per-mille at paragraph length, repeated
  * blocks fall under ~100. It is also the cheapest REPETITION detector
  * that needs no n-gram choice at all.
  *
  * Determinism: DEFLATE level 6, default strategy, raw (nowrap) stream —
  * a FIXED input always produces the same byte count. The oracle therefore
  * gates planted compressible/incompressible classes built from doc
  * arithmetic rather than restating zlib (which DuckDB cannot), with a
  * >5x ratio margin between the classes so the verdict never sits near
  * the threshold.
  *
  * Empty text reports 1000 (nothing to compress — by convention fully
  * incompressible, so empty docs never look like spam). Per-row,
  * shuffle-free, whole-stage-codegen'd; the Deflater is a reset-per-use
  * THREAD-LOCAL (native zlib allocation per row would dominate; the
  * per-thread cache is the ImageIO-codec discipline, and a cached
  * Deflater is never `end()`ed — it lives as long as its task thread).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_ratio requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DeflateRatio.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)

  override def prettyName: String = "deflate_ratio"
}

object DeflateRatio {

  /** One raw-deflate compressor per task thread, reset per use. */
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Static kernel shared by eval and the generated call. */
  def compute(text: UTF8String): Long = {
    val raw = text.getBytes
    if (raw.length == 0) return 1000L
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var compressed = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) compressed += d.deflate(buf)
    compressed * 1000L / raw.length
  }

  /** Column API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DeflateRatio(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
