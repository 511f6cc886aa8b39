package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native PQ asymmetric-distance kernel: the approximate distance between a
  * query embedding and a corpus row's product-quantization codes —
  * `sum over subspaces s of ||q_s − codebook[s][code_s]||²` — in one tight
  * pass. The codebook ships per task as a reference object (the
  * [[NearestCentroids]] pattern); accumulation order (outer subspace loop,
  * inner component left-fold) is bit-identical to the `aggregate`/`zip_with`
  * HOF formulation it replaces, so swapping it in changes no result. This
  * is the per-candidate hot path of the ADC scan — the one expression the
  * PQ index evaluates corpus-side at query time.
  *
  * `codebook` is row-major: subspace s, codeword c occupies
  * `[(s*ksub + c)*subDim, (s*ksub + c + 1)*subDim)`.
  */
object PqAdc {

  def compute(q: ArrayData, codes: ArrayData, cb: Array[Double],
      m: Int, ksub: Int, subDim: Int, qFloat: Boolean): Double = {
    val qn = q.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getLong(s).toInt
      val qBase = s * subDim
      val cBase = (s * ksub + code) * subDim
      var inner = 0.0
      var i = 0
      while (i < subDim && qBase + i < qn) {
        val x = if (qFloat) q.getFloat(qBase + i).toDouble else q.getDouble(qBase + i)
        val d = x - cb(cBase + i)
        inner += d * d
        i += 1
      }
      acc += inner
      s += 1
    }
    acc
  }

  def apply(qEmb: Column, codes: Column, codebook: Array[Double],
      m: Int, ksub: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PqAdc(org.apache.spark.sql.GraftColumnBridge.expression(qEmb),
        org.apache.spark.sql.GraftColumnBridge.expression(codes),
        codebook, m, ksub))
}

case class PqAdc(left: Expression, right: Expression, codebook: Array[Double],
    m: Int, ksub: Int) extends BinaryExpression {

  require(m > 0 && ksub > 0 && codebook.length % (m * ksub) == 0,
    "codebook length must be m*ksub*subDim")
  private def subDim: Int = codebook.length / (m * ksub)

  override def dataType: DataType = DoubleType

  private def qFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    val cOk = right.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (qOk && cOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<float|double>, array<long>), got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    PqAdc.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      codebook, m, ksub, subDim, qFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = PqAdc.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cb = ctx.addReferenceObj("codebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $helper.compute($l, $r, $cb, $m, $ksub, $subDim, $qFloat);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}
