package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native integer random-projection kernel (r17): for each output dim j,
  * `y_u[j] = Σ_i round(x_i · 1e6) · mat[j][i]` over the embedding — the
  * exact arithmetic of the `aggregate(zip_with(emb, mat_j, round·g), +)`
  * HOF chain it replaces in `s_rp_project`, which Catalyst evaluates
  * INTERPRETED (higher-order functions are CodegenFallback), paying a
  * per-element closure call × outDims passes per row. One codegen'd loop,
  * embedding read once.
  *
  * Exactness contract (pinned by IntMatProjectSpec against the original
  * HOF chain): per element, `round(cast(x as double) * 1e6, 0)` is Spark's
  * Round — `BigDecimal.valueOf(d).setScale(0, HALF_UP)` — then cast to
  * long, then multiplied by the {+1, 0, −1} matrix entry and summed as
  * BIGINT. The HOF chain's null AND error semantics are preserved: a row
  * whose embedding length differs from `dim` (zip_with pads with nulls) or
  * contains a null element yields an all-null output array exactly as the
  * per-j aggregates would, and a non-finite element throws like the ANSI
  * double→long cast the original chain contains.
  *
  * `mat` is row-major: row j occupies [j*dim, (j+1)*dim).
  */
case class IntMatProject(child: Expression, mat: Array[Long], outDims: Int)
    extends UnaryExpression {

  require(outDims > 0 && mat.length % outDims == 0,
    "mat length must be outDims * dim")
  private def dim: Int = mat.length / outDims

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int_mat_project requires array<float|double>, got $other")
    }

  /** Captured at plan time on the driver (as Cast does): the replaced
    * chain's double→long cast only throws on non-finite values under ANSI;
    * non-ANSI sessions get Scala's saturating toLong (NaN→0, ±Inf→extrema). */
  private val ansiEnabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  /** A NULL embedding must yield array(null × outDims), not NULL: the
    * replaced chain was `array(agg_0 .. agg_{outDims-1})` and each per-j
    * aggregate of a NULL input is null — the array constructor itself never
    * is. posexplode therefore emits outDims rows with null y_u, which a
    * NULL-propagating UnaryExpression would silently drop to 0 rows. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[Any](outDims))
    else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](outDims)
    if (n == dim && !IntMatProject.anyBad(arr, elemIsFloat)) {
      val micro = IntMatProject.microUnits(arr, elemIsFloat, ansiEnabled)
      var j = 0
      while (j < outDims) {
        var s = 0L
        val base = j * dim
        var i = 0
        while (i < dim) { s += micro(i) * mat(base + i); i += 1 }
        out(j) = s
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val imp = IntMatProject.getClass.getName.stripSuffix("$")
    val gad = classOf[GenericArrayData].getName
    val m = ctx.addReferenceObj("mat", mat, "long[]")
    val out = ctx.freshName("out"); val micro = ctx.freshName("micro")
    val j = ctx.freshName("j"); val i = ctx.freshName("i")
    val s = ctx.freshName("s"); val base = ctx.freshName("base")
    val resultCode =
      code"""
        |${childGen.code}
        |final Object[] $out = new Object[$outDims];
        |if (!${childGen.isNull} && ${childGen.value}.numElements() == $dim &&
        |    !$imp.anyBad(${childGen.value}, $elemIsFloat)) {
        |  final long[] $micro =
        |    $imp.microUnits(${childGen.value}, $elemIsFloat, $ansiEnabled);
        |  for (int $j = 0; $j < $outDims; $j++) {
        |    long $s = 0L;
        |    final int $base = $j * $dim;
        |    for (int $i = 0; $i < $dim; $i++) {
        |      $s += $micro[$i] * $m[$base + $i];
        |    }
        |    $out[$j] = $s;
        |  }
        |}
        |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  new $gad($out);
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): IntMatProject =
    copy(child = newChild)

  override def prettyName: String = "int_mat_project"
}

object IntMatProject {
  /** True when any element is null — the shape for which the HOF chain
    * this kernel replaces yields a null aggregate (zip_with/aggregate
    * propagate the null; the ANSI long cast never sees it). */
  def anyBad(arr: ArrayData, isFloat: Boolean): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** `round(cast(x as double) * 1e6, 0).cast(long)` per element — Spark's
    * Round semantics exactly (BigDecimal HALF_UP; Round passes non-finite
    * values through untouched), then the double→long Cast: under ANSI an
    * overflow error on non-finite/out-of-range values, otherwise Scala's
    * saturating toLong — mirroring Cast's ansiEnabled gate exactly. Shared
    * by the interpreted and codegen paths. */
  def microUnits(arr: ArrayData, isFloat: Boolean, ansi: Boolean): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * 1e6
      val r =
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
        else java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      if (ansi && (java.lang.Double.isNaN(r) || java.lang.Double.isInfinite(r) ||
          r < Long.MinValue.toDouble || r > Long.MaxValue.toDouble))
        throw new ArithmeticException(
          s"""[CAST_OVERFLOW] The value $r of the type "DOUBLE" cannot be """ +
            """cast to "BIGINT" due to an overflow (int_mat_project, """ +
            "matching the replaced ANSI round/cast chain)")
      out(i) = r.toLong
      i += 1
    }
    out
  }

  /** Column API: integer micro-unit matrix projection of an embedding. */
  def apply(emb: Column, mat: Array[Long], outDims: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      IntMatProject(org.apache.spark.sql.GraftColumnBridge.expression(emb),
        mat, outDims))
}
