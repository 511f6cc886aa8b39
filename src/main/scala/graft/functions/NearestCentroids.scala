package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native IVF assignment: the indices of the `nprobe` nearest centroids (by
  * squared L2, ties by lower index) for an embedding column. Centroids are
  * driver-side constants (trained once on a sample) shipped per task as a
  * reference object — the coarse-quantizer half of an IVF index, with the
  * same single-pass codegen'd shape as [[SignRandomProjection]].
  *
  * `centroids` is row-major: centroid c occupies [c*dim, (c+1)*dim).
  */
case class NearestCentroids(child: Expression, centroids: Array[Double],
    nlist: Int, nprobe: Int) extends UnaryExpression {

  require(nlist > 0 && centroids.length % nlist == 0,
    "centroids length must be nlist*dim")
  require(nprobe > 0 && nprobe <= nlist, "nprobe must be in [1, nlist]")
  private def dim: Int = centroids.length / nlist

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
          s"nearest_centroids requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    // insertion-select the nprobe smallest (d2, idx) pairs
    val bestD = Array.fill(nprobe)(Double.MaxValue)
    val bestI = Array.fill(nprobe)(-1L)
    var c = 0
    while (c < nlist) {
      var d2 = 0.0
      var i = 0
      val base = c * dim
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val diff = x - centroids(base + i)
        d2 += diff * diff
        i += 1
      }
      var j = nprobe - 1
      if (d2 < bestD(j)) {
        while (j > 0 && d2 < bestD(j - 1)) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d2; bestI(j) = c.toLong
      }
      c += 1
    }
    new GenericArrayData(bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cIn => {
      val uad = classOf[UnsafeArrayData].getName
      val cents = ctx.addReferenceObj("centroids", centroids, "double[]")
      val getter = if (elemIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff"); val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      s"""
        |final int $n = Math.min($cIn.numElements(), $dim);
        |final double[] $bestD = new double[$nprobe];
        |final long[] $bestI = new long[$nprobe];
        |java.util.Arrays.fill($bestD, Double.MAX_VALUE);
        |java.util.Arrays.fill($bestI, -1L);
        |for (int $c = 0; $c < $nlist; $c++) {
        |  double $d2 = 0.0;
        |  final int $base = $c * $dim;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $diff = ((double) $cIn.$getter($i)) - $cents[$base + $i];
        |    $d2 += $diff * $diff;
        |  }
        |  int $j = $nprobe - 1;
        |  if ($d2 < $bestD[$j]) {
        |    while ($j > 0 && $d2 < $bestD[$j - 1]) {
        |      $bestD[$j] = $bestD[$j - 1]; $bestI[$j] = $bestI[$j - 1]; $j--;
        |    }
        |    $bestD[$j] = $d2; $bestI[$j] = (long) $c;
        |  }
        |}
        |${ev.value} = $uad.fromPrimitiveArray($bestI);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroids"
}

object NearestCentroids {
  def apply(emb: Column, centroids: Array[Double], nlist: Int, nprobe: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NearestCentroids(org.apache.spark.sql.GraftColumnBridge.expression(emb),
        centroids, nlist, nprobe))
}
