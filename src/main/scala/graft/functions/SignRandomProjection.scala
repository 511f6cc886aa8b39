package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-LSH (random hyperplane projection) over an embedding column:
  * for each of `tables` hash tables, a `bits`-bit key whose bit b is the sign
  * of the dot product with hyperplane (table, b). Returns array<long> of
  * length `tables` — one bucket key per table.
  *
  * The hyperplanes are CONSTANTS, generated driver-side (seeded Gaussian) and
  * shipped once per task as a reference object — the round-1 formulation
  * re-derived every component per row per element via `xxhash64(tbl, b, i)`
  * inside interpreted HOFs, paying tables x bits x dim hash calls per row for
  * values that never change. One codegen'd loop, embeddings read once.
  *
  * `planes` is row-major: plane (t, b) occupies
  * [ (t*bits + b)*dim, (t*bits + b + 1)*dim ).
  */
case class SignRandomProjection(child: Expression, planes: Array[Double],
    tables: Int, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")
  require(planes.length % (tables * bits) == 0, "planes length must be tables*bits*dim")
  private def dim: Int = planes.length / (tables * bits)

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
          s"sign_random_projection requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          s += x * planes(base + i)
          i += 1
        }
        if (s > 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val uad = classOf[UnsafeArrayData].getName
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val getter = if (elemIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val key = ctx.freshName("key"); val base = ctx.freshName("base")
      s"""
        |final int $n = Math.min($c.numElements(), $dim);
        |final long[] $out = new long[$tables];
        |for (int $t = 0; $t < $tables; $t++) {
        |  long $key = 0L;
        |  for (int $b = 0; $b < $bits; $b++) {
        |    final int $base = ($t * $bits + $b) * $dim;
        |    double $s = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      $s += ((double) $c.$getter($i)) * $pl[$base + $i];
        |    }
        |    if ($s > 0) $key |= (1L << $b);
        |  }
        |  $out[$t] = $key;
        |}
        |${ev.value} = $uad.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignRandomProjection =
    copy(child = newChild)

  override def prettyName: String = "sign_random_projection"
}

object SignRandomProjection {
  /** Deterministic seeded Gaussian hyperplanes, row-major (table, bit, dim). */
  def planesFor(tables: Int, bits: Int, dim: Int, seed: Long): Array[Double] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables * bits * dim)(rnd.nextGaussian())
  }

  /** Column API: per-table sign-LSH bucket keys for an embedding column. */
  def apply(emb: Column, tables: Int, bits: Int, dim: Int, seed: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SignRandomProjection(org.apache.spark.sql.GraftColumnBridge.expression(emb),
        planesFor(tables, bits, dim, seed), tables, bits))
}
