package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a string array: each element votes +-1 on every
  * bit of its XXH64 (seed 42 — the same seed Spark's `xxhash64` function
  * uses, keeping values bit-identical to the interpreted HOF formulation this
  * replaces); the result bit is 1 where the vote sum is positive.
  *
  * Why native (the MinHashSignature treatment, see its scaladoc): the HOF
  * version (`aggregate(words, zip_with(...64 shifts...))`) is interpreted —
  * words x 64 boxed operations per row with no codegen — and dominated the
  * d_simhash pipeline. This is one tight two-level loop per row, hashing each
  * word once.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        |final int $n = $c.numElements();
        |final int[] $votes = new int[64];
        |for (int $i = 0; $i < $n; $i++) {
        |  final UTF8String $s = $c.getUTF8String($i);
        |  final long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |  for (int $b = 0; $b < 64; $b++) {
        |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
        |  }
        |}
        |long $out = 0L;
        |for (int $b = 0; $b < 64; $b++) {
        |  if ($votes[$b] > 0) $out |= (1L << $b);
        |}
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Column API for the native simhash. */
  def apply(words: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHash64(org.apache.spark.sql.GraftColumnBridge.expression(words)))
}
