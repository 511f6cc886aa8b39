package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a MinHash signature in one pass:
  * for each seed j in [0, numHashes), the minimum XXH64(shingle, seed=j)
  * over the input string array.
  *
  * Why a custom Expression (SURVEY §7 said "none needed" — this is the
  * revision): the higher-order-function formulation
  * (`transform(sequence(...), j -> array_min(transform(sh, ...)))`) is
  * interpreted — no codegen, no common-subexpression elimination — and
  * Catalyst freely inlines it per consumer, which turned a 12 s signature
  * pass into minutes (see ops.Dedup). This expression generates a tight
  * two-level Java loop over the UTF8 bytes: one evaluation, no per-element
  * allocation, whole-stage-codegen friendly.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
        if (h < min) min = h
        i += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val min = ctx.freshName("min"); val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
        |final int $n = $c.numElements();
        |final long[] $out = new long[$numHashes];
        |for (int $j = 0; $j < $numHashes; $j++) {
        |  long $min = Long.MAX_VALUE;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final UTF8String $s = $c.getUTF8String($i);
        |    final long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $j);
        |    if ($h < $min) $min = $h;
        |  }
        |  $out[$j] = $min;
        |}
        |${ev.value} = $uad.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** Column API for the native signature. */
  def apply(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashSignature(org.apache.spark.sql.GraftColumnBridge.expression(shingles), numHashes))
}

/** LSH band keys fused with the signature: one pass computes the
  * `numHashes`-seed minhash signature AND folds each `rowsPerBand`-slice
  * into a single XXH64-chained band key — array<long> of length `bands`.
  *
  * This removes the round-1 banding pipeline entirely: signature rows no
  * longer posexplode (`numHashes` rows/doc) through a groupBy +
  * collect_list/array_sort shuffle to be re-assembled into band hashes; a
  * doc now emits just `bands` (id, band, key) rows straight into the
  * candidate join. At sf0.1 that deletes a 3.2M-row shuffle per run.
  */
case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(bands > 0 && numHashes % bands == 0, "numHashes must divide by bands")
  private def rowsPerBand: Int = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_keys requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = b.toLong // band index seeds the chain: bands never collide
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) {
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val s = arr.getUTF8String(i)
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < min) min = h
          i += 1
        }
        key = XXH64.hashLong(min, key)
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val key = ctx.freshName("key")
      val j = ctx.freshName("j"); val end = ctx.freshName("end")
      val min = ctx.freshName("min"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      s"""
        |final int $n = $c.numElements();
        |final long[] $out = new long[$bands];
        |for (int $b = 0; $b < $bands; $b++) {
        |  long $key = (long) $b;
        |  final int $end = $b * $rowsPerBand + $rowsPerBand;
        |  for (int $j = $b * $rowsPerBand; $j < $end; $j++) {
        |    long $min = Long.MAX_VALUE;
        |    for (int $i = 0; $i < $n; $i++) {
        |      final UTF8String $s = $c.getUTF8String($i);
        |      final long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $j);
        |      if ($h < $min) $min = $h;
        |    }
        |    $key = $xxh.hashLong($min, $key);
        |  }
        |  $out[$b] = $key;
        |}
        |${ev.value} = $uad.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_keys"
}

object MinHashBandKeys {
  /** Column API for fused signature+banding. */
  def apply(shingles: Column, numHashes: Int, bands: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashBandKeys(org.apache.spark.sql.GraftColumnBridge.expression(shingles),
        numHashes, bands))
}
