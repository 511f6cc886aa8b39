package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native overlapping token-window chunking: the exact semantics of the HOF
  * chain it replaced —
  * `transform(sequence(0, nChunks-1), i -> concat_ws(" ", slice(w, i*stride+1,
  * window)))` with `w = split(trim(text), "\s+")` and
  * `nChunks = greatest(cast(ceil((size(w)-window)/stride)+1 as int), 1)` —
  * in one pass over the word array. Same medicine WordShingles got: the HOF
  * chain is interpreted (no whole-stage codegen for HigherOrderFunction), and
  * t_chunks/p_pack_chunks paid ~4 s at sf0.1 re-slicing and re-joining the
  * same words per window. Parity with the HOF chain is pinned byte-identical
  * by WordChunksSpec (same UTF8String trim/split/concatWs kernels Spark's own
  * expressions call).
  */
case class WordChunks(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  require(window > 0 && stride > 0 && stride <= window,
    "need 0 < stride <= window")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_chunks requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordChunks.compute(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WordChunks.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $window, $stride);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)

  override def prettyName: String = "word_chunks"
}

object WordChunks {
  private val WS: UTF8String = UTF8String.fromString("\\s+")
  private val SPACE: UTF8String = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, window: Int, stride: Int): GenericArrayData = {
    val words: Array[UTF8String] = text.trim().split(WS, -1)
    val len = words.length
    // greatest(cast(ceil((len-window)/stride)+1 as int), 1): a doc shorter
    // than one window yields itself as its single (clamped) chunk
    val nChunks = math.max(math.ceil((len - window).toDouble / stride).toInt + 1, 1)
    val arr = new Array[Any](nChunks)
    var i = 0
    while (i < nChunks) {
      val start = i * stride
      val end = math.min(start + window, len) // slice clamps at the array end
      arr(i) =
        if (start >= len) UTF8String.EMPTY_UTF8 // slice past end -> concat_ws of [] -> ""
        else if (end - start == 1) words(start)
        else UTF8String.concatWs(SPACE, java.util.Arrays.copyOfRange(words, start, end): _*)
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Column API. */
  def apply(text: Column, window: Int, stride: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordChunks(org.apache.spark.sql.GraftColumnBridge.expression(text), window, stride))
}

/** Native word n-grams WITH duplicates (WordShingles minus the distinct):
  * every position's n-gram of `lower(trim(text))` words in document order,
  * empty strings filtered. Duplicates are the point — repetition scoring
  * (Gopher-style quality signals) and term-frequency counting need the
  * multiset, which `array_distinct` would destroy. Shares the shingling
  * kernel conventions (clamped last gram, lowercase, \s+ split).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n-gram width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WordNgrams.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  private val WS: UTF8String = UTF8String.fromString("\\s+")
  private val SPACE: UTF8String = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words: Array[UTF8String] = text.trim().toLowerCase().split(WS, -1)
    val len = words.length
    val hi = math.max(len - n, 0) // inclusive, same positions as WordShingles
    val out = new java.util.ArrayList[Any](hi + 1)
    var i = 0
    while (i <= hi) {
      val end = math.min(i + n, len) // clamped last gram
      val g =
        if (end - i == 1) words(i)
        else UTF8String.concatWs(SPACE, java.util.Arrays.copyOfRange(words, i, end): _*)
      if (g.numBytes > 0) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordNgrams(org.apache.spark.sql.GraftColumnBridge.expression(text), n))
}
