package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-gram shingling: the exact semantics of the HOF
  * chain it replaced —
  * `array_distinct(filter(transform(sequence(0, max(size(w)-n, 0)),
  * i -> concat_ws(" ", slice(w, i+1, n))), s -> s != ""))` over
  * `w = split(lower(trim(text)), "\s+")` — in one pass. Parity is kept by
  * using the SAME UTF8String kernels Spark's own expressions call (trim,
  * toLowerCase, regex split, concatWs), so outputs are byte-identical,
  * including the quirks (docs shorter than n words yield one all-words
  * shingle; un-trimmed tabs/newlines produce a leading empty word that
  * joins into the first shingle).
  *
  * The HOF chain is interpreted with no fusion — profiled ~7 s at sf0.1 for
  * 5000 docs, the single largest cost of every dedup pipeline; this is the
  * same medicine MinHash/SimHash got.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val WS: UTF8String = UTF8String.fromString("\\s+")
  private val SPACE: UTF8String = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // same kernel chain as lower(trim(text)) / split(…, "\s+")
    val words: Array[UTF8String] = text.trim().toLowerCase().split(WS, -1)
    val len = words.length
    val hi = math.max(len - n, 0) // inclusive, matches sequence(0, max(size-n, 0))
    val out = new java.util.LinkedHashSet[UTF8String]() // array_distinct keeps first occurrence
    var i = 0
    while (i <= hi) {
      val end = math.min(i + n, len) // slice clamps at the array end
      val sh =
        if (end - i == 1) words(i)
        else UTF8String.concatWs(SPACE, java.util.Arrays.copyOfRange(words, i, end): _*)
      if (sh.numBytes > 0) out.add(sh) // filter(s != "")
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Column API. */
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordShingles(org.apache.spark.sql.GraftColumnBridge.expression(text), n))
}
