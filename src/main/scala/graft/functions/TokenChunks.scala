package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CJK-aware overlapping token-window chunking (r16) — [[WordChunks]]'s
  * window/stride semantics over [[TokenCount]]'s segmentation instead of
  * whitespace words: each CJK codepoint ([[ScriptCounts.isCjk]], the shared
  * routing class) is its own token, each maximal other non-whitespace run is
  * one token. Completes the packing loop the CJK-aware counter opened: with
  * whitespace windows a pure-Han document is ONE chunk of thousands of
  * tokens — sequence packing can't split it and shard sizing is wrong on
  * exactly the multilingual corpus temperature sampling targets. Here a
  * window of `window` tokens is a window of `window` Han characters.
  *
  * Chunk text reconstruction preserves the source faithfully: a single
  * space is emitted between two in-chunk tokens iff whitespace separated
  * them in the source (so ASCII text reflows multi-whitespace to one space,
  * exactly WordChunks' concat_ws semantics — on non-CJK input this kernel
  * is BYTE-IDENTICAL to WordChunks), and nothing is emitted at a CJK
  * adjacency (Chinese text comes back without invented spaces).
  *
  * Empty/whitespace-only text yields one "" chunk (WordChunks' clamp rule:
  * `split("") = [""]` → one window). Per-row, shuffle-free, codegen'd.
  */
case class TokenChunks(child: Expression, window: Int, stride: Int)
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
          s"token_chunks requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TokenChunks.compute(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TokenChunks.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $window, $stride);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)

  override def prettyName: String = "token_chunks"
}

object TokenChunks {

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, window: Int, stride: Int): GenericArrayData = {
    val s = text.toString
    // one segmentation pass: per token its [start, end) char span and
    // whether whitespace preceded it in the source
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    val wsBefore = new java.util.ArrayList[java.lang.Boolean]()
    var i = 0
    val n = s.length
    var sawWs = false
    var wordStart = -1 // open non-CJK run, -1 if none
    def closeWord(at: Int): Unit = if (wordStart >= 0) {
      ends.add(at); wordStart = -1
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp == ' ' || (cp >= 0x09 && cp <= 0x0D)) {
        closeWord(i); sawWs = true
      } else if (ScriptCounts.isCjk(cp)) {
        closeWord(i)
        starts.add(i); ends.add(i + w); wsBefore.add(sawWs)
        sawWs = false
      } else if (wordStart < 0) {
        wordStart = i
        starts.add(i); wsBefore.add(sawWs)
        sawWs = false
      }
      i += w
    }
    closeWord(n)
    val nTok = starts.size()
    val nChunks = math.max(math.ceil((nTok - window).toDouble / stride).toInt + 1, 1)
    val arr = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val lo = c * stride
      val hi = math.min(lo + window, nTok)
      if (lo >= nTok) arr(c) = UTF8String.EMPTY_UTF8
      else {
        val sb = new java.lang.StringBuilder((ends.get(hi - 1) - starts.get(lo)) + (hi - lo))
        var j = lo
        while (j < hi) {
          if (j > lo && wsBefore.get(j)) sb.append(' ')
          sb.append(s, starts.get(j), ends.get(j))
          j += 1
        }
        arr(c) = UTF8String.fromString(sb.toString)
      }
      c += 1
    }
    new GenericArrayData(arr)
  }

  /** Column API. */
  def apply(text: Column, window: Int, stride: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TokenChunks(org.apache.spark.sql.GraftColumnBridge.expression(text), window, stride))
}
