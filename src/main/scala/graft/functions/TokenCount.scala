package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CJK-aware token count (r16) — the codepoint-class segmenter behind every
  * token-denominated gate ([[graft.ops.Text.tokenCount]], the Gopher quality
  * band, token-budget / temperature mixing, sequence packing). A pure
  * whitespace split counts a Chinese or Japanese document as ~1 "token" per
  * sentence (CJK scripts don't delimit words with spaces), which poisons
  * budgets, quality verdicts, and shard sizes on exactly the multilingual
  * corpora temperature-flattened sampling exists for.
  *
  * Definition (one pass, no regex, no allocation):
  *   - each CJK codepoint (the [[ScriptCounts.isCjk]] class: Han, Hiragana,
  *     Katakana, Hangul, Bopomofo — the shared routing definition) counts as
  *     ONE token — the standard char-per-token approximation;
  *   - each maximal run of other non-whitespace codepoints counts as ONE
  *     token (exactly a `\s+`-split word);
  *   - whitespace is the ASCII `\s` class `[ \t\n\x0B\f\r]` — the same
  *     class the `split(trim(text), "\s+")` restatements pin;
  *   - a text with NO tokens (empty / whitespace-only) counts 1, preserving
  *     `size(split(trim(''), "\s+")) = size([""]) = 1` — the semantics every
  *     prior oracle restated, so the kernel is count-identical to the old
  *     whitespace counter on ALL non-CJK input (boilerplate-cleaned text can
  *     genuinely be empty; the swap must not move those rows).
  *
  * Surrogate pairs decode to one codepoint (astral-plane Han counts once).
  * Per-row, shuffle-free, whole-stage-codegen'd (static kernel, the
  * WordChunks discipline).
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_count requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TokenCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)

  override def prettyName: String = "token_count"
}

object TokenCount {

  /** Static kernel shared by eval and the generated call. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    var tokens = 0L
    var inWord = false
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp == ' ' || (cp >= 0x09 && cp <= 0x0D)) inWord = false
      else if (ScriptCounts.isCjk(cp)) { tokens += 1; inWord = false }
      else if (!inWord) { tokens += 1; inWord = true }
      i += Character.charCount(cp)
    }
    if (tokens == 0L) 1L else tokens
  }

  /** Column API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TokenCount(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
